"""Reference-style config-module loading (≙ ADDOK_CONFIG_MODULE,
reference addok/config/__init__.py:32-96 and tests/test_base.py):
UPPERCASE knobs from a Python file map onto EngineConfig."""

import pytest

from addok_spark.config import FieldSpec, config_from_module


def _write(tmp_path, body):
    p = tmp_path / "local_config.py"
    p.write_text(body)
    return str(p)


def test_reference_knobs_map(tmp_path):
    syn = tmp_path / "synonyms.txt"
    syn.write_text("bd => boulevard\n")
    path = _write(
        tmp_path,
        f"""
BUCKET_MAX = 42
COMMON_THRESHOLD = 1234
MIN_EDGE_NGRAMS = 2
MAX_EDGE_NGRAMS = 12
QUERY_MAX_LENGTH = 99
MIN_SCORE = 0.3
FILTERS = ["role"]
FIELDS = [
    {{"key": "text", "boost": 2, "null": False}},
    {{"key": "tool"}},
]
SYNONYMS_PATHS = [{str(syn)!r}]
LOG_QUERIES = True
""",
    )
    cfg = config_from_module(path)
    assert cfg.bucket_max == 42
    assert cfg.common_threshold == 1234
    assert cfg.min_edge_ngram == 2 and cfg.max_edge_ngram == 12
    assert cfg.query_max_length == 99 and cfg.min_score == 0.3
    assert cfg.filter_fields == ("role",)
    assert cfg.fields == (
        FieldSpec("text", boost=2.0, allow_null=False),
        FieldSpec("tool"),
    )
    assert cfg.synonyms == {"bd": "boulevard"}
    assert cfg.log_queries is True


def test_lowercase_native_names_and_overrides(tmp_path):
    path = _write(tmp_path, "bucket_max = 7\nscorer = 'reference'\n")
    cfg = config_from_module(path, bucket_max=9)
    assert cfg.bucket_max == 9  # explicit overrides beat the file
    assert cfg.scorer == "reference"


def test_ignored_reference_knobs_are_tolerated(tmp_path):
    path = _write(
        tmp_path,
        "REDIS = {'host': 'x'}\nGEOHASH_PRECISION = 9\n"
        "ID_FIELD = '_id'\nATTRIBUTION = 'BANO'\nBUCKET_MIN = 3\n",
    )
    assert config_from_module(path).bucket_min == 3


def test_unknown_key_raises(tmp_path):
    path = _write(tmp_path, "NOT_A_KNOB = 1\n")
    with pytest.raises(ValueError, match="NOT_A_KNOB"):
        config_from_module(path)


def test_missing_file_raises(tmp_path):
    with pytest.raises(Exception):
        config_from_module(str(tmp_path / "nope.py"))


def test_cli_cfg_reads_env(tmp_path, monkeypatch):
    import argparse

    from addok_spark.__main__ import _cfg

    path = _write(tmp_path, "BUCKET_MAX = 55\n")
    monkeypatch.setenv("ADDOK_SPARK_CONFIG", path)
    args = argparse.Namespace(cores="4", config=None)
    cfg = _cfg(args)
    assert cfg.bucket_max == 55
    assert cfg.build_partitions == 8  # flag-derived values still win


def test_imports_and_helpers_allowed(tmp_path):
    path = _write(
        tmp_path,
        "import os\nbase = os.path.join('/tmp', 'x')\n"
        "LOG_DIR = base\nLOG_QUERIES = True\nBUCKET_MAX = 11\n",
    )
    cfg = config_from_module(path)
    assert cfg.bucket_max == 11
    assert cfg.log_dir == "/tmp/x" and cfg.log_queries is True


def test_cli_does_not_clobber_file_knobs(tmp_path, monkeypatch):
    import argparse

    from addok_spark.__main__ import _cfg

    path = _write(
        tmp_path,
        "build_partitions = 64\nLOG_QUERIES = True\nLOG_DIR = '/tmp/ql'\n",
    )
    monkeypatch.setenv("ADDOK_SPARK_CONFIG", path)
    # no explicit --cores, no log flags: the file rules
    args = argparse.Namespace(cores="*", config=None)
    cfg = _cfg(args)
    assert cfg.build_partitions == 64
    assert cfg.log_queries is True and cfg.log_dir == "/tmp/ql"
    # an explicit flag still wins over the file
    args2 = argparse.Namespace(cores="4", config=None)
    assert _cfg(args2).build_partitions == 8


def test_log_flags_without_dir_default_to_cwd(monkeypatch):
    import argparse

    from addok_spark.__main__ import _cfg

    monkeypatch.delenv("ADDOK_SPARK_CONFIG", raising=False)
    args = argparse.Namespace(cores="*", config=None, log_queries=True)
    cfg = _cfg(args)
    assert cfg.log_queries is True and cfg.log_dir == "."


def test_callable_fields_boost_maps_to_boost_fn(tmp_path):
    """The reference allows FIELDS boost=lambda doc: ...
    (tests/test_index_utils.py:247-263). The loader carries the
    callable on FieldSpec.boost_fn — the build materializes it into
    a generated boost column (index/build.py:
    materialize_callable_boosts); nothing is silently dropped."""
    path = _write(
        tmp_path,
        "FIELDS = [{'key': 'text', 'boost': lambda doc: 2.0},"
        " {'key': 'tool'}]\n",
    )
    cfg = config_from_module(path)
    assert cfg.fields[0].boost_fn is not None
    assert cfg.fields[0].boost_fn({"text": "x"}) == 2.0
    assert cfg.fields[0].boost == 1.0  # static fallback stays neutral
    assert cfg.fields[1].boost_fn is None


def test_cli_reset(tmp_path, monkeypatch, capsys):
    """≙ reference `addok reset --force` (batch.py:33-35): removes
    every snapshot/stage under the index root; refuses to delete a
    directory that is not one of our indexes; asks for confirmation
    without --force."""
    from addok_spark.__main__ import main

    idx = tmp_path / "idx"
    idx.mkdir()
    (idx / "meta.json").write_text("{}")
    (idx / "blocks").mkdir()

    # non-index dirs are refused even with --force
    other = tmp_path / "precious"
    other.mkdir()
    (other / "data.txt").write_text("keep me")
    with pytest.raises(SystemExit, match="does not look like"):
        main(["reset", "--index", str(other), "--force"])
    assert other.exists()

    # declined confirmation aborts
    monkeypatch.setattr("builtins.input", lambda *_: "n")
    main(["reset", "--index", str(idx)])
    assert idx.exists()

    # --force deletes without asking
    main(["reset", "--index", str(idx), "--force"])
    assert not idx.exists()

    # resetting a missing dir is a no-op, not an error
    main(["reset", "--index", str(idx), "--force"])
    out = capsys.readouterr().out
    assert "nothing to reset" in out


def test_pyshell_namespace(tmp_path, spark):
    """≙ reference pyshell user_ns (shell.py:595-614): the namespace
    carries a live engine over --index plus doc lookup. The session
    fixture is reused through _spark's getOrCreate."""
    import argparse

    from addok_spark.__main__ import pyshell_namespace
    from addok_spark.config import EngineConfig
    from addok_spark.data.transcripts import transcripts_df
    from addok_spark.index.build import build_index

    cfg = EngineConfig(build_partitions=2, doc_bucket_bits=2,
                       posting_block_size=8)
    df = transcripts_df(spark, 5, seed=7)
    build_index(spark, df, cfg, str(tmp_path / "psi"))
    args = argparse.Namespace(cores="*", config=None,
                              driver_memory="8g",
                              index=str(tmp_path / "psi"))
    ns = pyshell_namespace(args)
    assert {"spark", "config", "engine", "Query", "doc_by_id"} <= set(ns)
    some = df.limit(1).collect()[0]
    rows = ns["doc_by_id"](some.conv_id, some.turn_idx)
    assert len(rows) == 1 and rows[0]["conv_id"] == some.conv_id
    res = ns["engine"].search(
        [ns["Query"](qid="p", q=some.text.split()[0], k=3)]
    )
    assert res.count() >= 0
