"""Object-store-safe snapshot publish (VERDICT r4 #4): snapshots
share untouched partitions by MANIFEST REFERENCE (no hardlinks, no
byte copies), commit is a single pointer PUT, readers resolve tables
through build.read_table, GC never deletes a dir a retained manifest
references. A NoLinkFileIO simulates S3 semantics and RAISES on any
attempted link/copy, so 'nothing is shared by bytes' is asserted by
construction."""

import json
from pathlib import Path

import pytest

from pyspark.sql import functions as F

from addok_spark.config import EngineConfig, FieldSpec
from addok_spark.index.build import (
    IndexPaths,
    build_index,
    materialize_snapshot,
    read_table,
)
from addok_spark.index.fileio import LocalFileIO, NoLinkFileIO
from addok_spark.index.incremental import apply_actions
from addok_spark.query.engine import Query, SearchEngine


@pytest.fixture()
def cfg():
    return EngineConfig(
        fields=(FieldSpec("text", 1.0), FieldSpec("tool", 4.0)),
        build_partitions=4,
        doc_bucket_bits=2,
        pbucket_shift=1,
        posting_block_size=2,
        common_threshold=1000,
    )


def _corpus(spark, n=16):
    rows = [
        (f"conv-{i:03d}", 0, "user", f"alpha tok{i:03d} omega", None, 0.1)
        for i in range(n)
    ]
    return spark.createDataFrame(
        rows, "conv_id string, turn_idx int, role string, text string,"
        " tool string, importance double"
    )


def _batch(spark, i, text):
    return spark.createDataFrame(
        [(f"conv-{i:03d}", 0, "user", text, None, 0.5, "update")],
        "conv_id string, turn_idx int, role string, text string,"
        " tool string, importance double, _action string",
    )


def _search(spark, paths, cfg, q):
    eng = SearchEngine(spark, paths, cfg)
    return [
        (r["conv_id"], r["turn_idx"], round(r["score"], 6))
        for r in eng.search([Query(qid="q", q=q, k=10)]).collect()
    ]


def _twin(spark, cfg, tmp_path, fileio, name):
    paths = build_index(spark, _corpus(spark), cfg, str(tmp_path / name))
    m = apply_actions(
        spark, paths, _batch(spark, 0, "rewritten zeta payload"),
        cfg, fileio=fileio,
    )
    return paths, m


def test_nolink_publish_shares_by_reference(spark, cfg, tmp_path):
    lp, lm = _twin(spark, cfg, tmp_path, LocalFileIO(), "linked")
    np_, nm = _twin(spark, cfg, tmp_path, NoLinkFileIO(), "nolink")
    assert lm["touched_pbuckets"] == nm["touched_pbuckets"]
    touched = set(nm["touched_pbuckets"])

    # the no-link snapshot dir holds ONLY rewritten partitions
    snap = Path(np_.root) / "v000001"
    for table in ("docs", "blocks"):
        got = {
            p.name for p in (snap / table).iterdir()
            if p.name.startswith("pbucket=")
        }
        assert got == {f"pbucket={v}" for v in touched}, table

    # pointer names the manifest; untouched entries reference v0
    cur = json.loads((Path(np_.root) / "CURRENT.json").read_text())
    assert cur["version"] == 1 and cur["manifest"] == "snapshot-v000001.json"
    man = json.loads((Path(np_.root) / cur["manifest"]).read_text())
    assert man["materialized"] is False
    docs_entries = man["tables"]["docs"]
    untouched = {
        k: v for k, v in docs_entries.items()
        if k not in {f"pbucket={t}" for t in touched}
    }
    assert untouched, "some partitions must be untouched"
    assert all(not v.startswith("v000001/") for v in untouched.values())
    assert all(
        docs_entries[f"pbucket={t}"].startswith("v000001/") for t in touched
    )

    # manifest-resolved reads == the hardlink twin, table by table
    for table in ("docs", "blocks", "dictionary", "dict_partials",
                  "prefixes", "pairs"):
        a = read_table(spark, lp, table)
        b = read_table(spark, np_, table)
        cols = sorted(a.columns)
        assert sorted(b.columns) == cols, table
        ra = sorted(map(tuple, a.select(*cols).collect()))
        rb = sorted(map(tuple, b.select(*cols).collect()))
        assert ra == rb, f"{table} diverged between linked and no-link"

    # and the engine sees identical results
    assert _search(spark, np_, cfg, "rewritten zeta") == _search(
        spark, lp, cfg, "rewritten zeta"
    )
    assert _search(spark, np_, cfg, "alpha tok007") == _search(
        spark, lp, cfg, "alpha tok007"
    )


def test_nolink_chained_batches_resolve_across_snapshots(spark, cfg, tmp_path):
    """Second no-link batch: its manifest must merge references into
    BOTH v0 (still-untouched) and v1 (partitions v1 rewrote that v2
    did not), and reads resolve across all three roots."""
    io = NoLinkFileIO()
    lp, _ = _twin(spark, cfg, tmp_path, LocalFileIO(), "linked")
    np_, m1 = _twin(spark, cfg, tmp_path, io, "nolink")
    b2 = _batch(spark, 15, "second wave theta")
    m2l = apply_actions(spark, lp, b2, cfg)
    m2n = apply_actions(spark, np_, b2, cfg, fileio=io)
    assert m2l["touched_pbuckets"] == m2n["touched_pbuckets"]
    man = json.loads(
        (Path(np_.root) / "snapshot-v000002.json").read_text()
    )
    roots = {
        v.split("/", 1)[0] for v in man["tables"]["docs"].values()
    }
    assert "v000002" in roots
    assert "v000001" in roots or "docs" in roots
    for q in ("rewritten zeta", "second wave", "alpha tok003"):
        assert _search(spark, np_, cfg, q) == _search(spark, lp, cfg, q)


def test_nolink_gc_keeps_referenced_dirs(spark, cfg, tmp_path):
    """GC after publish deletes old snapshot dirs ONLY when no
    retained manifest references them: rewriting the SAME pbucket
    every batch strands the intermediate snapshot's partitions, so
    that dir goes; dirs still referenced survive any age."""
    io = NoLinkFileIO()
    cfg2 = EngineConfig(**{**cfg.__dict__, "snapshot_keep": 1})
    paths = build_index(spark, _corpus(spark), cfg2, str(tmp_path / "gc"))
    for i, text in enumerate(
        ["gc wave one", "gc wave two", "gc wave three"], start=1
    ):
        apply_actions(
            spark, paths, _batch(spark, 0, text), cfg2, fileio=io
        )
        assert paths.current_version() == i
    root = Path(paths.root)
    assert (root / "v000003").exists()
    # with keep=1 only v3's manifest is retained: an old dir survives
    # GC iff that manifest references it — no more (space leak), no
    # less (corruption)
    man = json.loads((root / "snapshot-v000003.json").read_text())
    referenced = {
        rel.split("/", 1)[0]
        for entries in man["tables"].values()
        for rel in entries.values()
    }
    for v in ("v000001", "v000002"):
        assert (root / v).exists() == (v in referenced), v
    # v1's rewrites were all superseded by v2/v3 (same doc each batch)
    # so at least one old dir must actually have been GC'd
    assert "v000001" not in referenced and not (root / "v000001").exists()
    # everything v3's manifest references still resolves
    for entries in man["tables"].values():
        for rel in entries.values():
            assert (root / rel).exists(), rel
    assert _search(spark, paths, cfg2, "gc wave three")
    # the superseded batch's token is gone from the live dictionary
    assert not _search(spark, paths, cfg2, "one")


def test_materialize_snapshot_for_serving(spark, cfg, tmp_path):
    """Serving needs a physical layout: it must refuse a
    reference-only snapshot with a pointer to materialize_snapshot,
    and the materialized copy must serve identically to the engine."""
    io = NoLinkFileIO()
    np_, _ = _twin(spark, cfg, tmp_path, io, "nolink")
    from addok_spark.serving.local import LocalSearchEngine

    with pytest.raises(ValueError, match="materialize"):
        LocalSearchEngine(np_, cfg)
    dest = str(tmp_path / "served")
    flat = materialize_snapshot(np_, dest)
    srv = LocalSearchEngine(flat, cfg)
    got = srv.search([Query(qid="q", q="rewritten zeta", k=10)])
    want = _search(spark, np_, cfg, "rewritten zeta")
    assert list(zip(got["conv_id"], got["turn_idx"])) == [
        (c, t) for c, t, _ in want
    ]


def test_read_table_prunes_partitions_on_manifest_snapshots(spark, cfg, tmp_path):
    """Manifest resolution must not cost partition pruning: a pbucket
    filter over the unioned per-base scans still reaches every scan's
    PartitionFilters."""
    io = NoLinkFileIO()
    np_, m = _twin(spark, cfg, tmp_path, io, "nolink")
    pb = m["touched_pbuckets"][0]
    df = read_table(spark, np_, "docs").filter(F.col("pbucket") == pb)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in plan and "pbucket" in plan
    assert df.count() > 0


def test_cli_ngrams_postpass_on_flat_linked_and_reference_snapshots(
    spark, cfg, tmp_path, capsys, monkeypatch
):
    """The `ngrams` CLI post-pass must work against all three index
    states: flat bulk layout, versioned materialized snapshots, and
    versioned reference-only (object-store) snapshots — in the last
    case carrying untouched tables purely via the new manifest."""
    import json as _json

    import addok_spark.__main__ as cli

    monkeypatch.setattr(cli, "_spark", lambda args: spark)
    cfg2 = EngineConfig(**{
        **cfg.__dict__, "build_prefixes": False, "min_edge_ngram": 2,
    })

    def run_ngrams(idx):
        cli.main(["ngrams", "--index", idx])
        out = capsys.readouterr().out.strip().splitlines()[-1]
        return _json.loads(out)["prefixes"]

    def has_prefix(paths, pfx):
        rows = read_table(spark, paths.pin(), "prefixes").filter(
            F.col("prefix") == pfx
        )
        return rows.count() > 0

    # (a) flat layout
    flat = build_index(spark, _corpus(spark), cfg2, str(tmp_path / "flat"))
    assert run_ngrams(str(flat.root))["version"] is None
    assert has_prefix(flat, "alp")

    # (b) versioned materialized (LocalFileIO CDC first)
    lp = build_index(spark, _corpus(spark), cfg2, str(tmp_path / "lk"))
    apply_actions(spark, lp, _batch(spark, 0, "linked ngrams probe"), cfg2)
    v = run_ngrams(str(lp.root))["version"]
    assert v == 2 and lp.pin().version == 2
    assert has_prefix(lp, "lin")

    # (c) versioned reference-only (NoLinkFileIO CDC first): carried
    # tables resolve via the manifest, prefixes land in the new
    # snapshot, searches still work
    np_ = build_index(spark, _corpus(spark), cfg2, str(tmp_path / "nl"))
    apply_actions(
        spark, np_, _batch(spark, 0, "nolink ngrams probe"), cfg2,
        fileio=NoLinkFileIO(),
    )
    v = run_ngrams(str(np_.root))["version"]
    assert v == 2 and np_.pin().version == 2
    man = json.loads((Path(np_.root) / "snapshot-v000002.json").read_text())
    assert man["materialized"] is False
    assert "prefixes" in man["tables"]
    assert any(
        not loc.startswith("v000002/")
        for loc in man["tables"]["docs"].values()
    ), "carried tables must stay by-reference"
    assert has_prefix(np_, "nol")
    assert _search(spark, np_, cfg2, "nolink ngrams")
