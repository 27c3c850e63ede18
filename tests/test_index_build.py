"""Golden posting-table state tests (analog of the reference's exact
Redis-keyspace assertions, ``tests/test_index_utils.py:49-116``) plus
codec round-trips and resume behavior."""

import json
from pathlib import Path

import numpy as np
import pytest

from pyspark.sql import functions as F

from addok_spark.config import EngineConfig, FieldSpec
from addok_spark.index.build import build_index
from addok_spark.index.compress import (
    pack_deltas,
    unpack_deltas,
    varint_decode,
    varint_encode,
)


@pytest.fixture(scope="module")
def tiny_cfg():
    return EngineConfig(
        fields=(FieldSpec("text", 1.0), FieldSpec("tool", 4.0)),
        build_partitions=4,
        doc_bucket_bits=2,      # tiny buckets to exercise blocking
        posting_block_size=2,   # force multi-block posting lists
    )


@pytest.fixture(scope="module")
def tiny_corpus(spark):
    rows = [
        ("conv-a", 0, "user", "rue des Lilas", None, 0.5),
        ("conv-a", 1, "assistant", "rue des Lilas lilas", "grep", 0.5),
        ("conv-b", 0, "user", "avenue des Champs", None, 0.25),
        ("conv-b", 1, "tool", "rue du Général", "bash", 0.25),
    ]
    return spark.createDataFrame(
        rows, "conv_id string, turn_idx int, role string, text string,"
        " tool string, importance double"
    )


@pytest.fixture(scope="module")
def built(spark, tiny_corpus, tiny_cfg, tmp_index_root):
    out = str(Path(tmp_index_root) / "tiny")
    return build_index(spark, tiny_corpus, tiny_cfg, out)


def test_codec_roundtrip():
    rng = np.random.Generator(np.random.PCG64(3))
    v = np.sort(rng.integers(0, 2**50, size=5000).astype(np.uint64))
    assert np.array_equal(unpack_deltas(pack_deltas(v)), v)
    raw = rng.integers(0, 2**63, size=777).astype(np.uint64)
    assert np.array_equal(varint_decode(varint_encode(raw)), raw)


def test_doc_ids_dense_and_ordered(spark, built):
    docs = spark.read.parquet(built.docs).orderBy("doc_index").collect()
    ids = [r["doc_index"] for r in docs]
    assert ids == list(range(4))
    keys = [(r["conv_id"], r["turn_idx"]) for r in docs]
    assert keys == sorted(keys)  # stable (conv_id, turn_idx) ordering


def test_text_roundtrip_equality(spark, built, tiny_corpus):
    """Per-turn text equality under stable ordering (input_hint)."""
    orig = {
        (r["conv_id"], r["turn_idx"]): r["text"]
        for r in tiny_corpus.collect()
    }
    stored = {
        (r["conv_id"], r["turn_idx"]): r["text"]
        for r in spark.read.parquet(built.docs).collect()
    }
    assert orig == stored


def test_golden_posting_state(spark, built, tiny_cfg):
    """Exact posting rows ≙ exact Redis keyspace (boost formula
    DEFAULT_BOOST/len(tokens)*field_boost + importance*0.1,
    index_utils tests' `zscore == 4/5` analog)."""
    dictionary = {
        r["token"]: r
        for r in spark.read.parquet(built.dictionary).collect()
    }
    # 'rue' appears in docs 0,1,3 → df=3
    assert dictionary["rue"]["df"] == 3
    assert dictionary["lilas"]["df"] == 2
    assert dictionary["lilas"]["cf"] == 3  # tf 1 + tf 2
    assert dictionary["lilas"]["max_tf"] == 2
    # 'lilas' boosts: doc0 "rue des Lilas" (3 toks) → 1/3 + 0.5*0.1;
    # doc1 (4 toks) → 1/4 + 0.05; max = doc0's (shorter field boosts
    # more, addok/helpers/index.py:30-37)
    expected = np.float32(1.0 / 3 + 0.05)
    assert dictionary["lilas"]["max_boost"] == pytest.approx(float(expected))
    # tool field boost: 'grep' = 1/1*4 + 0.05
    assert dictionary["grep"]["max_boost"] == pytest.approx(
        float(np.float32(4.0 + 0.05))
    )


def test_blocks_pack_and_split(spark, built, tiny_cfg):
    from addok_spark.index.compress import unpack_deltas as und, varint_decode as vd

    blocks = spark.read.parquet(built.blocks).filter(F.col("token") == "rue")
    rows = blocks.orderBy("bucket", "block_id").collect()
    all_docs = []
    for r in rows:
        docs = und(bytes(r["docs_bin"])).astype(int).tolist()
        assert r["n"] == len(docs)
        assert r["min_doc"] == docs[0] and r["max_doc"] == docs[-1]
        assert len(docs) <= tiny_cfg.posting_block_size
        all_docs += docs
    assert all_docs == sorted(all_docs) == [0, 1, 3]


def test_dl_and_meta(spark, built):
    meta = json.loads(built.meta.read_text())
    assert meta["n_docs"] == 4
    docs = {r["doc_index"]: r["dl"] for r in spark.read.parquet(built.docs).collect()}
    # doc 1: 4 text tokens + 1 tool token
    assert docs[1] == 5
    assert meta["avgdl"] == pytest.approx(sum(docs.values()) / 4)


def test_prefix_table(spark, built):
    pfx = spark.read.parquet(built.prefixes)
    got = {
        (r["prefix"], r["token"])
        for r in pfx.filter(F.col("token") == "lilas").collect()
    }
    assert got == {("lil", "lilas"), ("lila", "lilas")}
    # digit tokens excluded
    assert pfx.filter(F.col("token").rlike("^[0-9]+$")).count() == 0


def test_pairs_table(spark, built):
    pairs = {
        (r["token_a"], r["token_b"])
        for r in spark.read.parquet(built.pairs).collect()
    }
    assert ("des", "rue") in pairs or ("rue", "des") in pairs
    for a, b in pairs:
        assert a < b  # canonical ordering, no dup orientation


def test_pairs_from_analyzed_equals_pairs_from_blocks(spark, built, tiny_cfg):
    """The bulk-path derivation (per-doc token sets read straight from
    the analyzed scratch) must produce the identical pair set to the
    CDC-path block-unpack derivation — including commons exclusion
    (threshold lowered so the tiny corpus actually has a Zipf head)."""
    from dataclasses import replace

    from addok_spark.index.build import pairs_from_analyzed, pairs_from_blocks

    analyzed = spark.read.parquet(str(Path(built.root) / "_analyzed"))
    blocks = spark.read.parquet(built.blocks)
    dictionary = spark.read.parquet(built.dictionary)
    for thr in (tiny_cfg.common_threshold, 2):  # no commons / with commons
        cfg = replace(tiny_cfg, common_threshold=thr)
        a = {
            (r.pbucket, r.token_a, r.token_b)
            for r in pairs_from_analyzed(analyzed, dictionary, cfg).collect()
        }
        b = {
            (r.pbucket, r.token_a, r.token_b)
            for r in pairs_from_blocks(blocks, dictionary, cfg).collect()
        }
        assert a == b and a
    # the thr=2 run actually excluded the Zipf head (df("des")=3 > 2)
    assert not any(
        t in ("des", "rue") for _, ta, tb in a for t in (ta, tb)
    )


def test_vectorized_analyzer_equals_pandas_udf(spark, tiny_corpus):
    """`_make_doc_analyzer` (Arrow-native, vectorized) must produce
    per-doc token aggregates identical to the pandas-UDF reference
    twin `make_doc_tokens_udf` — token set, tf, boost (importance
    folded in), position payload bytes, and dl — including synonym
    expansion. Struct ORDER within a doc is unspecified (code order vs
    first-occurrence), so compare as sets."""
    from pyspark.sql import functions as F

    from addok_spark.index.build import analyze_docs, make_doc_tokens_udf

    cfg = EngineConfig(
        fields=(FieldSpec("text", 1.0), FieldSpec("tool", 4.0)),
        synonyms=(("avenue", "av"), ("rue", "r")),
    )
    docs = tiny_corpus.withColumn("doc_index", F.monotonically_increasing_id())

    new = analyze_docs(docs, cfg).select("doc_index", "__an").collect()
    udf = make_doc_tokens_udf(cfg, ["text", "tool"])
    old = docs.withColumn(
        "__an", udf(F.col("text"), F.col("tool"), F.col("importance"))
    ).select("doc_index", "__an").collect()

    def canon(rows):
        return {
            r["doc_index"]: (
                r["__an"].dl,
                frozenset(
                    (t.token, t.tf, bytes(t.pos_bin), round(t.boost, 6))
                    for t in r["__an"].toks
                ),
            )
            for r in rows
        }

    got, want = canon(new), canon(old)
    assert got == want
    # synonyms actually fired (rue → r)
    all_toks = {t for _, ts in got.values() for (t, *_rest) in ts}
    assert "r" in all_toks and "rue" not in all_toks


def test_local_pack_blocks_equal_exploded_path(spark, built, tiny_cfg):
    """The local-pack+merge bulk path must emit block rows
    BIT-IDENTICAL to the exploded sort-merge path (`build_blocks`) —
    same grouping, same chunking, same payload bytes — including f|
    filter postings, multi-block runs (block_size=2) and multi-bucket
    salting (doc_bucket_bits=2)."""
    from pyspark.sql import functions as F

    from addok_spark.index.build import (
        build_blocks,
        build_blocks_from_analyzed,
        filter_token_rows,
    )

    analyzed = spark.read.parquet(str(Path(built.root) / "_analyzed"))
    token_doc = analyzed.select(
        "doc_index", F.explode("__an.toks").alias("tk")
    ).select(
        "doc_index",
        F.col("tk.token").alias("token"),
        F.col("tk.tf").alias("tf"),
        F.col("tk.pos_bin").alias("pos_bin"),
        F.col("tk.boost").alias("boost"),
    )
    frows = filter_token_rows(analyzed, tiny_cfg)
    if frows is not None:
        token_doc = token_doc.unionByName(frows)

    def key(r):
        return (r.token, r.bucket, r.block_id)

    old = {key(r): r.asDict() for r in build_blocks(token_doc, tiny_cfg).collect()}
    new = {
        key(r): r.asDict()
        for r in build_blocks_from_analyzed(analyzed, tiny_cfg).collect()
    }
    assert set(old) == set(new)
    assert any(r["token"].startswith("f|") for r in new.values())
    assert max(r["block_id"] for r in new.values()) > 0  # multi-block runs
    for k, r in old.items():
        assert new[k] == r, k


def test_local_pack_filter_cast_parity_numeric_field(spark, tmp_index_root):
    """f| filter keys for NON-string filter columns must use Spark
    cast semantics (1.0 → '1.0'), not Arrow's ('1') — the query side
    builds keys with Spark casts, so a divergence silently breaks
    every filtered query on that field."""
    from pyspark.sql import functions as F

    from addok_spark.index.build import build_index

    cfg = EngineConfig(
        fields=(FieldSpec("text", 1.0),),
        filter_fields=("year",),
        build_partitions=2,
        doc_bucket_bits=4,
    )
    rows = [("c", 0, "hello world", 2024.0), ("c", 1, "more text", None)]
    docs = spark.createDataFrame(
        rows, "conv_id string, turn_idx int, text string, year double"
    )
    out = str(Path(tmp_index_root) / "numfilter")
    paths = build_index(spark, docs, cfg, out)
    ftoks = {
        r.token
        for r in spark.read.parquet(paths.blocks)
        .filter(F.col("token").startswith("f|"))
        .select("token")
        .collect()
    }
    assert ftoks == {"f|year|2024.0"}  # Spark cast spelling, null dropped


def test_analyzer_empty_synonym_target_and_no_fields(spark):
    """Falsy synonym targets keep the original token (the reference
    `if repl` check); a docs frame with NO configured field columns
    analyzes to empty token lists instead of crashing."""
    from addok_spark.index.build import analyze_docs

    cfg = EngineConfig(
        fields=(FieldSpec("text", 1.0),), synonyms=(("foo", ""),)
    )
    docs = spark.createDataFrame(
        [(0, "foo bar")], "doc_index long, text string"
    )
    toks = {
        t.token
        for r in analyze_docs(docs, cfg).select("__an").collect()
        for t in r["__an"].toks
    }
    assert toks == {"foo", "bar"}  # '' not injected, foo kept

    nofield = spark.createDataFrame([(0, 1.5)], "doc_index long, x double")
    got = analyze_docs(nofield, cfg).select("__an").collect()
    assert got[0]["__an"].toks == [] and got[0]["__an"].dl == 0


ALT_ROWS = [
    ("c", 0, "user", "Vernou-la-Celle-sur-Seine", None, 0.0, ["Vernou"]),
    ("c", 1, "user", "rue des Lilas", "grep", 0.5, None),
    ("c", 2, "user", "avenue des Champs", None, 0.25,
     ["Champs", "avenue verte des champs"]),
    ("c", 3, "user", "boulevard Voltaire", "bash", 0.0, []),
]
ALT_SCHEMA = (
    "conv_id string, turn_idx int, role string, text string,"
    " tool string, importance double, alt_texts array<string>"
)


def test_list_value_variants_weights(spark, tmp_index_root):
    """≙ reference test_allow_list_values
    (tests/test_index_utils.py:170-183): a list-valued name indexes
    every variant, each weighted by ITS OWN token count — w|vernou ==
    field boost 4 (1-token variant), w|celle == 4/5 (5-token
    variant) — and tf folds across variants."""
    cfg = EngineConfig(
        fields=(FieldSpec("text", 4.0), FieldSpec("tool", 1.0)),
        build_partitions=2, doc_bucket_bits=2, posting_block_size=4,
    )
    df = spark.createDataFrame(ALT_ROWS, ALT_SCHEMA)
    paths = build_index(
        spark, df, cfg, str(Path(tmp_index_root) / "altidx")
    )
    docs = spark.read.parquet(paths.docs)
    d0 = docs.filter(F.col("turn_idx") == 0).collect()[0]
    from addok_spark.serving.local import ParquetIndex

    idx = ParquetIndex(str(paths.root), cfg)
    d = int(d0["doc_index"])
    assert idx.tf_of("vernou", d) == 2
    assert abs(idx.boost_of("vernou", d) - 4.0) < 1e-6
    assert idx.tf_of("celle", d) == 1
    assert abs(idx.boost_of("celle", d) - 4 / 5) < 1e-6
    assert idx.doc_len(d) == 6
    # deindex parity (tests/test_index_utils.py:185-201): deleting the
    # doc removes its variant postings too
    from addok_spark.index.incremental import apply_actions

    ch = spark.createDataFrame(
        [("c", 0, "user", None, None, 0.0, None, "delete")],
        ALT_SCHEMA + ", _action string",
    )
    apply_actions(spark, paths, ch, cfg)
    idx2 = ParquetIndex(str(paths.root), cfg)
    assert idx2.posting_count("vernou") == 0
    assert idx2.posting_count("celle") == 0


def test_vectorized_analyzer_equals_pandas_udf_with_alt(spark):
    """Alt-variant segments must keep the vectorized analyzer and the
    pandas twin bit-identical (token set, tf, boost, position bytes,
    dl) including synonyms inside variants."""
    from addok_spark.index.build import analyze_docs, make_doc_tokens_udf

    cfg = EngineConfig(
        fields=(FieldSpec("text", 4.0), FieldSpec("tool", 1.0)),
        synonyms=(("avenue", "av"),),
    )
    docs = spark.createDataFrame(ALT_ROWS, ALT_SCHEMA).withColumn(
        "doc_index", F.monotonically_increasing_id()
    )
    new = analyze_docs(docs, cfg).select("doc_index", "__an").collect()
    udf = make_doc_tokens_udf(cfg, ["text", "tool"], with_alt=True)
    old = docs.withColumn(
        "__an",
        udf(F.col("text"), F.col("tool"), F.col("alt_texts"),
            F.col("importance")),
    ).select("doc_index", "__an").collect()

    def canon(rows):
        return {
            r["doc_index"]: (
                r["__an"].dl,
                frozenset(
                    (t.token, t.tf, bytes(t.pos_bin), round(t.boost, 6))
                    for t in r["__an"].toks
                ),
            )
            for r in rows
        }

    assert canon(new) == canon(old)


def test_boost_col_overrides_field_boost(spark, tmp_index_root):
    """≙ reference test_should_be_possible_to_override_boost_with_callable
    (tests/test_index_utils.py:247-263): a per-document boost — a
    callable in the reference, a numeric COLUMN here (callables don't
    vectorize; column expressions do) — replaces the field's static
    boost: w|lilas == 5, w|cergy == 1; null falls back to the static
    boost. Vectorized analyzer and pandas twin stay bit-identical."""
    from addok_spark.index.build import analyze_docs, make_doc_tokens_udf
    from addok_spark.serving.local import ParquetIndex

    cfg = EngineConfig(
        fields=(
            FieldSpec("text", 1.0, boost_col="text_boost"),
            FieldSpec("tool", 1.0),
        ),
        build_partitions=2, doc_bucket_bits=2, posting_block_size=4,
    )
    rows = [
        ("c", 0, "user", "Lilas", "Cergy", 0.0, 5.0),
        ("c", 1, "user", "Voltaire", None, 0.0, None),  # null → static
    ]
    schema = ("conv_id string, turn_idx int, role string, text string,"
              " tool string, importance double, text_boost double")
    df = spark.createDataFrame(rows, schema)
    paths = build_index(
        spark, df, cfg, str(Path(tmp_index_root) / "bcol")
    )
    idx = ParquetIndex(str(paths.root), cfg)
    docs = {
        r["turn_idx"]: int(r["doc_index"])
        for r in spark.read.parquet(paths.docs).collect()
    }
    assert abs(idx.boost_of("lilas", docs[0]) - 5.0) < 1e-6
    assert abs(idx.boost_of("cergy", docs[0]) - 1.0) < 1e-6
    assert abs(idx.boost_of("voltaire", docs[1]) - 1.0) < 1e-6
    # twin equivalence with the boost column in play
    docs_df = df.withColumn("doc_index", F.monotonically_increasing_id())
    new = analyze_docs(docs_df, cfg).select("doc_index", "__an").collect()
    udf = make_doc_tokens_udf(cfg, ["text", "tool"])
    old = docs_df.withColumn(
        "__an",
        udf(F.col("text"), F.col("tool"), F.col("text_boost"),
            F.col("importance")),
    ).select("doc_index", "__an").collect()

    def canon(rs):
        return {
            r["doc_index"]: (
                r["__an"].dl,
                frozenset(
                    (t.token, t.tf, bytes(t.pos_bin), round(t.boost, 6))
                    for t in r["__an"].toks
                ),
            )
            for r in rs
        }

    assert canon(new) == canon(old)
    # oracle mirrors the same per-doc boost override
    import pandas as pd

    from addok_spark.oracle.bm25_oracle import OracleIndex

    pdf = pd.DataFrame(
        [list(r) for r in rows],
        columns=["conv_id", "turn_idx", "role", "text", "tool",
                 "importance", "text_boost"],
    )
    oi = OracleIndex(pdf, cfg)
    assert abs(oi.boost_of("lilas", 0) - 5.0) < 1e-6
    assert abs(oi.boost_of("cergy", 0) - 1.0) < 1e-6
    assert abs(oi.boost_of("voltaire", 1) - 1.0) < 1e-6


def test_allow_null_false_drops_doc(spark, tmp_index_root):
    """≙ reference test_doc_with_null_value_should_not_be_index_if_not_allowed
    (tests/test_index_utils.py:266-281): with ``null=False`` on a
    field, a document whose value is null or blank is not indexed at
    all — no doc row, no postings from its OTHER fields either."""
    cfg = EngineConfig(
        fields=(
            FieldSpec("text", 1.0, allow_null=False),
            FieldSpec("tool", 4.0),
        ),
        build_partitions=2,
        doc_bucket_bits=2,
        posting_block_size=4,
    )
    rows = [
        ("c", 0, "user", "rue des Lilas", None, 0.0),
        ("c", 1, "user", "", "cergy", 0.0),        # blank text → dropped
        ("c", 2, "user", "   ", None, 0.0),        # whitespace → dropped
        ("c", 3, "user", None, "bash", 0.0),       # null → dropped
        ("c", 4, "user", "avenue Voltaire", None, 0.0),
    ]
    df = spark.createDataFrame(
        rows, "conv_id string, turn_idx int, role string, text string,"
        " tool string, importance double"
    )
    paths = build_index(
        spark, df, cfg, str(Path(tmp_index_root) / "nullf")
    )
    docs = spark.read.parquet(paths.docs)
    assert sorted(
        r["turn_idx"] for r in docs.select("turn_idx").collect()
    ) == [0, 4]
    toks = {
        r["token"] for r in spark.read.parquet(paths.dictionary).collect()
    }
    # the dropped doc's tool tokens must not leak into the index
    assert "cergy" not in toks and "bash" not in toks
    # default config (allow_null=True) keeps all five docs
    cfg2 = EngineConfig(
        fields=(FieldSpec("text", 1.0), FieldSpec("tool", 4.0)),
        build_partitions=2, doc_bucket_bits=2, posting_block_size=4,
    )
    p2 = build_index(spark, df, cfg2, str(Path(tmp_index_root) / "nullt"))
    assert spark.read.parquet(p2.docs).count() == 5


def test_resume_skips_completed_stages(spark, tiny_corpus, tiny_cfg, built):
    manifest = json.loads(built.manifest.read_text())
    before = manifest["stages"]["blocks"]
    # rebuild with resume=True → stage untouched
    build_index(spark, tiny_corpus, tiny_cfg, str(built.root), resume=True)
    after = json.loads(built.manifest.read_text())["stages"]["blocks"]
    assert before == after


def test_callable_boost_matches_reference_scenario(spark, tmp_index_root):
    """≙ reference test_should_be_possible_to_override_boost_with_callable
    (tests/test_index_utils.py:247-263) with the ACTUAL callable:
    FIELDS boost=lambda doc: 5 on the primary field → w|lilas == 5
    while the other field keeps boost 1 (w|cergy == 1). The callable
    sees the document as a dict of source columns; here it reads one
    to prove per-DOCUMENT evaluation, not a constant fold."""
    from addok_spark.serving.local import ParquetIndex

    cfg = EngineConfig(
        fields=(
            FieldSpec("text", 1.0, boost_fn=lambda doc: doc["importance"] * 10),
            FieldSpec("tool", 1.0),
        ),
        build_partitions=2, doc_bucket_bits=2, posting_block_size=4,
    )
    rows = [
        ("c", 0, "user", "Lilas", "Cergy", 0.5),   # fn → 5.0
        ("c", 1, "user", "Voltaire", None, 0.2),   # fn → 2.0
    ]
    schema = ("conv_id string, turn_idx int, role string, text string,"
              " tool string, importance double")
    df = spark.createDataFrame(rows, schema)
    paths = build_index(
        spark, df, cfg, str(Path(tmp_index_root) / "bfn")
    )
    idx = ParquetIndex(str(paths.root), cfg)
    docs = {
        r["turn_idx"]: int(r["doc_index"])
        for r in spark.read.parquet(paths.docs).collect()
    }
    # w|lilas = 5/1-token + importance*0.1; w|cergy = 1 + imp*0.1
    assert abs(idx.boost_of("lilas", docs[0]) - (5.0 + 0.05)) < 1e-6
    assert abs(idx.boost_of("cergy", docs[0]) - (1.0 + 0.05)) < 1e-6
    assert abs(idx.boost_of("voltaire", docs[1]) - (2.0 + 0.02)) < 1e-6


def test_callable_boost_sees_none_not_nan_and_rejects_nonfinite(spark):
    """r5 advisor finding: pandas hands the callable NaN for null
    numeric fields (truthy, poisons arithmetic silently). The
    materializer must (a) convert nulls to None like the reference's
    plain doc dict, and (b) raise a clear error naming the field when
    the callable returns a non-finite boost."""
    from addok_spark.index.build import materialize_callable_boosts

    rows = [("c", 0, "user", "hello", None), ("c", 1, "user", "world", 0.5)]
    schema = ("conv_id string, turn_idx int, role string, text string,"
              " importance double")
    df = spark.createDataFrame(rows, schema)

    # (a) None arrives as None → the guard branch works
    cfg = EngineConfig(
        fields=(
            FieldSpec(
                "text", 1.0,
                boost_fn=lambda d: (d["importance"] or 0.0) * 10 + 1,
            ),
        ),
    )
    out, cfg2 = materialize_callable_boosts(df, cfg)
    col = cfg2.fields[0].boost_col
    got = {r["turn_idx"]: r[col] for r in out.collect()}
    assert got == {0: 1.0, 1: 6.0}

    # (b) an unguarded multiply on a null field → loud error naming
    # the field, not NaN-poisoned posting weights
    cfg_bad = EngineConfig(
        fields=(
            FieldSpec("text", 1.0, boost_fn=lambda d: d["importance"] * 10),
        ),
    )
    out_bad, _ = materialize_callable_boosts(df, cfg_bad)
    with pytest.raises(Exception, match="text"):
        out_bad.collect()
