"""Deterministic sampling + sequence packing (pipelines/sampling.py):
reproducibility and partition invariance are the whole point — these
must hold on any cluster layout."""

import pandas as pd
import pytest

from addok_spark.pipelines.sampling import (
    chunk_documents,
    pack_sequences,
    rate_threshold,
    stratified_sample,
)


@pytest.fixture(scope="module")
def docs(spark):
    rows = [
        (i, " ".join(f"w{i}x{j}" for j in range(5 + (i * 7) % 90)),
         ["en", "fr", "de", "xx"][i % 4])
        for i in range(400)
    ]
    return spark.createDataFrame(rows, "doc_id long, text string, lang string")


def test_rate_threshold_edges():
    assert rate_threshold(0.0) == ""
    assert rate_threshold(1.0) == "g"      # above every hex digit
    assert rate_threshold(1.5) == "g"
    assert rate_threshold(0.25) == "40000000"
    assert rate_threshold(0.5) == "80000000"


def test_stratified_sample_deterministic_and_partition_invariant(spark, docs):
    rates = {"en": 0.5, "fr": 0.25}
    a = stratified_sample(docs, "doc_id", "lang", rates, 0.1).toPandas()
    b = stratified_sample(
        docs.repartition(7), "doc_id", "lang", rates, 0.1
    ).toPandas()
    key = ["doc_id", "lang", "sample_key"]
    pd.testing.assert_frame_equal(
        a[key].sort_values(key).reset_index(drop=True),
        b[key].sort_values(key).reset_index(drop=True),
    )
    # rough rate sanity per stratum (hash-uniform keys)
    n_en = len(a[a.lang == "en"])
    assert 25 <= n_en <= 75  # 100 en docs at rate 0.5


def test_stratified_sample_superset_monotonicity(docs):
    lo = stratified_sample(docs, "doc_id", "lang", {"en": 0.2}, 0.0).toPandas()
    hi = stratified_sample(docs, "doc_id", "lang", {"en": 0.6}, 0.0).toPandas()
    assert set(lo["doc_id"]) <= set(hi["doc_id"])


def test_pack_sequences_matches_reference_fold(spark, docs):
    budget = 64
    got = pack_sequences(docs, "doc_id", "text", budget).toPandas()
    # python reference: same hash order, same running fold per bucket
    import hashlib

    pdf = docs.toPandas()
    pdf["sort_key"] = pdf["doc_id"].map(
        lambda d: hashlib.md5(str(d).encode()).hexdigest()
    )
    pdf["bucket"] = pdf["sort_key"].str[0]
    pdf["n_tokens"] = pdf["text"].map(lambda t: len(t.split()))
    recs = {}
    for bucket, grp in pdf.groupby("bucket"):
        off = 0
        for r in grp.sort_values(["sort_key", "doc_id"]).itertuples():
            recs[r.doc_id] = (bucket, off, f"{bucket}-{off // budget}")
            off += r.n_tokens
    for r in got.itertuples():
        b, off, pid = recs[r.doc_id]
        assert (r.bucket, r.start_offset, r.pack_id) == (b, off, pid), r
    # partition invariance
    again = pack_sequences(
        docs.repartition(5), "doc_id", "text", budget
    ).toPandas()
    key = ["doc_id", "bucket", "n_tokens", "start_offset", "pack_id"]
    pd.testing.assert_frame_equal(
        got[key].sort_values("doc_id").reset_index(drop=True),
        again[key].sort_values("doc_id").reset_index(drop=True),
    )


def test_pack_sequences_two_pass_layout_invariant(spark, docs):
    """The two-pass offset computation (per-grp sums → driver base
    offsets → streaming local cumsum) must produce identical packs
    under ANY task layout: shuffle width, grp granularity, and Arrow
    batch splits are execution details, not semantics."""
    budget = 64
    key = ["doc_id", "bucket", "n_tokens", "start_offset", "pack_id"]
    base = (
        pack_sequences(docs, "doc_id", "text", budget)
        .toPandas()[key].sort_values("doc_id").reset_index(drop=True)
    )
    for parts, depth in ((2, 1), (17, 2), (64, 4)):
        alt = (
            pack_sequences(
                docs, "doc_id", "text", budget,
                partitions=parts, depth=depth,
            )
            .toPandas()[key].sort_values("doc_id").reset_index(drop=True)
        )
        pd.testing.assert_frame_equal(base, alt)


def test_chunk_documents_windows_cover_and_overlap(spark):
    # 100 tokens, size 10, stride 7: starts 0,7,...,98 (15 chunks)
    text = " ".join(f"t{i}" for i in range(100))
    df = spark.createDataFrame([(1, text), (2, ""), (3, "solo")],
                               "doc_id long, text string")
    out = chunk_documents(df, "doc_id", "text", chunk_size=10, stride=7)
    pdf = out.toPandas().sort_values(["id", "chunk_idx"]).reset_index(drop=True)
    one = pdf[pdf.id == 1]
    assert list(one.start_tok) == list(range(0, 100, 7))
    assert list(one.chunk_idx) == list(range(15))
    # every token appears in at least one chunk; overlap = 3 tokens
    covered = set()
    for _, r in one.iterrows():
        toks = r.chunk_text.split(" ")
        assert len(toks) == r.n_chunk_tokens
        assert toks[0] == f"t{r.start_tok}"
        covered.update(toks)
    assert covered == {f"t{i}" for i in range(100)}
    # empty doc → no chunks; single-token doc → one chunk
    assert len(pdf[pdf.id == 2]) == 0
    three = pdf[pdf.id == 3]
    assert len(three) == 1 and three.iloc[0].chunk_text == "solo"


def test_chunk_documents_partition_invariant(spark, docs):
    a = chunk_documents(docs, "doc_id", "text").toPandas()
    b = chunk_documents(docs.repartition(13), "doc_id", "text").toPandas()
    key = ["id", "chunk_idx"]
    pd.testing.assert_frame_equal(
        a.sort_values(key).reset_index(drop=True),
        b.sort_values(key).reset_index(drop=True),
    )
