"""Positional phrase matching (consecutive-token queries over the
packed position streams)."""

import pytest

from addok_spark.config import EngineConfig
from addok_spark.data.transcripts import transcripts_pdf
from addok_spark.index.build import build_index
from addok_spark.query.engine import SearchEngine
from addok_spark.query.phrase import phrase_match
from addok_spark.functions.text import analyze_str


@pytest.fixture(scope="module")
def engine(spark, tmp_index_root):
    cfg = EngineConfig(
        build_partitions=4, doc_bucket_bits=4, posting_block_size=8,
        common_threshold=400,
    )
    rows = [
        ("c1", 0, "user", "the quick brown fox jumps", None, 0.5),
        ("c1", 1, "user", "quick brown shoes and a brown fox", None, 0.5),
        ("c2", 0, "user", "fox brown quick reversed words", None, 0.2),
        ("c2", 1, "user", "quick brown fox quick brown fox", None, 0.2),
    ]
    sdf = spark.createDataFrame(
        rows, "conv_id string, turn_idx int, role string, text string,"
        " tool string, importance double"
    )
    paths = build_index(spark, sdf, cfg, f"{tmp_index_root}/phrase_idx")
    return SearchEngine(spark, paths, cfg)


def test_phrase_exact_order(engine):
    res = phrase_match(engine, "quick brown fox").collect()
    got = {(r["conv_id"], r["turn_idx"]): r["n_occurrences"] for r in res}
    assert got == {("c1", 0): 1, ("c2", 1): 2}  # order matters; c2/0 excluded


def test_phrase_two_tokens(engine):
    res = phrase_match(engine, "brown fox").collect()
    got = {(r["conv_id"], r["turn_idx"]): r["n_occurrences"] for r in res}
    assert got == {("c1", 0): 1, ("c1", 1): 1, ("c2", 1): 2}


def test_phrase_not_found(engine):
    assert phrase_match(engine, "brown quick fox").count() == 0
    assert phrase_match(engine, "zzz qqq").count() == 0


def test_phrase_matches_python_reference(spark, engine):
    """Cross-check against a naive python scan of the synthetic
    corpus (positions parity with the analyzer)."""
    corpus = transcripts_pdf(10, seed=42)
    cfg = engine.cfg
    phrase_toks = analyze_str(corpus["text"].iloc[5], cfg.synonyms)[:2]
    if len(phrase_toks) < 2:
        pytest.skip("sampled turn too short")
    phrase = " ".join(phrase_toks)

    from addok_spark.index.build import build_index
    import tempfile

    sdf = spark.createDataFrame(corpus)
    paths = build_index(
        spark, sdf, cfg, tempfile.mkdtemp(prefix="phrase_ref_"), resume=False
    )
    eng2 = SearchEngine(spark, paths, cfg)
    got = {
        (r["conv_id"], r["turn_idx"]): r["n_occurrences"]
        for r in phrase_match(eng2, phrase, k=100000).collect()
    }
    want = {}
    for row in corpus.itertuples(index=False):
        toks = analyze_str(row.text, cfg.synonyms) + (
            analyze_str(row.tool, cfg.synonyms) if isinstance(row.tool, str) else []
        )
        n = sum(
            1
            for i in range(len(toks) - 1)
            if toks[i : i + 2] == phrase_toks
        )
        if n:
            want[(row.conv_id, row.turn_idx)] = n
    assert got == want
