"""Block-max WAND bucket skipping + cream early-termination.

WAND (SURVEY §4.1 top-k pushdown): per-bucket upper bounds from block
metadata let the engine skip decoding buckets that cannot contain a
top-n doc. The test corpus is deliberately skewed: the first docs are
two-token turns (boost 0.5/token) and the rest are 40-token turns
(boost 0.025/token), so the leading buckets' ub dominates and the
tail buckets must be skipped with ranks unchanged.

Cream (reference core.py:400-419): a dry bucket already holding a
string match ≥ MATCH_THRESHOLD stops the relaxation rounds.
"""

from pathlib import Path

import pandas as pd
import pytest

from addok_spark.config import EngineConfig
from addok_spark.index.build import build_index
from addok_spark.oracle.bm25_oracle import OracleIndex, oracle_search
from addok_spark.query.engine import Query, SearchEngine


def _skewed_corpus() -> pd.DataFrame:
    rows = []
    fillers = ["x1", "x2", "x3", "x4", "x5", "x6", "x7", "x8"]
    for i in range(96):
        if i == 0:
            text = "gamma delta eps zeta eta theta"  # unique doc (cream target)
        elif i < 8:
            text = "alpha beta"          # 2 tokens → boost 0.5 each
        else:
            text = "alpha beta " + " ".join(
                fillers[(i + j) % len(fillers)] for j in range(38)
            )                             # 40 tokens → boost 0.025
        rows.append(
            {
                "conv_id": f"conv-{i:08d}",
                "turn_idx": 0,
                "role": ["user", "assistant", "tool"][i % 3],
                "text": text,
                "tool": None,
                "ts": pd.Timestamp("2026-01-01") + pd.Timedelta(seconds=i),
                "importance": 0.0,
            }
        )
    return pd.DataFrame(rows)


@pytest.fixture(scope="module")
def wand_setup(spark, tmp_index_root):
    pdf = _skewed_corpus()
    cfg = EngineConfig(
        build_partitions=4,
        doc_bucket_bits=3,       # 8 docs per bucket → 12 buckets
        posting_block_size=8,
        wand_min_df=4,           # 'alpha'/'beta' df≈95 → wand engages
        wand_min_postings=10,    # tiny corpus: bypass the volume gate
        wand_bucket_batch=2,
        build_pairs=False,
    )
    sdf = spark.createDataFrame(pdf)
    out = str(Path(tmp_index_root) / "wand_test")
    paths = build_index(spark, sdf, cfg, out)
    return pdf, cfg, paths


def test_wand_skips_buckets_with_identical_ranks(spark, wand_setup):
    pdf, cfg, paths = wand_setup
    engine = SearchEngine(spark, paths, cfg)
    plan = pd.DataFrame(
        [("w1", 0, "alpha", 2, False), ("w1", 1, "beta", 2, False)],
        columns=["qid", "gid", "token", "n_required", "is_scan"],
    )
    wand = engine._run_round(plan, topn=5, wand_qids=["w1"])
    assert engine.last_round_metrics["buckets_skipped"] > 0, (
        "skewed corpus must let WAND skip tail buckets"
    )
    plain = engine._run_round(plan, topn=5, wand_qids=[])
    assert engine.last_round_metrics["buckets_skipped"] == 0
    pd.testing.assert_frame_equal(
        wand[["qid", "doc_index", "rn"]].reset_index(drop=True),
        plain[["qid", "doc_index", "rn"]].reset_index(drop=True),
    )
    # the winners are the short (high-boost) docs
    assert set(wand["doc_index"]) <= set(range(1, 8))


def test_wand_end_to_end_rank_identity(spark, wand_setup):
    import dataclasses

    pdf, cfg_full, paths = wand_setup
    # skipping engages once matches exceed the bucket limit
    # max(k, bucket_max) (the top-n floor must be a real lower
    # bound); 95 docs match, so shrink the bucket AND keep k within
    # it — k > bucket_max legitimately raises the collection limit
    # (reference core.py:339) and with it the skip floor
    cfg = dataclasses.replace(cfg_full, bucket_max=5, bucket_min=2)
    engine = SearchEngine(spark, paths, cfg)
    oracle = OracleIndex(pdf, cfg)
    queries = [Query(qid="we1", q="alpha beta", k=5)]
    got = engine.search(queries).toPandas()
    want = oracle_search(oracle, queries, cfg)
    assert list(got["doc_index"]) == list(want["doc_index"])
    assert engine.last_metrics["buckets_skipped"] > 0


def test_cream_early_termination(spark, wand_setup):
    """An exact full-text match (str_distance 1.0) in a dry bucket
    stops the relaxation rounds; ranks stay oracle-identical."""
    pdf, cfg, paths = wand_setup
    engine = SearchEngine(spark, paths, cfg)
    oracle = OracleIndex(pdf, cfg)
    # unique-ish 2-token doc text as the query, made dry by a
    # third token that only co-occurs in few docs: use the exact
    # short doc text (matches 8 docs < bucket_min=10 → dry) —
    # cream must stop rounds 3/4
    queries = [Query(qid="c1", q="alpha beta x1 x2 x3", k=10)]
    got = engine.search(queries).toPandas()
    want = oracle_search(oracle, queries, cfg)
    assert list(got["doc_index"]) == list(want["doc_index"])


def test_cream_reduces_rounds(spark, wand_setup):
    pdf, cfg, paths = wand_setup
    oracle = OracleIndex(pdf, cfg)
    engine = SearchEngine(spark, paths, cfg)
    # the query matches exactly ONE doc (dry: 1 < bucket_min=10)
    # whose text IS the query → cream stops before round 3. Six
    # meaningful tokens so the remove-1 margin condition
    # (len(meaningful)-1 > ceil(2/3·len(tokens)), collectors.py:123)
    # holds and the relaxation round WOULD run without cream
    q = [Query(qid="cr1", q="gamma delta eps zeta eta theta", k=10)]
    got = engine.search(q).toPandas()
    with_cream = dict(engine.last_metrics)
    assert with_cream["cream_stops"] >= 1
    assert with_cream["rounds"] == 1

    import dataclasses

    cfg_nc = dataclasses.replace(cfg, match_threshold=2.0)  # unreachable
    engine2 = SearchEngine(spark, paths, cfg_nc)
    got_nc = engine2.search(q).toPandas()
    assert engine2.last_metrics["rounds"] == 2  # relaxation round paid

    # ranks identical with and without cream, and oracle-identical
    want = oracle_search(oracle, q, cfg)
    assert list(got["doc_index"]) == list(want["doc_index"])
    want_nc = oracle_search(oracle, q, cfg_nc)
    assert list(got_nc["doc_index"]) == list(want_nc["doc_index"])


def test_wand_floor_tie_includes_tied_buckets(spark, tmp_index_root):
    """A remaining bucket whose upper bound EQUALS the phase-1 top-n
    floor must still be decoded: it can hold a doc that ties the floor
    prescore and wins the doc_index tiebreak. Corpus: doc 8 is the
    lone high-boost doc (bucket 1, ub 1.0); every other doc scores
    exactly float32(0.5), so bucket 0's ub ties the floor and its
    docs 0..3 must displace docs 9..12 in the final ranks."""
    rows = []
    for i in range(16):
        text = "alpha" if i == 8 else f"alpha w{i:02d}"
        rows.append(
            {
                "conv_id": f"conv-{i:02d}",
                "turn_idx": 0,
                "role": "user",
                "text": text,
                "tool": None,
                "ts": pd.Timestamp("2026-01-01") + pd.Timedelta(seconds=i),
                "importance": 0.0,
            }
        )
    pdf = pd.DataFrame(rows)
    cfg = EngineConfig(
        build_partitions=2,
        doc_bucket_bits=3,   # 8 docs per bucket → 2 buckets
        posting_block_size=8,
        wand_bucket_batch=1,  # phase 1 decodes ONLY bucket 1 (ub 1.0)
        build_pairs=False,
        build_prefixes=False,
    )
    sdf = spark.createDataFrame(pdf)
    out = str(Path(tmp_index_root) / "wand_tie_test")
    paths = build_index(spark, sdf, cfg, out)
    engine = SearchEngine(spark, paths, cfg)
    plan = pd.DataFrame(
        [("t1", 0, "alpha", 1, False)],
        columns=["qid", "gid", "token", "n_required", "is_scan"],
    )
    wand = engine._run_round(plan, topn=5, wand_qids=["t1"])
    plain = engine._run_round(plan, topn=5, wand_qids=[])
    assert list(plain["doc_index"]) == [8, 0, 1, 2, 3]
    pd.testing.assert_frame_equal(
        wand[["qid", "doc_index", "rn"]].reset_index(drop=True),
        plain[["qid", "doc_index", "rn"]].reset_index(drop=True),
        check_dtype=False,  # merged path re-ranks in pandas (int64)
    )


def test_cream_metric_not_fooled_by_containment(spark, tmp_index_root):
    """Cream uses the reference's str_distance metric (bigram
    compare_ngrams for non-autocomplete queries), NOT the compare_str
    tie-break key: a long turn that merely CONTAINS the query scores
    ~1.0 query-trigram recall under compare_str but far below
    MATCH_THRESHOLD under compare_ngrams, so relaxation rounds the
    reference would still run must not be skipped."""
    rows = []
    filler = " ".join(f"pad{j:02d}" for j in range(50))
    for i in range(24):
        if i == 0:
            text = (
                "zeta theta iota kappa lambda mu " + filler
            )  # CONTAINS the query verbatim
        else:
            text = f"misc{i:02d} " + " ".join(
                f"pad{(i + j) % 50:02d}" for j in range(10)
            )
        rows.append(
            {
                "conv_id": f"conv-{i:02d}",
                "turn_idx": 0,
                "role": "user",
                "text": text,
                "tool": None,
                "ts": pd.Timestamp("2026-01-01") + pd.Timedelta(seconds=i),
                "importance": 0.0,
            }
        )
    pdf = pd.DataFrame(rows)
    cfg = EngineConfig(
        build_partitions=2,
        doc_bucket_bits=3,
        posting_block_size=8,
        build_pairs=False,
        build_prefixes=False,
    )
    from addok_spark.functions.text import compare_ngrams, compare_str, fold_str

    # the trap: compare_str says "match", compare_ngrams says "no"
    label = fold_str(pdf["text"].iloc[0])
    QUERY = "zeta theta iota kappa lambda mu"  # 6 meaningful tokens so
    # the remove-1 margin condition holds (collectors.py:123) and the
    # relaxation round is applicable at all
    assert compare_str(QUERY, label) >= cfg.match_threshold
    assert compare_ngrams(label, QUERY) < cfg.match_threshold

    sdf = spark.createDataFrame(pdf)
    out = str(Path(tmp_index_root) / "cream_containment_test")
    paths = build_index(spark, sdf, cfg, out)
    engine = SearchEngine(spark, paths, cfg)
    q = [Query(qid="cc1", q=QUERY, k=10)]
    got = engine.search(q).toPandas()
    assert engine.last_metrics["cream_stops"] == 0
    assert engine.last_metrics["rounds"] >= 2  # relaxation round ran
    oracle = OracleIndex(pdf, cfg)
    want = oracle_search(oracle, q, cfg)
    assert list(got["doc_index"]) == list(want["doc_index"])
