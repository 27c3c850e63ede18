"""Benchmark harness (driver-run per round; BENCH_r{N}.json).

Prints ONE JSON line:
  {"metric": ..., "value": <total sec>, "unit": "sec",
   "queries": {name: sec, ...}, "sf": ...,
   "index_build": {...two-parallelism scaling evidence...},
   "query_latency": {...BM25 batch latency over the built index...}}

Scaling evidence (north_rule ≥0.8 from N→4N executors): the same
index build runs at local[SCALE_N] and local[4·SCALE_N] on identical
input; efficiency = throughput_4N / (4 · throughput_N). The corpus is
generated deterministically per conversation (partition-invariant),
so both runs index byte-identical data.

Env knobs:
  SPARK_GRAFT_SF_DIR   (default /root/testdata/sf0.1)
  SPARK_GRAFT_CPUS     (default 32)
  BENCH_CONVS          (default 3000 conversations ≈ 120k turns)
  BENCH_SCALE_N        (default 8 → compares local[8] vs local[32])
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
BENCH_CONVS = int(os.environ.get("BENCH_CONVS", "3000"))
SCALE_N = int(os.environ.get("BENCH_SCALE_N", "8"))

HEADLINE = [
    "bm25_topk",
    "token_dictionary",
    "postings_topk",
    "conjunctive_intersect",
    "dedup_exact",
    "dedup_jaccard",
    "minhash_signatures",
    "simhash",
    "lang_id",
    "quality_score",
    "cosine_topk",
    "lsh_buckets",
    "events_hourly",
    "events_sessionize",
]


def _session(cores: int):
    from addok_spark.session import build_session

    return build_session(
        cores=cores,
        shuffle_partitions=max(cores, 8),
        driver_memory="48g",
        app_name=f"addok_spark_bench_{cores}",
    )


def _bench_queries(spark) -> dict[str, float]:
    from addok_spark.entry_queries import QUERIES

    out = {}
    for name in HEADLINE:
        fn = QUERIES[name]
        t0 = time.time()
        fn(spark, SF_DIR).count()  # force full execution
        out[name] = round(time.time() - t0, 3)
    return out


def _build_once(spark, n_convs: int, out_dir: str) -> dict:
    from addok_spark.config import EngineConfig
    from addok_spark.data.transcripts import transcripts_df
    from addok_spark.index.build import build_index

    cores = spark.sparkContext.defaultParallelism
    cfg = EngineConfig(
        build_partitions=max(cores * 2, 8),
        common_threshold=10_000,
    )
    corpus = transcripts_df(spark, n_convs, seed=42, partitions=max(cores * 2, 8))
    t0 = time.time()
    paths = build_index(spark, corpus, cfg, out_dir, resume=False)
    build_s = time.time() - t0
    meta = json.loads(paths.meta.read_text())
    turns = meta["n_docs"]
    return {
        "seconds": round(build_s, 2),
        "turns": turns,
        "turns_per_sec": round(turns / build_s, 1),
    }


def _query_latency(spark, index_dir: str) -> dict:
    """Per-query BM25 top-k latency over the built index (p50/p95)."""
    from addok_spark.config import EngineConfig
    from addok_spark.data.transcripts import transcripts_pdf, reference_queries
    from addok_spark.query.engine import Query, SearchEngine

    cfg = EngineConfig(common_threshold=10_000)
    engine = SearchEngine(spark, index_dir, cfg)
    corpus = transcripts_pdf(200, seed=42)
    qdf = reference_queries(corpus, n=12, seed=7)
    lats = []
    for r in qdf.itertuples(index=False):
        t0 = time.time()
        engine.search(
            [Query(qid=r.qid, q=r.q, k=10, autocomplete=(r.kind == "prefix"))]
        ).collect()
        lats.append(time.time() - t0)
    lats.sort()
    n = len(lats)
    return {
        "n_queries": n,
        "p50_s": round(lats[n // 2], 3),
        "p95_s": round(lats[min(n - 1, int(n * 0.95))], 3),
        "mean_s": round(sum(lats) / n, 3),
    }


def main() -> None:
    t_total = time.time()
    work = Path(tempfile.mkdtemp(prefix="addok_bench_"))
    result: dict = {"sf": SF_DIR.rstrip("/").split("sf")[-1]}

    # 1) headline operator suite at the driver-chosen parallelism
    spark = _session(CPUS)
    queries = _bench_queries(spark)

    # 2) index build + query latency at full parallelism
    full = _build_once(spark, BENCH_CONVS, str(work / f"idx_{CPUS}"))
    latency = _query_latency(spark, str(work / f"idx_{CPUS}"))
    spark.stop()

    # 3) scaling: same input, local[N] vs local[4N]
    scaling = {}
    lo_cores, hi_cores = SCALE_N, SCALE_N * 4
    for cores in (lo_cores, hi_cores):
        s = _session(cores)
        scaling[f"local[{cores}]"] = _build_once(
            s, BENCH_CONVS, str(work / f"idx_scale_{cores}")
        )
        s.stop()
    thr_lo = scaling[f"local[{lo_cores}]"]["turns_per_sec"]
    thr_hi = scaling[f"local[{hi_cores}]"]["turns_per_sec"]
    efficiency = round(thr_hi / (4.0 * thr_lo), 3)

    shutil.rmtree(work, ignore_errors=True)

    result.update(
        {
            "metric": "addok_spark headline ops + index-build scaling",
            "value": round(time.time() - t_total, 2),
            "unit": "sec",
            "queries": queries,
            "index_build": {
                f"local[{CPUS}]": full,
                "scaling": scaling,
                "scaling_efficiency_n_to_4n": efficiency,
                "n_conversations": BENCH_CONVS,
            },
            "query_latency": latency,
        }
    )
    print(json.dumps(result))


if __name__ == "__main__":
    main()
