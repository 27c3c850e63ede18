"""Benchmark harness (driver-run per round; BENCH_r{N}.json).

Prints ONE COMPACT JSON line (< 2 KB — the driver's tail capture is
bounded, and round 3's full payload overflowed it) as the very last
stdout line:
  {"metric": ..., "value": <total sec>, "unit": "sec",
   "queries": {name: sec, ...}, "sf": ...,
   "build_turns_per_sec": ..., "scaling_efficiency_n_to_4n": ...,
   "wand": ..., "phrase_ab": ..., "query_latency": ...,
   "serving_warm_p50_ms": ..., "details": "BENCH_DETAILS.json"}
The full result (per-stage build metrics, all scaling runs, serving
detail) goes to BENCH_DETAILS.json at the repo root.

Scaling evidence (north_rule ≥0.8 from N→4N executors): the corpus is
materialized to parquet ONCE (the reference's import also reads a
pre-existing file), then the identical core index build (postings +
dictionary; prefix/pair side-tables deferred exactly like the
reference defers edge-ngrams during mass import, batch.py:44) runs at
local[N] and local[4N]. Efficiency = thr_4N / (4 · thr_N).

Methodology notes (this sandbox):
- The VM's CPU supply is host-oversubscribed and TIME-VARYING
  (identical fixed-work CPU burns drift 2-3× between minutes, and
  32-proc parallel efficiency of pure-CPU work measures ~0.6-0.7).
  The bench therefore (a) interleaves N / 4N runs ×3 and reports the
  per-pair efficiencies (back-to-back runs see the same host moment,
  so supply drift cancels within a pair), and (b) embeds a fixed-work
  multiprocessing calibration (`hardware`) so the achievable ceiling
  is visible next to the measured Spark efficiency.
- Default comparison is local[2] vs local[8], where the calibrated
  hardware ceiling is ~0.9; local[8]→local[32] is hardware-capped
  around ~0.7 regardless of the job.

Env knobs:
  SPARK_GRAFT_SF_DIR   (default /root/testdata/sf0.1)
  SPARK_GRAFT_CPUS     (default 32)
  BENCH_CONVS          (default 40000 conversations ≈ 1.6M turns)
  BENCH_SCALE_N        (default 2 → compares local[2] vs local[8])
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
BENCH_CONVS = int(os.environ.get("BENCH_CONVS", "40000"))
SCALE_N = int(os.environ.get("BENCH_SCALE_N", "2"))


def _burn(n: int) -> int:
    x = 0
    for i in range(n):
        x += i * i
    return x


def _hw_calibration() -> dict:
    """Fixed-work multiprocessing burn: measures what parallel
    efficiency THIS host can deliver right now (ceiling context for
    the Spark scaling number)."""
    import multiprocessing

    burn = _burn
    n = 20_000_000
    t0 = time.time()
    burn(n)
    base = time.time() - t0
    out = {"single_s": round(base, 2)}
    for procs in (SCALE_N, SCALE_N * 4):
        t0 = time.time()
        with multiprocessing.get_context("fork").Pool(procs) as p:
            p.map(burn, [n] * procs)
        out[f"eff_{procs}procs"] = round(base / (time.time() - t0), 2)
    return out

HEADLINE = [
    "bm25_topk",
    "phrase_count",
    "minhash_lsh_pairs",
    "lsh_topk_multiprobe",
    "stateful_sessions",
    "token_kinds",
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
    "dedup_clusters",
    "collocations_pmi",
    "repetition_score",
    "contamination",
    "retrieval_topk",
    "pii_redact",
    "chunk_documents",
    "events_context",
    "unigram_logprob",
    "ivf_topk",
    "kmeans_clusters",
    "semdedup_pairs",
    "highlight_snippets",
    "retrieval_lm_topk",
    "pq_adc_topk",
    "pq_rerank_topk",
    "duplicate_spans",
    "remove_duplicate_spans",
    "quality_buckets",
    "dsir_weights",
    "semantic_topk",
    "hybrid_rrf_topk",
    "retrieval_prf_topk",
    "bigram_logprob",
]


def _session(cores: int, shuffle: int | None = None):
    from addok_spark.session import build_session

    return build_session(
        cores=cores,
        shuffle_partitions=shuffle or max(cores * 3, 8),
        driver_memory="48g",
        app_name=f"addok_spark_bench_{cores}",
    )


def _stop(spark) -> None:
    """Stop a session with a QUIET shutdown: straggler accumulator
    updates arriving after the Python accumulator server closes make
    the JVM log a benign 'Failed to update accumulator' ERROR stack
    (~1.7 KB) — enough to push the final JSON line out of the
    driver's bounded tail capture. FATAL the log level first so the
    tail stays clean machine-parsable JSON."""
    try:
        spark.sparkContext.setLogLevel("FATAL")
    except Exception:
        pass
    spark.stop()


def _bench_queries(spark) -> dict[str, float]:
    from addok_spark.entry_queries import QUERIES

    # warm-up on the smallest sf: JIT/codegen + python workers, so the
    # first timed query doesn't absorb session warm-up
    for name in ("token_dictionary", "cosine_topk"):
        QUERIES[name](spark, "/root/testdata/sf0.001").count()
    out = {}
    for name in HEADLINE:
        fn = QUERIES[name]
        t0 = time.time()
        fn(spark, SF_DIR).count()  # force full execution
        out[name] = round(time.time() - t0, 3)
    return out


def _materialize_corpus(spark, n_convs: int, path: str) -> int:
    from addok_spark.data.transcripts import transcripts_df

    df = transcripts_df(spark, n_convs, seed=42, partitions=64)
    df.write.mode("overwrite").parquet(path)
    return spark.read.parquet(path).count()


def _build_once(spark, corpus_path: str, out_dir: str, side_tables: bool,
                partitions: int | None = None) -> dict:
    from addok_spark.config import EngineConfig
    from addok_spark.index.build import build_index

    cores = spark.sparkContext.defaultParallelism
    cfg = EngineConfig(
        build_partitions=partitions or max(cores * 3, 8),
        common_threshold=10_000,
        build_prefixes=side_tables,
        build_pairs=side_tables,
    )
    corpus = spark.read.parquet(corpus_path)
    t0 = time.time()
    paths = build_index(spark, corpus, cfg, out_dir, resume=False)
    build_s = time.time() - t0
    meta = json.loads(paths.meta.read_text())
    turns = meta["n_docs"]
    return {
        "seconds": round(build_s, 2),
        "turns": turns,
        "turns_per_sec": round(turns / build_s, 1),
        "stages": meta.get("build_metrics", {}),
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
    # batch mode: the idiomatic Spark shape — the whole query set as
    # ONE search() call (shared scans/joins across queries)
    qs = [
        Query(qid=r.qid, q=r.q, k=10, autocomplete=(r.kind == "prefix"))
        for r in qdf.itertuples(index=False)
    ]
    t0 = time.time()
    engine.search(qs).collect()
    batch_s = time.time() - t0
    return {
        "n_queries": n,
        "p50_s": round(lats[n // 2], 3),
        "p95_s": round(lats[min(n - 1, int(n * 0.95))], 3),
        "mean_s": round(sum(lats) / n, 3),
        "batch_total_s": round(batch_s, 3),
        "batch_per_query_s": round(batch_s / n, 3),
    }


def _serving_latency(index_dir: str, label: str) -> dict:
    """Warm serving-tier latency (serving/local.py): same reference
    query set answered straight from the parquet index without a
    Spark job — the architecture the reference's Redis RAM serving
    maps to at scale (Spark builds/compacts, serving nodes read the
    immutable artifacts with pruned columnar fetches)."""
    from addok_spark.config import EngineConfig
    from addok_spark.data.transcripts import transcripts_pdf, reference_queries
    from addok_spark.query.engine import Query
    from addok_spark.serving.local import LocalSearchEngine

    cfg = EngineConfig(common_threshold=10_000)
    t0 = time.time()
    srv = LocalSearchEngine(index_dir, cfg)
    warm_s = time.time() - t0
    corpus = transcripts_pdf(200, seed=42)
    qdf = reference_queries(corpus, n=12, seed=7)
    qs = [
        Query(qid=r.qid, q=r.q, k=10, autocomplete=(r.kind == "prefix"))
        for r in qdf.itertuples(index=False)
    ]
    cold = []
    for q in qs:
        t0 = time.time()
        srv.search([q])
        cold.append(time.time() - t0)
    warm = []
    for q in qs:
        trials = []
        for _ in range(3):
            t0 = time.time()
            srv.search([q])
            trials.append(time.time() - t0)
        warm.append(min(trials))
    t0 = time.time()
    reps = 3
    for _ in range(reps):
        for q in qs:
            srv.search([q])
    qps = reps * len(qs) / (time.time() - t0)
    # warm parallel throughput: the spec flow is Python-side, so a
    # request pool scales with PROCESSES, not threads (GIL) —
    # fork AFTER warm-up so workers inherit the hot caches
    # copy-on-write, exactly how a prefork serving node works
    import multiprocessing

    global _SERVE_WORKER
    _SERVE_WORKER = srv  # forked children inherit the warm engine
    preps = 16
    nproc = 8
    chunks = [qs[i::nproc] * preps for i in range(nproc)]
    with multiprocessing.get_context("fork").Pool(nproc) as pool:
        t0 = time.time()
        pool.map(_serve_worker_run, chunks)
        qps8 = sum(len(c) for c in chunks) / (time.time() - t0)
    _SERVE_WORKER = None
    cold.sort()
    warm.sort()
    n = len(qs)
    out = {
        "index": label,
        "warmup_s": round(warm_s, 3),
        "n_queries": n,
        "cold_p50_ms": round(cold[n // 2] * 1000, 2),
        "cold_p95_ms": round(cold[min(n - 1, int(n * 0.95))] * 1000, 2),
        "warm_p50_ms": round(warm[n // 2] * 1000, 2),
        "warm_p95_ms": round(warm[min(n - 1, int(n * 0.95))] * 1000, 2),
        "warm_qps": round(qps, 1),
        "warm_qps_8procs": round(qps8, 1),
    }
    # preload evidence (serve --preload): a fresh engine that warms
    # the Zipf-head token blocks before traffic answers first-touch
    # queries near warm latency instead of cold
    t0 = time.time()
    pre = LocalSearchEngine(index_dir, cfg)
    n_pre = pre.preload(1000)
    preload_s = time.time() - t0
    pcold = []
    for q in qs:
        t0 = time.time()
        pre.search([q])
        pcold.append(time.time() - t0)
    pcold.sort()
    out["preload_s"] = round(preload_s, 3)
    out["preload_tokens"] = n_pre
    out["preloaded_first_p50_ms"] = round(pcold[n // 2] * 1000, 2)

    # serving-tier phrase + common-token-scan paths (the interactive
    # product's hardest cases: positional decode / block-max scan)
    from addok_spark.functions.text import analyze_str

    ptoks = analyze_str(str(corpus.iloc[0]["text"]), {})[:3]
    specials = {"phrase": Query(qid="ph", q=" ".join(ptoks), k=10, phrase=True)}
    dfs = getattr(srv.index, "df", {})
    commons = [t for t in sorted(dfs, key=lambda t: -dfs[t]) if "|" not in t][:2]
    if commons:
        specials["common_scan"] = Query(qid="cs", q=" ".join(commons), k=10)
    for name, q in specials.items():
        trials = []
        for _ in range(3):
            t0 = time.time()
            srv.search([q])
            trials.append(time.time() - t0)
        # first = uncached path cost (restricted block decode for
        # phrases); warm = repeat (whole-phrase LRU for phrases)
        out[f"{name}_first_ms"] = round(trials[0] * 1000, 2)
        out[f"{name}_warm_ms"] = round(min(trials[1:]) * 1000, 2)
    return out


def _phrase_ab(spark, index_dir: str) -> dict:
    """Stopword-bearing phrase at the big-corpus scale, run twice on
    the same index: full-decode (phrase_rare_prune=False — every
    phrase token's positional postings decoded and shuffled) vs the
    rarest-token doc conjunction. Evidence = identical ranks + the
    wall-clock of the bounded path."""
    from addok_spark.config import EngineConfig
    from addok_spark.data.transcripts import transcripts_pdf
    from addok_spark.functions.text import analyze_str
    from addok_spark.query.engine import Query, SearchEngine
    from addok_spark.serving.local import ParquetIndex

    base = dict(common_threshold=10_000)
    dfs = ParquetIndex(index_dir, EngineConfig(**base)).df
    corpus = transcripts_pdf(50, seed=42)
    # the most df-skewed 3-token window in the sample: guarantees the
    # phrase carries a Zipf-head token next to a rare one
    best = None
    for text in corpus["text"]:
        toks = analyze_str(str(text), {})
        for i in range(len(toks) - 2):
            win = toks[i:i + 3]
            d = [dfs.get(t, 0) for t in win]
            if min(d) > 0:
                spread = max(d) / max(min(d), 1)
                if best is None or spread > best[0]:
                    best = (spread, win, d)
    out = {"query": " ".join(best[1]), "token_dfs": best[2]}
    ranks = {}
    for mode, prune in (("full_decode", False), ("rare_pruned", True)):
        eng = SearchEngine(
            spark, index_dir, EngineConfig(phrase_rare_prune=prune, **base)
        )
        t0 = time.time()
        got = eng.search(
            [Query(qid="p", q=out["query"], k=10, phrase=True)]
        ).toPandas()
        out[f"{mode}_s"] = round(time.time() - t0, 3)
        ranks[mode] = list(got["doc_index"])
    out["rank_identical"] = ranks["full_decode"] == ranks["rare_pruned"]
    return out


_SERVE_WORKER = None


def _serve_worker_run(queries):
    for q in queries:
        _SERVE_WORKER.search([q])
    return len(queries)


def _wand_at_scale(corpus_path: str, work: Path, n_turns: int,
                   bits: int = 16) -> dict:
    """Open the WAND gate at the full scaling-corpus size and assert
    the skip path is rank-identical to the exact path.

    Block-max skipping needs bucket-level score heterogeneity; the
    uniform synthetic corpus has none (every 2^16-doc range holds the
    same boost distribution, so every bucket's upper bound beats the
    top-k floor and skipped stays 0 — correctly). The evidence corpus
    therefore adds a realistic RANGE-correlated importance skew
    (recent conversations more important — importance decays along
    the conv_id order), which concentrates the top-k in early buckets
    and lets later buckets' upper bounds fall below the floor."""
    from pyspark.sql import functions as F

    from addok_spark.config import EngineConfig
    from addok_spark.index.build import build_index
    from addok_spark.query.engine import Query, SearchEngine

    spark = _session(CPUS)
    try:
        corpus = spark.read.parquet(corpus_path)
        # conv_id is "conv-%08d" — decay importance along the conv
        # order (recency skew), fully distributed, no window
        skewed = corpus.withColumn(
            "importance",
            F.greatest(
                F.lit(0.0),
                F.lit(1.0)
                - F.substring("conv_id", 6, 8).cast("double")
                / F.lit(float(BENCH_CONVS)),
            )
            * F.col("importance"),
        )
        # importance-dominated boosts (importance_weight≫default):
        # the default addok weight (1/dl + 0.1·imp) gives every
        # 2^bits-doc bucket a near-identical max boost (each holds a
        # short doc), so block-max bounds cannot discriminate — a
        # corpus where importance dominates is the shape WAND serves
        bcfg = EngineConfig(
            build_partitions=max(CPUS * 3, 8),
            common_threshold=10_000,
            doc_bucket_bits=bits,
            importance_weight=5.0,
            build_prefixes=False,
            build_pairs=False,
        )
        idx = str(work / "idx_wand_skew")
        build_index(spark, skewed, bcfg, idx, resume=False)
        # pick the query from the index itself. WAND's regime: every
        # group df > wand_min_df but NOT every group beyond
        # intersect_limit (an all-commons query correctly routes to
        # manual_scan instead, ≙ the reference's only_commons path).
        # The synthetic templates put exactly one mid-df token per
        # turn (mid-df tokens never co-occur), so the evidence query
        # = the highest-df token INSIDE the band (anchors the
        # conjunction to ~its df matches) + the two highest-df tokens
        # overall (co-occur with everything)
        qcfg = EngineConfig()
        dic = spark.read.parquet(idx + "/dictionary").filter(
            ~F.col("token").contains("|")
        )
        band = (
            dic.filter(
                (F.col("df") > qcfg.wand_min_df)
                & (F.col("df") <= qcfg.intersect_limit)
            )
            .orderBy(F.desc("df"))
            .limit(1)
            .collect()
        )
        head = dic.orderBy(F.desc("df")).limit(2).collect()
        top = band + head
        q = " ".join(r["token"] for r in top)
        sum_df = int(sum(r["df"] for r in top))
        gate = min(500_000, int(sum_df * 0.8))
        base = dict(common_threshold=10_000)
        ranks = {}
        times = {}
        skipped = 0
        fired = 0
        for mode, cfg in (
            ("exact", EngineConfig(wand_enabled=False, **base)),
            (
                "wand",
                EngineConfig(
                    wand_enabled=True, wand_min_postings=gate, **base
                ),
            ),
        ):
            eng = SearchEngine(spark, idx, cfg)
            t0 = time.time()
            got = eng.search([Query(qid="w", q=q, k=50)]).toPandas()
            times[mode] = round(time.time() - t0, 3)
            ranks[mode] = list(got["doc_index"])
            if mode == "wand":
                m = getattr(eng, "last_round_metrics", {})
                skipped = int(m.get("buckets_skipped", 0))
                fired = int(m.get("wand_qids", 0))
        return {
            "n_turns": n_turns,
            "query": q,
            "sum_df": sum_df,
            "gate_min_postings": gate,
            "default_gate_min_postings": EngineConfig().wand_min_postings,
            "buckets_skipped": skipped,
            "wand_fired": bool(fired),
            "rank_identical": ranks["exact"] == ranks["wand"],
            "n_results": len(ranks["wand"]),
            "exact_s": times["exact"],
            "wand_s": times["wand"],
        }
    finally:
        _stop(spark)


def main() -> None:
    t_total = time.time()
    work = Path(tempfile.mkdtemp(prefix="addok_bench_"))
    result: dict = {"sf": SF_DIR.rstrip("/").split("sf")[-1]}
    corpus_path = str(work / "corpus")

    # 1) corpora + full build, then LATENCY FIRST.
    # The full-build/latency corpus is FIXED (8k convs ≈ 320k turns)
    # so those metrics stay comparable across rounds; BENCH_CONVS
    # sizes only the scaling corpus.
    spark = _session(CPUS)
    n_turns = _materialize_corpus(spark, BENCH_CONVS, corpus_path)
    _materialize_corpus(spark, 8000, str(work / "corpus_fixed"))
    _materialize_corpus(spark, 200, str(work / "warm"))
    full = _build_once(
        spark, str(work / "corpus_fixed"), str(work / f"idx_{CPUS}"),
        side_tables=True,
    )
    _stop(spark)
    # latency is measured in a FRESH session and BEFORE the op sweep:
    # a long-lived driver JVM carries hundreds of stages of heap/GC
    # pressure that inflates per-query wall-clock ~1.5-2× (measured:
    # p50 7.9 s in-session vs 4.8 s standalone on the same index and
    # host moment), and a 30-op sweep also heats the host — a
    # latency-serving deployment is a dedicated app, so measure it
    # like one, early and alone
    spark = _session(CPUS)
    latency = _query_latency(spark, str(work / f"idx_{CPUS}"))
    _stop(spark)

    # headline operator suite + the BIG full build (the 320k-turn
    # build is fixed-cost-dominated — 7 stage writes; the big one is
    # the number comparable to the reference's 26M-doc amortized
    # import rate)
    spark = _session(CPUS)
    queries = _bench_queries(spark)
    full_big = _build_once(
        spark, corpus_path, str(work / f"idxbig_{CPUS}"), side_tables=True,
    )
    phrase_ab = _phrase_ab(spark, str(work / f"idxbig_{CPUS}"))
    _stop(spark)
    serving = [
        _serving_latency(str(work / f"idx_{CPUS}"), "320k_turns"),
        _serving_latency(str(work / f"idxbig_{CPUS}"), f"{n_turns}_turns"),
    ]

    # 2) scaling: same parquet input, local[N] vs local[4N], core
    # build; interleaved best-of-3 per level (host CPU supply varies
    # over time — see module docstring). Partition count is FIXED at
    # both levels (sized by the DATA, as on a real cluster — shuffle
    # partitions follow volume via maxPartitionBytes, not core count):
    # the scaling measurement then compares identical work
    # decompositions and only the parallelism differs.
    hw = _hw_calibration()
    lo_cores, hi_cores = SCALE_N, SCALE_N * 4
    scale_parts = 32
    # warm the OS page cache over the scaling corpus before ANY timed
    # run: rep 1's first build otherwise pays the cold parquet reads
    # alone (r4: lo-level rep 1 ran 33% under reps 2-3, minting an
    # impossible >1.0 pair efficiency), and which LEVEL pays it
    # depends on run order — a bias, not noise
    for f in sorted(Path(corpus_path).rglob("*.parquet")):
        f.read_bytes()
    runs: dict[int, list[dict]] = {lo_cores: [], hi_cores: []}
    for rep in (1, 2, 3):
        # alternate within-pair order across reps so monotone
        # host-supply drift inside a pair biases alternate reps in
        # OPPOSITE directions and cancels in the median
        order = (lo_cores, hi_cores) if rep % 2 else (hi_cores, lo_cores)
        for cores in order:
            s = _session(cores, shuffle=scale_parts)
            # warm-up: full code path on a tiny slice (JIT + workers)
            _build_once(
                s, str(work / "warm"), str(work / f"wi{cores}_{rep}"),
                side_tables=False, partitions=scale_parts,
            )
            runs[cores].append(
                _build_once(
                    s, corpus_path,
                    str(work / f"idx_scale_{cores}_{rep}"), side_tables=False,
                    partitions=scale_parts,
                )
            )
            _stop(s)
    best = {
        c: max(rs, key=lambda r: r["turns_per_sec"]) for c, rs in runs.items()
    }
    scaling = {f"local[{c}]": best[c] for c in (lo_cores, hi_cores)}
    scaling["all_runs"] = {
        f"local[{c}]": [r["turns_per_sec"] for r in rs] for c, rs in runs.items()
    }
    # efficiency per INTERLEAVED PAIR (each rep's N and 4N runs are
    # back-to-back, so host-supply drift cancels within a pair;
    # best-of per level would compare runs from different moments and
    # can under/overstate the ratio) — report the best pair + all
    pair_effs = [
        round(h["turns_per_sec"] / (4.0 * l["turns_per_sec"]), 3)
        for l, h in zip(runs[lo_cores], runs[hi_cores])
    ]
    scaling["pair_efficiencies"] = pair_effs
    # headline = MEDIAN pair, clamped to 1.0: a >1.0 ratio is host
    # noise, not superlinear scaling, and the max of three noisy
    # pairs overstates. The raw pairs stay in pair_efficiencies.
    efficiency = min(1.0, sorted(pair_effs)[len(pair_effs) // 2])

    # 3) block-max WAND skip evidence at the 1.6M-turn scale: a
    # common-token conjunction large enough to open the volume gate
    # (gate lowered explicitly and reported — at sf0.1 the default
    # 20M-posting gate correctly stays closed), rank-identity-checked
    # against the exact path on the same index
    wand_evidence = _wand_at_scale(corpus_path, work, n_turns)

    shutil.rmtree(work, ignore_errors=True)

    result.update(
        {
            "metric": "addok_spark headline ops + index-build scaling",
            "value": round(time.time() - t_total, 2),
            "unit": "sec",
            "queries": queries,
            "index_build": {
                f"local[{CPUS}]_full": full,
                f"local[{CPUS}]_full_big": full_big,
                "scaling": scaling,
                "scaling_efficiency_n_to_4n": efficiency,
                "hardware": hw,
                "n_conversations": BENCH_CONVS,
                "n_turns": n_turns,
            },
            "wand_at_scale": wand_evidence,
            "phrase_ab": phrase_ab,
            "query_latency": latency,
            "serving_latency": serving,
        }
    )
    # full payload → file; stdout gets ONE compact line (< 2 KB) as
    # the very last thing printed, so the driver's bounded tail
    # capture always parses it
    Path(__file__).resolve().parent.joinpath("BENCH_DETAILS.json").write_text(
        json.dumps(result, indent=2)
    )
    compact = {
        "metric": result["metric"],
        "value": result["value"],
        "unit": "sec",
        "sf": result["sf"],
        "queries": queries,
        "build_turns_per_sec": {
            "full_320k": full["turns_per_sec"],
            "full_big": full_big["turns_per_sec"],
        },
        "scaling_efficiency_n_to_4n": efficiency,
        "pair_efficiencies": pair_effs,
        "hw_ceiling": hw,
        "wand": {
            k: wand_evidence.get(k)
            for k in ("buckets_skipped", "rank_identical", "exact_s", "wand_s")
        },
        "phrase_ab": {
            k: phrase_ab.get(k)
            for k in ("full_decode_s", "rare_pruned_s", "rank_identical")
        },
        "query_latency": {
            k: latency[k] for k in ("p50_s", "p95_s", "batch_per_query_s")
        },
        "serving_warm_p50_ms": {s["index"]: s["warm_p50_ms"] for s in serving},
        "serving_warm_p95_ms": {s["index"]: s["warm_p95_ms"] for s in serving},
        "serving_phrase_warm_ms": {
            s["index"]: s.get("phrase_warm_ms") for s in serving
        },
        "details": "BENCH_DETAILS.json",
    }
    # every session is stopped by now; whatever the JVM/py4j still
    # flushes at interpreter exit (the benign 'Failed to update
    # accumulator' stack) must not land AFTER this line in the
    # driver's bounded tail capture — drop stderr, let in-flight log
    # lines land, then emit the JSON as the true last output
    sys.stderr.flush()
    os.dup2(os.open(os.devnull, os.O_WRONLY), 2)
    time.sleep(1.0)
    print(json.dumps(compact))
    sys.stdout.flush()


if __name__ == "__main__":
    main()
