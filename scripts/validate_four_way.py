"""Four-way rank-identity validation at scale: the Spark engine, the
pure-Python oracle, the warm serving tier, and a sharded scatter-
gather coordinator answer the same query set over the same corpus and
must agree. Run ad hoc per round as the closing evidence
(BASELINE.md records each round's result).

Usage: python scripts/validate_four_way.py [n_convs] [cores]
"""

import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import numpy as np


def main() -> None:
    n_convs = int(sys.argv[1]) if len(sys.argv) > 1 else 2500
    cores = int(sys.argv[2]) if len(sys.argv) > 2 else 16

    from addok_spark.config import EngineConfig
    from addok_spark.data.transcripts import (
        reference_queries, transcripts_df, transcripts_pdf,
    )
    from addok_spark.index.build import build_index
    from addok_spark.oracle.bm25_oracle import OracleIndex, oracle_search
    from addok_spark.query.engine import Query, SearchEngine
    from addok_spark.serving.local import LocalSearchEngine
    from addok_spark.session import build_session

    spark = build_session(cores=cores, driver_memory="16g")
    cfg = EngineConfig(build_partitions=cores * 2, common_threshold=10_000)
    sdf = transcripts_df(spark, n_convs, seed=42)
    out = f"/tmp/val4_{n_convs}"
    import shutil

    shutil.rmtree(out, ignore_errors=True)
    t0 = time.time()
    paths = build_index(spark, sdf, cfg, out)
    build_s = time.time() - t0
    pdf = transcripts_pdf(n_convs, seed=42)
    n_turns = len(pdf)

    qdf = reference_queries(pdf, n=48, seed=7)
    queries = [
        Query(qid=r.qid, q=r.q, k=10, autocomplete=(r.kind == "prefix"))
        for r in qdf.itertuples(index=False)
    ]
    # filter-bearing variants of the first exact queries
    for i, r in enumerate(qdf[qdf.kind == "exact"].head(8).itertuples(index=False)):
        queries.append(Query(
            qid=f"f-{i:02d}", q=r.q, k=10,
            filters={"role": ["user", "assistant"][i % 2:i % 2 + 1]},
        ))

    t0 = time.time()
    eng = SearchEngine(spark, paths, cfg)
    got_engine = eng.search(queries).toPandas()
    engine_s = time.time() - t0
    oracle = OracleIndex(pdf, cfg)
    want = oracle_search(oracle, queries, cfg)
    srv = LocalSearchEngine(out, cfg)
    t0 = time.time()
    got_srv = srv.search(queries)
    srv_s = time.time() - t0
    shr = LocalSearchEngine(out, cfg, shards=4)
    got_shr = shr.search(queries)

    def ranks(df):
        out = {}
        for qid, g in df.groupby("qid"):
            g = g.sort_values("rank")
            out[qid] = list(zip(g["conv_id"], g["turn_idx"]))
        return out

    r_e, r_o, r_s, r_h = ranks(got_engine), ranks(want), ranks(got_srv), ranks(got_shr)
    mismatches = []
    for qid in sorted(r_o):
        for name, r in (("engine", r_e), ("serving", r_s), ("sharded", r_h)):
            if r.get(qid, []) != r_o[qid]:
                mismatches.append((qid, name, r.get(qid, []), r_o[qid]))
    # engine BM25 score agreement (rtol)
    sc_ok = True
    m = got_engine.merge(
        want, on=["qid", "conv_id", "turn_idx"], suffixes=("_e", "_o")
    )
    if len(m):
        sc_ok = bool(np.allclose(m["score_e"], m["score_o"], rtol=1e-9))
    print(
        f"RESULT turns={n_turns} queries={len(queries)} "
        f"mismatches={len(mismatches)} scores_close={sc_ok} "
        f"build_s={build_s:.1f} engine_batch_s_per_q={engine_s/len(queries):.3f} "
        f"serving_cold_ms_per_q={1000*srv_s/len(queries):.1f}"
    )
    for mm in mismatches[:5]:
        print("MISMATCH", mm[0], mm[1], mm[2][:3], "vs", mm[3][:3])
    spark.stop()
    sys.exit(1 if mismatches or not sc_ok else 0)


if __name__ == "__main__":
    main()
