"""Extra benchmarks for optimization work (bench.py is FROZEN for
driver measurement — this file exists so optimization rounds can
iterate on individual operators without touching it).

Usage:
  python bench_extra.py [--reps N] [--plans DIR] [--noop] [q1 q2 ...]

- Times each named query (default: the full bench.py HEADLINE list)
  with the same methodology as bench.py (`fn(spark, SF_DIR).count()`
  in a local[$SPARK_GRAFT_CPUS] session, same config), `--reps N`
  times, reporting each sample and the min.
- `--plans DIR` additionally writes `.explain("formatted")` for each
  query to DIR/<name>.txt (the r06 plan evidence).
- `--noop` uses the noop sink (guide §1.4: computes every column)
  instead of .count() — isolates computation from count's pruning.

Prints one JSON line at the end: {"queries": {name: [s, ...]},
"queries_min": {name: s}}.
"""

from __future__ import annotations

import json
import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))


def main() -> None:
    args = sys.argv[1:]
    reps = 1
    plans_dir = None
    use_noop = False
    names = []
    i = 0
    while i < len(args):
        a = args[i]
        if a == "--reps":
            reps = int(args[i + 1])
            i += 2
        elif a == "--plans":
            plans_dir = Path(args[i + 1])
            plans_dir.mkdir(parents=True, exist_ok=True)
            i += 2
        elif a == "--noop":
            use_noop = True
            i += 1
        else:
            names.append(a)
            i += 1

    from addok_spark.session import build_session
    from addok_spark.entry_queries import QUERIES

    if not names:
        import bench

        names = list(bench.HEADLINE)

    spark = build_session(
        cores=CPUS,
        shuffle_partitions=max(CPUS * 3, 8),
        driver_memory="48g",
        app_name="addok_spark_bench_extra",
    )
    # same warm-up as bench.py
    for name in ("token_dictionary", "cosine_topk"):
        QUERIES[name](spark, "/root/testdata/sf0.001").count()

    samples: dict[str, list[float]] = {}
    for name in names:
        fn = QUERIES[name]
        if plans_dir is not None:
            df = fn(spark, SF_DIR)
            txt = df._jdf.queryExecution().explainString(
                spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
                    "formatted"
                )
            )
            (plans_dir / f"{name}.txt").write_text(txt)
        samples[name] = []
        for _ in range(reps):
            spark.sparkContext.setJobDescription(f"bench_extra:{name}")
            t0 = time.time()
            if use_noop:
                fn(spark, SF_DIR).write.format("noop").mode("overwrite").save()
            else:
                fn(spark, SF_DIR).count()
            samples[name].append(round(time.time() - t0, 3))
            spark.sparkContext.setJobDescription(None)
        print(f"{name}: {samples[name]}", file=sys.stderr)

    spark.sparkContext.setLogLevel("FATAL")
    spark.stop()
    out = {
        "sf": SF_DIR,
        "queries": samples,
        "queries_min": {k: min(v) for k, v in samples.items()},
    }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
