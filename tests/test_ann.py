"""IVF-Flat coarse quantization (pipelines/ann.py): deterministic
anchors, cell assignment as partition, probe-restricted search, and
full-probe equivalence to the brute-force baseline."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from addok_spark.pipelines import ann

N, DIM, CELLS = 80, 16, 4


@pytest.fixture(scope="module")
def emb(spark):
    rng = np.random.Generator(np.random.PCG64(7))
    vecs = rng.normal(size=(N, DIM)).astype("float32")
    rows = [(i, [float(x) for x in vecs[i]]) for i in range(N)]
    return spark.createDataFrame(
        rows, "vec_id long, embedding array<float>"
    ).cache()


def test_ivf_assignment_partitions(emb):
    anchors = ann.ivf_cells(emb, CELLS)
    assert len(anchors) == CELLS and len(anchors[0]) == DIM
    cells = emb.select(
        "vec_id",
        ann.ivf_assign_col(F.col("embedding"), anchors).alias("cell"),
    ).collect()
    assert len(cells) == N
    got = {r["vec_id"]: r["cell"] for r in cells}
    assert set(got.values()) <= set(range(CELLS))
    # an anchor's own vector lands in its own cell (cosine == 1)
    for j in range(CELLS):
        assert got[j] == j


def test_ivf_topk_probes_subset_and_full_probe_is_exact(emb):
    anchors = ann.ivf_cells(emb, CELLS)
    qv = [float(x) for x in emb.filter(F.col("vec_id") == 3)
          .collect()[0]["embedding"]]
    probes = ann.ivf_probe_cells(qv, anchors, nprobe=2)
    assert len(probes) == 2
    res = ann.ivf_topk(emb, qv, anchors, k=10, nprobe=2).collect()
    assert res and all(r["cell"] in probes for r in res)
    # the query's own vector is its best match when its cell is probed
    assert res[0]["id"] == 3 and res[0]["cosine"] == pytest.approx(1.0)
    # probing every cell recovers the exact brute-force ranking
    full = ann.ivf_topk(emb, qv, anchors, k=10, nprobe=CELLS).collect()
    brute = ann.cosine_topk(emb, qv, k=10).collect()
    assert [r["id"] for r in full] == [r["id"] for r in brute]
    assert [r["cosine"] for r in full] == [r["cosine"] for r in brute]


def test_kmeans_deterministic_and_improves(emb):
    got = {
        r["id"]: r
        for r in ann.kmeans_assign(emb, CELLS, iters=2).collect()
    }
    assert len(got) == N
    assert set(r["cluster"] for r in got.values()) <= set(range(CELLS))
    # partition-invariance: same result from a different layout
    re = {
        r["id"]: r
        for r in ann.kmeans_assign(emb.repartition(7), CELLS, iters=2)
        .collect()
    }
    assert all(
        re[i]["cluster"] == got[i]["cluster"]
        and re[i]["cosine"] == got[i]["cosine"]
        for i in got
    )
    # Lloyd improves (or keeps) mean within-cluster cosine vs iters=1
    one = ann.kmeans_assign(emb, CELLS, iters=1).collect()
    assert sum(r["cosine"] for r in got.values()) >= (
        sum(r["cosine"] for r in one) - 1e-6
    )


def test_semdedup_pairs(spark):
    # two planted near-dup groups + noise: dups must pair up within
    # their k-means cell, noise must not
    rng = np.random.Generator(np.random.PCG64(11))
    base1 = rng.normal(size=DIM)
    base2 = rng.normal(size=DIM)
    rows = []
    for i in range(3):  # group A: ids 0-2
        rows.append((i, [float(x) for x in base1 + 0.01 * rng.normal(size=DIM)]))
    for i in range(3, 6):  # group B: ids 3-5
        rows.append((i, [float(x) for x in base2 + 0.01 * rng.normal(size=DIM)]))
    for i in range(6, 30):  # noise
        rows.append((i, [float(x) for x in rng.normal(size=DIM)]))
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    pairs = ann.semdedup_pairs(df, 4, threshold=0.95).collect()
    got = {(r["id_a"], r["id_b"]) for r in pairs}
    assert got >= {(0, 1), (0, 2), (1, 2), (3, 4), (3, 5), (4, 5)}
    # no cross-group or noise pair reaches 0.95
    assert all(
        (a < 3 and b < 3) or (3 <= a < 6 and 3 <= b < 6) for a, b in got
    )
    assert all(r["id_a"] < r["id_b"] for r in pairs)


def test_ivf_partitioned_layout_prunes(spark, emb, tmp_path):
    anchors = ann.ivf_cells(emb, CELLS)
    path = str(tmp_path / "ivf_cells")
    ann.ivf_write_partitioned(emb, anchors, path)
    import os
    dirs = sorted(d for d in os.listdir(path) if d.startswith("cell="))
    assert len(dirs) == CELLS
    qv = [float(x) for x in emb.filter(F.col("vec_id") == 3)
          .collect()[0]["embedding"]]
    res = ann.ivf_topk_partitioned(spark, path, qv, anchors, k=10, nprobe=2)
    # identical ranking to the scan-everything variant
    base = ann.ivf_topk(emb, qv, anchors, k=10, nprobe=2).collect()
    got = res.collect()
    assert [(r["id"], r["cosine"]) for r in got] == [
        (r["id"], r["cosine"]) for r in base
    ]
    # the physical plan prunes to the probed partition dirs
    plan = res._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in plan and "cell" in plan
    probes = ann.ivf_probe_cells(qv, anchors, 2)
    import re
    m = re.search(r"PartitionFilters: \[([^\]]*)\]", plan)
    assert m and all(str(c) in m.group(1) for c in probes)
