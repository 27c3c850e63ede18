"""Distributed inverted-index build (postings, dictionary, prefix,
pairs) over a transcripts table.

Reference dataflow being re-expressed (NOT ported): the reference
indexes docs one at a time into Redis sorted sets
(``/root/reference/addok/helpers/index.py:40-85``) behind a
multiprocessing pool (``addok/helpers/__init__.py:224-289``). Here the
same logical artifacts are produced as one declarative Spark plan:

    transcripts
      → assign dense ordered doc_index   (scalable two-pass range sort)
      → analyze fields (Arrow pandas UDF) → posexplode
      → groupBy(doc_index, token): tf, positions, boost     [map-side
        partial agg; key is per-doc so never skewed]
      → groupBy(token, doc_bucket): pack posting BLOCKS      [doc-range
        bucketing IS the hot-token salt: "the" splits across buckets,
        no reducer ever owns a full hot posting list, and unlike a
        random salt the bucket boundaries preserve doc order so blocks
        concatenate into a globally doc-ordered posting list]
      → delta+varint pack (PForDelta-style) into binary columns
      → dictionary / prefix / pair side tables.

Each stage is written to its own directory with a manifest + metrics
sidecar; a re-run with the same ``out_dir`` skips completed stages →
checkpoint-resumable build (north_rule). Storage is parquet here; on
a real cluster these writers target Iceberg tables (``writeTo``),
which adds snapshot isolation on top of the same layout.

Weight formula parity: per-field token boost =
``DEFAULT_BOOST / n_field_tokens * field_boost`` and per-(doc,token)
``max(boost) + importance * 0.1``
(``addok/helpers/index.py:30-37,121-141``).
"""

from __future__ import annotations

import json
import math
import time
from dataclasses import dataclass
from pathlib import Path
from typing import Iterator

import numpy as np
import pandas as pd

from pyspark import StorageLevel, TaskContext
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..config import EngineConfig
from ..functions.text import edge_ngrams_col, make_analyze_udf
from .compress import pack_deltas, pack_f32, varint_encode

BLOCK_SCHEMA = T.ArrayType(
    T.StructType(
        [
            T.StructField("block_id", T.IntegerType()),
            T.StructField("n", T.IntegerType()),
            T.StructField("sum_tf", T.LongType()),
            T.StructField("max_tf", T.IntegerType()),
            T.StructField("max_boost", T.FloatType()),
            T.StructField("min_doc", T.LongType()),
            T.StructField("max_doc", T.LongType()),
            T.StructField("docs_bin", T.BinaryType()),
            T.StructField("tfs_bin", T.BinaryType()),
            T.StructField("boosts_bin", T.BinaryType()),
            T.StructField("pos_bin", T.BinaryType()),
        ]
    )
)


@dataclass
class IndexPaths:
    root: Path

    @property
    def docs(self) -> str:
        return str(self.root / "docs")

    @property
    def blocks(self) -> str:
        return str(self.root / "blocks")

    @property
    def dictionary(self) -> str:
        return str(self.root / "dictionary")

    @property
    def prefixes(self) -> str:
        return str(self.root / "prefixes")

    @property
    def pairs(self) -> str:
        return str(self.root / "pairs")

    @property
    def meta(self) -> Path:
        return self.root / "meta.json"

    @property
    def manifest(self) -> Path:
        return self.root / "manifest.json"


def assign_doc_ids(df: DataFrame, partitions: int) -> DataFrame:
    """Dense, ordered int64 doc_index by (conv_id, turn_idx).

    Scalable two-pass pattern (no global window): range-partition +
    per-partition sort, count rows per partition (O(P) driver state),
    then attach ``offset[pid] + arange`` per partition. Replaces the
    reference's Redis INCR id allocator (``addok/db.py:20-22``) with
    an order-preserving distributed equivalent.
    """
    sdf = (
        df.repartitionByRange(partitions, "conv_id", "turn_idx")
        .sortWithinPartitions("conv_id", "turn_idx")
        .persist(StorageLevel.MEMORY_AND_DISK)
    )
    counts = (
        sdf.groupBy(F.spark_partition_id().alias("pid"))
        .count()
        .collect()
    )
    sizes = {r["pid"]: r["count"] for r in counts}
    offsets: dict[int, int] = {}
    acc = 0
    for pid in range(max(sizes) + 1 if sizes else 0):
        offsets[pid] = acc
        acc += sizes.get(pid, 0)
    spark = df.sparkSession
    b_offsets = spark.sparkContext.broadcast(offsets)
    out_schema = T.StructType(
        sdf.schema.fields + [T.StructField("doc_index", T.LongType(), False)]
    )

    def attach(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        pid = TaskContext.get().partitionId()
        seen = b_offsets.value.get(pid, 0)
        for pdf in batches:
            pdf = pdf.assign(doc_index=np.arange(seen, seen + len(pdf), dtype=np.int64))
            seen += len(pdf)
            yield pdf

    return sdf.mapInPandas(attach, schema=out_schema), sdf


def _pack_blocks_udf(block_size: int):
    """(token,bucket) posting group → packed block rows.

    Input: array<struct<doc_index,tf,boost,positions>>; output: blocks
    of ≤block_size postings, doc-ordered, with block-max metadata
    (the block-max WAND layout; max_tf yields a valid BM25 upper
    bound since the tf-saturation term is monotone in tf)."""

    def pack(plists: pd.Series) -> pd.Series:
        out = []
        for plist in plists:
            rows = sorted(plist, key=lambda r: r["doc_index"])
            docs = np.array([r["doc_index"] for r in rows], dtype=np.uint64)
            tfs = np.array([r["tf"] for r in rows], dtype=np.uint64)
            boosts = np.array([r["boost"] for r in rows], dtype=np.float32)
            blocks = []
            for b, lo in enumerate(range(0, len(rows), block_size)):
                hi = min(lo + block_size, len(rows))
                pos_bufs = []
                for r in rows[lo:hi]:
                    p = np.asarray(r["positions"], dtype=np.uint64)
                    pos_bufs.append(pack_deltas(p))
                blocks.append(
                    {
                        "block_id": b,
                        "n": hi - lo,
                        "sum_tf": int(tfs[lo:hi].sum()),
                        "max_tf": int(tfs[lo:hi].max()),
                        "max_boost": float(boosts[lo:hi].max()),
                        "min_doc": int(docs[lo]),
                        "max_doc": int(docs[hi - 1]),
                        "docs_bin": pack_deltas(docs[lo:hi]),
                        "tfs_bin": varint_encode(tfs[lo:hi]),
                        "boosts_bin": pack_f32(boosts[lo:hi]),
                        "pos_bin": b"".join(pos_bufs),
                    }
                )
            out.append(blocks)
        return pd.Series(out)

    return F.pandas_udf(pack, BLOCK_SCHEMA)


def tokenize_docs(docs: DataFrame, cfg: EngineConfig) -> DataFrame:
    """docs (with doc_index, importance, field columns) →
    (doc_index, token, tf, positions, boost) rows — the reference's
    extract_tokens + FieldsIndexer weight fold
    (addok/helpers/index.py:30-37,121-141) as one declarative plan."""
    analyze = make_analyze_udf(cfg.synonyms)
    arrays = [
        analyze(F.col(f.name)).alias(f"__toks_{f.name}")
        for f in cfg.fields
        if f.name in docs.columns
    ]
    with_toks = docs.select("doc_index", "importance", *arrays)
    structs = []
    for f in cfg.fields:
        c = f"__toks_{f.name}"
        if c not in with_toks.columns:
            continue
        bf = (
            F.lit(cfg.default_boost)
            / F.greatest(F.size(F.col(c)), F.lit(1))
            * F.lit(f.boost)
        )

        def _mk(bf_col):
            # single-arg lambda: F.transform treats 2-arg lambdas
            # as (element, index)
            return lambda x: F.struct(x.alias("token"), bf_col.alias("fboost"))

        structs.append(F.transform(F.col(c), _mk(bf)))
    combined = with_toks.select(
        "doc_index", "importance", F.concat(*structs).alias("toks")
    )
    exploded = combined.select(
        "doc_index", "importance", F.posexplode("toks").alias("pos", "tk")
    ).select(
        "doc_index",
        "importance",
        F.col("tk.token").alias("token"),
        F.col("tk.fboost").alias("fboost"),
        "pos",
    )
    return exploded.groupBy("doc_index", "token").agg(
        F.count(F.lit(1)).cast("int").alias("tf"),
        F.sort_array(F.collect_list("pos")).alias("positions"),
        (F.max("fboost") + F.first("importance") * cfg.importance_weight)
        .cast("float")
        .alias("boost"),
    )


def build_blocks(token_doc: DataFrame, cfg: EngineConfig) -> DataFrame:
    """(doc_index, token, tf, positions, boost) → packed block rows
    with pbucket dir-partition column."""
    bucketed = token_doc.withColumn(
        "bucket", F.shiftright("doc_index", cfg.doc_bucket_bits)
    )
    grouped = bucketed.groupBy("token", "bucket").agg(
        F.collect_list(
            F.struct("doc_index", "tf", "boost", "positions")
        ).alias("plist")
    )
    return (
        grouped.withColumn(
            "blk", _pack_blocks_udf(cfg.posting_block_size)(F.col("plist"))
        )
        .select("token", "bucket", F.explode("blk").alias("b"))
        .select("token", "bucket", "b.*")
        .withColumn("pbucket", F.shiftright("bucket", cfg.pbucket_shift))
    )


def dictionary_from_blocks(blocks: DataFrame) -> DataFrame:
    """Token dictionary as a pure derivation of block metadata."""
    return blocks.groupBy("token").agg(
        F.sum("n").cast("long").alias("df"),
        F.sum("sum_tf").cast("long").alias("cf"),
        F.max("max_tf").alias("max_tf"),
        F.max("max_boost").alias("max_boost"),
    )


class IndexBuilder:
    def __init__(self, spark: SparkSession, cfg: EngineConfig, out_dir: str):
        self.spark = spark
        self.cfg = cfg
        self.paths = IndexPaths(Path(out_dir))
        self.paths.root.mkdir(parents=True, exist_ok=True)
        self.metrics: dict = {"stages": {}}

    # --- manifest / resume -------------------------------------------------
    def _manifest(self) -> dict:
        if self.paths.manifest.exists():
            return json.loads(self.paths.manifest.read_text())
        return {"stages": {}}

    def _stage_done(self, name: str) -> bool:
        m = self._manifest()
        st = m["stages"].get(name)
        return bool(st and st.get("status") == "done")

    def _mark_stage(self, name: str, **info) -> None:
        m = self._manifest()
        m["stages"][name] = {"status": "done", **info}
        self.paths.manifest.write_text(json.dumps(m, indent=2))

    def _write(self, df: DataFrame, path: str, name: str, sort_by=None,
               partition_keys: int | None = None, partition_by: str | None = None) -> None:
        t0 = time.time()
        if sort_by:
            df = df.repartitionByRange(
                partition_keys or self.cfg.build_partitions, *sort_by
            ).sortWithinPartitions(*sort_by)
        writer = df.write.mode("overwrite")
        if partition_by:
            # directory-partitioned layout → incremental maintenance
            # rewrites only affected pbucket dirs (≙ Iceberg partition
            # overwrite; see index/incremental.py)
            writer = writer.partitionBy(partition_by)
        writer.parquet(path)
        rows = self.spark.read.parquet(path).count()
        dur = time.time() - t0
        # per-snapshot metrics sidecar (north_rule: lineage + counts)
        Path(path, "_metrics.json").write_text(
            json.dumps({"rows": rows, "seconds": round(dur, 3)})
        )
        self.metrics["stages"][name] = {"rows": rows, "seconds": round(dur, 3)}
        self._mark_stage(name, rows=rows, seconds=round(dur, 3))

    # --- the build ---------------------------------------------------------
    def build(self, transcripts: DataFrame, resume: bool = True) -> IndexPaths:
        cfg = self.cfg
        spark = self.spark
        analyze = make_analyze_udf(cfg.synonyms)

        if not (resume and self._stage_done("docs")):
            docs, cached = assign_doc_ids(transcripts, cfg.build_partitions)
            if "importance" not in docs.columns:
                docs = docs.withColumn("importance", F.lit(0.0))
            docs.persist(StorageLevel.MEMORY_AND_DISK)
            token_doc = tokenize_docs(docs, cfg)
            token_doc.persist(StorageLevel.MEMORY_AND_DISK)

            dl = token_doc.groupBy("doc_index").agg(
                F.sum("tf").cast("int").alias("dl")
            )
            docs_out = (
                docs.join(dl, "doc_index", "left")
                .fillna({"dl": 0})
                .withColumn(
                    "pbucket",
                    F.shiftright("doc_index", cfg.doc_bucket_bits + cfg.pbucket_shift),
                )
            )
            self._write(
                docs_out, self.paths.docs, "docs", sort_by=["doc_index"],
                partition_by="pbucket",
            )

            # --- posting blocks (doc-range bucketing = order-preserving salt)
            blocks = build_blocks(token_doc, cfg)
            self._write(
                blocks, self.paths.blocks, "blocks", sort_by=["token", "bucket"],
                partition_by="pbucket",
            )

            # --- dictionary derived purely from block stats (df = Σn,
            # cf = Σsum_tf; ≙ ZCARD + zset max, addok/helpers/index.py:22-27,
            # lua/order_by_max_score.lua) — derivable after any
            # incremental bucket rewrite without re-reading text
            dictionary = dictionary_from_blocks(
                self.spark.read.parquet(self.paths.blocks)
            )
            self._write(
                dictionary, self.paths.dictionary, "dictionary", sort_by=["token"]
            )

            # --- global stats
            n_docs = docs_out.count()
            sum_dl = docs_out.agg(F.sum("dl")).collect()[0][0] or 0
            meta = {
                "n_docs": int(n_docs),
                "avgdl": float(sum_dl) / max(n_docs, 1),
                "bm25_k1": cfg.bm25_k1,
                "bm25_b": cfg.bm25_b,
                "doc_bucket_bits": cfg.doc_bucket_bits,
                "pbucket_shift": cfg.pbucket_shift,
                "posting_block_size": cfg.posting_block_size,
                "fields": [[f.name, f.boost] for f in cfg.fields],
            }
            self.paths.meta.write_text(json.dumps(meta, indent=2))
            self._mark_stage("docs_meta")

            token_doc.unpersist()
            docs.unpersist()
            cached.unpersist()

        dictionary = spark.read.parquet(self.paths.dictionary)

        # --- prefix table (edge n-grams over non-digit dictionary tokens;
        # a separate follow-on job like `addok ngrams`, autocomplete.py:111-131)
        if not (resume and self._stage_done("prefixes")):
            prefixes = (
                dictionary.filter(~F.col("token").rlike("^[0-9]+$"))
                .select(
                    "token",
                    "df",
                    F.explode(
                        edge_ngrams_col(
                            "token", cfg.min_edge_ngram, cfg.max_edge_ngram
                        )
                    ).alias("prefix"),
                )
                .select("prefix", "token", "df")
            )
            self._write(
                prefixes, self.paths.prefixes, "prefixes", sort_by=["prefix"]
            )

        # --- pair (co-occurrence) table, meaningful tokens only
        # (reference PairsIndexer skips commons, addok/pairs.py:6-16)
        if not (resume and self._stage_done("pairs")):
            docs_df = spark.read.parquet(self.paths.docs)
            meaningful = dictionary.filter(
                F.col("df") <= cfg.common_threshold
            ).select("token")
            toks = (
                docs_df.select(
                    "doc_index", F.explode(analyze(F.col("text"))).alias("token")
                )
                .dropDuplicates(["doc_index", "token"])
                .join(F.broadcast(meaningful), "token", "left_semi")
            )
            a, b = toks.alias("a"), toks.alias("b")
            pairs = (
                a.join(b, "doc_index")
                .filter(F.col("a.token") < F.col("b.token"))
                .select(
                    F.col("a.token").alias("token_a"),
                    F.col("b.token").alias("token_b"),
                )
                .distinct()
            )
            self._write(pairs, self.paths.pairs, "pairs", sort_by=["token_a"])

        # final metrics rollup
        meta = json.loads(self.paths.meta.read_text())
        meta["build_metrics"] = self.metrics["stages"]
        self.paths.meta.write_text(json.dumps(meta, indent=2))
        return self.paths


def build_index(
    spark: SparkSession,
    transcripts: DataFrame,
    cfg: EngineConfig,
    out_dir: str,
    resume: bool = True,
) -> IndexPaths:
    return IndexBuilder(spark, cfg, out_dir).build(transcripts, resume=resume)
