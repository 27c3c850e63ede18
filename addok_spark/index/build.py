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
import time
from dataclasses import dataclass
from pathlib import Path

import numpy as np
import pandas as pd

from pyspark import StorageLevel
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..config import EngineConfig
from ..functions.text import edge_ngrams_col
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
    def dict_partials(self) -> str:
        # per-pbucket dictionary aggregates (pbucket-partitioned):
        # CDC recomputes only touched partitions and the global
        # dictionary folds these partials instead of all block stats
        return str(self.root / "dict_partials")

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



def _parquet_rows(path: str) -> int:
    """Row count from parquet footers (driver-side, no Spark job)."""
    import pyarrow.parquet as pq

    total = 0
    for p in Path(path).rglob("*.parquet"):
        try:
            total += pq.ParquetFile(p).metadata.num_rows
        except Exception:
            pass
    return total


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
    offsets: list[tuple[int, int]] = []
    acc = 0
    for pid in range(max(sizes) + 1 if sizes else 0):
        offsets.append((pid, acc))
        acc += sizes.get(pid, 0)
    spark = df.sparkSession
    off_df = spark.createDataFrame(offsets or [(0, 0)], "pid int, __offset long")
    # doc_index computed entirely JVM-side: monotonically_increasing_id
    # encodes (partition_id << 33) | row-seq-within-partition, so
    # seq = mid - (pid << 33); no Python crossing in the hot path.
    with_ids = (
        sdf.withColumn("pid", F.spark_partition_id())
        .withColumn("__mid", F.monotonically_increasing_id())
        .join(F.broadcast(off_df), "pid")
        .withColumn(
            "doc_index",
            (F.col("__mid") - F.expr("shiftleft(cast(pid as bigint), 33)"))
            + F.col("__offset"),
        )
        .drop("pid", "__mid", "__offset")
    )
    return with_ids, sdf


@F.pandas_udf(T.ArrayType(T.LongType()))
def _unpack_docs_udf(docs_bin: pd.Series) -> pd.Series:
    from .compress import unpack_deltas

    return pd.Series(
        [unpack_deltas(bytes(b)).astype(np.int64).tolist() for b in docs_bin]
    )


DOC_TOKENS_TYPE = T.StructType(
    [
        T.StructField(
            "toks",
            T.ArrayType(
                T.StructType(
                    [
                        T.StructField("token", T.StringType()),
                        T.StructField("tf", T.IntegerType()),
                        T.StructField("pos_bin", T.BinaryType()),
                        T.StructField("boost", T.FloatType()),
                    ]
                )
            ),
        ),
        T.StructField("dl", T.IntegerType()),
    ]
)


def _varint_len(values: np.ndarray) -> np.ndarray:
    """Byte length of each value's LEB128 encoding (vectorized)."""
    v = values.astype(np.uint64)
    nb = np.ones(v.shape, dtype=np.int64)
    tmp = v >> np.uint64(7)
    while tmp.any():
        nb += (tmp != 0).astype(np.int64)
        tmp >>= np.uint64(7)
    return nb


def make_doc_tokens_udf(cfg: EngineConfig, field_names: list[str]):
    """Per-DOCUMENT analysis + aggregation in ONE Arrow batch pass.

    Since every (doc, token) pair lives in exactly one input row, the
    tf/positions/boost aggregation is a per-row computation — doing
    it inside the UDF removes the 60M-row explode + hash-aggregate
    that dominated the build (and anti-scaled at high thread counts
    from per-task agg memory pressure). Weight formula unchanged:
    ``DEFAULT_BOOST / n_field_tokens * field_boost`` per field,
    per-(doc,token) ``max + importance*0.1``
    (addok/helpers/index.py:30-37,121-141). Positions are global
    across fields in config field order; dl = total token count.
    """
    from ..functions.text import analyze_series

    fields = [(f.name, f.boost) for f in cfg.fields if f.name in field_names]
    syn = dict(cfg.synonyms)
    default_boost, iw = cfg.default_boost, cfg.importance_weight

    def run(*cols: pd.Series) -> pd.DataFrame:
        imp = cols[-1].fillna(0.0).to_numpy(dtype=np.float64)
        per_field = [analyze_series(c, syn) for c in cols[:-1]]
        n_rows = len(imp)
        # per-doc token aggregation (python dicts over ~40 tokens/doc)
        doc_pairs: list = []   # per doc: [(token, tf, boost, pos_list), ...]
        dl_out = np.zeros(n_rows, dtype=np.int32)
        all_pos: list = []     # flat positions in emit order
        pair_counts: list = [] # tf per emitted pair (for byte slicing)
        for i in range(n_rows):
            pos = 0
            tfs: dict = {}
            boosts: dict = {}
            positions: dict = {}
            for (fname, fboost), toks_s in zip(fields, per_field):
                toks = toks_s.iat[i]
                if toks is None or len(toks) == 0:
                    continue
                w = default_boost / len(toks) * fboost
                for t in toks:
                    tfs[t] = tfs.get(t, 0) + 1
                    positions.setdefault(t, []).append(pos)
                    b = boosts.get(t)
                    if b is None or w > b:
                        boosts[t] = w
                    pos += 1
            ib = imp[i] * iw
            pairs = []
            for t, tf in tfs.items():
                pairs.append((t, tf, boosts[t] + ib))
                all_pos.extend(positions[t])
                pair_counts.append(tf)
            doc_pairs.append(pairs)
            dl_out[i] = pos
        # ONE vectorized delta+varint encode for the whole batch's
        # positions, then slice per pair by byte offsets — position
        # payloads travel the shuffle as opaque binary, never as
        # per-row int arrays (Arrow/python object cost at 34M rows
        # dominated the block build before this).
        flat = np.asarray(all_pos, dtype=np.uint64)
        counts = np.asarray(pair_counts, dtype=np.int64)
        ends = np.cumsum(counts)
        starts = ends - counts
        deltas = flat.copy()
        if len(flat) > 1:
            deltas[1:] = flat[1:] - flat[:-1]
        if len(starts):
            deltas[starts] = flat[starts]
        buf = varint_encode(deltas)
        blens = _varint_len(deltas) if len(deltas) else np.empty(0, dtype=np.int64)
        bends = np.cumsum(blens)
        # byte range of pair j = [bstart[starts[j]], bend[ends[j]-1]]
        toks_out = []
        j = 0
        for pairs in doc_pairs:
            row = []
            for (t, tf, boost) in pairs:
                blo = int(bends[starts[j]] - blens[starts[j]]) if tf else 0
                bhi = int(bends[ends[j] - 1]) if tf else 0
                row.append(
                    {"token": t, "tf": tf, "pos_bin": buf[blo:bhi], "boost": boost}
                )
                j += 1
            toks_out.append(row)
        return pd.DataFrame({"toks": toks_out, "dl": dl_out})

    return F.pandas_udf(run, DOC_TOKENS_TYPE)


def analyze_docs(docs: DataFrame, cfg: EngineConfig) -> DataFrame:
    """docs → docs + ``__an`` struct (toks array + dl). One UDF pass,
    no shuffle."""
    field_cols = [f.name for f in cfg.fields if f.name in docs.columns]
    udf = make_doc_tokens_udf(cfg, field_cols)
    imp = (
        F.col("importance")
        if "importance" in docs.columns
        else F.lit(0.0)
    )
    return docs.withColumn(
        "__an", udf(*[F.col(c) for c in field_cols], imp)
    )


def tokenize_docs(docs: DataFrame, cfg: EngineConfig) -> DataFrame:
    """docs (with doc_index, importance, field columns) →
    (doc_index, token, tf, positions, boost) rows — the reference's
    extract_tokens + FieldsIndexer weight fold
    (addok/helpers/index.py:30-37,121-141); per-row aggregation, no
    shuffle."""
    return (
        analyze_docs(docs, cfg)
        .select("doc_index", F.explode("__an.toks").alias("tk"))
        .select(
            "doc_index",
            F.col("tk.token").alias("token"),
            F.col("tk.tf").alias("tf"),
            F.col("tk.pos_bin").alias("pos_bin"),
            F.col("tk.boost").alias("boost"),
        )
    )


BLOCK_ROW_SCHEMA = T.StructType(
    [
        T.StructField("token", T.StringType()),
        T.StructField("bucket", T.LongType()),
    ]
    + list(BLOCK_SCHEMA.elementType.fields)
)


def _pack_group(
    token: str,
    bucket: int,
    docs: np.ndarray,
    tfs: np.ndarray,
    boosts: np.ndarray,
    pos_lists,
    block_size: int,
) -> list[dict]:
    """Pack one doc-sorted (token,bucket) posting run into block rows.

    ``pos_lists`` = per-posting pos_bin buffers (already delta+varint
    encoded at analysis time, reset per posting) — block pos_bin is
    their concatenation; decode splits by tf counts."""
    docs = docs.astype(np.uint64)
    tfs = tfs.astype(np.uint64)
    boosts = boosts.astype(np.float32)
    out = []
    for b, lo in enumerate(range(0, len(docs), block_size)):
        hi = min(lo + block_size, len(docs))
        out.append(
            {
                "token": token,
                "bucket": int(bucket),
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
                "pos_bin": b"".join(
                    bytes(p) if p is not None else b"" for p in pos_lists[lo:hi]
                ),
            }
        )
    return out


def filter_token_rows(docs: DataFrame, cfg: EngineConfig) -> DataFrame:
    """Filter-set postings: one ``f|name|value`` token row per doc per
    filterable column (≙ the reference's ``f|`` Redis sets,
    ``addok/helpers/keys.py:16-17``, ``helpers/index.py:180-195``).
    Stored in the SAME blocks table as word postings (tf=1, boost=0,
    empty positions), so query filters ride the normal intersection
    path and constrain candidate COLLECTION — a selective filter can
    never be starved by an unfiltered top-boost bucket. ``|`` cannot
    appear in analyzed tokens, so the namespace is collision-free."""
    fields = [f for f in cfg.filter_fields if f in docs.columns]
    if not fields:
        return None
    # values TRIMMED (empty-after-trim dropped) — the exact
    # normalization the query side applies when building f| keys and
    # the post-score predicate, so a value carrying stray whitespace
    # can never silently fail to match any filter
    parts = [
        docs.select(
            "doc_index", F.trim(F.col(f).cast("string")).alias("__v")
        )
        .filter(F.col("__v").isNotNull() & (F.col("__v") != ""))
        .select(
            "doc_index",
            F.concat(F.lit(f"f|{f}|"), F.col("__v")).alias("token"),
            F.lit(1).alias("tf"),
            F.lit(b"").alias("pos_bin"),
            F.lit(0.0).cast("float").alias("boost"),
        )
        for f in fields
    ]
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out


def build_blocks(token_doc: DataFrame, cfg: EngineConfig) -> DataFrame:
    """(doc_index, token, tf, pos_bin, boost) -> packed block rows.

    External **sort-merge** posting assembly (north_star): one shuffle
    keyed (token, bucket) + Spark's spill-safe external sort -- no
    collect_list hash-agg (which anti-scales under per-task agg
    memory pressure at high thread counts). A streaming mapInPandas
    packer walks each sorted run; complete groups are packed straight
    from numpy slices (zero per-element boxing), only the single
    group spanning a batch boundary is carried. Task memory is
    bounded by one (token,bucket) group <= 2^bits postings no matter
    how hot the token -- the doc-range bucket IS the salt.
    """
    block_size = cfg.posting_block_size
    pshift = cfg.pbucket_shift
    arranged = (
        token_doc.withColumn(
            "bucket", F.shiftright("doc_index", cfg.doc_bucket_bits)
        )
        .repartition(cfg.build_partitions, "token", "bucket")
        .sortWithinPartitions("token", "bucket", "doc_index")
    )

    def stream_pack(batches):
        carry = None  # (token, bucket, [docs...], [tfs...], [boosts...], [pos...])

        def flush_carry(c):
            return _pack_group(
                c[0], c[1],
                np.concatenate(c[2]), np.concatenate(c[3]),
                np.concatenate(c[4]).astype(np.float32),
                np.concatenate(c[5]), block_size,
            )

        for pdf in batches:
            if not len(pdf):
                continue
            toks = pdf["token"].to_numpy()
            bucks = pdf["bucket"].to_numpy()
            docs_v = pdf["doc_index"].to_numpy()
            tfs_v = pdf["tf"].to_numpy()
            boosts_v = pdf["boost"].to_numpy()
            pos_v = pdf["pos_bin"].to_numpy()
            change = np.empty(len(pdf), dtype=bool)
            change[0] = True
            if len(pdf) > 1:
                change[1:] = (toks[1:] != toks[:-1]) | (bucks[1:] != bucks[:-1])
            bounds = np.flatnonzero(change).tolist() + [len(pdf)]
            rows_out = []
            n_groups = len(bounds) - 1
            for gi in range(n_groups):
                lo, hi = bounds[gi], bounds[gi + 1]
                last = gi == n_groups - 1
                if gi == 0 and carry is not None:
                    if (carry[0], carry[1]) == (toks[lo], bucks[lo]):
                        carry[2].append(docs_v[lo:hi])
                        carry[3].append(tfs_v[lo:hi])
                        carry[4].append(boosts_v[lo:hi])
                        carry[5].append(pos_v[lo:hi])
                        if last:
                            break  # group may continue into next batch
                        rows_out.extend(flush_carry(carry))
                        carry = None
                        continue
                    rows_out.extend(flush_carry(carry))
                    carry = None
                if last:
                    # may continue into the next Arrow batch -> carry
                    carry = [toks[lo], bucks[lo], [docs_v[lo:hi]],
                             [tfs_v[lo:hi]], [boosts_v[lo:hi]], [pos_v[lo:hi]]]
                    break
                rows_out.extend(
                    _pack_group(
                        toks[lo], bucks[lo], docs_v[lo:hi], tfs_v[lo:hi],
                        boosts_v[lo:hi].astype(np.float32), pos_v[lo:hi],
                        block_size,
                    )
                )
            if rows_out:
                yield pd.DataFrame(rows_out)
        if carry is not None:
            out = flush_carry(carry)
            if out:
                yield pd.DataFrame(out)

    return arranged.mapInPandas(stream_pack, schema=BLOCK_ROW_SCHEMA).withColumn(
        "pbucket", F.shiftright("bucket", pshift)
    )


def prefixes_from_dictionary(dictionary: DataFrame, cfg: EngineConfig) -> DataFrame:
    """Edge-ngram prefix table over non-digit word tokens (skips the
    f| filter namespace) — the `addok ngrams` post-pass derivation
    (autocomplete.py:111-131), shared by build / CDC / CLI."""
    return (
        dictionary.filter(
            ~F.col("token").rlike("^[0-9]+$") & ~F.col("token").contains("|")
        )
        .select(
            "token",
            "df",
            F.explode(
                edge_ngrams_col("token", cfg.min_edge_ngram, cfg.max_edge_ngram)
            ).alias("prefix"),
        )
        # partition key = hash of the TOKEN: all of a token's prefix
        # rows land in one bucket, so a CDC batch rewrites exactly
        # the buckets of its changed tokens (incremental.py)
        .select(
            "prefix", "token", "df",
            F.pmod(
                F.xxhash64("token"), F.lit(cfg.prefix_hash_buckets)
            ).cast("int").alias("pfx_bucket"),
        )
    )


def pairs_from_blocks(
    blocks_df: DataFrame, dictionary: DataFrame, cfg: EngineConfig
) -> DataFrame:
    """Co-occurrence pairs derived from posting BLOCKS (no text
    re-analysis): unpack doc ids per token, drop COMMON tokens (the
    Zipf head is small by construction → broadcast anti-join), regroup
    per doc, expand pairs with a codegen nested transform — no
    self-join shuffle at all (≙ PairsIndexer skipping commons,
    addok/pairs.py:6-16). Reused by the bulk build AND the CDC path
    so the relation round never sees stale edges."""
    commons = dictionary.filter(
        F.col("df") > cfg.common_threshold
    ).select("token")
    shift = cfg.doc_bucket_bits + cfg.pbucket_shift
    tok_doc = (
        blocks_df.filter(~F.col("token").contains("|"))
        .join(F.broadcast(commons), "token", "left_anti")
        .select("token", _unpack_docs_udf(F.col("docs_bin")).alias("ds"))
        .select("token", F.explode("ds").alias("doc_index"))
    )
    per_doc = tok_doc.groupBy("doc_index").agg(
        F.array_sort(F.collect_set("token")).alias("toks")
    )
    return (
        per_doc.select(
            # provenance partition key: the doc's pbucket — pairs are
            # distinct per pbucket (the global pair set is the union
            # over partitions; consumers dedupe in the driver set),
            # which is what makes the CDC pair refresh O(touched
            # partitions) instead of a full corpus unpack
            F.shiftright("doc_index", shift).alias("pbucket"),
            F.explode(
                F.flatten(
                    F.transform(
                        "toks",
                        lambda x, i: F.transform(
                            F.slice(
                                F.col("toks"),
                                i + 2,
                                F.greatest(
                                    F.size(F.col("toks")) - i - 1, F.lit(0)
                                ),
                            ),
                            lambda y: F.struct(
                                x.alias("token_a"), y.alias("token_b")
                            ),
                        ),
                    )
                )
            ).alias("p")
        )
        .select("pbucket", "p.token_a", "p.token_b")
        .distinct()
    )


def dictionary_from_blocks(blocks: DataFrame) -> DataFrame:
    """Token dictionary as a pure derivation of block metadata."""
    return blocks.groupBy("token").agg(
        F.sum("n").cast("long").alias("df"),
        F.sum("sum_tf").cast("long").alias("cf"),
        F.max("max_tf").alias("max_tf"),
        F.max("max_boost").alias("max_boost"),
    )


def dict_partials_from_blocks(blocks: DataFrame) -> DataFrame:
    """Per-(pbucket, token) dictionary aggregates from block
    metadata. All four measures are associative, so the global
    dictionary is an exact re-aggregation of these partials — which
    is what lets CDC refresh only touched pbucket partitions and
    still keep global df/cf exact (the reference's deindex
    invariant, tests/test_index_utils.py:94-167)."""
    return blocks.groupBy("pbucket", "token").agg(
        F.sum("n").cast("long").alias("df"),
        F.sum("sum_tf").cast("long").alias("cf"),
        F.max("max_tf").alias("max_tf"),
        F.max("max_boost").alias("max_boost"),
    )


def dictionary_from_partials(partials: DataFrame) -> DataFrame:
    """Global dictionary = fold of the per-pbucket partials (2^shift×
    fewer input rows than re-aggregating block stats)."""
    return partials.groupBy("token").agg(
        F.sum("df").cast("long").alias("df"),
        F.sum("cf").cast("long").alias("cf"),
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
               partition_keys: int | None = None, partition_by: str | None = None,
               count_rows: bool = True) -> None:
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
        # metrics row count from parquet footers, driver-side (no
        # Spark job — keeps the serial floor between stages low)
        rows = _parquet_rows(path) if count_rows else -1
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

        scratch = str(self.paths.root / "_analyzed")

        # stage 1: dense ids + per-doc analysis → ONE scratch parquet
        # (doc columns + nested token aggregates + dl). Intermediates
        # go to parquet, NOT .persist(): disk-backed stage checkpoints
        # are what makes the build resumable AND avoid the in-memory
        # cache contention that anti-scaled at high thread counts
        # (measured: cached pipeline 2× slower on local[32] than
        # local[8]; checkpointed stages scale).
        if not (resume and self._stage_done("analyzed")):
            docs, cached = assign_doc_ids(transcripts, cfg.build_partitions)
            if "importance" not in docs.columns:
                docs = docs.withColumn("importance", F.lit(0.0))
            analyzed = analyze_docs(docs, cfg)
            self._write(analyzed, scratch, "analyzed", count_rows=False)
            cached.unpersist()

        analyzed = spark.read.parquet(scratch)

        # stage 2: final docs table (dl + pbucket partition layout)
        if not (resume and self._stage_done("docs")):
            docs_out = (
                analyzed.withColumn("dl", F.col("__an.dl"))
                .drop("__an")
                .withColumn(
                    "pbucket",
                    F.shiftright("doc_index", cfg.doc_bucket_bits + cfg.pbucket_shift),
                )
            )
            # analyzed is already globally doc_index-ordered (range
            # layout from assign_doc_ids) — no re-shuffle needed
            self._write(
                docs_out.sortWithinPartitions("doc_index"),
                self.paths.docs, "docs", partition_by="pbucket",
            )

        # stage 3: posting blocks (doc-range bucketing = order-preserving salt)
        if not (resume and self._stage_done("blocks")):
            token_doc = analyzed.select(
                "doc_index", F.explode("__an.toks").alias("tk")
            ).select(
                "doc_index",
                F.col("tk.token").alias("token"),
                F.col("tk.tf").alias("tf"),
                F.col("tk.pos_bin").alias("pos_bin"),
                F.col("tk.boost").alias("boost"),
            )
            # filter-set postings ride the same shuffle + pack pass
            frows = filter_token_rows(analyzed, cfg)
            if frows is not None:
                token_doc = token_doc.unionByName(frows)
            blocks = build_blocks(token_doc, cfg)
            # pack output is (token,bucket)-sorted within partitions
            # already — write as-is; parquet row-group stats still give
            # token min/max pruning per file
            self._write(
                blocks, self.paths.blocks, "blocks", partition_by="pbucket",
            )

        # stage 4a: per-pbucket dictionary partials from block stats
        # (pbucket-partitioned; CDC refreshes only touched partitions)
        if not (resume and self._stage_done("dict_partials")):
            partials = dict_partials_from_blocks(
                spark.read.parquet(self.paths.blocks)
            )
            self._write(
                partials.repartition("pbucket")
                .sortWithinPartitions("pbucket", "token"),
                self.paths.dict_partials, "dict_partials",
                partition_by="pbucket",
            )

        # stage 4b: global dictionary folded from the partials (df =
        # Σn, cf = Σsum_tf; ≙ ZCARD + zset max,
        # addok/helpers/index.py:22-27, lua/order_by_max_score.lua) —
        # re-derivable after any incremental bucket rewrite without
        # re-reading text or block payloads
        if not (resume and self._stage_done("dictionary")):
            dictionary = dictionary_from_partials(
                spark.read.parquet(self.paths.dict_partials)
            )
            self._write(
                dictionary, self.paths.dictionary, "dictionary", sort_by=["token"]
            )

        if not (resume and self._stage_done("docs_meta")):
            docs_now = spark.read.parquet(self.paths.docs)
            n_docs = self._manifest()["stages"].get("docs", {}).get("rows", -1)
            if n_docs < 0:
                n_docs = docs_now.count()
            sum_dl = docs_now.agg(F.sum("dl")).collect()[0][0] or 0
            meta = {
                "n_docs": int(n_docs),
                "sum_dl": int(sum_dl),
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

        dictionary = spark.read.parquet(self.paths.dictionary)

        # --- prefix table (edge n-grams over non-digit dictionary tokens;
        # a separate follow-on job like `addok ngrams`, autocomplete.py:111-131)
        if cfg.build_prefixes and not (resume and self._stage_done("prefixes")):
            # token-hash-bucketed dirs, prefix-sorted files within:
            # CDC rewrites only changed tokens' buckets, query
            # IN-lists still prune row groups on prefix min/max
            self._write(
                prefixes_from_dictionary(dictionary, cfg)
                .repartition("pfx_bucket")
                .sortWithinPartitions("pfx_bucket", "prefix"),
                self.paths.prefixes, "prefixes", partition_by="pfx_bucket",
            )

        # --- pair (co-occurrence) table, meaningful tokens only
        # (reference PairsIndexer skips commons, addok/pairs.py:6-16)
        if cfg.build_pairs and not (resume and self._stage_done("pairs")):
            pairs = pairs_from_blocks(
                spark.read.parquet(self.paths.blocks), dictionary, cfg
            )
            self._write(
                pairs.repartition("pbucket")
                .sortWithinPartitions("pbucket", "token_a", "token_b"),
                self.paths.pairs, "pairs", partition_by="pbucket",
            )

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
