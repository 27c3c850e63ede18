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
from .compress import (
    pack_deltas,
    pack_f32,
    varint_decode,
    varint_encode,
    varint_encode_offsets,
)

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
    """Index directory layout with versioned snapshot publish.

    Two layouts coexist:

    - **flat** (a bulk build into an empty dir): tables live directly
      under ``root`` — ``version`` 0.
    - **versioned** (after any CDC batch): each snapshot is a complete
      table set under ``root/v{N:06d}/`` and ``root/CURRENT.json``
      names the published one. Publish is a single atomic
      ``os.replace`` of that manifest — the local-FS analog of an
      Iceberg snapshot commit (the reference gets the same property
      from Redis per-command atomicity). A reader NEVER sees a torn
      table: writers only create new snapshot dirs (hardlinking
      unchanged partition files, O(#files) not O(bytes)) and flip
      CURRENT last.

    ``version=None`` (default) resolves CURRENT.json on every access —
    what mutators and tests want. Long-lived readers (SearchEngine,
    serving) call ``pin()`` once so all their reads come from one
    consistent snapshot; ``publish(..., keep=k)`` retains the last
    ``k`` snapshots for exactly those pinned readers.
    """

    root: Path
    version: int | None = None  # None → follow CURRENT.json; 0 → flat

    def current_version(self) -> int | None:
        cur = self.root / "CURRENT.json"
        if not cur.exists():
            return None
        try:
            return int(json.loads(cur.read_text())["version"])
        except Exception:
            return None

    def pin(self) -> "IndexPaths":
        """A copy fixed to the snapshot published right now."""
        if self.version is not None:
            return self
        v = self.current_version()
        return IndexPaths(self.root, v if v is not None else 0)

    @property
    def snapshot_root(self) -> Path:
        v = self.version if self.version is not None else self.current_version()
        if not v:
            return self.root
        return self.root / f"v{v:06d}"

    def snapshot_manifest_file(self, version: int) -> Path:
        """Immutable per-snapshot manifest: {"version": N,
        "materialized": bool, "tables": {table: {entry: root-relative
        location}}}. Entries are partition-dir names ("pbucket=3") or
        "" for a table wholly inside one dir. With a link-capable
        FileIO every location points into the materialized snapshot
        tree; without links, locations reference whichever earlier
        snapshot dir actually holds the bytes — sharing by reference,
        the object-store-safe substitute for hardlinks."""
        return self.root / f"snapshot-v{int(version):06d}.json"

    def read_snapshot_manifest(self) -> dict | None:
        """The pinned version's snapshot manifest, or None (flat v0 /
        pre-manifest snapshots)."""
        v = self.version if self.version is not None else self.current_version()
        if not v:
            return None
        f = self.snapshot_manifest_file(v)
        if not f.exists():
            return None
        try:
            return json.loads(f.read_text())
        except Exception:
            return None

    def table_locations(self, table: str) -> list[str] | None:
        """Manifest-resolved absolute locations of ``table``'s data,
        or None when the table should be read as a plain directory
        (no manifest, or a materialized snapshot)."""
        m = self.read_snapshot_manifest()
        if m is None or m.get("materialized", True):
            return None
        entries = m.get("tables", {}).get(table)
        if not entries:
            return None
        return [str(self.root / rel) for rel in entries.values()]

    def publish(self, version: int, keep: int = 2, fileio=None) -> None:
        """Commit ``version``: one atomic pointer swap of
        CURRENT.json (os.replace locally ≙ single-object PUT on an
        object store — the only mutable object in the layout), then
        GC snapshot dirs older than the last ``keep`` UNLESS a
        retained manifest still references them (without hardlinks a
        new snapshot's untouched partitions live in older dirs by
        reference; deleting those would corrupt the live snapshot).
        Pinned readers on the previous snapshot keep working; the
        flat v0 layout is never deleted — it doubles as the root
        dir."""
        import os
        import re
        import shutil as _shutil

        if fileio is None:
            from .fileio import LocalFileIO

            fileio = LocalFileIO()
        pointer: dict = {"version": int(version)}
        if self.snapshot_manifest_file(version).exists():
            pointer["manifest"] = self.snapshot_manifest_file(version).name
        fileio.put_pointer(
            self.root / "CURRENT.json", json.dumps(pointer)
        )
        # dirs referenced by any RETAINED snapshot's manifest survive
        referenced: set[str] = set()
        lo = version - max(keep, 1) + 1
        for v in range(max(lo, 1), version + 1):
            f = self.snapshot_manifest_file(v)
            if not f.exists():
                continue
            try:
                man = json.loads(f.read_text())
            except Exception:
                continue
            for entries in man.get("tables", {}).values():
                for rel in entries.values():
                    referenced.add(str(rel).split("/", 1)[0])
        for p in self.root.iterdir():
            m = re.fullmatch(r"v(\d{6})", p.name)
            if m and int(m.group(1)) <= version - max(keep, 1):
                if p.name in referenced:
                    continue
                _shutil.rmtree(p, ignore_errors=True)
                old = self.snapshot_manifest_file(int(m.group(1)))
                if old.exists():
                    old.unlink()

    @property
    def docs(self) -> str:
        return str(self.snapshot_root / "docs")

    @property
    def blocks(self) -> str:
        return str(self.snapshot_root / "blocks")

    @property
    def dictionary(self) -> str:
        return str(self.snapshot_root / "dictionary")

    @property
    def dict_partials(self) -> str:
        # per-pbucket dictionary aggregates (pbucket-partitioned):
        # CDC recomputes only touched partitions and the global
        # dictionary folds these partials instead of all block stats
        return str(self.snapshot_root / "dict_partials")

    @property
    def prefixes(self) -> str:
        return str(self.snapshot_root / "prefixes")

    @property
    def pairs(self) -> str:
        return str(self.snapshot_root / "pairs")

    @property
    def meta(self) -> Path:
        return self.snapshot_root / "meta.json"

    @property
    def manifest(self) -> Path:
        # build-stage resume state: root-level (spans snapshots)
        return self.root / "manifest.json"



# every table a snapshot manifest can carry (each an IndexPaths
# property resolving under snapshot_root)
MANIFEST_TABLES = (
    "docs", "blocks", "dictionary", "dict_partials", "prefixes", "pairs"
)


def read_table(spark, paths: "IndexPaths", table: str) -> DataFrame:
    """Open an index table at the pinned snapshot.

    Materialized snapshots (flat v0, or any snapshot published with a
    link-capable FileIO) read as a plain directory — identical plan
    to before. A reference-only snapshot (object-store publish: no
    hardlinks) resolves through its manifest: partition dirs are
    grouped by the snapshot-dir base they physically live in, each
    group scanned with that ``basePath`` (so the hive partition
    column survives), groups unioned. Partition-filter pushdown still
    prunes inside every group, so the scan shape matches the
    materialized layout's."""
    pinned = paths.pin()
    locs = pinned.table_locations(table)
    if locs is None:
        return spark.read.parquet(str(getattr(pinned, table)))
    groups: dict[str, list[str]] = {}
    singles: list[str] = []
    for loc in locs:
        p = Path(loc)
        if "=" in p.name:
            groups.setdefault(str(p.parent), []).append(str(p))
        else:
            singles.append(str(p))
    dfs = [
        spark.read.option("basePath", base).parquet(*sorted(dirs))
        for base, dirs in sorted(groups.items())
    ]
    dfs.extend(spark.read.parquet(s) for s in sorted(singles))
    out = dfs[0]
    for d in dfs[1:]:
        out = out.unionByName(d, allowMissingColumns=True)
    return out


def table_exists(paths: "IndexPaths", table: str) -> bool:
    """Whether the pinned snapshot carries ``table`` — by manifest
    entry for reference-only snapshots, by directory otherwise."""
    pinned = paths.pin()
    m = pinned.read_snapshot_manifest()
    if m is not None and not m.get("materialized", True):
        return bool(m.get("tables", {}).get(table))
    return Path(getattr(pinned, table)).exists()


def materialize_snapshot(paths: "IndexPaths", dest: str) -> "IndexPaths":
    """Sync the pinned snapshot into a plain directory tree — what an
    object-store serving node does to its local cache before opening
    pyarrow datasets (the serving tier reads individual parquet files
    by offset and needs a physical layout; on a POSIX deployment
    snapshots are already materialized and this is never needed).
    Returns a flat-layout IndexPaths over ``dest``."""
    import shutil as _shutil

    pinned = paths.pin()
    dst = Path(dest)
    dst.mkdir(parents=True, exist_ok=True)
    for table in MANIFEST_TABLES:
        locs = pinned.table_locations(table)
        tdir = Path(getattr(pinned, table))
        out = dst / table
        if locs is None:
            if tdir.exists():
                _shutil.copytree(tdir, out, dirs_exist_ok=True)
            continue
        for loc in locs:
            src = Path(loc)
            tgt = out / src.name if "=" in src.name else out
            _shutil.copytree(src, tgt, dirs_exist_ok=True)
    if pinned.meta.exists():
        _shutil.copy2(pinned.meta, dst / "meta.json")
    return IndexPaths(dst, 0)


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


def make_doc_tokens_udf(
    cfg: EngineConfig, field_names: list[str], with_alt: bool = False
):
    """Per-DOCUMENT analysis + aggregation in ONE Arrow batch pass —
    the readable REFERENCE twin of the vectorized ``_make_doc_analyzer``
    the build actually runs (equivalence-tested in
    tests/test_index_build.py; also used by small CDC batches via
    the pandas-UDF path where batch sizes don't justify the
    vectorized machinery... kept primarily as executable spec).

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
    from ..functions.text import analyze_series, analyze_str

    fields = [
        (f.name, f.boost, f.boost_col)
        for f in cfg.fields
        if f.name in field_names
    ]
    # fields with a per-doc boost column, in field order — their
    # columns follow the field columns in the UDF argument list
    boosted = [i for i, (_, _, bc) in enumerate(fields) if bc]
    syn = dict(cfg.synonyms)
    procs = cfg.processors
    default_boost, iw = cfg.default_boost, cfg.importance_weight

    def run(*cols: pd.Series) -> pd.DataFrame:
        # column order: field columns, boost-override columns (for
        # fields with boost_col, in field order), [alt variants
        # list], importance
        imp = cols[-1].fillna(0.0).to_numpy(dtype=np.float64)
        n_f = len(fields)
        bseries = {
            fi: cols[n_f + j] for j, fi in enumerate(boosted)
        }
        alt_col = cols[n_f + len(boosted)] if with_alt else None
        per_field = [analyze_series(c, syn, procs) for c in cols[:n_f]]
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
            segments = []
            for fi, ((fname, fboost, _bc), toks_s) in enumerate(
                zip(fields, per_field)
            ):
                bs = bseries.get(fi)
                if bs is not None and not pd.isna(bs.iat[i]):
                    fboost = float(bs.iat[i])
                segments.append((toks_s.iat[i], fboost))
                if fi == 0 and alt_col is not None:
                    variants = alt_col.iat[i]
                    if variants is not None:
                        for v in variants:
                            # each variant weighted by its OWN length
                            segments.append(
                                (analyze_str(v or "", syn, procs), fboost)
                            )
            for toks, fboost in segments:
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


def _expand_synonyms(flat, rows, syn: dict[str, str]):
    """Inline, order-preserving synonym expansion over a flat Arrow
    token array (+ parallel row-id array). Applied on the DICTIONARY
    (unique values), not per token — a batch has thousands of uniques
    vs millions of tokens. Same semantics as ``synonymize_tokens``:
    each hit is replaced by its (possibly multi-word) target, in
    place."""
    import pyarrow as pa

    enc = flat.dictionary_encode()
    codes = enc.indices.to_numpy(zero_copy_only=False).astype(np.int64)
    uniq = enc.dictionary.to_pylist()
    # falsy targets keep the original token — the `if repl` check in
    # synonymize_tokens; '' .split(" ") would inject an empty token
    exp = [syn[u].split(" ") if syn.get(u) else [u] for u in uniq]
    if all(len(e) == 1 and e[0] == u for e, u in zip(exp, uniq)):
        return flat, rows
    rep_counts = np.array([len(e) for e in exp], dtype=np.int64)
    vals = pa.array([t for e in exp for t in e], type=pa.string())
    val_starts = np.concatenate(([0], np.cumsum(rep_counts)))
    per_tok = rep_counts[codes]
    out_rows = np.repeat(rows, per_tok)
    base = np.repeat(val_starts[codes], per_tok)
    within = np.arange(len(out_rows), dtype=np.int64) - np.repeat(
        np.cumsum(per_tok) - per_tok, per_tok
    )
    return vals.take(pa.array(base + within)), out_rows


def _apply_procs_flat(flat, ids, procs):
    """Apply the configured token-processor chain per contiguous
    id-run of a flat Arrow token array (+ parallel row/variant id
    array) — the Arrow analyzer's hook for ``cfg.token_processors``.
    Only runs when processors are configured (the default build never
    leaves Arrow); a processor sees one segment's ordered token list,
    exactly like ``analyze_str`` gives it."""
    import pyarrow as pa

    from ..functions.text import apply_processors

    toks = flat.to_pylist()
    out_t: list[str] = []
    out_i: list[int] = []
    i, n = 0, len(toks)
    while i < n:
        j = i
        rid = ids[i]
        while j < n and ids[j] == rid:
            j += 1
        new = apply_processors(toks[i:j], procs)
        out_t.extend(new)
        out_i.extend([rid] * len(new))
        i = j
    return pa.array(out_t, type=pa.string()), np.array(out_i, dtype=np.int64)


def _make_doc_analyzer(
    cfg: EngineConfig,
    fields: list[tuple[str, float]],
    alt_field: str | None = None,
):
    """mapInArrow analyzer: the fully-vectorized twin of
    ``make_doc_tokens_udf`` (kept as the readable reference — their
    outputs are equivalence-tested). Tokens are split JVM→Arrow→C++
    (``split_pattern_regex``), synonym-expanded on unique values only,
    aggregated per (doc, token) with one lexsort + reduceat, positions
    delta+varint-encoded in ONE flat pass, and the nested ``__an``
    output column is assembled as native Arrow buffers — no per-token
    Python objects in OR out (the list-of-dicts return path of the
    pandas UDF was most of the stage's CPU). Struct order within a doc
    is dictionary-code order, not first-occurrence order — no consumer
    depends on it (blocks and pairs both re-sort)."""
    from ..functions.text import fold_series

    syn = dict(cfg.synonyms)
    procs = cfg.processors
    db, iw = cfg.default_boost, cfg.importance_weight

    def run(batches):
        import pyarrow as pa
        import pyarrow.compute as pc

        for b in batches:
            n_rows = b.num_rows
            if n_rows == 0:
                continue
            names = list(b.schema.names)
            if "importance" in names:
                imp = np.nan_to_num(
                    b.column("importance").to_numpy(zero_copy_only=False)
                    .astype(np.float64),
                    nan=0.0,
                )
            else:
                imp = np.zeros(n_rows)
            row_parts, tok_parts, w_parts, pos_parts = [], [], [], []
            pos_base = np.zeros(n_rows, dtype=np.int64)

            def _emit(flat, rows0, w_tok, cnt_row):
                nonlocal pos_base
                # positions continue per row across segments; within a
                # segment the flattened order is row-major, so the
                # in-row offset is index-minus-row-start
                starts_r = np.cumsum(cnt_row) - cnt_row
                pos_in = np.arange(len(rows0), dtype=np.int64) - np.repeat(
                    starts_r, cnt_row
                )
                row_parts.append(rows0)
                tok_parts.append(flat)
                w_parts.append(w_tok)
                pos_parts.append(pos_base[rows0] + pos_in)
                pos_base = pos_base + cnt_row

            def _alt_segment(bvals):
                # list-valued label variants (≙ reference list-value
                # name, index_document): each variant weighted by ITS
                # OWN token count (x the owning row's field boost);
                # tokens appended right after the primary field's
                col = b.column(alt_field)
                if isinstance(col, pa.ChunkedArray):
                    col = col.combine_chunks()
                ll = (
                    pc.list_value_length(col).fill_null(0)
                    .to_numpy(zero_copy_only=False).astype(np.int64)
                )
                vrow = np.repeat(np.arange(n_rows, dtype=np.int64), ll)
                if len(vrow) == 0:
                    return
                folded = fold_series(col.flatten().to_pandas())
                sp = pc.split_pattern_regex(
                    pa.array(folded, type=pa.string()), "[^a-z0-9_]+"
                )
                counts_v = pc.list_value_length(sp).fill_null(0).to_numpy(
                    zero_copy_only=False
                ).astype(np.int64)
                flat = _one_chunk(sp.flatten())
                vid0 = np.repeat(
                    np.arange(len(vrow), dtype=np.int64), counts_v
                )
                ne = np.flatnonzero(
                    pc.not_equal(flat, "").to_numpy(zero_copy_only=False)
                )
                flat = flat.take(pa.array(ne))
                vid0 = vid0[ne]
                if syn and len(vid0):
                    flat, vid0 = _expand_synonyms(flat, vid0, syn)
                if procs and len(vid0):
                    flat, vid0 = _apply_procs_flat(flat, vid0, procs)
                cnt_v = np.bincount(vid0, minlength=len(vrow))
                w_v = np.zeros(len(vrow))
                nzv = cnt_v > 0
                w_v[nzv] = db / cnt_v[nzv] * bvals[vrow][nzv]
                rows0 = vrow[vid0]
                cnt_row = np.bincount(rows0, minlength=n_rows)
                _emit(flat, rows0, w_v[vid0], cnt_row)

            for fi, (fname, fboost, bcol) in enumerate(fields):
                # per-doc boost override column (≙ callable boost)
                if bcol and bcol in names:
                    bvals = (
                        b.column(bcol).to_pandas()
                        .astype("float64").fillna(fboost)
                        .to_numpy(dtype=np.float64)
                    )
                else:
                    bvals = np.full(n_rows, float(fboost))
                folded = fold_series(b.column(fname).to_pandas())
                sp = pc.split_pattern_regex(
                    pa.array(folded, type=pa.string()), "[^a-z0-9_]+"
                )
                counts = pc.list_value_length(sp).fill_null(0).to_numpy(
                    zero_copy_only=False
                ).astype(np.int64)
                flat = _one_chunk(sp.flatten())
                rows0 = np.repeat(np.arange(n_rows, dtype=np.int64), counts)
                ne = np.flatnonzero(
                    pc.not_equal(flat, "").to_numpy(zero_copy_only=False)
                )
                flat = flat.take(pa.array(ne))
                rows0 = rows0[ne]
                if syn and len(rows0):
                    flat, rows0 = _expand_synonyms(flat, rows0, syn)
                if procs and len(rows0):
                    flat, rows0 = _apply_procs_flat(flat, rows0, procs)
                counts_f = np.bincount(rows0, minlength=n_rows)
                w_row = np.zeros(n_rows)
                nz = counts_f > 0
                w_row[nz] = db / counts_f[nz] * bvals[nz]
                _emit(flat, rows0, w_row[rows0], counts_f)
                if fi == 0 and alt_field is not None and alt_field in names:
                    _alt_segment(bvals)
            rows_all = (
                np.concatenate(row_parts)
                if row_parts
                else np.empty(0, dtype=np.int64)  # no field columns
            )
            dl = pos_base.astype(np.int32)
            if len(rows_all) == 0:
                empty_struct = pa.array(
                    [],
                    type=pa.struct(
                        [
                            ("token", pa.string()),
                            ("tf", pa.int32()),
                            ("pos_bin", pa.binary()),
                            ("boost", pa.float32()),
                        ]
                    ),
                )
                toks_list = pa.ListArray.from_arrays(
                    pa.array(np.zeros(n_rows + 1, dtype=np.int32)),
                    empty_struct,
                )
                an = pa.StructArray.from_arrays(
                    [toks_list, pa.array(dl, type=pa.int32())],
                    names=["toks", "dl"],
                )
                yield pa.RecordBatch.from_arrays(
                    list(b.columns) + [an], names=names + ["__an"]
                )
                continue
            tok_all = pa.concat_arrays(
                [t.cast(pa.string()) for t in tok_parts]
            )
            w_all = np.concatenate(w_parts)
            pos_all = np.concatenate(pos_parts)
            enc = tok_all.dictionary_encode()
            codes = enc.indices.to_numpy(zero_copy_only=False).astype(np.int64)
            dic = enc.dictionary
            order = np.lexsort((pos_all, codes, rows_all))
            r_s = rows_all[order]
            c_s = codes[order]
            w_s = w_all[order]
            p_s = pos_all[order]
            change = np.ones(len(r_s), dtype=bool)
            if len(r_s) > 1:
                change[1:] = (r_s[1:] != r_s[:-1]) | (c_s[1:] != c_s[:-1])
            gstarts = np.flatnonzero(change)
            gends = np.append(gstarts[1:], len(r_s))
            g_row = r_s[gstarts]
            tf = (gends - gstarts).astype(np.int32)
            boost = (
                np.maximum.reduceat(w_s, gstarts) + imp[g_row] * iw
            ).astype(np.float32)
            deltas = p_s.copy()
            deltas[1:] -= p_s[:-1]
            deltas[gstarts] = p_s[gstarts]
            buf, bcum = varint_encode_offsets(deltas.astype(np.uint64))
            pos_offsets = np.concatenate(
                (np.zeros(1, dtype=np.int64), bcum[gends])
            )
            per_doc = np.bincount(g_row, minlength=n_rows)
            offsets = np.concatenate(
                (np.zeros(1, dtype=np.int64), np.cumsum(per_doc))
            ).astype(np.int32)
            struct = pa.StructArray.from_arrays(
                [
                    dic.take(pa.array(c_s[gstarts])).cast(pa.string()),
                    pa.array(tf, type=pa.int32()),
                    _binary_from(np.frombuffer(buf, dtype=np.uint8), pos_offsets),
                    pa.array(boost, type=pa.float32()),
                ],
                names=["token", "tf", "pos_bin", "boost"],
            )
            toks_list = pa.ListArray.from_arrays(pa.array(offsets), struct)
            an = pa.StructArray.from_arrays(
                [toks_list, pa.array(dl, type=pa.int32())],
                names=["toks", "dl"],
            )
            yield pa.RecordBatch.from_arrays(
                list(b.columns) + [an], names=names + ["__an"]
            )

    return run


def field_null_violation(docs: DataFrame, cfg: EngineConfig):
    """Boolean Column: true for docs violating a ``null=False`` field
    constraint (≙ reference FieldSpec ``null`` key,
    addok/helpers/index.py:121-141 via config FIELDS: a document
    whose required field is missing/empty is not indexed at all).
    Null / empty-after-trim strings violate; for array-valued fields,
    null or no non-blank element violates. Returns None when every
    configured field allows null (the default) — callers skip the
    filter entirely, so the scan predicate only exists when asked
    for."""
    pred = None
    for f in cfg.fields:
        if f.allow_null or f.name not in docs.columns:
            continue
        col = F.col(f.name)
        if isinstance(docs.schema[f.name].dataType, T.ArrayType):
            ok = col.isNotNull() & (
                F.size(
                    F.filter(
                        col,
                        lambda x: x.isNotNull()
                        & (F.length(F.trim(x.cast("string"))) > 0),
                    )
                )
                > 0
            )
        else:
            ok = col.isNotNull() & (
                F.length(F.trim(col.cast("string"))) > 0
            )
        viol = ~ok
        pred = viol if pred is None else (pred | viol)
    return pred


def enforce_field_nulls(docs: DataFrame, cfg: EngineConfig) -> DataFrame:
    """Drop documents violating ``allow_null=False`` field specs
    before id assignment (bulk build path)."""
    pred = field_null_violation(docs, cfg)
    return docs if pred is None else docs.filter(~pred)


def materialize_callable_boosts(
    docs: DataFrame, cfg: EngineConfig
) -> tuple[DataFrame, EngineConfig]:
    """Evaluate callable FIELDS boosts (reference ``boost(doc)``,
    helpers/index.py:121-141 via tests/test_index_utils.py:247-263)
    into generated per-document columns and rewrite the specs onto
    the vectorized ``boost_col`` path.

    The callable receives the document as a dict of the source
    columns (reference parity: it sees the raw doc, not the analyzed
    form). Evaluation is an Arrow-batched pandas UDF — the per-row
    Python call is inherent to a Python-callable knob, but it runs
    once per document at build time, stays off the posting hot path,
    and adds no shuffle. Lambdas from ``--config`` modules work
    because the UDF closure is cloudpickled."""
    import dataclasses

    if not any(f.boost_fn for f in cfg.fields):
        return docs, cfg
    src_cols = [c for c in docs.columns if not c.startswith("__")]
    new_fields = []
    for f in cfg.fields:
        if not f.boost_fn or f.name not in docs.columns:
            new_fields.append(f)
            continue
        colname = f"__boost_fn_{f.name}"

        def _make(fn, fname):
            def _eval(batch: pd.DataFrame) -> pd.Series:
                # reference parity: the callable sees a plain doc dict
                # — null numeric fields must arrive as None, not NaN
                # (NaN is truthy and propagates through arithmetic,
                # silently poisoning the doc's posting weights)
                clean = batch.astype(object).where(batch.notna(), None)
                out = []
                for r in clean.to_dict("records"):
                    v = float(fn(r))
                    if v != v or v in (float("inf"), float("-inf")):
                        raise ValueError(
                            f"callable boost for field {fname!r} "
                            f"returned non-finite {v!r} for doc "
                            f"{r.get('conv_id', r)!r}"
                        )
                    out.append(v)
                return pd.Series(out, index=batch.index, dtype="float64")

            return _eval

        udf = F.pandas_udf(_make(f.boost_fn, f.name), "double")
        docs = docs.withColumn(colname, udf(F.struct(*src_cols)))
        new_fields.append(
            dataclasses.replace(f, boost_col=colname, boost_fn=None)
        )
    return docs, dataclasses.replace(cfg, fields=tuple(new_fields))


def analyze_docs(docs: DataFrame, cfg: EngineConfig) -> DataFrame:
    """docs → docs + ``__an`` struct (toks array + dl). One
    mapInArrow pass, no shuffle (see ``_make_doc_analyzer``)."""
    docs, cfg = materialize_callable_boosts(docs, cfg)
    field_specs = [
        (f.name, f.boost, f.boost_col)
        for f in cfg.fields
        if f.name in docs.columns
    ]
    alt = (
        cfg.alt_text_field
        if cfg.alt_text_field and cfg.alt_text_field in docs.columns
        else None
    )
    out_schema = T.StructType(
        list(docs.schema.fields) + [T.StructField("__an", DOC_TOKENS_TYPE)]
    )
    return docs.mapInArrow(
        _make_doc_analyzer(cfg, field_specs, alt_field=alt), out_schema
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


# packer output is keyed by the two token hashes, NOT the token
# string: the string never travels the posting shuffle or the Arrow
# crossing (measured: serializing 40M token strings into Python was
# ~55% of the block stage's CPU); build_blocks joins the strings back
# onto the ~1000x-smaller block rows afterward
BLOCK_ROW_SCHEMA = T.StructType(
    [
        T.StructField("g1", T.LongType()),
        T.StructField("g2", T.LongType()),
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
    from pyspark.sql.types import ArrayType

    fields = [f for f in cfg.filter_fields if f in docs.columns]
    if not fields:
        return None
    types = dict(docs.dtypes)

    def _vals(f):
        # ARRAY-valued filter fields index one f| posting per element
        # (≙ the reference's list-valued doc fields,
        # tests/test_search.py:436-445 test_filter_indexes_multiple_values)
        if isinstance(docs.schema[f].dataType, ArrayType):
            return F.explode(F.col(f)).alias("__raw")
        return F.col(f).alias("__raw")

    # values TRIMMED (empty-after-trim dropped) — the exact
    # normalization the query side applies when building f| keys and
    # the post-score predicate, so a value carrying stray whitespace
    # can never silently fail to match any filter
    parts = [
        docs.select("doc_index", _vals(f))
        .select(
            "doc_index", F.trim(F.col("__raw").cast("string")).alias("__v")
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


def _pa_block_schema():
    import pyarrow as pa

    return pa.schema(
        [
            ("g1", pa.int64()),
            ("g2", pa.int64()),
            ("bucket", pa.int64()),
            ("block_id", pa.int32()),
            ("n", pa.int32()),
            ("sum_tf", pa.int64()),
            ("max_tf", pa.int32()),
            ("max_boost", pa.float32()),
            ("min_doc", pa.int64()),
            ("max_doc", pa.int64()),
            ("docs_bin", pa.binary()),
            ("tfs_bin", pa.binary()),
            ("boosts_bin", pa.binary()),
            ("pos_bin", pa.binary()),
        ]
    )


def _binary_view(arr) -> tuple[np.ndarray, np.ndarray]:
    """(int64 value offsets rebased to 0, uint8 data window) of a
    pyarrow Binary/String array — null entries read as 0-length."""
    bufs = arr.buffers()
    off = np.frombuffer(bufs[1], dtype=np.int32)[
        arr.offset : arr.offset + len(arr) + 1
    ].astype(np.int64)
    if bufs[2] is None:
        return off - off[0], np.empty(0, dtype=np.uint8)
    data = np.frombuffer(bufs[2], dtype=np.uint8)[off[0] : off[-1]]
    return off - off[0], data


def _binary_from(data, offsets: np.ndarray):
    """Zero-copy pyarrow binary array over one flat buffer: value i =
    data[offsets[i]:offsets[i+1]] — no per-value bytes slicing."""
    import pyarrow as pa

    return pa.Array.from_buffers(
        pa.binary(),
        len(offsets) - 1,
        [None, pa.py_buffer(offsets.astype(np.int32).tobytes()), pa.py_buffer(data)],
    )


def _pack_sorted_window(
    schema, k, first_offset,
    g1, g2, bucket, docs, tfs, boosts, pos_off, pos_data,
    block_size, final,
):
    """Vectorized pack of one window of (hash,bucket,doc)-sorted
    posting rows (numpy views over the Arrow batch, prepended with any
    carried rows). Emits one RecordBatch of hash-keyed block rows;
    unless ``final``, the trailing incomplete block is returned as the
    new carry (posting blocks are independently decodable — each
    block's first doc delta is absolute — so complete blocks are
    emitted even when their run continues into the next batch).

    ``k`` = carried row count (always the head of run 0);
    ``first_offset`` = block_id offset for run 0 (continuation)."""
    import pyarrow as pa

    n = len(docs)
    change = np.empty(n, dtype=bool)
    change[0] = True
    if n > 1:
        change[1:] = (
            (g1[1:] != g1[:-1])
            | (g2[1:] != g2[:-1])
            | (bucket[1:] != bucket[:-1])
        )
    run_starts = np.flatnonzero(change)
    run_id = np.cumsum(change) - 1
    pos = np.arange(n, dtype=np.int64) - run_starts[run_id]
    starts = np.flatnonzero(change | (pos % block_size == 0))
    bids = (pos[starts] // block_size).astype(np.int32)
    if first_offset:
        bids[run_id[starts] == 0] += np.int32(first_offset)

    carry = None
    cut = n
    m = len(starts)
    if not final:
        key = (int(g1[-1]), int(g2[-1]), int(bucket[-1]))
        if n - starts[-1] < block_size:  # trailing block incomplete
            cut = int(starts[-1])
            m -= 1
            carry = {
                "key": key, "bid": int(bids[-1]),
                "docs": docs[cut:].copy(), "tfs": tfs[cut:].copy(),
                "boosts": boosts[cut:].copy(),
                "pos_off": (pos_off[cut:] - pos_off[cut]).copy(),
                "pos_data": pos_data[pos_off[cut] : pos_off[n]].copy(),
            }
        else:  # complete — emit it, carry only the continuation point
            carry = {
                "key": key, "bid": int(bids[-1]) + 1,
                "docs": docs[:0], "tfs": tfs[:0], "boosts": boosts[:0],
                "pos_off": np.zeros(1, dtype=np.int64),
                "pos_data": pos_data[:0],
            }
    if m == 0 or cut == 0:
        return None, carry
    starts = starts[:m]
    ends = np.append(starts[1:], cut)

    tfs_w = tfs[:cut]
    boosts_w = boosts[:cut].astype(np.float32, copy=False)
    d = docs[:cut].astype(np.uint64)
    deltas = d.copy()
    if cut > 1:
        deltas[1:] = d[1:] - d[:-1]
    deltas[starts] = d[starts]
    bounds = np.append(starts, cut)
    dbuf, dcum = varint_encode_offsets(deltas)
    tbuf, tcum = varint_encode_offsets(tfs_w.astype(np.uint64))

    rb = pa.RecordBatch.from_arrays(
        [
            pa.array(g1[starts], type=pa.int64()),
            pa.array(g2[starts], type=pa.int64()),
            pa.array(bucket[starts], type=pa.int64()),
            pa.array(bids[:m], type=pa.int32()),
            pa.array((ends - starts).astype(np.int32), type=pa.int32()),
            pa.array(np.add.reduceat(tfs_w.astype(np.int64), starts), type=pa.int64()),
            pa.array(np.maximum.reduceat(tfs_w, starts).astype(np.int32), type=pa.int32()),
            pa.array(np.maximum.reduceat(boosts_w, starts), type=pa.float32()),
            pa.array(docs[starts].astype(np.int64), type=pa.int64()),
            pa.array(docs[ends - 1].astype(np.int64), type=pa.int64()),
            _binary_from(dbuf, dcum[bounds]),
            _binary_from(tbuf, tcum[bounds]),
            _binary_from(boosts_w.tobytes(), 4 * bounds),
            _binary_from(pos_data[: pos_off[cut]], pos_off[bounds]),
        ],
        schema=schema,
    )
    return rb, carry


def _flush_carry(schema, carry, block_size):
    """Emit the carried partial block as its own one-block batch."""
    k = len(carry["docs"])
    if k == 0:
        return None
    key = carry["key"]
    rb, _ = _pack_sorted_window(
        schema, k,
        carry["bid"],
        np.full(k, key[0], dtype=np.int64),
        np.full(k, key[1], dtype=np.int64),
        np.full(k, key[2], dtype=np.int64),
        carry["docs"], carry["tfs"], carry["boosts"],
        carry["pos_off"], carry["pos_data"],
        block_size, final=True,
    )
    return rb


def _make_arrow_packer(block_size: int):
    """mapInArrow fn factory: walk sorted posting runs, emit packed
    block rows. Fully vectorized — run boundaries from the two int64
    hash columns, per-block aggregates via np.*.reduceat, binary
    payloads sliced zero-copy from one flat encode per batch. No
    pandas, no per-row Python objects (a 64M-row mapInPandas crossing
    boxes every token string; this path crosses Arrow buffers only)."""

    def pack(batches):
        carry = None
        schema = _pa_block_schema()
        for batch in batches:
            if batch.num_rows == 0:
                continue
            cols = dict(zip(batch.schema.names, batch.columns))
            g1 = cols["g1"].to_numpy()
            g2 = cols["g2"].to_numpy()
            bucket = cols["bucket"].to_numpy()
            docs = cols["doc_index"].to_numpy()
            tfs = cols["tf"].to_numpy()
            boosts = cols["boost"].to_numpy()
            pos_off, pos_data = _binary_view(cols["pos_bin"])
            k = 0
            first_offset = 0
            if carry is not None:
                if carry["key"] == (int(g1[0]), int(g2[0]), int(bucket[0])):
                    k = len(carry["docs"])
                    first_offset = carry["bid"]
                    if k:
                        key = carry["key"]
                        g1 = np.concatenate([np.full(k, key[0], dtype=g1.dtype), g1])
                        g2 = np.concatenate([np.full(k, key[1], dtype=g2.dtype), g2])
                        bucket = np.concatenate(
                            [np.full(k, key[2], dtype=bucket.dtype), bucket]
                        )
                        docs = np.concatenate([carry["docs"], docs])
                        tfs = np.concatenate([carry["tfs"], tfs])
                        boosts = np.concatenate([carry["boosts"], boosts])
                        clen = carry["pos_off"][-1]
                        pos_data = np.concatenate([carry["pos_data"], pos_data])
                        pos_off = np.concatenate(
                            [carry["pos_off"][:-1], pos_off + clen]
                        )
                else:
                    rb = _flush_carry(schema, carry, block_size)
                    if rb is not None:
                        yield rb
                carry = None
            rb, carry = _pack_sorted_window(
                schema, k, first_offset,
                g1, g2, bucket, docs, tfs, boosts, pos_off, pos_data,
                block_size, final=False,
            )
            if rb is not None:
                yield rb
        if carry is not None:
            rb = _flush_carry(schema, carry, block_size)
            if rb is not None:
                yield rb

    return pack


def build_blocks(
    token_doc: DataFrame, cfg: EngineConfig, tokens: DataFrame | None = None
) -> DataFrame:
    """(doc_index, token, tf, pos_bin, boost) -> packed block rows.

    External **sort-merge** posting assembly (north_star): one shuffle
    keyed (token-hash, bucket) + Spark's spill-safe external sort — no
    collect_list hash-agg (which anti-scales under per-task agg
    memory pressure at high thread counts). A vectorized mapInArrow
    packer walks each sorted run (see _make_arrow_packer); only a
    trailing incomplete block is carried across Arrow batches. Task
    memory is bounded by one (token,bucket) group <= 2^bits postings
    no matter how hot the token — the doc-range bucket IS the salt.

    The token STRING never enters the shuffle or the Arrow crossing:
    rows are keyed by two independent JVM-computed xxhash64 columns
    (long sort beats string sort; serializing 40M strings into Python
    was ~55% of the stage's CPU). The packer emits hash-keyed block
    rows; token strings are joined back onto the ~1000x-smaller block
    table from ``tokens`` (a cheap distinct-token source — pass the
    nested-pruned analyzed scan; defaults to token_doc itself), then
    rows are re-sorted by token within partitions so parquet row
    groups keep tight token min/max for IN-list pruning. Two distinct
    tokens colliding on BOTH 64-bit hashes (≈2^-128 birthday-paired
    over the vocabulary) would merge runs — same risk class the run
    detection always had.
    """
    block_size = cfg.posting_block_size
    pshift = cfg.pbucket_shift
    arranged = (
        token_doc.withColumn(
            "bucket", F.shiftright("doc_index", cfg.doc_bucket_bits)
        )
        .withColumn("g1", F.xxhash64("token"))
        .withColumn("g2", F.xxhash64(F.lit(1), "token"))
        .drop("token")
        .repartition(cfg.build_partitions, "g1", "bucket")
        .sortWithinPartitions("g1", "g2", "bucket", "doc_index")
    )
    packed = arranged.mapInArrow(_make_arrow_packer(block_size), BLOCK_ROW_SCHEMA)
    tok_src = tokens if tokens is not None else token_doc.select("token")
    tok_map = tok_src.distinct().select(
        "token",
        F.xxhash64("token").alias("g1"),
        F.xxhash64(F.lit(1), "token").alias("g2"),
    )
    return (
        packed.join(tok_map, ["g1", "g2"])
        .drop("g1", "g2")
        .select("token", *[f.name for f in BLOCK_ROW_SCHEMA.fields[2:]])
        .withColumn("pbucket", F.shiftright("bucket", pshift))
        .sortWithinPartitions("token", "bucket", "block_id")
    )


# spark-side schemas for the local-pack path: per-partition RUN rows
# (no block_id — chunking happens at merge) and the final token-keyed
# block rows
RUN_ROW_SCHEMA = T.StructType(
    [
        T.StructField("token", T.StringType()),
        T.StructField("bucket", T.LongType()),
    ]
    + [f for f in BLOCK_SCHEMA.elementType.fields if f.name != "block_id"]
)
TOKEN_BLOCK_ROW_SCHEMA = T.StructType(
    [
        T.StructField("token", T.StringType()),
        T.StructField("bucket", T.LongType()),
    ]
    + list(BLOCK_SCHEMA.elementType.fields)
)


def _pa_token_block_schema():
    import pyarrow as pa

    return pa.schema([("token", pa.string())] + list(_pa_block_schema())[2:])


def _make_local_run_packer(doc_bucket_bits: int, filter_fields: list[str]):
    """mapInArrow fn factory for the MAP side of the local-pack block
    build: consumes nested analyzed doc rows (doc_index, toks
    list<struct>, filter columns) straight off the columnar parquet
    scan — the cheap Arrow path; measured ~4.5x cheaper per posting
    than crossing exploded rows out of a row pipeline — and emits one
    RUN row per (token, bucket) per batch: all of the batch's postings
    for that key, doc-sorted and payload-packed. Filter-set tokens
    (``f|field|value``, tf=1, no positions) are synthesized here with
    the same trim semantics as ``filter_token_rows``. Run rows are
    ~100-1000x fewer than posting rows, so the posting shuffle and
    the reduce-side Arrow crossing shrink by the same factor."""

    def pack(batches):
        import pyarrow as pa
        import pyarrow.compute as pc

        hash_schema = _pa_block_schema()
        run_schema = _pa_run_schema()
        for b in batches:
            if b.num_rows == 0:
                continue
            cols = dict(zip(b.schema.names, b.columns))
            docs = cols["doc_index"].to_numpy()
            toks = cols["toks"]
            counts = pc.list_value_length(toks).fill_null(0).to_numpy(
                zero_copy_only=False
            ).astype(np.int64)
            flat = toks.flatten()
            tok_arrs = [flat.field("token")]
            doc_parts = [np.repeat(docs, counts)]
            tf_parts = [
                flat.field("tf").to_numpy(zero_copy_only=False).astype(np.int64)
            ]
            boost_parts = [
                flat.field("boost").to_numpy(zero_copy_only=False).astype(np.float32)
            ]
            pos_arrs = [flat.field("pos_bin")]
            for f in filter_fields:
                # values arrive ALREADY Spark-cast + trimmed (the
                # caller projects F.trim(col.cast("string")) JVM-side
                # — Arrow's cast formats non-string values differently
                # from Spark's, e.g. 1.0 → "1" vs "1.0", which would
                # silently break f| key parity with the query side).
                # Array-valued fields arrive as list<string>: one f|
                # posting per element.
                sv = cols[f]
                if pa.types.is_list(sv.type):
                    fcounts = pc.list_value_length(sv).fill_null(0).to_numpy(
                        zero_copy_only=False
                    ).astype(np.int64)
                    fdocs = np.repeat(docs, fcounts)
                    sv = _one_chunk(sv.flatten())
                else:
                    fdocs = docs
                keep = pc.and_kleene(pc.is_valid(sv), pc.not_equal(sv, ""))
                idx = np.flatnonzero(
                    keep.to_numpy(zero_copy_only=False) == True  # noqa: E712
                )
                if idx.size == 0:
                    continue
                fvals = sv.take(pa.array(idx))
                tok_arrs.append(
                    pc.binary_join_element_wise(
                        pa.scalar(f"f|{f}|"), fvals, pa.scalar("")
                    )
                )
                doc_parts.append(fdocs[idx])
                tf_parts.append(np.ones(idx.size, dtype=np.int64))
                boost_parts.append(np.zeros(idx.size, dtype=np.float32))
                pos_arrs.append(
                    pa.array([b""] * idx.size, type=pa.binary())
                )
            tok_all = pa.concat_arrays(
                [a.cast(pa.string()) for a in tok_arrs]
            )
            if len(tok_all) == 0:
                continue
            enc = tok_all.dictionary_encode()
            codes = enc.indices.to_numpy(zero_copy_only=False).astype(np.int64)
            dic = enc.dictionary
            doc_all = np.concatenate(doc_parts)
            tf_all = np.concatenate(tf_parts)
            boost_all = np.concatenate(boost_parts)
            pos_all = pa.concat_arrays([a.cast(pa.binary()) for a in pos_arrs])
            order = np.lexsort((doc_all, codes))
            docs_s = doc_all[order]
            pos_off, pos_data = _binary_view(pos_all.take(pa.array(order)))
            rb, _ = _pack_sorted_window(
                hash_schema, 0, 0,
                codes[order], codes[order],
                docs_s >> np.int64(doc_bucket_bits),
                docs_s, tf_all[order], boost_all[order],
                pos_off, pos_data,
                1 << 30, final=True,  # block_size ∞ → one row per run
            )
            if rb is None:
                continue
            tok_out = dic.take(rb.column("g1"))
            yield pa.RecordBatch.from_arrays(
                [tok_out.cast(pa.string()), rb.column("bucket")]
                + [rb.column(i) for i in range(4, rb.num_columns)],
                schema=run_schema,
            )

    return pack


def _pa_run_schema():
    import pyarrow as pa

    return pa.schema(
        [("token", pa.string())]
        + [f for f in _pa_block_schema() if f.name not in ("g1", "g2", "block_id")]
    )


def _one_chunk(col):
    """ChunkedArray | Array → single contiguous Array (pyarrow's
    combine_chunks return type differs across versions)."""
    if hasattr(col, "num_chunks"):  # ChunkedArray
        col = col.combine_chunks()
        if hasattr(col, "num_chunks"):  # older pyarrow: still chunked
            col = col.chunk(0)
    return col


def _make_run_merge_packer(block_size: int):
    """mapInArrow fn factory for the REDUCE side of the local-pack
    block build: consumes RUN rows sorted by (token, bucket, min_doc)
    within partitions, decodes each (token, bucket) group's runs
    (fully vectorized: segmented-cumsum delta decode, varint
    continuation-bit scan for per-posting position byte boundaries),
    re-sorts postings by doc (input partitions need not cover
    contiguous doc ranges — file splits/merges can interleave), and
    re-chunks through the SAME `_pack_sorted_window` machinery the
    exploded path uses — so the final block rows are bit-identical to
    `build_blocks` output (asserted in tests). Groups are buffered to
    completion before decode (memory bound: one (token,bucket) group
    ≤ 2^doc_bucket_bits postings)."""
    inner = _make_arrow_packer(block_size)

    def merge(batches):
        import pyarrow as pa
        import pyarrow.compute as pc

        out_schema = _pa_token_block_schema()
        gid_tokens: list[str] = []

        def decode(t: "pa.Table"):
            """Complete-group run rows → one doc-sorted posting batch."""
            tok = _one_chunk(t.column("token"))
            bucket = t.column("bucket").to_numpy()
            n = t.column("n").to_numpy().astype(np.int64)
            # group boundaries over sorted (token, bucket) rows
            nr = len(n)
            change = np.ones(nr, dtype=bool)
            if nr > 1:
                neq_tok = pc.not_equal(
                    tok.slice(1), tok.slice(0, nr - 1)
                ).to_numpy(zero_copy_only=False)
                change[1:] = neq_tok | (bucket[1:] != bucket[:-1])
            gstarts = np.flatnonzero(change)
            gid0 = len(gid_tokens)
            for i in gstarts:
                gid_tokens.append(tok[int(i)].as_py())
            gid_runs = gid0 + np.cumsum(change) - 1
            # --- payload decode (all runs at once) ---
            doff, ddata = _binary_view(_one_chunk(t.column("docs_bin")))
            d = varint_decode(ddata)
            ends = np.cumsum(n)
            starts = ends - n
            c = np.cumsum(d, dtype=np.uint64)
            base = c[starts] - d[starts]
            docs = (c - np.repeat(base, n)).astype(np.int64)
            toff, tdata = _binary_view(_one_chunk(t.column("tfs_bin")))
            tfs = varint_decode(tdata).astype(np.int64)
            boff, bdata = _binary_view(_one_chunk(t.column("boosts_bin")))
            boosts = np.frombuffer(bdata.tobytes(), dtype=np.float32)
            poff, pdata = _binary_view(_one_chunk(t.column("pos_bin")))
            # per-posting position byte boundaries from varint
            # continuation bits. tf == #positions for word tokens;
            # filter (f|) runs carry tf=1 with EMPTY positions, so
            # zero their effective varint count first.
            eff_tf = tfs.copy()
            # poff is per-RUN (nr+1 offsets); starts/ends index POSTINGS
            empty_runs = np.flatnonzero(np.diff(poff) == 0)
            for i in empty_runs:
                eff_tf[starts[i]:ends[i]] = 0
            vends = np.concatenate(
                (
                    np.zeros(1, dtype=np.int64),
                    np.flatnonzero((pdata & 0x80) == 0) + 1,
                )
            )
            idx = np.cumsum(eff_tf)
            pend_b = vends[idx]  # per-posting END byte; starts are
            # the previous posting's end (streams are contiguous), so
            # offsets = [0] ++ pend_b
            # posting-level group / bucket columns
            gid_post = np.repeat(gid_runs, n)
            bucket_post = np.repeat(bucket, n)
            # doc re-sort within groups (stable; handles interleaved
            # doc ranges from non-contiguous map partitions)
            order = np.lexsort((docs, gid_post))
            # rebuild contiguous per-posting pos buffers in doc order
            pos_sorted = _binary_from(
                pdata,
                np.concatenate((np.zeros(1, dtype=np.int64), pend_b)),
            ).take(pa.array(order))
            return pa.RecordBatch.from_arrays(
                [
                    pa.array(gid_post[order], type=pa.int64()),
                    pa.array(gid_post[order], type=pa.int64()),
                    pa.array(bucket_post[order], type=pa.int64()),
                    pa.array(docs[order], type=pa.int64()),
                    pa.array(tfs[order], type=pa.int32()),
                    pa.array(boosts[order], type=pa.float32()),
                    pos_sorted,
                ],
                names=["g1", "g2", "bucket", "doc_index", "tf", "boost", "pos_bin"],
            )

        def posting_batches():
            buf = None
            for rb in batches:
                if rb.num_rows == 0:
                    continue
                t = pa.table(rb)
                if buf is not None:
                    t = pa.concat_tables([buf, t]).combine_chunks()
                nr = t.num_rows
                tok = _one_chunk(t.column("token"))
                bucket = t.column("bucket").to_numpy()
                last_start = 0
                if nr > 1:
                    neq = pc.not_equal(
                        tok.slice(1), tok.slice(0, nr - 1)
                    ).to_numpy(zero_copy_only=False)
                    bounds = np.flatnonzero(neq | (bucket[1:] != bucket[:-1])) + 1
                    last_start = int(bounds[-1]) if len(bounds) else 0
                if last_start > 0:
                    yield decode(t.slice(0, last_start))
                buf = t.slice(last_start)
            if buf is not None and buf.num_rows:
                yield decode(buf)

        # gid→token lookup built INCREMENTALLY (convert only tokens
        # added since the last output batch — rebuilding the whole
        # array per batch is O(groups × batches))
        tok_chunks: list = []
        converted = 0
        for rb in inner(posting_batches()):
            if len(gid_tokens) > converted:
                tok_chunks.append(
                    pa.array(gid_tokens[converted:], type=pa.string())
                )
                converted = len(gid_tokens)
            toks = _one_chunk(
                pa.chunked_array(tok_chunks).take(rb.column("g1"))
            )
            yield pa.RecordBatch.from_arrays(
                [toks, rb.column("bucket")]
                + [rb.column(i) for i in range(3, rb.num_columns)],
                schema=out_schema,
            )

    return merge


def build_blocks_from_analyzed(analyzed: DataFrame, cfg: EngineConfig) -> DataFrame:
    """Bulk-path block build: LOCAL PACK then MERGE (the classic
    local-index/merge shape). The map side crosses nested analyzed doc
    rows into Python straight off the columnar parquet scan and packs
    per-batch (token, bucket) runs; only compressed run rows travel
    the shuffle (~3x fewer bytes, ~100x fewer rows than raw postings);
    the reduce side decodes, doc-sorts, and re-chunks groups into
    block rows BIT-IDENTICAL to `build_blocks` (equivalence asserted
    in tests/test_index_build.py; golden posting-state tests cover the
    full build). `build_blocks` remains the path for CDC micro-batches
    where inputs are already exploded posting rows."""
    from pyspark.sql.types import ArrayType

    filter_fields = [f for f in cfg.filter_fields if f in analyzed.columns]

    def _fcol(f):
        # filter values normalized JVM-side (Spark cast + trim — the
        # same ops filter_token_rows and the query-side key builder
        # use), so the packer sees canonical strings; array-valued
        # fields arrive as list<string> and flatten in the packer
        if isinstance(analyzed.schema[f].dataType, ArrayType):
            return F.transform(
                F.col(f), lambda x: F.trim(x.cast("string"))
            ).alias(f)
        return F.trim(F.col(f).cast("string")).alias(f)

    src = analyzed.select(
        "doc_index",
        F.col("__an.toks").alias("toks"),
        *[_fcol(f) for f in filter_fields],
    )
    runs = src.mapInArrow(
        _make_local_run_packer(cfg.doc_bucket_bits, filter_fields),
        RUN_ROW_SCHEMA,
    )
    return (
        runs.repartition(cfg.build_partitions, "token", "bucket")
        .sortWithinPartitions("token", "bucket", "min_doc")
        .mapInArrow(
            _make_run_merge_packer(cfg.posting_block_size),
            TOKEN_BLOCK_ROW_SCHEMA,
        )
        .withColumn("pbucket", F.shiftright("bucket", cfg.pbucket_shift))
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
            "max_boost",
            F.explode(
                edge_ngrams_col("token", cfg.min_edge_ngram, cfg.max_edge_ngram)
            ).alias("prefix"),
        )
        # df AND max_boost denormalized per candidate (≙ ZCARD +
        # ZREVRANGE max used by order_by_frequency / order_by_max_
        # score.lua) so autocomplete planning needs no second
        # dictionary probe; partition key = hash of the TOKEN: all of
        # a token's prefix rows land in one bucket, so a CDC batch
        # rewrites exactly the buckets of its changed tokens
        # (incremental.py)
        .select(
            "prefix", "token", "df", "max_boost",
            F.pmod(
                F.xxhash64("token"), F.lit(cfg.prefix_hash_buckets)
            ).cast("int").alias("pfx_bucket"),
        )
    )


def _expand_pairs(per_doc: DataFrame) -> DataFrame:
    """(pbucket, toks sorted-distinct array) → distinct (pbucket,
    token_a, token_b) with token_a < token_b, via a codegen nested
    transform — no self-join shuffle at all (≙ PairsIndexer,
    addok/pairs.py:6-16). pbucket is the provenance partition key:
    pairs are distinct per pbucket (the global pair set is the union
    over partitions; consumers dedupe in the driver set), which is
    what makes the CDC pair refresh O(touched partitions) instead of
    a full corpus unpack."""
    return (
        per_doc.select(
            "pbucket",
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


def pairs_from_blocks(
    blocks_df: DataFrame, dictionary: DataFrame, cfg: EngineConfig
) -> DataFrame:
    """Co-occurrence pairs derived from posting BLOCKS (no text
    re-analysis): unpack doc ids per token, drop COMMON tokens (the
    Zipf head is small by construction → broadcast anti-join), regroup
    per doc, expand pairs (≙ PairsIndexer skipping commons,
    addok/pairs.py:6-16). This is the CDC path — after an incremental
    rewrite the blocks table is the truth and the analyzed scratch is
    stale; the bulk build uses ``pairs_from_analyzed`` (same result,
    one less shuffle)."""
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
    ).select(F.shiftright("doc_index", shift).alias("pbucket"), "toks")
    return _expand_pairs(per_doc)


def pairs_from_analyzed(
    analyzed: DataFrame, dictionary: DataFrame, cfg: EngineConfig
) -> DataFrame:
    """Bulk-build pairs derivation: the analyzed scratch already holds
    each doc's distinct tokens (``__an.toks``, one struct per distinct
    token), so the per-doc token set needs NO block unpack and NO
    regroup-by-doc shuffle — just an in-row projection. Commons (the
    Zipf head: bounded by tokens with df > COMMON_THRESHOLD, i.e. a
    stopword-sized set even at full corpus scale) are removed with a
    constant-folded literal array via ``array_except``. Produces the
    identical pair set to ``pairs_from_blocks`` (asserted in
    tests/test_index_build.py)."""
    commons = [
        r["token"]
        for r in dictionary.filter(F.col("df") > cfg.common_threshold)
        .select("token")
        .collect()
    ]
    shift = cfg.doc_bucket_bits + cfg.pbucket_shift
    # direct array-struct field extraction (NOT a lambda transform):
    # GetArrayStructFields is what nested-schema pruning understands —
    # a transform() lambda forces the scan to read the full token
    # structs incl. position binaries (measured 4× slower)
    toks = F.array_sort(F.col("__an.toks").getField("token"))
    if commons:
        toks = F.array_except(toks, F.array(*[F.lit(c) for c in commons]))
    per_doc = analyzed.select(
        F.shiftright("doc_index", shift).alias("pbucket"), toks.alias("toks")
    )
    return _expand_pairs(per_doc)


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
        root = Path(out_dir)
        base = IndexPaths(root)
        curv = base.current_version()
        # fresh dir → flat layout (version 0, tables under root).
        # rebuild over a VERSIONED index (a full reset after CDC
        # batches) → stage the whole build into the next snapshot dir
        # and publish atomically at the end, so concurrent readers of
        # the current snapshot never see the rebuild in progress
        self._publish_version: int | None = (
            curv + 1 if curv is not None else None
        )
        self.paths = (
            IndexPaths(root, self._publish_version)
            if self._publish_version is not None
            else base
        )
        self.paths.snapshot_root.mkdir(parents=True, exist_ok=True)
        if self._publish_version is not None:
            # a resume manifest from a DIFFERENT snapshot must not
            # skip stages of this one
            m = self._manifest()
            if m.get("build_version") != self._publish_version:
                self.paths.manifest.write_text(json.dumps(
                    {"stages": {}, "build_version": self._publish_version}
                ))
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

        scratch = str(self.paths.snapshot_root / "_analyzed")

        # stage 1: dense ids + per-doc analysis → ONE scratch parquet
        # (doc columns + nested token aggregates + dl). Intermediates
        # go to parquet, NOT .persist(): disk-backed stage checkpoints
        # are what makes the build resumable AND avoid the in-memory
        # cache contention that anti-scaled at high thread counts
        # (measured: cached pipeline 2× slower on local[32] than
        # local[8]; checkpointed stages scale).
        if not (resume and self._stage_done("analyzed")):
            docs, cached = assign_doc_ids(
                enforce_field_nulls(transcripts, cfg), cfg.build_partitions
            )
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

        # stage 3: posting blocks — local pack + merge off the
        # columnar scan (doc-range bucketing = order-preserving salt;
        # filter-set postings synthesized inside the local packer)
        if not (resume and self._stage_done("blocks")):
            blocks = build_blocks_from_analyzed(analyzed, cfg)
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
            # hash repartition (not range): the range sampler re-runs
            # the blocks-scan aggregation child; in-partition sort
            # keeps row-group token min/max tight for probe pruning
            self._write(
                partials.repartition(
                    cfg.build_partitions, "pbucket", "token"
                ).sortWithinPartitions("pbucket", "token"),
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
                .repartitionByRange(
                    cfg.build_partitions, "pfx_bucket", "prefix"
                )
                .sortWithinPartitions("pfx_bucket", "prefix"),
                self.paths.prefixes, "prefixes", partition_by="pfx_bucket",
            )

        # --- pair (co-occurrence) table, meaningful tokens only
        # (reference PairsIndexer skips commons, addok/pairs.py:6-16)
        if cfg.build_pairs and not (resume and self._stage_done("pairs")):
            # bulk path reads per-doc token sets straight from the
            # analyzed scratch (no block unpack / regroup shuffle);
            # CDC uses pairs_from_blocks on touched pbuckets
            pairs = pairs_from_analyzed(analyzed, dictionary, cfg)
            # HASH repartition, not repartitionByRange: the range
            # partitioner's sampling job re-executes the child, and
            # this child is the 700M-row pair expansion + distinct
            # (measured ~2x the stage). Files lose global token-range
            # clustering but stay (token_a, token_b)-sorted WITHIN
            # partitions, so the probes' IN-lists still prune row
            # groups on footer min/max — the part that matters.
            self._write(
                pairs.repartition(
                    cfg.build_partitions, "pbucket", "token_a"
                ).sortWithinPartitions("pbucket", "token_a", "token_b"),
                self.paths.pairs, "pairs", partition_by="pbucket",
            )

        # final metrics rollup
        meta = json.loads(self.paths.meta.read_text())
        meta["build_metrics"] = self.metrics["stages"]
        self.paths.meta.write_text(json.dumps(meta, indent=2))
        if self._publish_version is not None:
            # atomic cutover: readers switch snapshots only here
            IndexPaths(self.paths.root).publish(
                self._publish_version, keep=self.cfg.snapshot_keep
            )
        return self.paths


def build_index(
    spark: SparkSession,
    transcripts: DataFrame,
    cfg: EngineConfig,
    out_dir: str,
    resume: bool = True,
) -> IndexPaths:
    return IndexBuilder(spark, cfg, out_dir).build(transcripts, resume=resume)
