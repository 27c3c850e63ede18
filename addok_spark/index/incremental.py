"""Incremental index maintenance (CDC) + streaming ingestion.

Re-expresses the reference's per-document ``_action ∈ {index, update,
delete}`` path (``/root/reference/addok/ds.py:58-75``,
``addok/helpers/index.py:57-92`` index/deindex) as *bucket-granular
partition rewrites*:

- every posting block holds only docs from one doc-range bucket, and
  buckets are grouped into ``pbucket`` partition directories;
- an upsert/delete therefore invalidates exactly the pbuckets of the
  touched doc_indexes: those directories are recomputed from the
  (updated) docs partition and overwritten atomically (dynamic
  partition overwrite ≙ Iceberg ``REPLACE WHERE``); nothing else is
  read or written — the distributed analog of the reference's
  per-key ZREM/ZADD, but O(touched-bucket) instead of O(doc·token)
  round-trips;
- the token dictionary is re-derived from block *metadata* (no text
  re-analysis), so global df/cf stay exactly consistent after any
  sequence of actions — the invariant the reference's deindex tests
  assert (``tests/test_index_utils.py:94-167``).

New documents are appended to the tail of the doc_index space in
(conv_id, turn_idx) order, preserving the stable-ordering invariant
for all pre-existing docs. Updates keep their doc_index (same key →
same id), so posting order stays globally consistent.

``stream_transcripts`` wires the same apply_actions into Structured
Streaming via foreachBatch: exactly-once per micro-batch through the
streaming checkpoint + the manifest's applied-batch record.
"""

from __future__ import annotations

import json
from pathlib import Path

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..config import EngineConfig
from .build import (
    IndexPaths,
    build_blocks,
    dictionary_from_blocks,
    filter_token_rows,
    pairs_from_blocks,
    prefixes_from_dictionary,
    tokenize_docs,
)


def _with_pbucket(df: DataFrame, cfg: EngineConfig) -> DataFrame:
    return df.withColumn(
        "pbucket",
        F.shiftright("doc_index", cfg.doc_bucket_bits + cfg.pbucket_shift),
    )


def apply_actions(
    spark: SparkSession,
    paths: IndexPaths | str,
    changes: DataFrame,
    cfg: EngineConfig,
) -> dict:
    """Apply a batch of document actions to an existing index.

    ``changes``: transcripts columns + optional ``_action`` column
    (default "index"). Returns metrics {upserts, deletes,
    touched_pbuckets}.
    """
    paths = paths if isinstance(paths, IndexPaths) else IndexPaths(Path(paths))
    spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")

    if "_action" not in changes.columns:
        changes = changes.withColumn("_action", F.lit("index"))
    changes = changes.withColumn(
        "_action", F.coalesce(F.col("_action"), F.lit("index"))
    )
    # LAST action per key wins, deterministically: ordered by the
    # change-sequence column — explicit `_seq` if provided, else the
    # row timestamp `ts` — with `_action` as the final tiebreak so
    # equal-sequence batches still resolve identically across runs
    # (the reference processes actions strictly in stream order,
    # ds.py:67-70; a micro-batch must reproduce that order)
    from pyspark.sql.window import Window as _W

    seq = (
        F.col("_seq")
        if "_seq" in changes.columns
        else (F.col("ts") if "ts" in changes.columns else F.lit(0))
    )
    # final tiebreak: a deterministic payload digest, so two rows that
    # tie on BOTH (_seq, _action) — e.g. duplicate 'index' actions with
    # different text at the same _seq — still resolve identically
    # across runs (never by partition luck); the ordering is total
    payload_cols = [
        c for c in changes.columns
        if c not in ("conv_id", "turn_idx", "_seq")
    ]
    wseq = _W.partitionBy("conv_id", "turn_idx").orderBy(
        seq.desc(),
        F.col("_action").desc(),
        F.xxhash64(*[F.col(c).cast("string") for c in payload_cols]).desc(),
    )
    changes = (
        changes.withColumn("__rn", F.row_number().over(wseq))
        .filter(F.col("__rn") == 1)
        .drop("__rn", *(["_seq"] if "_seq" in changes.columns else []))
    )

    docs = spark.read.parquet(paths.docs)
    keyed = changes.select(
        "conv_id", "turn_idx", "_action",
        *[c for c in changes.columns if c not in ("conv_id", "turn_idx", "_action")],
    )
    existing = docs.select("conv_id", "turn_idx", "doc_index").join(
        F.broadcast(keyed.select("conv_id", "turn_idx")), ["conv_id", "turn_idx"],
        "left_semi",
    )

    deletes = keyed.filter(F.col("_action") == "delete")
    upserts = keyed.filter(F.col("_action") != "delete")

    # ids: updates keep their doc_index; new docs append after max
    upd = upserts.join(
        docs.select("conv_id", "turn_idx", "doc_index"),
        ["conv_id", "turn_idx"],
        "left",
    )
    max_id = docs.agg(F.max("doc_index")).collect()[0][0]
    max_id = -1 if max_id is None else int(max_id)
    new_rows = upd.filter(F.col("doc_index").isNull()).drop("doc_index")
    # small-batch id assignment via window (batches are micro-batches;
    # the bulk path is build_index's two-pass assigner)
    from pyspark.sql.window import Window

    w = Window.orderBy("conv_id", "turn_idx")
    new_rows = new_rows.withColumn(
        "doc_index", F.row_number().over(w).cast("long") + F.lit(max_id)
    )
    upserted = upd.filter(F.col("doc_index").isNotNull()).unionByName(new_rows)

    # touched pbuckets = buckets of deleted ∪ updated ∪ new doc ids
    touched_ids = (
        existing.select("doc_index")
        .unionByName(upserted.select("doc_index"))
        .distinct()
    )
    shift = cfg.doc_bucket_bits + cfg.pbucket_shift
    touched_pb = sorted(
        r["pb"]
        for r in touched_ids.select(
            F.shiftright("doc_index", shift).alias("pb")
        ).distinct().collect()
    )
    if not touched_pb:
        return {"upserts": 0, "deletes": 0, "touched_pbuckets": []}

    # rebuild the touched doc partitions: survivors + upserts
    doc_cols = [c for c in docs.columns if c not in ("dl", "pbucket")]
    survivors = (
        docs.filter(F.col("pbucket").isin(touched_pb))
        .join(
            F.broadcast(keyed.select("conv_id", "turn_idx")),
            ["conv_id", "turn_idx"],
            "left_anti",
        )
        .select(*doc_cols)
    )
    ups_cols = upserted
    if "importance" not in ups_cols.columns:
        ups_cols = ups_cols.withColumn("importance", F.lit(0.0))
    ups_cols = ups_cols.select(
        *[F.col(c) if c in ups_cols.columns else F.lit(None).alias(c) for c in doc_cols]
    )
    new_docs = survivors.unionByName(ups_cols)

    token_doc = tokenize_docs(new_docs, cfg)
    dl = token_doc.groupBy("doc_index").agg(F.sum("tf").cast("int").alias("dl"))
    docs_part = _with_pbucket(
        new_docs.join(dl, "doc_index", "left").fillna({"dl": 0}), cfg
    ).persist()
    docs_part.write.mode("overwrite").partitionBy("pbucket").parquet(paths.docs)

    # rebuild the touched posting partitions (incl. filter-set rows,
    # same union as the bulk build)
    frows = filter_token_rows(new_docs, cfg)
    if frows is not None:
        token_doc = token_doc.unionByName(frows)
    blocks = build_blocks(token_doc, cfg)
    blocks.write.mode("overwrite").partitionBy("pbucket").parquet(paths.blocks)

    # dynamic overwrite can't clear a partition that became EMPTY
    # (no rows written for it) — drop those dirs explicitly so a
    # full-bucket delete leaves no orphan postings (the reference's
    # deindex invariant, tests/test_index_utils.py:94-114)
    import shutil

    present = {
        r["pbucket"] for r in docs_part.select("pbucket").distinct().collect()
    }
    for pb in set(touched_pb) - present:
        for base in (paths.docs, paths.blocks):
            shutil.rmtree(Path(base) / f"pbucket={pb}", ignore_errors=True)
    docs_part.unpersist()

    # dictionary + prefixes re-derived from block metadata (cheap,
    # reads block stats only — no text re-analysis)
    dictionary = dictionary_from_blocks(spark.read.parquet(paths.blocks))
    dictionary.write.mode("overwrite").parquet(paths.dictionary)

    # pairs must not go stale (the relation round would use edges
    # from deleted docs / miss new docs'): either re-derive them —
    # exact, but a full block-unpack pass — or invalidate the dir so
    # the engine degrades to pairs=None (cfg.cdc_rebuild_pairs)
    if Path(paths.pairs).exists():
        if cfg.cdc_rebuild_pairs:
            # derived from blocks only (no self-read) → plain overwrite
            pairs_from_blocks(
                spark.read.parquet(paths.blocks),
                spark.read.parquet(paths.dictionary),
                cfg,
            ).write.mode("overwrite").parquet(paths.pairs)
        else:
            import shutil as _sh

            _sh.rmtree(paths.pairs, ignore_errors=True)
    prefixes_from_dictionary(
        spark.read.parquet(paths.dictionary), cfg
    ).write.mode("overwrite").parquet(paths.prefixes)

    # refresh meta (n_docs / avgdl) + lineage record
    docs_now = spark.read.parquet(paths.docs)
    n_docs = docs_now.count()
    sum_dl = docs_now.agg(F.sum("dl")).collect()[0][0] or 0
    meta = json.loads(paths.meta.read_text())
    meta["n_docs"] = int(n_docs)
    meta["avgdl"] = float(sum_dl) / max(n_docs, 1)
    n_up = upserted.count()
    n_del = deletes.count()
    meta.setdefault("applied_batches", []).append(
        {"upserts": n_up, "deletes": n_del, "touched_pbuckets": touched_pb}
    )
    paths.meta.write_text(json.dumps(meta, indent=2))
    return {"upserts": n_up, "deletes": n_del, "touched_pbuckets": touched_pb}


def stream_transcripts(
    spark: SparkSession,
    stream_df: DataFrame,
    paths: IndexPaths | str,
    cfg: EngineConfig,
    checkpoint_dir: str,
    trigger_once: bool = True,
):
    """Continuous ingestion: readStream → foreachBatch(apply_actions).

    The streaming checkpoint gives exactly-once micro-batches; each
    batch id is also recorded in meta.applied_batches (lineage)."""

    def process(batch_df: DataFrame, batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        apply_actions(spark, paths, batch_df, cfg)

    writer = (
        stream_df.writeStream.foreachBatch(process)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("append")
    )
    if trigger_once:
        writer = writer.trigger(availableNow=True)
    return writer.start()
