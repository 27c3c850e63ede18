"""Positional phrase matching over the packed posting blocks.

The reference has no phrase operator (Redis zsets carry no
positions); the Spark index stores per-posting position lists
(north_star: postings = docID, tf, positions), delta+varint packed
per block. This operator proves them out: find documents where the
query tokens appear as a CONSECUTIVE sequence.

Plan shape: conjunctive candidate join (same as Q1) restricted to the
query tokens → per-(doc, token) positions decoded from pos_bin (split
by the block's tf stream) → adjacency check, all inside one
mapInPandas over block rows + a groupBy — no driver-side loops.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..functions.text import analyze_str
from ..index.compress import unpack_deltas, varint_decode

POS_SCHEMA = T.StructType(
    [
        T.StructField("doc_index", T.ArrayType(T.LongType())),
        T.StructField("position", T.ArrayType(T.IntegerType())),
    ]
)


@F.pandas_udf(POS_SCHEMA)
def _unpack_positions(docs_bin: pd.Series, tfs_bin: pd.Series, pos_bin: pd.Series) -> pd.DataFrame:
    """Decode a block's position streams into FLAT parallel arrays
    (doc repeated per occurrence, absolute position) — all numpy, no
    per-posting Python objects. Per-posting delta streams are
    restored with one cumsum + a vectorized per-group offset reset
    (each posting's first delta is its absolute first position)."""
    doc_col, pos_col = [], []
    empty_i8, empty_i4 = np.empty(0, np.int64), np.empty(0, np.int32)
    for db, tb, pb in zip(docs_bin, tfs_bin, pos_bin):
        docs = unpack_deltas(bytes(db)).astype(np.int64)
        tfs = varint_decode(bytes(tb)).astype(np.int64)
        deltas = varint_decode(bytes(pb)).astype(np.int64)
        if not len(deltas):
            doc_col.append(empty_i8)
            pos_col.append(empty_i4)
            continue
        starts = np.cumsum(tfs) - tfs
        c = np.cumsum(deltas)
        # offset of posting j = running total just before its start;
        # subtracting it makes each posting's cumsum restart at its
        # own absolute first position
        off = np.zeros(len(tfs), dtype=np.int64)
        off[1:] = c[starts[1:] - 1]
        doc_col.append(np.repeat(docs, tfs))
        pos_col.append((c - np.repeat(off, tfs)).astype(np.int32))
    return pd.DataFrame({"doc_index": doc_col, "position": pos_col})


def phrase_match(engine, phrase: str, k: int = 10) -> DataFrame:
    """Documents containing the analyzed tokens of ``phrase`` at
    consecutive positions; returns (conv_id, turn_idx, text,
    n_occurrences) ordered by (n_occurrences desc, doc_index asc),
    top k."""
    spark = engine.spark
    toks = analyze_str(phrase, engine.cfg.synonyms, engine.cfg.processors)
    if not toks:
        return spark.createDataFrame(
            [], "conv_id string, turn_idx int, text string, n_occurrences long"
        )
    qdf = F.broadcast(
        spark.createDataFrame(
            [(t, i) for i, t in enumerate(toks)], "token string, offset int"
        )
    )
    hits = engine.blocks.filter(
        F.col("token").isin(sorted(set(toks)))
    ).join(qdf, "token")
    # bucket prune: all tokens must have blocks in the bucket
    buck = (
        hits.groupBy("bucket")
        .agg(F.countDistinct("token").alias("nt"))
        .filter(F.col("nt") >= len(set(toks)))
        .select("bucket")
    )
    pruned = hits.join(buck, "bucket", "left_semi")
    unp = pruned.select(
        "offset", _unpack_positions("docs_bin", "tfs_bin", "pos_bin").alias("u")
    )
    pos = unp.select(
        "offset",
        F.explode(
            F.arrays_zip(
                F.col("u.doc_index").alias("doc_index"),
                F.col("u.position").alias("position"),
            )
        ).alias("p"),
    ).select(
        "offset",
        F.col("p.doc_index").alias("doc_index"),
        # normalize: a token at position x matching query offset o
        # anchors a phrase starting at x - o
        (F.col("p.position") - F.col("offset")).alias("anchor"),
    )
    # per (doc, offset): the set of anchor starts; phrase occurs at
    # anchor a iff EVERY offset contributes a  →  count distinct
    # offsets per (doc, anchor) == n_tokens
    anchors = pos.dropDuplicates(["doc_index", "offset", "anchor"])
    matched = (
        anchors.groupBy("doc_index", "anchor")
        .agg(F.count(F.lit(1)).alias("no"))
        .filter(F.col("no") == len(toks))
        .groupBy("doc_index")
        .agg(F.count(F.lit(1)).cast("long").alias("n_occurrences"))
    )
    docs = engine.docs.select("doc_index", "conv_id", "turn_idx", "text")
    return (
        matched.join(docs, "doc_index")
        .orderBy(F.desc("n_occurrences"), F.asc("doc_index"))
        .select("conv_id", "turn_idx", "text", "n_occurrences")
        .limit(k)
    )
