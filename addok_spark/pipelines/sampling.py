"""Deterministic sampling + sequence packing for training-data prep.

Two operations every LLM pretraining pipeline runs at corpus scale:

- ``stratified_sample``: per-stratum (e.g. per-language) subsampling
  with CONTENT-HASH Bernoulli selection instead of an RNG — the same
  row set comes back on every run, on any cluster size, under any
  partitioning (rebalancing corpora reproducibly is the point; an
  RNG-based sample() is neither stable across retries nor auditable).
  A row is kept iff the first 8 hex chars of ``md5(id)`` sort below
  the stratum's rate threshold; hex strings compare lexicographically
  = numerically, so the Spark plan and the DuckDB oracle use the
  identical predicate on identical md5 strings.

- ``pack_sequences``: concat-and-cut packing of documents into
  ~``budget``-token training sequences ("sequence packing"). Order
  must be deterministic but decorrelated from source order, and a
  global sort is a non-starter at 100 TB — so documents are first
  split into 16 independent hash buckets (first md5 hex char), then
  ordered by (md5, id) within the bucket, and a windowed running sum
  of token counts assigns ``pack_id = bucket || floor(start/budget)``.
  Each bucket packs in parallel; a document straddling a boundary
  belongs to the pack where it starts (concatenate-then-cut
  semantics). Both sides (Spark window, DuckDB window) compute the
  same fold.

Scale notes: both are one scan + (for packing) one bounded window per
hash bucket — no shuffle beyond the bucket repartition, no skew
(md5-uniform keys), map-side prunable columns.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

_HEX_SPACE = 16 ** 8


def rate_threshold(rate: float) -> str:
    """Hex threshold string for a keep-rate in [0, 1]: md5-prefix <
    threshold keeps ~rate of rows. 'g' sorts above every hex digit,
    so rate >= 1 keeps everything; '' keeps nothing."""
    if rate <= 0.0:
        return ""
    t = int(rate * _HEX_SPACE)
    if t >= _HEX_SPACE:
        return "g"
    return format(t, "08x")


def stratified_sample(
    df: DataFrame,
    id_col: str,
    stratum_col: str,
    rates: dict[str, float],
    default_rate: float = 0.0,
) -> DataFrame:
    """Keep each stratum at its configured rate, deterministically.

    ``rates`` maps stratum value → keep-rate; strata not listed use
    ``default_rate``. Selection key = md5 of the row id, so the
    sample is stable across runs, partitionings, and cluster sizes,
    and higher rates yield supersets of lower rates (same key space).
    """
    h = F.substring(F.md5(F.col(id_col).cast("string")), 1, 8)
    thr = F.lit(rate_threshold(default_rate))
    for value in sorted(rates):
        thr = F.when(
            F.col(stratum_col) == value, F.lit(rate_threshold(rates[value]))
        ).otherwise(thr)
    return (
        df.withColumn("_h", h)
        .where(F.col("_h") < thr)
        .select(id_col, stratum_col, F.col("_h").alias("sample_key"))
    )


def stratified_sample_sql(
    table: str,
    id_col: str,
    stratum_col: str,
    rates: dict[str, float],
    default_rate: float = 0.0,
) -> str:
    """DuckDB twin of ``stratified_sample`` (same md5 keys, same
    thresholds, same lexicographic predicate)."""
    branches = " ".join(
        f"WHEN {stratum_col} = '{v}' THEN '{rate_threshold(r)}'"
        for v, r in sorted(rates.items())
    )
    return f"""
WITH keyed AS (
  SELECT {id_col}, {stratum_col},
         substr(md5(cast({id_col} AS varchar)), 1, 8) AS sample_key,
         CASE {branches} ELSE '{rate_threshold(default_rate)}' END AS thr
  FROM {table}
)
SELECT {id_col}, {stratum_col}, sample_key
FROM keyed WHERE sample_key < thr
"""


def pack_sequences(
    df: DataFrame,
    id_col: str,
    text_col: str,
    budget: int,
) -> DataFrame:
    """Assign each document to a ~``budget``-token training pack.

    Deterministic hash order inside 16 independent buckets; windowed
    running sum of whitespace token counts; ``pack_id`` is the bucket
    plus the pack ordinal the document STARTS in (concat-then-cut).
    Returns (id, bucket, n_tokens, start_offset, pack_id).
    """
    md5 = F.md5(F.col(id_col).cast("string"))
    toks = F.size(
        F.filter(F.split(F.col(text_col), r"\s+"), lambda x: x != "")
    ).cast("long")
    w = (
        Window.partitionBy("bucket")
        .orderBy("sort_key", id_col)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        df.select(
            F.col(id_col),
            F.substring(md5, 1, 1).alias("bucket"),
            md5.alias("sort_key"),
            toks.alias("n_tokens"),
        )
        .withColumn(
            "start_offset",
            (F.sum("n_tokens").over(w) - F.col("n_tokens")).cast("long"),
        )
        .withColumn(
            "pack_id",
            F.concat_ws(
                "-", F.col("bucket"),
                F.floor(F.col("start_offset") / budget).cast("string"),
            ),
        )
        .select(id_col, "bucket", "n_tokens", "start_offset", "pack_id")
    )


def pack_sequences_sql(table: str, id_col: str, text_col: str, budget: int) -> str:
    """DuckDB twin of ``pack_sequences``."""
    return f"""
WITH t AS (
  SELECT {id_col},
         substr(md5(cast({id_col} AS varchar)), 1, 1) AS bucket,
         md5(cast({id_col} AS varchar)) AS sort_key,
         len(list_filter(regexp_split_to_array({text_col}, '\\s+'),
                         x -> x <> ''))::bigint AS n_tokens
  FROM {table}
)
SELECT {id_col}, bucket, n_tokens,
       (sum(n_tokens) OVER (PARTITION BY bucket ORDER BY sort_key, {id_col}
            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
        - n_tokens)::bigint AS start_offset,
       bucket || '-' || cast(floor(((sum(n_tokens) OVER (PARTITION BY bucket
            ORDER BY sort_key, {id_col}
            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)) - n_tokens)
            / {budget}) AS bigint) AS pack_id
FROM t
"""
