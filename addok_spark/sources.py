"""Document sources (reference S1-S5) as thin spark.read wrappers.

The reference streams ndjson / msgpack / CSV / stdin line-by-line
through a multiprocessing pool (``/root/reference/addok/helpers/
__init__.py:19-38``, ``addok/batch.py:48-58``); here each format maps
to a distributed reader returning the transcripts schema, with
malformed rows surfaced in a ``_corrupt`` column instead of silently
dropped (``to_json`` returns None on error, batch.py:53-58 — we keep
the evidence)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

TRANSCRIPT_SCHEMA = T.StructType(
    [
        T.StructField("conv_id", T.StringType()),
        T.StructField("turn_idx", T.IntegerType()),
        T.StructField("role", T.StringType()),
        T.StructField("text", T.StringType()),
        T.StructField("tool", T.StringType()),
        T.StructField("ts", T.TimestampType()),
        T.StructField("importance", T.DoubleType()),
        T.StructField("_action", T.StringType()),
    ]
)


def load_ndjson(spark: SparkSession, path: str) -> DataFrame:
    """S1+S5: line-delimited JSON → typed rows; bad lines land in
    ``_corrupt_record`` (filter or route to a dead-letter sink)."""
    schema = T.StructType(
        TRANSCRIPT_SCHEMA.fields
        + [T.StructField("_corrupt_record", T.StringType())]
    )
    return (
        spark.read.schema(schema)
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", "_corrupt_record")
        .json(path)
    )


def load_csv(spark: SparkSession, path: str) -> DataFrame:
    """S3: headered CSV with schema coercion (reference sniffs the
    dialect; Spark's csv reader handles quoting/escapes)."""
    return (
        spark.read.schema(TRANSCRIPT_SCHEMA)
        .option("header", "true")
        .option("mode", "PERMISSIVE")
        .csv(path)
    )


def load_parquet(spark: SparkSession, path: str) -> DataFrame:
    return spark.read.parquet(path)


def load_msgpack(spark: SparkSession, path: str) -> DataFrame:
    """S2: file(s) of concatenated msgpack maps (the reference's
    ``load_msgpack_file`` stream shape, helpers/__init__.py:25-30) →
    typed rows. ``binaryFile`` distributes whole files to executors;
    a mapInPandas pass decodes them with the pure-Python codec
    (msgpack_codec.py — the env ships no msgpack binding). Records
    that fail to decode or aren't maps land in ``_corrupt_record``;
    a truncated tail yields one corrupt row for the remainder."""
    import pandas as pd

    fields = [
        (f.name, f.dataType.simpleString()) for f in TRANSCRIPT_SCHEMA.fields
    ]
    out_schema = T.StructType(
        TRANSCRIPT_SCHEMA.fields
        + [T.StructField("_corrupt_record", T.StringType())]
    )

    def decode(batches):
        from .msgpack_codec import MsgpackError, unpack_stream

        names = [n for n, _ in fields]
        for pdf in batches:
            rows = []
            for content in pdf["content"]:
                try:
                    for obj in unpack_stream(bytes(content)):
                        if isinstance(obj, dict):
                            rows.append(
                                {n: obj.get(n) for n in names}
                                | {"_corrupt_record": None}
                            )
                        else:
                            rows.append(
                                dict.fromkeys(names)
                                | {"_corrupt_record": repr(obj)[:200]}
                            )
                except MsgpackError as exc:
                    rows.append(
                        dict.fromkeys(names)
                        | {"_corrupt_record": f"decode error: {exc}"}
                    )
            if rows:
                out = pd.DataFrame(rows)
                out["turn_idx"] = pd.array(out["turn_idx"], dtype="Int32")
                out["importance"] = pd.array(out["importance"], dtype="Float64")
                out["ts"] = pd.to_datetime(out["ts"], errors="coerce")
                yield out

    return (
        spark.read.format("binaryFile")
        .load(path)
        .select("content")
        .mapInPandas(decode, schema=out_schema)
    )


def valid_rows(df: DataFrame) -> DataFrame:
    """Drop corrupt rows + enforce the not-null key invariant."""
    if "_corrupt_record" in df.columns:
        df = df.filter(F.col("_corrupt_record").isNull()).drop("_corrupt_record")
    return df.filter(F.col("conv_id").isNotNull() & F.col("turn_idx").isNotNull())
