"""Structured Streaming validation: the same compiled constraint plan
applied to an unbounded token stream.

The reference has no streaming story (SURVEY.md §2.8) — this is engine
surface the target contract adds.  The key design point: the compiled plan
is pure Column expressions, so the SAME plan object validates batch and
streaming DataFrames — streaming-specific code is only watermarks, windowed
violation-rate aggregation, and sink plumbing.

Scale shape: per-microbatch work is embarrassingly parallel (row-local
predicates); the only stateful operator is the windowed aggregate, keyed by
(window, source) — small cardinality, bounded state via watermark eviction.
Cross-row checks that need global state (uniqueness, drift baselines) run
as periodic batch jobs over the accumulated table instead — at 10^12-scale
an unbounded exact-dedup state store is the wrong tool; the batch
hash-bucket pass is (see plans/pipeline.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from json_schema_modern_spark.validator import Validator


def validate_stream(stream_df: DataFrame, spec: dict, id_cols: list[str] | None = None):
    """Annotate an unbounded DataFrame with _valid + violation rows.

    Returns (annotated, violations) — both unbounded; attach writeStream
    sinks downstream."""
    v = Validator(spec)
    res = v.validate(stream_df, id_cols=id_cols or ["doc_id"])
    return res.annotated, res.violations


def violation_rate(
    annotated: DataFrame,
    ts_col: str,
    window: str = "1 minute",
    watermark: str = "5 minutes",
    group_col: str | None = "source",
) -> DataFrame:
    """Windowed violation-rate aggregate with late-data handling.

    watermark bounds state: rows later than `watermark` behind the max seen
    event time are dropped and their windows finalized/evicted."""
    keys = [F.window(ts_col, window).alias("w")]
    if group_col:
        keys.append(F.col(group_col))
    out = (
        annotated.withWatermark(ts_col, watermark)
        .groupBy(*keys)
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.sum((~F.col("_valid")).cast("long")).alias("n_invalid"),
        )
        .withColumn("invalid_rate", F.col("n_invalid") / F.col("n_rows"))
    )
    return out.select(
        F.col("w.start").alias("window_start"),
        F.col("w.end").alias("window_end"),
        *([group_col] if group_col else []),
        "n_rows", "n_invalid", "invalid_rate",
    )


def quarantine_writer(violations: DataFrame, path: str, checkpoint: str):
    """writeStream handle routing violation rows to a quarantine table
    (append-only parquet; exactly-once via checkpoint dir)."""
    return (
        violations.writeStream
        .format("parquet")
        .option("path", path)
        .option("checkpointLocation", checkpoint)
        .outputMode("append")
    )


def validate_json_stream(stream_df: DataFrame, spec: dict, json_col: str,
                         id_cols: list[str] | None = None,
                         tier: str = "python"):
    """JSON-document column over an unbounded stream.

    tier="python" runs the exact per-document evaluator inside the
    micro-batch executors (mapInPandas is streaming-native; the
    per-worker evaluator cache persists across micro-batches, so the
    registry builds once per worker, not once per batch).  tier="hybrid"
    also works — its routing is a stateless projection + filter-union —
    but costs two extra JSON parses per row per micro-batch; tier=
    "columns" needs the documents to fit the decode schema exactly.
    All tiers are stateless row-local transforms: no watermark needed
    until a downstream aggregation adds one."""
    v = Validator(spec)
    res = v.validate_json_strings(stream_df, json_col,
                                  id_cols=id_cols or ["doc_id"], tier=tier)
    return res.annotated, res.violations
