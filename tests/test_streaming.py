"""Structured Streaming validation: same compiled plan over an unbounded
source, windowed violation-rate with watermark, quarantine sink."""

import os

import pytest
from pyspark.sql import functions as F

from json_schema_modern_spark.sources.sequences import sequences_df
from json_schema_modern_spark.streaming.validate_stream import (
    quarantine_writer,
    validate_stream,
    violation_rate,
)

SPEC = {
    "type": "object",
    "required": ["doc_id", "tokens", "n_tok", "source"],
    "properties": {
        "tokens": {"type": "array",
                   "items": {"type": "integer", "minimum": 0, "maximum": 50256}},
        "n_tok": {"minimum": 1, "maximum": 2048},
        "source": {"enum": ["web", "books", "code", "wiki", "forums"]},
    },
}


@pytest.fixture(scope="module")
def stream_dir(spark, tmp_path_factory):
    d = tmp_path_factory.mktemp("stream_in")
    df = sequences_df(spark, 1500, seed=42, corrupt=True) \
        .withColumn("ts", F.timestamp_seconds(
            F.lit(1_700_000_000) + F.xxhash64("doc_id") % 3600))
    df.coalesce(2).write.mode("overwrite").parquet(str(d))
    return str(d), df.schema


def test_stream_violations_match_batch(spark, stream_dir, tmp_path):
    path, schema = stream_dir
    stream = spark.readStream.schema(schema).parquet(path)
    assert stream.isStreaming
    annotated, violations = validate_stream(stream, SPEC)

    out = str(tmp_path / "quarantine")
    ckpt = str(tmp_path / "ckpt")
    q = quarantine_writer(violations, out, ckpt).trigger(availableNow=True).start()
    q.awaitTermination(120)

    got = spark.read.parquet(out)
    batch = validate_stream(spark.read.parquet(path), SPEC)[1]
    assert got.count() == batch.count() > 0
    # same violation keyword profile either way
    a = {(r.keyword, r["count"]) for r in got.groupBy("keyword").count().collect()}
    b = {(r.keyword, r["count"]) for r in batch.groupBy("keyword").count().collect()}
    assert a == b


def test_violation_rate_windows(spark, stream_dir, tmp_path):
    path, schema = stream_dir
    stream = spark.readStream.schema(schema).parquet(path)
    annotated, _ = validate_stream(stream, SPEC)
    rate = violation_rate(annotated, "ts", window="10 minutes",
                          watermark="30 minutes", group_col="source")
    out = str(tmp_path / "rates")
    q = (rate.writeStream.format("parquet")
         .option("path", out)
         .option("checkpointLocation", str(tmp_path / "rckpt"))
         .outputMode("append").trigger(availableNow=True).start())
    q.awaitTermination(120)
    rows = spark.read.parquet(out).collect()
    # append mode emits only watermark-finalized windows — windows inside
    # the final 30-minute watermark stay in state, so emitted counts are a
    # strict subset; every emitted row must match the batch computation
    assert rows, "no windows finalized"
    assert sum(r.n_rows for r in rows) <= spark.read.parquet(path).count()
    batch = {
        (r.window_start, r.source): (r.n_rows, r.n_invalid)
        for r in violation_rate(
            validate_stream(spark.read.parquet(path), SPEC)[0],
            "ts", window="10 minutes", watermark="30 minutes",
            group_col="source",
        ).collect()
    }
    for r in rows:
        assert batch[(r.window_start, r.source)] == (r.n_rows, r.n_invalid)
    assert all(0.0 <= r.invalid_rate <= 1.0 for r in rows)


@pytest.mark.parametrize("tier", ["python", "hybrid"])
def test_json_stream_matches_batch(spark, tmp_path, tier):
    """validate_json_stream: the JSON-document tiers over an unbounded
    source produce the same per-row validity as the batch tiers on the
    same files (mapInPandas and the hybrid routing are both
    streaming-native, stateless row-local transforms)."""
    from json_schema_modern_spark.streaming.validate_stream import (
        validate_json_stream,
    )

    d = str(tmp_path / "json_in")
    rows = [(f"d{i}",
             '{"a": null}' if i % 11 == 0 else
             '{"a": 1, "big": 99999999999999999999}' if i % 13 == 0 else
             '{"a": %d}' % (i % 100))
            for i in range(400)]
    spark.createDataFrame(rows, "doc_id string, payload string") \
        .coalesce(2).write.mode("overwrite").parquet(d)
    spec = {"type": "object", "required": ["a"],
            "properties": {"a": {"type": ["integer", "null"], "maximum": 80},
                           "big": {"maximum": 99999999999999999998}}}

    stream = spark.readStream.schema("doc_id string, payload string").parquet(d)
    assert stream.isStreaming
    annotated, _ = validate_json_stream(stream, spec, "payload",
                                        id_cols=["doc_id"], tier=tier)
    name = f"json_stream_{tier}"
    q = (annotated.select("doc_id", "_valid").writeStream
         .format("memory").queryName(name).outputMode("append")
         .trigger(availableNow=True).start())
    q.awaitTermination(120)
    got = {r.doc_id: r._valid for r in spark.table(name).collect()}

    from json_schema_modern_spark import Validator

    batch = Validator(spec).validate_json_strings(
        spark.read.parquet(d), "payload", id_cols=["doc_id"], tier=tier)
    want = {r.doc_id: r._valid
            for r in batch.annotated.select("doc_id", "_valid").collect()}
    assert got == want and len(got) == 400 and not all(got.values())
