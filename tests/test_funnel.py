"""Curation funnel: quality -> exact dedup -> split, per-source rollup."""

from __future__ import annotations

import duckdb

from pyspark.sql import functions as F


def test_funnel_monotone_and_oracle_parity(spark):
    from json_schema_modern_spark.operators.funnel import (
        curation_funnel, curation_funnel_oracle_sql,
    )

    path = "/root/testdata/sf0.001/documents.parquet"
    d = spark.read.parquet(path)
    # duplicate a deterministic slice so the dedup stage has work
    df = d.unionAll(d.filter(F.col("doc_id") % 97 == 0))
    rows = curation_funnel(df).collect()
    assert rows
    for r in rows:
        assert r.n_raw >= r.n_quality >= r.n_unique >= r.n_train, r
    got = {r.source: (r.n_raw, r.n_quality, r.n_unique, r.n_train)
           for r in rows}
    sql = curation_funnel_oracle_sql(
        f"(SELECT * FROM '{path}' UNION ALL "
        f" SELECT * FROM '{path}' WHERE doc_id % 97 = 0)")
    want = {s: (a, b, c, e) for s, a, b, c, e in duckdb.sql(sql).fetchall()}
    assert got == want
    # the dedup stage actually collapsed the seeded duplicates
    assert sum(v[1] for v in got.values()) > sum(v[2] for v in got.values())


def test_funnel_source_fully_filtered(spark):
    from json_schema_modern_spark.operators.funnel import curation_funnel

    rows = [
        (1, "ok this text has the classic stopwords and it is long enough "
            "to clear the filter for sure", "good"),
        (2, "x", "junk"),          # <5 words -> score 0
        (3, "y z", "junk"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string, source string")
    out = {r.source: r for r in curation_funnel(df).collect()}
    assert out["junk"].n_raw == 2
    assert out["junk"].n_quality == 0
    assert out["junk"].n_unique == 0
    assert out["junk"].n_train == 0
    assert out["good"].n_quality == 1
