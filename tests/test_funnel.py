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


def test_token_budget_first_crossing(spark):
    from json_schema_modern_spark.operators.funnel import token_budget_filter

    # one group, distinct scores: levels 0.9(50) 0.8(40) 0.7(30) 0.6(20);
    # budget 80 -> 0.9 (cum_before 0) and 0.8 (cum_before 50) keep,
    # 0.7 (cum_before 90 >= 80) does not
    rows = [(1, "a", 0.9, 50), (2, "a", 0.8, 40),
            (3, "a", 0.7, 30), (4, "a", 0.6, 20)]
    df = spark.createDataFrame(
        rows, "doc_id long, source string, quality_score double, n_tok long")
    got = {r.doc_id: r.keep for r in token_budget_filter(df, 80).collect()}
    assert got == {1: True, 2: True, 3: False, 4: False}


def test_token_budget_ties_and_nulls(spark):
    from json_schema_modern_spark.operators.funnel import token_budget_filter

    rows = [(1, "a", 0.9, 50), (2, "a", 0.9, 50),     # tied level: both keep
            (3, "a", 0.8, 10),
            (4, "a", None, 99), (5, "a", 0.9, None),  # nulls never keep
            (6, "a", 0.9, -3),                        # negative never keeps
            (7, "b", 0.1, 5)]                         # tiny group: all keep
    df = spark.createDataFrame(
        rows, "doc_id long, source string, quality_score double, n_tok long")
    got = {r.doc_id: r.keep for r in token_budget_filter(df, 60).collect()}
    assert got == {1: True, 2: True, 3: False,
                   4: False, 5: False, 6: False, 7: True}


def test_group_cap_paths_and_null_group(spark):
    from json_schema_modern_spark.operators.funnel import group_cap_filter

    rows = ([(i, "big", "en") for i in range(10)]
            + [(100, "small", "en"), (101, "small", "en")]
            + [(200, None, "en"), (201, None, "en"), (202, None, "en")])
    df = spark.createDataFrame(rows, "doc_id long, source string, lang string")
    out = group_cap_filter(df, cap=2, group_cols=["source", "lang"]).collect()
    assert len(out) == len(rows)          # null group not dropped
    by_grp = {}
    for r in out:
        by_grp.setdefault((r.source, r.lang), []).append(r.keep)
    assert sum(by_grp[("big", "en")]) == 2
    assert all(by_grp[("small", "en")])
    assert sum(by_grp[(None, "en")]) == 2
    # deterministic: keepers are the cap smallest md5('cap-v1'||id)
    import hashlib
    ids = sorted(range(10),
                 key=lambda i: (hashlib.md5(f"cap-v1{i}".encode()).hexdigest(), i))
    kept_big = {r.doc_id for r in out if r.source == "big" and r.keep}
    assert kept_big == set(ids[:2])
