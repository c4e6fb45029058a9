"""Drift-operator guards and determinism.

- psi_drift: the window-free fold must reproduce the DuckDB cumulative
  sum bit-for-bit (deterministic bucket-order addition) — the exact
  comparison the driver gate runs for `drift_psi` at sf0.01.
- ks_drift_pandas: reference=None collects a driver-side sample, so the
  input row count is guarded (mirrors ivf_centroids' max_sample
  fail-fast) — the scale footgun from the round-4 verdict.
- resume_from: same workdir normalization as __init__ (file:// stripped,
  remote URIs rejected with the explicit error, not an opaque ENOENT).
"""

from __future__ import annotations

import duckdb
import pytest

from pyspark.sql import functions as F


def test_psi_drift_matches_duckdb_cumulative(spark):
    from json_schema_modern_spark.operators.drift import psi_drift

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    out = {r.source: (r.n_group, r.n_global, r.psi, r.drifted)
           for r in psi_drift(docs, "n_chars", "source",
                              0.0, 600.0, 30, threshold=0.2).collect()}
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW documents AS SELECT * FROM "
        "'/root/testdata/sf0.001/documents.parquet'")
    oracle = con.execute("""
WITH binned AS (
  SELECT source AS grp,
         CASE WHEN n_chars < 0 THEN 0 WHEN n_chars >= 600 THEN 31
              ELSE CAST(floor(n_chars/20.0) AS BIGINT) + 1 END AS bucket,
         count(*) AS cnt
  FROM documents WHERE n_chars IS NOT NULL GROUP BY 1, 2),
gtot AS (SELECT bucket, CAST(sum(cnt) AS BIGINT) AS gcnt FROM binned GROUP BY 1),
totals AS (SELECT grp, CAST(sum(cnt) AS BIGINT) AS n_grp FROM binned GROUP BY 1),
nglob AS (SELECT CAST(sum(gcnt) AS BIGINT) AS n_glob FROM gtot),
nb AS (SELECT count(*) AS n_buckets_seen FROM gtot),
full_grid AS (
  SELECT g.grp, gl.bucket, coalesce(b.cnt, 0) AS cnt, gl.gcnt
  FROM (SELECT DISTINCT grp FROM binned) g
  CROSS JOIN gtot gl
  LEFT JOIN binned b ON b.grp = g.grp AND b.bucket = gl.bucket),
terms AS (
  SELECT f.grp, f.bucket, t.n_grp, n.n_glob,
         ((f.cnt + 0.5) / (t.n_grp + 0.5 * nb.n_buckets_seen)
          - (f.gcnt + 0.5) / (n.n_glob + 0.5 * nb.n_buckets_seen))
         * ln(((f.cnt + 0.5) / (t.n_grp + 0.5 * nb.n_buckets_seen))
              / ((f.gcnt + 0.5) / (n.n_glob + 0.5 * nb.n_buckets_seen))) AS term
  FROM full_grid f JOIN totals t ON f.grp = t.grp CROSS JOIN nglob n CROSS JOIN nb),
cum AS (
  SELECT grp, bucket, n_grp, n_glob,
         sum(term) OVER (PARTITION BY grp ORDER BY bucket) AS cpsi
  FROM terms)
SELECT grp, n_grp, n_glob,
       CAST(round(round(arg_max(cpsi, bucket), 9), 6) AS DOUBLE) AS psi,
       arg_max(cpsi, bucket) > 0.2 AS drifted
FROM cum GROUP BY 1, 2, 3
""").fetchall()
    assert oracle
    for grp, n_grp, n_glob, psi, drifted in oracle:
        assert out[grp] == (n_grp, n_glob, psi, drifted), grp


def test_psi_drift_plan_has_no_window(spark):
    """The determinism fold must live inside the single aggregation —
    no Window exchange+sort in the physical plan."""
    from json_schema_modern_spark.operators.drift import psi_drift

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    plan = psi_drift(docs, "n_chars", "source", 0.0, 600.0, 30) \
        ._jdf.queryExecution().executedPlan().toString()
    assert "Window" not in plan


def test_ks_drift_pandas_guard_fires(spark):
    from json_schema_modern_spark.operators.drift import ks_drift_pandas

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    with pytest.raises(ValueError, match="max_sample"):
        ks_drift_pandas(docs, "n_chars", "source", max_sample=10)
    # explicit reference bypasses the guard entirely (the scale path)
    out = ks_drift_pandas(docs.limit(50), "n_chars", "source",
                          reference=[10.0, 20.0, 400.0], max_sample=1)
    assert out.count() > 0


def test_resume_from_workdir_normalization(tmp_path):
    from json_schema_modern_spark.plans.pipeline import ValidationPipeline

    with pytest.raises(ValueError, match="local filesystem"):
        ValidationPipeline.resume_from("hdfs://nn/checkpoints/run1")
    # file:// prefix is stripped, then the manifest open fails with the
    # normalized LOCAL path (not a file:/... ENOENT)
    with pytest.raises(FileNotFoundError) as exc:
        ValidationPipeline.resume_from(f"file://{tmp_path}/nope")
    assert "file://" not in str(exc.value)
