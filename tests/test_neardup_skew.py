"""Hot-bucket skew handling in the LSH-bucketed embedding near-dup join.

A within-bucket self-join is quadratic in bucket size; the operator
sub-blocks buckets larger than ``max_bucket_size`` into bounded sub-block
pair tasks.  These tests force the pathological input — every row in ONE
bucket (identical direction ⇒ identical sign pattern) — and assert the
pair SET is invariant under sub-blocking (m = 1 vs m ≫ 1 vs the exact
block-matmul path).
"""

import pytest
from pyspark.sql import functions as F

from json_schema_modern_spark.operators.similarity import (
    embedding_near_duplicates,
)


def _skewed_df(spark, n=40, dim=8):
    # all vectors share the direction (1,1,...) with tiny distinct
    # perturbations along it: one LSH bucket, all pairs sim ≈ 1
    rows = [(i, [1.0 + i * 1e-4] * dim) for i in range(n)]
    return spark.createDataFrame(rows, "vec_id int, embedding array<float>")


def _pairs(df):
    return {(r.id_a, r.id_b) for r in df.collect()}


def test_subblocking_preserves_pair_set(spark):
    df = _skewed_df(spark)
    plain = _pairs(embedding_near_duplicates(df, threshold=0.9))
    blocked = _pairs(embedding_near_duplicates(df, threshold=0.9,
                                               max_bucket_size=7))
    exact = _pairs(embedding_near_duplicates(df, threshold=0.9, exact=True))
    n = df.count()
    assert len(plain) == n * (n - 1) // 2        # one dense bucket: all pairs
    assert blocked == plain == exact


def test_skewed_bucket_is_subblocked(spark):
    """With max_bucket_size below the bucket population the join really
    fans out over sub-block pair keys (m(m+1)/2 of them), bounding the
    per-task pair count."""
    df = _skewed_df(spark, n=30)
    out = embedding_near_duplicates(df, threshold=0.9, max_bucket_size=10)
    # m = ceil(30/10) = 3 sub-blocks -> 6 sub-block pairs in the plan;
    # verify via the physical plan's explode of the pair-key sequences
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "Generate explode" in plan or "explode" in plan.lower()
    assert len(_pairs(out)) == 30 * 29 // 2


def test_unskewed_input_unchanged(spark):
    """Distinct directions spread across buckets; default max_bucket_size
    leaves m=1 everywhere and the ANN contract (subset of exact pairs,
    same sims) holds."""
    import random

    rng = random.Random(7)
    rows = [(i, [rng.uniform(-1, 1) for _ in range(8)]) for i in range(60)]
    df = spark.createDataFrame(rows, "vec_id int, embedding array<float>")
    ann = _pairs(embedding_near_duplicates(df, threshold=0.8, n_planes=4))
    exact = _pairs(embedding_near_duplicates(df, threshold=0.8, exact=True))
    assert ann <= exact


def test_pairs_ordered_and_distinct(spark):
    df = _skewed_df(spark, n=12)
    out = embedding_near_duplicates(df, threshold=0.9, max_bucket_size=5)
    rows = out.collect()
    assert all(r.id_a < r.id_b for r in rows)
    assert len(rows) == len({(r.id_a, r.id_b) for r in rows})
