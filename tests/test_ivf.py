"""IVF coarse-quantizer ANN: trained k-means centroids (deterministic
bounded-sample Lloyd) + cell assignment + probe-pruned top-k."""

from pyspark.sql import functions as F

from json_schema_modern_spark.operators.similarity import (
    cosine_topk, ivf_assignment, ivf_centroids, ivf_topk, query_vector,
)


def _clustered_df(spark):
    # three tight clusters around distinct anchors (deterministic)
    rows = []
    anchors = [[1.0, 0.0, 0.0, 0.0], [0.0, 1.0, 0.0, 0.0], [0.0, 0.0, 1.0, 0.0]]
    for i in range(90):
        a = anchors[i % 3]
        jitter = ((i * 37) % 11 - 5) / 100.0
        rows.append((i, [v + (jitter if j == 3 else 0.0) for j, v in enumerate(a)]))
    return spark.createDataFrame(rows, "vec_id bigint, embedding array<double>")


def test_centroids_deterministic_and_separating(spark):
    df = _clustered_df(spark)
    c1 = ivf_centroids(df, n_centroids=3, sample_mod=2, iters=5)
    c2 = ivf_centroids(df, n_centroids=3, sample_mod=2, iters=5)
    assert c1 == c2                                  # pure function of input
    # the three clusters land in three distinct cells
    cells = (df.select(ivf_assignment(F.col("embedding"), c1).alias("c"),
                       (F.col("vec_id") % 3).alias("g"))
             .groupBy("g").agg(F.count_distinct("c").alias("n")).collect())
    assert all(r.n == 1 for r in cells)
    assigned = df.select((F.col("vec_id") % 3).alias("g"),
                         ivf_assignment(F.col("embedding"), c1).alias("c")) \
        .distinct().collect()
    assert len({r.c for r in assigned}) == 3


def test_ivf_topk_matches_bruteforce_on_probed_mass(spark):
    df = _clustered_df(spark)
    cents = ivf_centroids(df, n_centroids=3, sample_mod=2, iters=5)
    q = [1.0, 0.0, 0.0, 0.05]
    ivf = ivf_topk(df, q, cents, k=5, nprobe=1)
    brute = cosine_topk(df, q, k=5)
    # the query sits inside cluster 0: probing ONE cell reproduces the
    # exact brute-force top-5
    assert [r.vec_id for r in ivf.collect()] == [r.vec_id for r in brute.collect()]


def test_ivf_probe_prunes(spark):
    df = _clustered_df(spark)
    cents = ivf_centroids(df, n_centroids=3, sample_mod=2, iters=5)
    q = query_vector(4, seed=42)
    cell = ivf_assignment(F.col("embedding"), cents)
    probed = df.withColumn("_c", cell)
    n_all = probed.count()
    one_cell_max = probed.groupBy("_c").count().agg(F.max("count")).first()[0]
    assert one_cell_max < n_all                      # pruning is real


def test_centroid_sample_cap_fails_fast(spark):
    """The absolute driver-memory guard: an over-selecting modulus must
    raise (with the modulus to use) rather than collect the table."""
    import pytest

    df = _clustered_df(spark)
    with pytest.raises(ValueError, match="raise sample_mod"):
        ivf_centroids(df, n_centroids=3, sample_mod=2, max_sample=10)
    # and the suggested shape passes
    assert len(ivf_centroids(df, n_centroids=3, sample_mod=11, max_sample=10)) == 3


def test_ann_recall_perfect_when_multiprobe_covers(spark):
    from json_schema_modern_spark.operators.similarity import ann_recall

    df = _clustered_df(spark)
    # with enough probes the LSH path degenerates to exact -> recall 1.0
    qs = [[1.0, 0.0, 0.0, 0.05], [0.0, 1.0, 0.0, -0.03]]
    got = ann_recall(df, qs, k=5, n_planes=2, multiprobe=2).collect()
    assert [r.query_id for r in got] == [0, 1]
    assert all(r.k == 5 and r.n_hits == 5 and r.recall == 1.0 for r in got)


def test_ann_recall_partial_under_pruning(spark):
    from json_schema_modern_spark.operators.similarity import ann_recall

    df = _clustered_df(spark)
    qs = [[1.0, 0.0, 0.0, 0.0]]
    got = ann_recall(df, qs, k=5, n_planes=8, multiprobe=0).collect()[0]
    # pruned probe set can only lose neighbors, never invent them
    assert 0 <= got.n_hits <= 5
    assert got.recall == round(got.n_hits / 5.0, 6)
