"""Token-space dedup + source-similarity operators: MinHash-LSH over
token-id n-grams, prefix-containment (truncated-duplicate) pairs, and the
pairwise Jensen-Shannon source matrix."""

import math

import pytest
from pyspark.sql import functions as F

from json_schema_modern_spark.operators.dedup import (
    minhash_lsh_candidates_tokens,
    prefix_containment_pairs,
    token_ngram_shingles,
)
from json_schema_modern_spark.operators.drift import jsd_matrix


def _toks(spark, rows):
    return spark.createDataFrame(rows, "doc_id string, tokens array<int>")


def test_token_shingles_short_arrays_empty(spark):
    df = _toks(spark, [("a", [1, 2]), ("b", [1, 2, 3]), ("c", [])])
    got = {r.doc_id: r.g for r in df.select(
        "doc_id", token_ngram_shingles(F.col("tokens"), 3).alias("g")).collect()}
    # sequence(1, 0) counts DOWN in Spark — the guard must yield [] here,
    # not a bogus [1, 0]-indexed gram pair
    assert got["a"] == []
    assert got["b"] == ["1-2-3"]
    assert got["c"] == []


def test_token_shingles_distinct(spark):
    df = _toks(spark, [("a", [5, 5, 5, 5])])
    got = df.select(token_ngram_shingles(F.col("tokens"), 2).alias("g")).head().g
    assert got == ["5-5"]


def test_token_minhash_exact_and_near_dups(spark):
    base = list(range(30))
    df = _toks(spark, [
        ("d1", base),
        ("d2", base),                 # exact duplicate
        ("d3", base + [99, 98]),      # near duplicate (shared prefix grams)
        ("d4", [7] * 25),             # unrelated
    ])
    pairs = {(r.id_a, r.id_b)
             for r in minhash_lsh_candidates_tokens(df).collect()}
    assert ("d1", "d2") in pairs          # identical signature → intra pair
    assert ("d1", "d3") in pairs and ("d2", "d3") in pairs
    assert not any("d4" in p for p in pairs)


def test_prefix_containment_basic(spark):
    df = _toks(spark, [
        ("full", list(range(20))),
        ("cut", list(range(10))),          # exact prefix of full
        ("twin", list(range(20))),         # equal length → excluded
        ("head8", list(range(8)) + [99]),  # shares 8-token head, diverges at 9
        ("short", [0, 1, 2]),              # below prefix_k → dropped
    ])
    got = {(r.id_short, r.id_long): (r.n_short, r.n_long)
           for r in prefix_containment_pairs(df, prefix_k=8).collect()}
    assert got[("cut", "full")] == (10, 20)
    assert got[("cut", "twin")] == (10, 20)
    # head8 shares the 8-token bucket with the range-based docs but is a
    # true prefix of none (its 9th token diverges); equal-length twins and
    # below-prefix_k docs are excluded
    assert set(got) == {("cut", "full"), ("cut", "twin")}


def test_jsd_identical_zero_disjoint_ln2(spark):
    df = spark.createDataFrame(
        [("s1", [1, 1, 2, 3]), ("s1", [1, 2]),
         ("s2", [1, 1, 2, 3]), ("s2", [1, 2]),
         ("s3", [7, 8, 9])],
        "source string, tokens array<int>")
    got = {(r.source_a, r.source_b): (r.jsd, r.n_tokens_a, r.n_tokens_b)
           for r in jsd_matrix(df).collect()}
    assert got[("s1", "s2")][0] == pytest.approx(0.0, abs=1e-9)
    assert got[("s1", "s3")][0] == pytest.approx(math.log(2), abs=1e-6)
    assert got[("s2", "s3")][0] == pytest.approx(math.log(2), abs=1e-6)
    assert got[("s1", "s2")][1:] == (6, 6)
    assert len(got) == 3  # full pair grid, disjoint pair included


def test_jsd_matches_dense_reference(spark):
    # dense two-source reference computed directly from the definition
    df = spark.createDataFrame(
        [("a", [1, 1, 2]), ("b", [1, 3])],
        "source string, tokens array<int>")
    pa = {1: 2 / 3, 2: 1 / 3}
    pb = {1: 1 / 2, 3: 1 / 2}
    want = 0.0
    for t in {1, 2, 3}:
        p, q = pa.get(t, 0.0), pb.get(t, 0.0)
        m = (p + q) / 2
        if p:
            want += 0.5 * p * math.log(p / m)
        if q:
            want += 0.5 * q * math.log(q / m)
    got = jsd_matrix(df).head()
    assert (got.source_a, got.source_b) == ("a", "b")
    assert got.jsd == pytest.approx(want, abs=1e-6)


def test_span_position_coverage_interval_merge(spark):
    from json_schema_modern_spark.operators.dedup import span_position_coverage

    # a and b share tokens[0:8] (positions 0..7): windows at starts 0..3
    # all hit -> merged span covers 8 positions, not 4*5=20
    shared = [1, 2, 3, 4, 5, 6, 7, 8]
    df = _toks(spark, [
        ("a", shared + [100, 101, 102, 103]),   # 12 toks, 8 covered
        ("b", shared + [200, 201, 202, 203]),   # 12 toks, 8 covered
        ("c", [50, 51, 52, 53, 54, 55]),        # unique -> 0 covered
        ("d", [1, 2, 3]),                        # < n tokens -> no windows
        ("e", []),                               # empty -> NULL coverage
    ])
    got = {r.doc_id: r for r in span_position_coverage(df, ngram_n=5).collect()}
    assert (got["a"].n_tok, got["a"].covered) == (12, 8)
    assert got["a"].coverage == pytest.approx(8 / 12, abs=1e-6)
    assert (got["b"].n_tok, got["b"].covered) == (12, 8)
    assert (got["c"].covered, got["c"].coverage) == (0, 0.0)
    assert (got["d"].covered, got["d"].coverage) == (0, 0.0)
    assert got["e"].n_tok == 0 and got["e"].covered == 0
    assert got["e"].coverage is None


def test_span_position_coverage_disjoint_spans(spark):
    from json_schema_modern_spark.operators.dedup import span_position_coverage

    # two disjoint shared 5-spans inside a 20-token doc -> covered = 10
    s1, s2 = [1, 2, 3, 4, 5], [6, 7, 8, 9, 10]
    df = _toks(spark, [
        ("x", s1 + [91, 92, 93, 94, 95] + s2 + [96, 97, 98, 99, 90]),
        ("y", s1 + [81, 82, 83, 84, 85, 86, 87] + s2 + [88, 89, 80]),
    ])
    got = {r.doc_id: r for r in span_position_coverage(df, ngram_n=5).collect()}
    assert got["x"].covered == 10 and got["x"].n_tok == 20
    assert got["y"].covered == 10
