"""Benchmark-contamination operator: word-n-gram overlap vs a benchmark
set (operators/contamination.py)."""

from pyspark.sql import functions as F

from json_schema_modern_spark.operators.contamination import (
    ngram_contamination,
    word_ngrams,
)


def test_word_ngrams_normalization(spark):
    df = spark.createDataFrame(
        [(1, "The  QUICK, brown fox! jumps"),
         (2, "tiny"),
         (3, None)],
        "id int, text string")
    out = {r.id: r.g for r in df.select(
        "id", word_ngrams(F.col("text"), 3).alias("g")).collect()}
    assert out[1] == ["the quick brown", "quick brown fox",
                      "brown fox jumps"]
    assert out[2] == []          # fewer than n words
    assert out[3] == []          # NULL text -> size(w) >= n is false


def test_ngram_contamination_counts(spark):
    bench = spark.createDataFrame(
        [(100, "alpha beta gamma delta")], "doc_id int, text string")
    docs = spark.createDataFrame(
        [(1, "alpha beta gamma epsilon"),      # 1 of 2 grams contaminated
         (2, "zeta eta theta iota"),           # clean
         (3, "x alpha beta gamma delta y")],   # 2 of 4 grams contaminated
        "doc_id int, text string")
    out = {r.doc_id: r for r in
           ngram_contamination(docs, bench, n=3).collect()}
    assert (out[1].total_ngrams, out[1].contaminated_ngrams) == (2, 1)
    assert out[1].contamination_rate == 0.5
    assert (out[2].total_ngrams, out[2].contaminated_ngrams) == (2, 0)
    assert (out[3].total_ngrams, out[3].contaminated_ngrams) == (4, 2)
    assert out[3].contamination_rate == 0.5


def test_repeated_grams_counted_once(spark):
    """Grams are DISTINCT per document: repetition inside one doc does not
    inflate the contaminated count."""
    bench = spark.createDataFrame([(9, "a b c")], "doc_id int, text string")
    docs = spark.createDataFrame([(1, "a b c a b c a b c")],
                                 "doc_id int, text string")
    r = ngram_contamination(docs, bench, n=3).first()
    # distinct grams of the doc: {a b c, b c a, c a b, c b a?} -> exactly
    # {'a b c', 'b c a', 'c a b'}; only 'a b c' is in the benchmark
    assert r.total_ngrams == 3 and r.contaminated_ngrams == 1


def test_no_broadcast_fallback_same_result(spark):
    bench = spark.createDataFrame(
        [(100, "alpha beta gamma delta")], "doc_id int, text string")
    docs = spark.createDataFrame(
        [(1, "alpha beta gamma epsilon"), (2, "zeta eta theta iota")],
        "doc_id int, text string")
    a = sorted(map(tuple, ngram_contamination(docs, bench, n=3).collect()))
    b = sorted(map(tuple, ngram_contamination(docs, bench, n=3,
                                              broadcast=False).collect()))
    assert a == b


def test_numeric_quantiles_exact_vs_approx(spark):
    from json_schema_modern_spark.operators.stats import numeric_quantiles

    df = spark.range(1, 101).select(F.col("id").cast("double").alias("v"))
    exact = {(r.column, r.p): r.q
             for r in numeric_quantiles(df, ["v"], probs=(0.5, 0.9)).collect()}
    # linear interpolation over 1..100: p=0.5 -> 50.5, p=0.9 -> 90.1
    assert exact[("v", 0.5)] == 50.5
    assert abs(exact[("v", 0.9)] - 90.1) < 1e-9
    approx = {(r.column, r.p): r.q for r in numeric_quantiles(
        df, ["v"], probs=(0.5, 0.9), exact=False).collect()}
    assert abs(approx[("v", 0.5)] - 50.5) <= 1.0   # sketch tolerance


def test_segmented_stats(spark):
    from json_schema_modern_spark.operators.stats import segmented_stats

    df = spark.createDataFrame(
        [("a", 1), ("a", 3), ("a", None), ("b", 10)],
        "src string, x int")
    out = {r.segment: r for r in segmented_stats(df, "src", "x").collect()}
    assert (out["a"].n_rows, out["a"].null_count) == (3, 1)
    assert (out["a"].min, out["a"].max, out["a"].mean) == (1.0, 3.0, 2.0)
    assert (out["b"].n_rows, out["b"].mean) == (1, 10.0)


def test_token_ngram_contamination_exact_window_hits(spark):
    from json_schema_modern_spark.operators.contamination import (
        token_ngram_contamination,
    )

    # k=3: train doc 1 shares the window [5,6,7] with the benchmark;
    # doc 2's repeated window hits twice (multiplicity semantics);
    # doc 3 is shorter than k (zero windows).
    train = spark.createDataFrame(
        [
            (1, [4, 5, 6, 7, 8]),       # windows: 456 567 678 -> 567 hits once
            (2, [9, 9, 9, 9]),          # windows: 999 x2 -> both hit
            (3, [1, 2]),                # < k -> 0 windows
        ],
        "doc_id long, tokens array<int>",
    )
    bench = spark.createDataFrame(
        [(100, [5, 6, 7, 9, 9, 9])], "doc_id long, tokens array<int>")
    out = {r.doc_id: r for r in
           token_ngram_contamination(train, bench, k=3).collect()}
    assert out[1].total_ngrams == 3 and out[1].contaminated_ngrams == 1
    assert abs(out[1].contamination_rate - 1 / 3) < 1e-6
    assert out[2].total_ngrams == 2 and out[2].contaminated_ngrams == 2
    assert out[2].contamination_rate == 1.0
    assert out[3].total_ngrams == 0 and out[3].contaminated_ngrams == 0
    assert out[3].contamination_rate == 0.0


def test_token_kgrams_multiplicity_and_short_input(spark):
    from json_schema_modern_spark.operators.contamination import token_kgrams

    df = spark.createDataFrame(
        [([1, 2, 1, 2, 1],), ([1],), (None,)], "tokens array<int>")
    rows = df.select(F.size(token_kgrams(F.col("tokens"), 2)).alias("n")).collect()
    # windows of [1,2,1,2,1]: (1,2),(2,1),(1,2),(2,1) -> 4 with multiplicity
    assert [r.n for r in rows] == [4, 0, 0]
