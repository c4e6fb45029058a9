"""Corpus-level source diagnostics: MinHash-sketch lexical overlap and
document-frequency boilerplate n-grams."""

from json_schema_modern_spark.operators.dedup import source_overlap_sketch
from json_schema_modern_spark.operators.diversity import boilerplate_ngrams


def test_sketch_overlap_identical_vs_disjoint(spark):
    df = spark.createDataFrame(
        [("s1", list(range(40))), ("s2", list(range(40))),
         ("s3", [100 + i for i in range(40)])],
        "source string, tokens array<int>")
    got = {(r.source_a, r.source_b): (r.n_matching, r.jaccard_est)
           for r in source_overlap_sketch(df).collect()}
    assert got[("s1", "s2")] == (16, 1.0)   # identical shingle sets
    assert got[("s1", "s3")] == (0, 0.0)    # disjoint shingle sets
    assert got[("s2", "s3")] == (0, 0.0)
    assert len(got) == 3


def test_sketch_overlap_partial_is_between(spark):
    df = spark.createDataFrame(
        [("a", list(range(40))),
         ("b", list(range(20)) + [200 + i for i in range(20)])],
        "source string, tokens array<int>")
    row = source_overlap_sketch(df).head()
    assert 0 < row.n_matching < 16  # shares the [0..19] head grams only


def test_boilerplate_doc_frequency_and_rank(spark):
    docs = spark.createDataFrame(
        [("s1", "cookie banner accept all terms now please read more"),
         ("s1", "cookie banner accept all rights reserved today"),
         ("s1", "cookie banner accept all of it cookie banner accept"),
         ("s1", "totally unique content about sparks and rivers"),
         ("s2", "one two three four five")],
        "source string, text string")
    rows = boilerplate_ngrams(docs, n=3, top_k=2, min_docs=2).collect()
    got = [(r.source, r.gram, r.n_docs, r.rank) for r in rows]
    # each doc votes ONCE per distinct gram (doc 3 repeats the gram
    # in-document — still one vote), ties break on gram text ascending
    assert got == [("s1", "banner accept all", 3, 1),
                   ("s1", "cookie banner accept", 3, 2)]


def test_boilerplate_min_docs_filters_singletons(spark):
    docs = spark.createDataFrame(
        [("s1", "alpha beta gamma delta"), ("s1", "epsilon zeta eta theta")],
        "source string, text string")
    assert boilerplate_ngrams(docs, n=3, min_docs=2).count() == 0


def test_vocab_growth_curve(spark):
    from pyspark.sql import functions as F

    from json_schema_modern_spark.operators.diversity import vocab_growth

    # shard = id % 2; shard 0 sees {a,b}, shard 1 adds {c} only
    rows = [(0, ["a", "b"]), (2, ["a"]), (1, ["b", "c"]), (3, ["c", "a"])]
    df = spark.createDataFrame(rows, "doc_id long, tokens array<string>")
    out = {r.shard: (r.n_new_tokens, r.cum_vocab)
           for r in vocab_growth(df, n_shards=2).collect()}
    assert out == {0: (2, 2), 1: (1, 3)}
    # empty/null token arrays contribute nothing
    df2 = df.unionAll(spark.createDataFrame(
        [(4, []), (5, None)], "doc_id long, tokens array<string>"))
    out2 = {r.shard: (r.n_new_tokens, r.cum_vocab)
            for r in vocab_growth(df2, n_shards=2).collect()}
    assert out2 == out
