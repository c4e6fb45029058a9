"""Token-id statistics operators (operators/tokens.py)."""

import pytest
from pyspark.sql import functions as F

from json_schema_modern_spark.operators.tokens import (
    oov_stats,
    token_frequencies,
    vocab_coverage,
)


@pytest.fixture(scope="module")
def tok_df(spark):
    rows = [
        (1, "a", [1, 2, 2, 3]),
        (2, "a", [2, 99, 100]),
        (3, "b", [2, 2, 2, -1]),
    ]
    return spark.createDataFrame(
        rows, "doc_id int, source string, tokens array<int>")


def test_token_frequencies(tok_df):
    got = [(r.token, r.n_occurrences) for r in token_frequencies(tok_df, top_k=3).collect()]
    assert got == [(2, 6), (-1, 1), (1, 1)]   # count desc, token asc ties


def test_oov_stats(tok_df):
    got = {r.source: (r.n_tokens, r.n_oov, r.oov_rate)
           for r in oov_stats(tok_df, vocab_size=100).collect()}
    assert got["a"] == (7, 1, round(1 / 7, 6))     # 100 is OOV for [0,100)
    assert got["b"] == (4, 1, 0.25)                # -1 is OOV


def test_vocab_coverage(tok_df):
    row = vocab_coverage(tok_df, vocab_size=10, exact=True).collect()[0]
    # in-vocab distinct ids: {1, 2, 3}
    assert (row.n_distinct_tokens, row.vocab_size, row.coverage) == (3, 10, 0.3)


def test_token_entropy(spark):
    import math

    from json_schema_modern_spark.operators.tokens import token_entropy

    rows = [(1, "a", [1, 2, 1, 2, 1, 2]), (2, "a", [1, 2, 3, 4]),
            (3, "b", [5]), (4, "b", []), (5, "b", None)]
    df = spark.createDataFrame(rows, "doc_id long, source string, tokens array<int>")
    got = {r.doc_id: (r.n_tokens, r.n_distinct, r.entropy)
           for r in token_entropy(df).collect()}
    assert got[1] == (6, 2, round(math.log(2), 6))
    assert got[2] == (4, 4, round(math.log(4), 6))
    assert got[3] == (1, 1, 0.0)
    assert got[4] == (0, 0, None)
    assert got[5] == (0, 0, None)


def test_token_run_stats(spark):
    from json_schema_modern_spark.operators.tokens import token_run_stats

    rows = [
        (1, "a", [1, 1, 1, 2, 2]),      # max run 3 -> loopy
        (2, "a", [1, 2, 3, 4]),         # max run 1
        (3, "b", [7, 7, 7, 7, 7, 7]),   # max run 6 -> loopy
        (4, "b", [5]),                  # single token: run 1
        (5, "b", []),                   # excluded
        (6, "b", None),                 # excluded
    ]
    df = spark.createDataFrame(
        rows, "doc_id long, source string, tokens array<int>")
    got = {r.source: r for r in token_run_stats(df).collect()}
    assert (got["a"].n_docs, got["a"].max_run, got["a"].avg_max_run,
            got["a"].n_loopy, got["a"].loopy_frac) == (2, 3, 2.0, 1, 0.5)
    assert (got["b"].n_docs, got["b"].max_run, got["b"].avg_max_run,
            got["b"].n_loopy, got["b"].loopy_frac) == (2, 6, 3.5, 1, 0.5)


def test_token_run_stats_threshold(spark):
    from json_schema_modern_spark.operators.tokens import token_run_stats

    rows = [(1, "a", [1, 1, 2]), (2, "a", [3, 3, 3, 3])]
    df = spark.createDataFrame(
        rows, "doc_id long, source string, tokens array<int>")
    r = token_run_stats(df, loop_threshold=4).collect()[0]
    assert (r.n_loopy, r.loopy_frac) == (1, 0.5)   # only the run of 4


def test_tokenizer_fertility(spark):
    from json_schema_modern_spark.operators.tokens import tokenizer_fertility

    df = spark.createDataFrame(
        [("a", "web", [1, 2, 3, 4], "abcdefgh"),       # 4 tok / 8 chars
         ("b", "web", [5, 6], "xy"),                   # 2 tok / 2 chars
         ("c", "code", None, None),                    # null-safe
         ("d", "code", [], "abcd")],
        "doc_id string, source string, tokens array<int>, text string")
    got = {r.source: r for r in tokenizer_fertility(df).collect()}
    web = got["web"]
    assert (web.n_docs, web.n_tokens, web.n_chars) == (2, 6, 10)
    assert web.tokens_per_char == pytest.approx(0.6, abs=1e-6)
    assert web.chars_per_token == pytest.approx(10 / 6, abs=1e-6)
    code = got["code"]
    assert (code.n_tokens, code.n_chars) == (0, 4)
    assert code.tokens_per_char == 0.0 and code.chars_per_token is None


def test_coverage_topk_curve(spark):
    from json_schema_modern_spark.operators.tokens import coverage_topk_curve

    # id 7 x6, id 3 x3, id 9 x1 -> total 10
    df = spark.createDataFrame(
        [("a", [7, 7, 7, 3, 3, 9]), ("b", [7, 7, 7, 3])],
        "doc_id string, tokens array<int>")
    got = {r.k: r for r in coverage_topk_curve(df, ks=[1, 2, 10]).collect()}
    assert got[1].covered == 6 and got[1].total == 10
    assert got[1].coverage == pytest.approx(0.6, abs=1e-6)
    assert got[2].covered == 9
    assert got[10].coverage == pytest.approx(1.0, abs=1e-6)


def test_heavy_hitter_grams_exact(spark):
    from json_schema_modern_spark.operators.tokens import heavy_hitter_grams

    # bigram (1,2) appears 8x, (2,1) 7x, (3,4) 1x, (4,5) 1x -> total 17
    rows = [("a", [1, 2, 1, 2, 1, 2, 1, 2, 1]),   # (1,2)x4 (2,1)x4
            ("b", [1, 2, 1, 2, 1, 2, 1, 2]),      # (1,2)x4 (2,1)x3
            ("c", [3, 4, 5]),                      # (3,4) (4,5)
            ("d", None), ("e", []), ("f", [9])]    # 0 grams each
    df = spark.createDataFrame(rows, "doc_id string, tokens array<int>")
    # threshold total/denom = 17/4 = 4.25 -> heavy iff cnt*4 >= 17 -> cnt >= 5
    got = {r.gram: r for r in heavy_hitter_grams(df, denom=4).collect()}
    assert set(got) == {1 * 65536 + 2, 2 * 65536 + 1}
    assert got[1 * 65536 + 2].cnt == 8
    assert got[2 * 65536 + 1].cnt == 7
    assert got[1 * 65536 + 2].frac == pytest.approx(8 / 17, abs=1e-6)


def test_heavy_hitter_grams_no_false_negatives_under_compression(spark):
    from json_schema_modern_spark.operators.tokens import heavy_hitter_grams

    # 40 distinct noise bigrams (1x each) + one heavy bigram (20x), with a
    # tiny capacity/compress_at so the MG compress path actually runs:
    # the heavy gram must survive nomination and come back with its EXACT
    # count (the guarantee the operator documents).
    rows = [(f"n{i}", [100 + i, 200 + i]) for i in range(40)]
    rows += [("h", [7, 8] * 21)]  # (7,8)x21, (8,7)x20 interleaved
    df = spark.createDataFrame(rows, "doc_id string, tokens array<int>")
    out = heavy_hitter_grams(df, denom=8, capacity=8, compress_at=10)
    got = {r.gram: r.cnt for r in out.collect()}
    # total grams = 40 + 41 = 81; threshold cnt*8 >= 81 -> cnt >= 11
    assert got == {7 * 65536 + 8: 21, 8 * 65536 + 7: 20}


def test_heavy_hitter_grams_trigram_and_guards(spark):
    from json_schema_modern_spark.operators.tokens import heavy_hitter_grams

    df = spark.createDataFrame(
        [("a", [1, 2, 3, 1, 2, 3, 1, 2, 3])],  # (1,2,3)x3 of 7 trigrams
        "doc_id string, tokens array<int>")
    got = {r.gram: r.cnt for r in heavy_hitter_grams(df, denom=3, n=3).collect()}
    key = (1 * 65536 + 2) * 65536 + 3
    assert got[key] == 3
    with pytest.raises(ValueError):
        heavy_hitter_grams(df, denom=1)
    with pytest.raises(ValueError):
        heavy_hitter_grams(df, denom=16, capacity=8)


def test_heavy_hitter_grams_partition_invariant(spark):
    """The MG nomination pass depends on partition layout; the OUTPUT must
    not (exact verify makes it partition-invariant).  Drive the same
    seeded corpus through 1, 3, and 8 partitions and assert identical
    result sets; cross-check against a driver-side exact count."""
    import random
    from collections import Counter

    from json_schema_modern_spark.operators.tokens import heavy_hitter_grams

    rng = random.Random(7)
    rows = []
    for i in range(300):
        # zipf-ish: small ids dominate so real heavy bigrams exist
        toks = [min(int(rng.paretovariate(1.1)), 30) for _ in range(rng.randint(0, 40))]
        rows.append((f"d{i}", toks))
    exact = Counter()
    total = 0
    for _, toks in rows:
        for a, b in zip(toks, toks[1:]):
            exact[a * 65536 + b] += 1
            total += 1
    denom = 50
    expected = {g: c for g, c in exact.items() if c * denom >= total}
    assert expected, "fixture must contain at least one heavy bigram"

    df = spark.createDataFrame(rows, "doc_id string, tokens array<int>")
    results = []
    for parts in (1, 3, 8):
        out = heavy_hitter_grams(
            df.repartition(parts), denom=denom, capacity=60, compress_at=100)
        results.append({r.gram: r.cnt for r in out.collect()})
    assert results[0] == results[1] == results[2] == expected


def test_positional_entropy_template_detection(spark):
    from json_schema_modern_spark.operators.tokens import positional_entropy

    # source "tpl": every sequence starts with token 7 (templated header),
    # position 1 varies uniformly; source "nat": position 0 varies too.
    rows = [
        ("t1", "tpl", [7, 1, 5]),
        ("t2", "tpl", [7, 2]),
        ("t3", "tpl", [7, 3]),
        ("t4", "tpl", [7, 4]),
        ("n1", "nat", [1, 1]),
        ("n2", "nat", [2, 2]),
        ("n3", "nat", None),     # null tokens drop out entirely
        ("n4", "nat", []),       # empty slice contributes no positions
    ]
    df = spark.createDataFrame(rows, "doc_id string, source string, tokens array<int>")
    got = {(r.source, r.pos): r for r in positional_entropy(df, k=2).collect()}

    t0 = got[("tpl", 0)]
    assert t0.n_seqs == 4 and t0.distinct_tokens == 1
    assert t0.entropy == 0.0 and t0.top_share == 1.0   # fully templated
    t1 = got[("tpl", 1)]
    assert t1.n_seqs == 4 and t1.distinct_tokens == 4
    assert t1.entropy == 2.0 and t1.top_share == 0.25  # uniform over 4
    n0 = got[("nat", 0)]
    assert n0.n_seqs == 2 and n0.distinct_tokens == 2 and n0.entropy == 1.0
    # k bound: position 2 of t1's 3-token sequence is outside k=2
    assert ("tpl", 2) not in got and len(got) == 4


def test_positional_entropy_partition_invariant(spark):
    from json_schema_modern_spark.operators.tokens import positional_entropy

    rows = [(f"d{i}", "s", [i % 3, i % 5, i % 7]) for i in range(60)]
    df = spark.createDataFrame(rows, "doc_id string, source string, tokens array<int>")
    one = sorted(map(tuple, positional_entropy(df.coalesce(1), k=3).collect()))
    many = sorted(map(tuple, positional_entropy(df.repartition(13), k=3).collect()))
    # quantized-BIGINT entropy fold ⇒ bit-identical across partitionings
    assert one == many
