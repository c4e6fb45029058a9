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
