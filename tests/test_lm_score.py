"""Unigram LM scoring (CCNet-style perplexity-proxy filter)."""

import math

import pytest

from json_schema_modern_spark.operators.lm_score import (
    unigram_logprob_scores, unigram_logprobs,
)


@pytest.fixture()
def toy(spark):
    # vocab 4; corpus counts: 0→3, 1→2, 3→1 (id 9 is OOV and untrained)
    rows = [(1, [0, 0, 1]), (2, [0, 1, 3]), (3, [9, 0]),
            (4, []), (5, None)]
    return spark.createDataFrame(rows, "doc_id long, tokens array<int>")


def test_trained_logprobs(toy):
    logp, oov = unigram_logprobs(toy, vocab_size=4)
    # total in-vocab tokens = 7 (id 9 excluded), denom = 7 + 4 = 11;
    # add-one smoothing: logp = log((count + 1) / denom)
    assert logp[0] == pytest.approx(math.log(5 / 11))
    assert logp[1] == pytest.approx(math.log(3 / 11))
    assert logp[2] == pytest.approx(math.log(1 / 11))   # unseen, smoothed
    assert logp[3] == pytest.approx(math.log(2 / 11))
    assert oov == pytest.approx(math.log(1 / 11))


def test_scores(toy):
    got = {r.doc_id: r for r in
           unigram_logprob_scores(toy, vocab_size=4).collect()}
    d = 11
    want1 = -(2 * math.log(5 / d) + math.log(3 / d)) / 3
    want3 = -(math.log(1 / d) + math.log(5 / d)) / 2   # OOV id 9 -> count 0
    assert got[1].lm_score == pytest.approx(want1, abs=1e-6)
    assert got[3].lm_score == pytest.approx(want3, abs=1e-6)
    assert got[1].n_tokens == 3
    # empty and null token arrays: no score, zero tokens
    assert got[4].lm_score is None and got[4].n_tokens == 0
    assert got[5].lm_score is None and got[5].n_tokens == 0
    # typical docs score lower (more probable) than OOV-heavy docs
    assert got[1].lm_score < got[3].lm_score


def test_vocab_guard(toy):
    with pytest.raises(ValueError, match="broadcast-join"):
        unigram_logprobs(toy, vocab_size=5_000_000)


def test_bigram_scores_hand_computed(spark):
    from json_schema_modern_spark.operators.lm_score import (
        bigram_logprob_scores,
    )

    # corpus bigrams (V=4): d1 -> (0,1),(1,0),(0,1); d2 -> (0,1);
    # d3 -> (9,0) skipped (9 OOV), (0,3) kept
    rows = [(1, [0, 1, 0, 1]), (2, [0, 1]), (3, [9, 0, 3]),
            (4, []), (5, None), (6, [7])]
    df = spark.createDataFrame(rows, "doc_id long, tokens array<int>")
    got = {r.doc_id: r for r in bigram_logprob_scores(df, 4).collect()}
    # c2: (0,1)->3, (1,0)->1, (0,3)->1 ; c1: 0->4, 1->1
    p01 = (3 + 1) / (4 + 4)
    p10 = (1 + 1) / (1 + 4)
    p03 = (1 + 1) / (4 + 4)
    want1 = -(2 * math.log(p01) + math.log(p10)) / 3
    assert got[1].n_bigrams == 3
    assert got[1].bigram_score == pytest.approx(want1, abs=1e-6)
    assert got[2].n_bigrams == 1
    assert got[2].bigram_score == pytest.approx(-math.log(p01), abs=1e-6)
    assert got[3].n_bigrams == 1   # the OOV-adjacent pair was skipped
    assert got[3].bigram_score == pytest.approx(-math.log(p03), abs=1e-6)
    # empty / null / single-token docs: zero bigrams, NULL score
    for d in (4, 5, 6):
        assert got[d].n_bigrams == 0 and got[d].bigram_score is None


def test_bigram_orders_repetition_below_novelty(spark):
    from json_schema_modern_spark.operators.lm_score import (
        bigram_logprob_scores,
    )

    rows = [(1, [1, 2] * 10), (2, list(range(3, 23)))]
    df = spark.createDataFrame(rows, "doc_id long, tokens array<int>")
    got = {r.doc_id: r.bigram_score
           for r in bigram_logprob_scores(df, 100).collect()}
    assert got[1] < got[2]   # repetitive stream is more predictable


def test_perplexity_buckets(spark):
    from json_schema_modern_spark.operators.lm_score import (
        perplexity_buckets,
    )

    # six docs per source with distinct scores -> terciles of 2 docs each
    rows = [(i, "a", float(i)) for i in range(1, 7)] + \
           [(10 + i, "b", 10.0 + i) for i in range(1, 7)] + \
           [(99, "a", None)]   # NULL score excluded
    df = spark.createDataFrame(
        rows, "doc_id long, source string, lm_score double")
    got = {(r.source, r.bucket): (r.n_docs, r.avg_score)
           for r in perplexity_buckets(df).collect()}
    # thresholds for 1..6 at q=1/3, 2/3 -> 2.666.., 4.333..
    assert got[("a", "head")] == (2, 1.5)
    assert got[("a", "middle")] == (2, 3.5)
    assert got[("a", "tail")] == (2, 5.5)
    assert got[("b", "head")] == (2, 11.5)
    assert len(got) == 6


def test_perplexity_buckets_approx_path(spark):
    from json_schema_modern_spark.operators.lm_score import (
        perplexity_buckets,
    )

    rows = [(i, "a", float(i % 10)) for i in range(200)]
    df = spark.createDataFrame(
        rows, "doc_id long, source string, lm_score double")
    got = perplexity_buckets(df, exact=False).collect()
    assert sum(r.n_docs for r in got) == 200
    assert {r.bucket for r in got} <= {"head", "middle", "tail"}
