"""Unigram language-model scoring — the CCNet-style LM-filter shape
(Wenzek et al., "CCNet: Extracting High Quality Monolingual Datasets",
LREC 2020 §4.3: score each document with a language model and filter by
perplexity band) with the LM reduced to a corpus-trained unigram model,
which is the piece expressible exactly in one engine pass and one oracle.

Two phases, both scale-shaped:

1. TRAIN — token counts over the in-vocab ids: explode with map-side
   partial aggregation, shuffle O(vocab × partitions) regardless of
   corpus size (the same shape as tokens.token_frequencies).  The count
   table collects to the driver as one float64 logprob array of
   ``vocab_size`` entries (guarded: a >4M-entry vocab should switch to
   the broadcast-join variant instead of a driver array — fail fast).

2. SCORE — one Arrow pass, zero shuffle: the logprob array rides in the
   task closure (vocab_size × 8 bytes — the same payload a broadcast
   join would ship) and every document's score is a vectorized numpy
   gather + mean.  Add-one smoothing: p(t) = (count(t)+1) / (total+V);
   out-of-vocab ids score as count 0.  score = −mean(log p) over the
   document's tokens (the unigram cross-entropy in nats; perplexity =
   exp(score)).  Empty/null token arrays yield NULL.

Reference anchor: the reference engine has no corpus statistics at all
(JSON-Schema-Modern is per-document); this operator is part of the
§2.8 engine-additions surface the target contract asks for.
"""

from __future__ import annotations

import math

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_MAX_DRIVER_VOCAB = 4_000_000


def unigram_logprobs(df: DataFrame, vocab_size: int,
                     tokens_col: str = "tokens") -> tuple[np.ndarray, float]:
    """(logprob array of len vocab_size, oov logprob) trained on the
    in-vocab token occurrences of ``df`` with add-one smoothing."""
    if vocab_size > _MAX_DRIVER_VOCAB:
        raise ValueError(
            f"vocab_size {vocab_size} exceeds the driver-array guard "
            f"({_MAX_DRIVER_VOCAB}); use a broadcast-join scoring variant")
    t = F.col(tokens_col)
    counts = (
        df.select(F.explode(t).alias("token"))
        .where((F.col("token") >= 0) & (F.col("token") < vocab_size))
        .groupBy("token").count()
        .collect()
    )
    total = sum(r["count"] for r in counts)
    denom = float(total + vocab_size)
    arr = np.full(vocab_size, math.log(1.0 / denom), dtype=np.float64)
    for r in counts:
        arr[r["token"]] = math.log((r["count"] + 1) / denom)
    return arr, math.log(1.0 / denom)


def unigram_logprob_scores(
    df: DataFrame,
    vocab_size: int,
    id_col: str = "doc_id",
    tokens_col: str = "tokens",
) -> DataFrame:
    """(id, n_tokens, lm_score) per document: unigram cross-entropy in
    nats (−mean log p), trained on the same corpus.  Lower = more typical
    of the corpus; filter bands the way CCNet buckets perplexity."""
    logp, oov_logp = unigram_logprobs(df, vocab_size, tokens_col)

    @F.pandas_udf("double")
    def score_udf(tok: pd.Series) -> pd.Series:
        out = np.full(len(tok), np.nan)
        for i, ts in enumerate(tok):
            if ts is None or len(ts) == 0:
                continue
            ids = np.asarray(ts, dtype=np.int64)
            lp = np.where((ids >= 0) & (ids < vocab_size),
                          logp[np.clip(ids, 0, vocab_size - 1)], oov_logp)
            out[i] = -lp.mean()
        return pd.Series(out)

    t = F.col(tokens_col)
    # size(NULL) is NULL under ANSI (this engine's default) and -1 under
    # legacy sizeOfNull — the isNull branch is required either way
    n_tok = F.when(t.isNull(), F.lit(0)).otherwise(F.size(t))
    return df.select(
        F.col(id_col),
        n_tok.cast("long").alias("n_tokens"),
        F.round(score_udf(t), 6).alias("lm_score"),
    )


def bigram_logprob_scores(
    df: DataFrame,
    vocab_size: int,
    id_col: str = "doc_id",
    tokens_col: str = "tokens",
) -> DataFrame:
    """(id, n_bigrams, bigram_score) per document: conditional bigram
    cross-entropy in nats, −mean log p(t2|t1) with add-one smoothing

        p(t2|t1) = (c(t1,t2) + 1) / (c(t1,·) + V)

    trained on the same corpus, over adjacent pairs with BOTH ids
    in-vocab (out-of-vocab pairs are skipped; a doc with no in-vocab
    bigram scores NULL).  The order-sensitive sibling of the unigram
    filter: repetitive token streams ("a b a b a b") look typical to a
    unigram model but improbable to a bigram one.

    100 TB shape: unlike the unigram path there is NO driver-side model
    array — the bigram table is a DataFrame joined back to the exploded
    pairs (c(t1,t2) has no V² bound driver-side; shuffle is
    O(|observed bigrams|), and the scoring join keys on (t1,t2) — AQE
    broadcasts it when small, sort-merge otherwise).  Pair construction
    is one zip_with, the count aggs are map-side combined, and the
    per-doc mean is a plain avg (round-6 on both engines)."""
    t = F.col(tokens_col)
    pairs = (
        df.select(
            F.col(id_col).alias("_id"),
            F.explode(F.zip_with(
                F.slice(t, 1, F.greatest(F.size(t) - 1, F.lit(0))),
                F.slice(t, 2, F.greatest(F.size(t) - 1, F.lit(0))),
                lambda a, b: F.struct(a.alias("t1"), b.alias("t2")),
            )).alias("p"),
        )
        .select("_id", F.col("p.t1").alias("t1"), F.col("p.t2").alias("t2"))
        .where((F.col("t1") >= 0) & (F.col("t1") < vocab_size)
               & (F.col("t2") >= 0) & (F.col("t2") < vocab_size))
    )
    c2 = pairs.groupBy("t1", "t2").agg(F.count(F.lit(1)).alias("n2"))
    c1 = c2.groupBy("t1").agg(F.sum("n2").alias("n1"))
    lp = F.log((F.col("n2") + F.lit(1.0)) / (F.col("n1") + F.lit(float(vocab_size))))
    scored = (
        pairs.join(c2, ["t1", "t2"]).join(c1, ["t1"])
        .groupBy("_id")
        .agg(F.count(F.lit(1)).alias("nb"), (-F.avg(lp)).alias("sc"))
    )
    return (
        df.select(F.col(id_col))
        .join(scored, F.col(id_col) == F.col("_id"), "left_outer")
        .select(
            F.col(id_col),
            F.coalesce(F.col("nb"), F.lit(0)).cast("long").alias("n_bigrams"),
            F.round("sc", 6).alias("bigram_score"),
        )
    )


def perplexity_buckets(
    scored: DataFrame,
    group_col: str = "source",
    score_col: str = "lm_score",
    exact: bool = True,
) -> DataFrame:
    """CCNet head/middle/tail perplexity bucketing (Wenzek et al. §4.3:
    split each language's documents into three equal-mass perplexity
    bands and keep the head/middle): per group, bucket documents by
    score terciles and report (group, bucket, n_docs, avg_score).

    ``scored`` is any DataFrame carrying ``group_col`` and ``score_col``
    (e.g. unigram_logprob_scores joined back to source).  NULL scores
    (empty documents) are excluded — documented contract.

    100 TB shape: a two-pass threshold plan, NOT a per-group window —
    ntile() would sort every document of a source on one task (a 10 TB
    source = one executor).  Pass 1 reduces to a |groups|-row threshold
    table (exact=True uses `percentile`, the interpolating exact
    aggregate that matches DuckDB quantile_cont bit-for-bit for the
    oracle gate; at web scale flip exact=False for `approx_percentile`,
    the sketch-mergeable KLL path with the identical plan shape).
    Pass 2 broadcast-joins the thresholds back and buckets with two
    comparisons — zero data shuffle beyond the final |groups x 3|-row
    aggregate."""
    s = F.col(score_col)
    pct = (F.percentile(s, F.array(F.lit(1.0 / 3.0), F.lit(2.0 / 3.0)))
           if exact else
           F.approx_percentile(s, F.array(F.lit(1.0 / 3.0), F.lit(2.0 / 3.0)),
                               F.lit(10000)))
    thresholds = (
        scored.where(s.isNotNull())
        .groupBy(group_col)
        .agg(pct.alias("_t"))
        .select(group_col, F.col("_t")[0].alias("_t1"), F.col("_t")[1].alias("_t2"))
    )
    bucket = (
        F.when(s <= F.col("_t1"), F.lit("head"))
        .when(s <= F.col("_t2"), F.lit("middle"))
        .otherwise(F.lit("tail"))
    )
    # avg_score sums the round-6 scores in exact 1e-6 integer units so the
    # mean is independent of float summation order, and ROUNDS IN MICRO
    # SPACE: round(x, 6) on a double like 4.1267675 is engine-dependent
    # (Spark rounds the shortest-decimal repr HALF_UP, C++ engines round
    # the binary value), while micro-unit ties (…7.5) are exactly
    # representable and round identically everywhere.
    micro = F.round(s * F.lit(1e6)).cast("long")
    return (
        scored.where(s.isNotNull())
        .join(F.broadcast(thresholds), group_col)
        .select(F.col(group_col), bucket.alias("bucket"), micro.alias("_m"))
        .groupBy(group_col, "bucket")
        .agg(F.count(F.lit(1)).alias("n_docs"), F.sum("_m").alias("_sm"))
        .select(
            F.col(group_col), "bucket", "n_docs",
            (F.round(F.col("_sm") * F.lit(1.0) / F.col("n_docs"))
             .cast("long") / F.lit(1e6)).alias("avg_score"))
        .orderBy(group_col, "bucket")
    )
