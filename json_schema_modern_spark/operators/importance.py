"""DSIR-style data selection: hashed-unigram importance weights.

Data Selection via Importance Resampling (Xie et al., NeurIPS 2023)
scores every raw document by how target-like its token distribution is:
fit unigram bag-of-hashed-ngrams models on a small TARGET corpus and on
the RAW corpus, then weight each document by the log-likelihood ratio

    log w(d) = sum over tokens t in d of
               [ log p_target(bucket(t)) - log p_raw(bucket(t)) ]

and resample the raw corpus proportionally to w.  Hashing n-grams into a
fixed bucket table is the trick that makes the model engine-sized: the
"language model" is just B smoothed count ratios.

Engine-portable construction (the DuckDB oracle replays every step):

  * tokens  = text split on ``[^A-Za-z]+``, then lowercased (split
    before lower: post-split tokens are pure ASCII, immune to engine
    differences in Unicode special casing; empty strings dropped)
  * bucket  = first 32 bits of md5(seed || token) mod B   (same md5
    bucket as `splits.split_bucket` — never Spark's Murmur3 ``hash()``)
  * probs   = add-one smoothing: (n_b + 1) / (N + B)
  * output  rounded to 6 decimals — the two engines sum IEEE doubles in
    different orders; |log-ratio| <= ~15 and docs hold O(100) tokens, so
    associativity drift is ~1e-12, far inside the rounding grain.

Scale design (10^12 rows): the bucket table is ONE map-side-combined
hash aggregate over the exploded tokens with B groups (B = 4096 here;
DSIR uses 10^4-10^5 — still trivially broadcast-able), computing the
target and raw counts in the same pass via a conditional sum.  The
per-document pass is explode -> broadcast-join the B-row ratio table ->
re-aggregate by doc_id: the only data-sized shuffle is the final
group-by on the document key, the same shape as every per-doc text
statistic in `text.py`.  The target corpus is usually a tiny curated
set; here the target predicate is a column filter (lang = 'en') so the
whole fit stays one pass over one table.

The reference validates documents one at a time and has no notion of
corpus-level selection; this operator belongs to the training-pipeline
surface built around the validation engine.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

BUCKETS = 4096
SEED = "dsir-v1"


def _token_bucket(tok: Column, buckets: int = BUCKETS,
                  seed: str = SEED) -> Column:
    h = F.md5(F.concat(F.lit(seed), tok))
    return F.pmod(F.conv(F.substring(h, 1, 8), 16, 10).cast("long"),
                  F.lit(buckets))


def _tokens(text_col: Column) -> Column:
    """Split on non-[A-Za-z] FIRST, then lowercase: the surviving tokens
    are pure ASCII letters, where every engine's lower() agrees (the
    shared immune construction — see text.portable_words)."""
    from .text import portable_words

    return portable_words(text_col, digits=False)


def dsir_weights(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    target: Column | None = None,
    buckets: int = BUCKETS,
    seed: str = SEED,
) -> DataFrame:
    """(id, n_terms, log_weight): per-document DSIR importance score.

    `target` is a boolean Column marking the target-domain rows inside
    `df` (default: lang = 'en').  Documents with no [a-z] tokens get
    log_weight 0.0 and n_terms 0 (they carry no evidence either way).
    """
    if target is None:
        target = F.col("lang") == "en"
    toks = (
        df.select(F.col(id_col), target.alias("_is_target"),
                  F.explode(_tokens(F.col(text_col))).alias("_tok"))
          .select(id_col, "_is_target",
                  _token_bucket(F.col("_tok"), buckets, seed).alias("_b"))
    )
    # one B-group pass fits both models: raw count = all rows, target
    # count = conditional sum over the same rows
    per_bucket = toks.groupBy("_b").agg(
        F.count(F.lit(1)).alias("_n_raw"),
        F.sum(F.when(F.col("_is_target"), 1).otherwise(0)).alias("_n_tgt"),
    )
    totals = per_bucket.agg(
        F.sum("_n_raw").alias("_t_raw"), F.sum("_n_tgt").alias("_t_tgt"))
    # |buckets|-row ratio table x 1-row totals: both sides broadcast
    ratios = (
        per_bucket.crossJoin(F.broadcast(totals))
        .select(
            "_b",
            (F.log((F.col("_n_tgt") + 1.0)
                   / (F.col("_t_tgt") + float(buckets)))
             - F.log((F.col("_n_raw") + 1.0)
                     / (F.col("_t_raw") + float(buckets)))).alias("_lr"),
        )
    )
    # avg_log_ratio = per-token mean: the raw DSIR sum is length-biased
    # (longer docs accumulate more negative mass regardless of domain),
    # so the per-token mean is the ranking diagnostic.  Both outputs
    # round the UNROUNDED double sum — rounding the quotient of an
    # already-rounded sum would park the value exactly on .5e-6
    # boundaries (rounded sums are multiples of 1e-6), where Spark's
    # BigDecimal HALF_UP and DuckDB's float rounding disagree.
    scored = (
        toks.join(F.broadcast(ratios), "_b")
            .groupBy(id_col)
            .agg(F.count(F.lit(1)).alias("n_terms"),
                 F.round(F.sum("_lr"), 6).alias("log_weight"),
                 F.round(F.sum("_lr") / F.count(F.lit(1)), 6)
                  .alias("avg_log_ratio"))
    )
    # left join restores zero-token documents (explode dropped them)
    return (
        df.select(id_col).join(scored, id_col, "left")
          .select(
              id_col,
              F.coalesce("n_terms", F.lit(0)).cast("long").alias("n_terms"),
              F.coalesce("log_weight", F.lit(0.0)).alias("log_weight"),
              F.coalesce("avg_log_ratio", F.lit(0.0)).alias("avg_log_ratio"),
          )
    )


def dsir_oracle_sql(table: str = "documents", text_col: str = "text",
                    id_col: str = "doc_id",
                    target_sql: str = "lang = 'en'",
                    buckets: int = BUCKETS, seed: str = SEED) -> str:
    """DuckDB replay of dsir_weights (same md5 buckets, same smoothing)."""
    bucket = (f"CAST(concat('0x', substr(md5('{seed}' || _tok), 1, 8)) "
              f"AS BIGINT) % {buckets}")
    return f"""
WITH toks AS (
  SELECT {id_col}, _is_target, {bucket} AS _b
  FROM (
    -- evaluate the target predicate HERE, where every table column is
    -- in scope (the outer level projects only id/flag/token)
    SELECT {id_col}, ({target_sql}) AS _is_target,
           lower(unnest(regexp_split_to_array({text_col}, '[^A-Za-z]+'))) AS _tok
    FROM {table})
  WHERE _tok <> ''
), per_bucket AS (
  SELECT _b, count(*) AS _n_raw,
         sum(CASE WHEN _is_target THEN 1 ELSE 0 END) AS _n_tgt
  FROM toks GROUP BY 1
), totals AS (
  SELECT sum(_n_raw) AS _t_raw, sum(_n_tgt) AS _t_tgt FROM per_bucket
), ratios AS (
  SELECT _b,
         ln((_n_tgt + 1.0) / (_t_tgt + {buckets}.0))
       - ln((_n_raw + 1.0) / (_t_raw + {buckets}.0)) AS _lr
  FROM per_bucket, totals
), scored AS (
  SELECT toks.{id_col}, count(*) AS n_terms,
         round(sum(_lr), 6) AS log_weight,
         round(sum(_lr) / count(*), 6) AS avg_log_ratio
  FROM toks JOIN ratios USING (_b) GROUP BY 1
)
SELECT d.{id_col},
       CAST(coalesce(s.n_terms, 0) AS BIGINT) AS n_terms,
       CAST(coalesce(s.log_weight, 0.0) AS DOUBLE) AS log_weight,
       CAST(coalesce(s.avg_log_ratio, 0.0) AS DOUBLE) AS avg_log_ratio
FROM {table} d LEFT JOIN scored s ON d.{id_col} = s.{id_col}
"""
