"""Corpus-level diversity diagnostics: distinct-n ratio and Zipf slope.

Two standard training-corpus health metrics, per source:

* **distinct-n** (Li et al. 2016): |distinct n-grams| / |n-grams| over
  the whole source, not per document — the cross-document counterpart of
  `text.repetition_stats`.  A source whose distinct-2 ratio collapses is
  template spam or a crawler trap even when every individual document
  looks clean.
* **Zipf rank-frequency slope**: OLS slope of ln(freq) on ln(rank) over
  the source's unigram distribution.  Natural text sits near -1
  (Zipf's law); machine-generated or boilerplate-heavy sources flatten
  (slope → 0) or steepen past -1.5.  Slope = covar_pop(ln freq, ln rank)
  / var_pop(ln rank) — spelled as the explicit covariance ratio in BOTH
  engines so the oracle replays the same estimator.

Tokenization is the engine-portable `text.portable_words` form (split on
``[^A-Za-z0-9]+`` FIRST, then lowercase) — immune to the
Unicode-special-casing divergence recorded in docs/DEVIATIONS.md, unlike
the legacy lower-then-split tokenizers whose oracle hashes predate it.

Scale design (10^12 tokens): the n-gram/unigram frequency table is one
explode feeding a map-side-combined hash aggregate — the shuffle carries
O(|distinct grams| x partitions) partial rows, never the token stream.
distinct-n's exact COUNT(DISTINCT) is a second aggregate over that same
|distinct|-bounded table; `exact=False` swaps in a HyperLogLog sketch
(`approx_count_distinct`) collapsing it to one pass with fixed-size
state — the oracle uses the exact form (precedent:
`tokens.vocab_coverage`).  The Zipf rank is a per-source window over the
frequency TABLE (|vocab| rows, not corpus rows); vocabulary is bounded
(~10^6-10^7 types even at web scale), so the per-source sort is a
single small task, and `top_k` caps the fitted head anyway — the
standard practice, since the Zipf tail below min_freq is censored.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def _words(text_col: Column) -> Column:
    from .text import portable_words

    return portable_words(text_col, digits=True)


def _grams(text_col: Column, n: int) -> Column:
    """Word n-grams via zip_with over shifted slices (explode-free until
    the caller explodes; same construction as text.repetition_stats)."""
    w = _words(text_col)
    grams = F.slice(w, 1, F.greatest(F.size(w) - (n - 1), F.lit(0)))
    for i in range(1, n):
        shifted = F.slice(
            w, i + 1, F.greatest(F.size(w) - (n - 1), F.lit(0)))
        grams = F.zip_with(grams, shifted,
                           lambda a, b: F.concat(a, F.lit(" "), b))
    return grams


def distinct_ngram_ratio(
    df: DataFrame,
    text_col: str = "text",
    n: int = 2,
    by: str = "source",
    exact: bool = True,
) -> DataFrame:
    """(source, total_ngrams, distinct_ngrams, distinct_ratio) —
    cross-document distinct-n per source."""
    g = df.select(F.col(by),
                  F.explode(_grams(F.col(text_col), n)).alias("_g"))
    distinct = (F.count_distinct("_g") if exact
                else F.approx_count_distinct("_g"))
    return (
        g.groupBy(by)
         .agg(F.count(F.lit(1)).alias("total_ngrams"),
              distinct.alias("distinct_ngrams"))
         .select(
             by, "total_ngrams", "distinct_ngrams",
             F.round(F.col("distinct_ngrams") / F.col("total_ngrams"), 6)
              .alias("distinct_ratio"))
    )


def zipf_slope(
    df: DataFrame,
    text_col: str = "text",
    by: str = "source",
    top_k: int = 10_000,
) -> DataFrame:
    """(source, n_types, head_tokens, slope) — OLS slope of ln(freq) on
    ln(rank) over the top_k unigram ranks per source.  Rank ties break
    on the token string so the ranking (hence the fit) is deterministic
    in any engine.  head_tokens counts tokens in the FITTED head only
    (censored at top_k), not the source total — `tokens.oov_stats` /
    `stats_by_source` carry corpus totals.  A degenerate head with one
    distinct rank (var = 0) yields NULL slope in both engines — guarded
    explicitly, since unguarded 0/0 is NULL on some DuckDB versions and
    NaN on others."""
    toks = df.select(F.col(by),
                     F.explode(_words(F.col(text_col))).alias("_tok"))
    freqs = toks.groupBy(by, "_tok").agg(F.count(F.lit(1)).alias("_freq"))
    w = Window.partitionBy(by).orderBy(F.desc("_freq"), F.asc("_tok"))
    ranked = (freqs.withColumn("_rank", F.row_number().over(w))
                   .where(F.col("_rank") <= top_k))
    lx, ly = F.log("_rank"), F.log("_freq")
    return (
        ranked.groupBy(by)
              .agg(F.count(F.lit(1)).alias("n_types"),
                   F.sum("_freq").alias("head_tokens"),
                   F.when(F.var_pop(lx) > 0,
                          F.round(F.covar_pop(ly, lx) / F.var_pop(lx), 6))
                    .alias("slope"))
    )


def distinct_ngram_oracle_sql(table: str = "documents",
                              text_col: str = "text", n: int = 2,
                              by: str = "source") -> str:
    gram = " || ' ' || ".join(f"ws[i + {j}]" for j in range(n))
    return f"""
WITH w AS (
  SELECT {by},
         list_transform(list_filter(string_split_regex({text_col},
             '[^A-Za-z0-9]+'), x -> x <> ''), x -> lower(x)) AS ws
  FROM {table}
), g AS (
  SELECT {by},
         unnest(list_transform(range(1, greatest(len(ws) - {n - 2}, 1)),
                i -> {gram})) AS _g
  FROM w
)
SELECT {by}, CAST(count(*) AS BIGINT) AS total_ngrams,
       CAST(count(DISTINCT _g) AS BIGINT) AS distinct_ngrams,
       CAST(round(count(DISTINCT _g) * 1.0 / count(*), 6) AS DOUBLE)
         AS distinct_ratio
FROM g GROUP BY 1
"""


def zipf_slope_oracle_sql(table: str = "documents",
                          text_col: str = "text", by: str = "source",
                          top_k: int = 10_000) -> str:
    return f"""
WITH toks AS (
  SELECT {by},
         lower(unnest(list_filter(string_split_regex({text_col},
               '[^A-Za-z0-9]+'), x -> x <> ''))) AS _tok
  FROM {table}
), f AS (
  SELECT {by}, _tok, count(*) AS _freq FROM toks GROUP BY 1, 2
), r AS (
  SELECT {by}, _tok, _freq,
         row_number() OVER (PARTITION BY {by}
                            ORDER BY _freq DESC, _tok ASC) AS _rank
  FROM f
)
SELECT {by}, CAST(count(*) AS BIGINT) AS n_types,
       CAST(sum(_freq) AS BIGINT) AS head_tokens,
       CASE WHEN var_pop(ln(_rank)) > 0
            THEN CAST(round(covar_pop(ln(_freq), ln(_rank))
                            / var_pop(ln(_rank)), 6) AS DOUBLE)
       END AS slope
FROM r WHERE _rank <= {top_k} GROUP BY 1
"""


def boilerplate_ngrams(
    df: DataFrame,
    text_col: str = "text",
    n: int = 3,
    by: str = "source",
    top_k: int = 5,
    min_docs: int = 2,
) -> DataFrame:
    """(source, gram, n_docs, rank) — the top-k word n-grams per group by
    DOCUMENT frequency (each doc votes once per distinct gram): the C4-era
    boilerplate detector (navigation chrome, cookie banners, footer
    legalese repeat across documents, not merely within one).  Grams seen
    in fewer than `min_docs` documents are noise, not boilerplate.

    100 TB shape: per-doc distinct grams explode once, the doc-frequency
    agg is map-side combined (shuffle O(|distinct grams|)), and the top-k
    is a row_number window partitioned by group over the already-
    aggregated gram counts — the same bounded-partition pattern as
    `zipf_slope`.  Ties break on gram text for a deterministic ranking.
    """
    g = df.select(
        F.col(by),
        F.explode(F.array_distinct(_grams(F.col(text_col), n))).alias("gram"),
    )
    counts = (
        g.groupBy(by, "gram")
        .agg(F.count(F.lit(1)).alias("n_docs"))
        .where(F.col("n_docs") >= min_docs)
    )
    w = Window.partitionBy(by).orderBy(F.desc("n_docs"), F.asc("gram"))
    return (
        counts.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= top_k)
        .select(by, "gram", "n_docs", "rank")
    )


def boilerplate_ngrams_oracle_sql(table: str = "documents",
                                  text_col: str = "text", n: int = 3,
                                  by: str = "source", top_k: int = 5,
                                  min_docs: int = 2) -> str:
    """DuckDB replay of `boilerplate_ngrams`: same word split, per-doc
    distinct grams, doc-frequency count, and (n_docs DESC, gram ASC)
    row_number ranking."""
    gram = " || ' ' || ".join(f"ws[i + {j}]" for j in range(n))
    return f"""
WITH w AS (
  SELECT {by}, row_number() OVER () AS _doc,
         list_transform(list_filter(string_split_regex({text_col},
             '[^A-Za-z0-9]+'), x -> x <> ''), x -> lower(x)) AS ws
  FROM {table}
), g AS (
  SELECT DISTINCT {by}, _doc,
         unnest(list_transform(range(1, greatest(len(ws) - {n - 2}, 1)),
                i -> {gram})) AS gram
  FROM w
), c AS (
  SELECT {by}, gram, CAST(count(*) AS BIGINT) AS n_docs
  FROM g GROUP BY 1, 2 HAVING count(*) >= {min_docs}
), r AS (
  SELECT {by}, gram, n_docs,
         CAST(row_number() OVER (PARTITION BY {by}
              ORDER BY n_docs DESC, gram ASC) AS INT) AS rank
  FROM c
)
SELECT * FROM r WHERE rank <= {top_k}
"""


def vocab_growth(
    df: DataFrame,
    tokens_col: str = "tokens",
    id_col: str = "doc_id",
    n_shards: int = 8,
) -> DataFrame:
    """(shard, n_new_tokens, cum_vocab) — the Heaps-law vocabulary
    growth curve over a deterministic sharding of the corpus (shard =
    id mod n_shards): how many token types appear for the FIRST time
    in each shard, plus the running vocabulary size.  A flat tail says
    more data of this source stops adding types (diversity exhausted);
    eval teams read this before deciding whether another crawl epoch
    buys anything.

    100 TB shape: explode → min(shard) per token is ONE hash-shuffle
    on token id, map-side combined (partial min), so shuffle width is
    O(|vocab|) not O(corpus); the curve itself is an |n_shards|-row
    window — driver-trivial.  No per-shard rescans, no iterative pass
    per shard."""
    from pyspark.sql import Window

    first = (
        df.select(F.pmod(F.col(id_col), F.lit(int(n_shards))).alias("_shard"),
                  # within-row dedup before the explode: min(shard) per
                  # token is unchanged, the explode emits ~2x fewer rows
                  F.explode(F.array_distinct(tokens_col)).alias("_tok"))
        .groupBy("_tok")
        .agg(F.min("_shard").alias("shard"))
        .groupBy("shard")
        .agg(F.count(F.lit(1)).alias("n_new_tokens"))
    )
    w = (Window.orderBy("shard")
         .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    return first.select(
        F.col("shard").cast("long").alias("shard"),
        "n_new_tokens",
        F.sum("n_new_tokens").over(w).alias("cum_vocab"))
