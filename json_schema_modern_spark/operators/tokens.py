"""Token-id statistics over `tokens:array<int>` columns (the engine's
payload axis; SURVEY.md §2.8 aggregations applied to the token table of
BASELINE.json's input_hint).

Scale shapes (10^12-sequence table):

- `token_frequencies`: explode + hash-aggregate.  The explode produces
  O(total tokens) rows but partial (map-side) aggregation collapses each
  partition to at most |vocab| states before the shuffle, so shuffle
  volume is O(|vocab| x partitions) — independent of row count.  Top-k is
  TakeOrderedAndProject (no global sort).
- `oov_stats`: NO explode — per-row OOV counting stays inside one
  codegen'd higher-order `filter`/`size` expression, then a per-source
  partial+final aggregate.  Shuffle is O(|sources| x partitions).
- `vocab_coverage`: distinct-token-id count via HLL sketch over the
  exploded ids (partial sketches merge map-side; exact count_distinct
  variant for the DuckDB oracle gate).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def token_frequencies(
    df: DataFrame, tokens_col: str = "tokens", top_k: int = 20,
) -> DataFrame:
    """Top-k most frequent token ids: (token, n_occurrences), ties broken
    by token id so the result is deterministic."""
    return (
        df.select(F.explode(tokens_col).alias("token"))
        .groupBy("token").agg(F.count(F.lit(1)).alias("n_occurrences"))
        .orderBy(F.desc("n_occurrences"), F.asc("token"))
        .limit(top_k)
    )


def oov_stats(
    df: DataFrame, vocab_size: int,
    tokens_col: str = "tokens", group_col: str = "source",
) -> DataFrame:
    """Per-group out-of-vocabulary rate for a [0, vocab_size) id space:
    (group, n_tokens, n_oov, oov_rate).  oov_rate is rounded to 6 decimals
    (documented oracle-parity convention)."""
    toks = F.col(tokens_col)
    oov = F.size(F.filter(toks, lambda t: (t < F.lit(0)) | (t >= F.lit(vocab_size))))
    # size(NULL) is NULL under ANSI (this engine's default) but -1 under
    # spark.sql.legacy.sizeOfNull — coalesce() would pass the -1 straight
    # into SUM, so gate on isNull() explicitly: null rows contribute 0
    # under EITHER config (the DuckDB oracle's len(NULL)=NULL is dropped
    # by SUM the same way).
    return (
        df.select(F.col(group_col).alias("grp"),
                  F.when(toks.isNull(), F.lit(0))
                   .otherwise(F.size(toks)).alias("_n"),
                  F.when(toks.isNull(), F.lit(0))
                   .otherwise(oov).alias("_oov"))
        .groupBy("grp")
        .agg(F.sum("_n").alias("n_tokens"), F.sum("_oov").alias("n_oov"))
        .select(
            F.col("grp").alias(group_col), "n_tokens", "n_oov",
            F.round(F.col("n_oov") / F.col("n_tokens"), 6).alias("oov_rate"))
        .orderBy(group_col)
    )


def vocab_coverage(
    df: DataFrame, vocab_size: int,
    tokens_col: str = "tokens", exact: bool = False, rsd: float = 0.01,
) -> DataFrame:
    """One-row summary: (n_distinct_tokens, vocab_size, coverage) where
    coverage counts only in-vocabulary ids.  exact=True swaps the HLL
    sketch for count(DISTINCT) — the DuckDB-oracle configuration."""
    ids = (
        df.select(F.explode(tokens_col).alias("token"))
        .filter((F.col("token") >= 0) & (F.col("token") < vocab_size))
    )
    distinct = (F.count_distinct("token") if exact
                else F.approx_count_distinct("token", rsd=rsd))
    return ids.agg(distinct.alias("n_distinct_tokens")).select(
        "n_distinct_tokens",
        F.lit(vocab_size).alias("vocab_size"),
        F.round(F.col("n_distinct_tokens") / F.lit(float(vocab_size)), 6)
        .alias("coverage"),
    )


def token_entropy(
    df: DataFrame,
    id_col: str = "doc_id",
    tokens_col: str = "tokens",
) -> DataFrame:
    """(id, n_tokens, n_distinct, entropy) — within-document Shannon
    entropy of the token unigram distribution in nats: H = −Σ (c/n)·ln(c/n)
    over the doc's own token counts.  The degenerate-repetition filter:
    "a b a b a b" has H = ln 2 no matter how long it runs, while natural
    text grows toward ln(n_distinct); filter on H or on H/ln(n_distinct).

    100 TB shape: one explode + map-side-combined (id, token) count, then
    a per-doc fold over the ≤|doc vocab| count rows in deterministic token
    order (array_sort + aggregate — bit-stable for the oracle, same
    pattern as psi_drift).  Empty/null token arrays yield n=0 and NULL
    entropy via the left join back to the id spine."""
    c = (
        df.select(F.col(id_col).alias("_id"), F.explode(tokens_col).alias("token"))
        .groupBy("_id", "token")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .groupBy("_id")
        .agg(F.array_sort(F.collect_list(F.struct("token", "cnt"))).alias("arr"))
        .select(
            "_id",
            F.aggregate("arr", F.lit(0).cast("long"),
                        lambda acc, x: acc + x["cnt"]).alias("n"),
            F.size("arr").alias("nd"),
            "arr",
        )
        .select(
            "_id", "n", "nd",
            F.aggregate(
                "arr", F.lit(0.0),
                lambda acc, x: acc - (x["cnt"] / F.col("n"))
                * F.log(x["cnt"] / F.col("n")),
            ).alias("ent"),
        )
    )
    return (
        df.select(F.col(id_col))
        .join(c, F.col(id_col) == F.col("_id"), "left_outer")
        .select(
            F.col(id_col),
            F.coalesce(F.col("n"), F.lit(0)).cast("long").alias("n_tokens"),
            F.coalesce(F.col("nd"), F.lit(0)).cast("long").alias("n_distinct"),
            F.round("ent", 6).alias("entropy"),
        )
    )


def positional_entropy(
    df: DataFrame,
    k: int = 16,
    tokens_col: str = "tokens",
    group_col: str = "source",
) -> DataFrame:
    """(group, pos, n_seqs, distinct_tokens, entropy, top_share) —
    token-distribution stats at each of the first `k` sequence positions,
    per group.  Low entropy / high top_share at early positions flags
    templated sequence starts (shared headers, boilerplate prompts, BOS
    scaffolding) — the cross-document complement of `token_entropy`'s
    within-document repetition check.  entropy is Shannon H in bits over
    the position's token distribution; top_share the modal token's mass.

    100 TB shape: posexplode of a k-slice bounds the explode at k rows
    per sequence (NOT O(n_tok)); the (group, pos, token) count
    map-side-combines to ≤ |groups|·k·|vocab-at-pos| states before the
    only data-sized shuffle.  The entropy sum folds integer-quantized
    per-token terms — round(c·log2 c · 1e6) summed as BIGINT — so the
    result is partition-order independent with no collect_list/sort
    (same convention as the quantized centroid passes); quantization
    error after the final division is < 1e-6 per term over n ≥ terms,
    inside the round-4 output precision."""
    toks = F.col(tokens_col)
    counts = (
        df.where(toks.isNotNull())
        .select(F.col(group_col).alias("grp"),
                F.posexplode(F.slice(toks, 1, k)).alias("pos", "token"))
        .groupBy("grp", "pos", "token")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    q = F.round(F.col("c") * F.log2("c") * F.lit(1e6)).cast("long")
    return (
        counts.groupBy("grp", "pos")
        .agg(F.sum("c").alias("n_seqs"),
             F.count(F.lit(1)).alias("distinct_tokens"),
             F.max("c").alias("_maxc"),
             F.sum(q).alias("_sq"))
        .select(
            F.col("grp").alias(group_col),
            F.col("pos").cast("long").alias("pos"),
            "n_seqs", "distinct_tokens",
            F.round(F.log2("n_seqs") - (F.col("_sq") / F.lit(1e6)) / F.col("n_seqs"),
                    4).alias("entropy"),
            F.round(F.col("_maxc") / F.col("n_seqs"), 6).alias("top_share"))
        .orderBy(group_col, "pos")
    )


def token_run_stats(
    df: DataFrame,
    tokens_col: str = "tokens",
    group_col: str = "source",
    loop_threshold: int = 3,
) -> DataFrame:
    """Per-group consecutive-repetition statistics: (group, n_docs,
    max_run, avg_max_run, n_loopy, loopy_frac) where a document's
    ``max_run`` is the length of its longest run of consecutive IDENTICAL
    token ids and "loopy" means max_run >= loop_threshold — the
    tokenizer-loop / degenerate-generation detector (a model emitting
    "the the the ..." or a tokenizer stuck on a byte produces long
    uniform runs that per-doc entropy alone can miss when the run is a
    small fraction of a long document).

    100 TB shape: the entire per-document run computation is ONE
    codegen'd higher-order `aggregate` fold over the token array — no
    explode, no window, zero extra rows; the only shuffle is the final
    per-source partial+final aggregate, O(|sources| x partitions).
    Documents with NULL/empty token arrays are excluded (documented
    contract, mirrored in the oracle's ``len(toks) >= 1`` filter).
    """
    toks = F.col(tokens_col)
    # fold state: (prev token, current run length, best run length);
    # prev starts NULL so the first comparison is NULL -> otherwise(1).
    init = F.struct(
        F.lit(None).cast("int").alias("prev"),
        F.lit(0).alias("run"),
        F.lit(0).alias("best"),
    )

    def step(acc, t):
        run = F.when(t == acc["prev"], acc["run"] + 1).otherwise(F.lit(1))
        return F.struct(
            t.alias("prev"), run.alias("run"),
            F.greatest(acc["best"], run).alias("best"))

    max_run = F.aggregate(toks, init, step, lambda acc: acc["best"])
    return (
        df.where(toks.isNotNull() & (F.size(toks) >= 1))
        .select(F.col(group_col).alias("grp"), max_run.alias("_mr"))
        .groupBy("grp")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.max("_mr").alias("max_run"),
            F.round(F.avg("_mr"), 6).alias("avg_max_run"),
            F.sum(F.when(F.col("_mr") >= loop_threshold, 1)
                  .otherwise(0)).alias("n_loopy"),
        )
        .select(
            F.col("grp").alias(group_col),
            "n_docs",
            F.col("max_run").cast("int").alias("max_run"),
            "avg_max_run",
            F.col("n_loopy").cast("long").alias("n_loopy"),
            F.round(F.col("n_loopy") / F.col("n_docs"), 6).alias("loopy_frac"),
        )
        .orderBy(group_col)
    )


def tokenizer_fertility(
    df: DataFrame,
    tokens_col: str = "tokens",
    text_col: str = "text",
    group_col: str = "source",
) -> DataFrame:
    """Per-source tokenizer fertility: (source, n_docs, n_tokens, n_chars,
    tokens_per_char, chars_per_token) — the compression-ratio diagnostic a
    tokenizer owner watches per domain (code tokenizes denser than prose;
    a fertility spike on one source flags mojibake or a domain the vocab
    was never trained on).  Ratios are rounded to 6 decimals (oracle
    parity convention); sources with zero chars report NULL ratios.

    100 TB shape: pure Column expressions into one partial+final aggregate
    — shuffle is O(|sources| x partitions), no explode, no UDF."""
    toks, txt = F.col(tokens_col), F.col(text_col)
    return (
        df.select(
            F.col(group_col).alias("source"),
            F.when(toks.isNull(), F.lit(0)).otherwise(F.size(toks))
             .cast("long").alias("_nt"),
            F.coalesce(F.length(txt), F.lit(0)).cast("long").alias("_nc"),
        )
        .groupBy("source")
        .agg(F.count(F.lit(1)).alias("n_docs"),
             F.sum("_nt").alias("n_tokens"),
             F.sum("_nc").alias("n_chars"))
        .select(
            "source", "n_docs", "n_tokens", "n_chars",
            F.when(F.col("n_chars") > 0,
                   F.round(F.col("n_tokens") / F.col("n_chars"), 6))
            .alias("tokens_per_char"),
            F.when(F.col("n_tokens") > 0,
                   F.round(F.col("n_chars") / F.col("n_tokens"), 6))
            .alias("chars_per_token"),
        )
    )


def coverage_topk_curve(
    df: DataFrame,
    ks: list[int],
    tokens_col: str = "tokens",
) -> DataFrame:
    """(k, covered, total, coverage) — fraction of ALL token occurrences
    accounted for by the k most frequent ids, for each k in `ks`: the
    head-mass curve that sizes a vocabulary (coverage@32k vs @64k) and
    exposes Zipf-tail domains.  Rank ties break by token id ascending
    (deterministic).

    100 TB shape: the explode collapses map-side to <=|vocab| states per
    partition before the shuffle; ranking then runs over the
    |vocab|-bounded frequency table — a single-partition window over at
    most a few million rows, independent of corpus size — and the k
    thresholds apply as one conditional aggregate."""
    from pyspark.sql import Window

    freq = (
        df.select(F.explode(tokens_col).alias("token"))
        .groupBy("token").agg(F.count(F.lit(1)).alias("cnt"))
    )
    ranked = freq.withColumn(
        "rk", F.row_number().over(
            Window.orderBy(F.desc("cnt"), F.asc("token"))))
    ks_df = ranked.sparkSession.createDataFrame(
        [(int(k),) for k in sorted(set(ks))], "k int")
    return (
        ranked.crossJoin(F.broadcast(ks_df))
        .groupBy("k")
        .agg(
            F.sum(F.when(F.col("rk") <= F.col("k"), F.col("cnt"))
                  .otherwise(F.lit(0))).cast("long").alias("covered"),
            F.sum("cnt").cast("long").alias("total"),
        )
        .select("k", "covered", "total",
                F.when(F.col("total") > 0,
                       F.round(F.col("covered") / F.col("total"), 6))
                .alias("coverage"))
        .orderBy("k")
    )


def _gram_exprs(tokens_col: str, n: int, base: int) -> tuple:
    """(grams, width): JVM-side Column of all base-`base` packed n-gram
    keys per row, and the per-row gram count.  gram(i) folds n consecutive
    ids into one long — replicable in SQL as t[i]*base^(n-1) + ... + t[i+n-1]."""
    t = F.col(tokens_col)
    width = F.when(t.isNull(), F.lit(0)).otherwise(
        F.greatest(F.size(t) - (n - 1), F.lit(0)))

    def gram_at(i):
        expr = None
        for j in range(n):
            term = F.element_at(t, i + j + 1).cast("long")
            expr = term if expr is None else expr * F.lit(base) + term
        return expr

    grams = F.transform(
        F.slice(F.coalesce(t, F.array().cast("array<int>")), F.lit(1), width),
        lambda _, i: gram_at(i))
    return grams, width


def heavy_hitter_grams(
    df: DataFrame,
    denom: int,
    n: int = 2,
    tokens_col: str = "tokens",
    capacity: int | None = None,
    compress_at: int | None = None,
    base: int = 65536,
) -> DataFrame:
    """(gram, cnt, frac) — every token n-gram whose EXACT occurrence count
    is >= total_grams / denom, via a two-pass Misra-Gries mergeable-summary
    sketch: the bounded-shuffle alternative to `token_frequencies` when the
    key space is n-grams rather than a fixed vocabulary (at 10^12 sequences
    the distinct-bigram space is ~|vocab|^2 — an exact groupBy shuffles
    O(|distinct grams| x partitions) partial states, while this pass
    shuffles at most `capacity` summary rows per partition, then exact
    counts ONLY the candidate set).

    Guarantee (Misra-Gries / mergeable summaries, Agarwal et al. 2012):
    each partition keeps an MG summary of capacity `capacity`
    (default 2*denom); every compression subtracts the (capacity+1)-th
    largest weight from all entries, so a key's total undercount is
    <= N_p/(capacity+1) per partition and <= N/(capacity+1) < N/denom
    after the union — any gram with true count >= N/denom therefore
    survives to the candidate set, and the exact verification pass
    (broadcast semi-join on candidates -> groupBy) makes the final counts
    exact with zero false positives/negatives.  The sketch pass is
    Arrow-batched numpy (no per-row Python); memory per task is bounded by
    `compress_at` (default 16*capacity) live keys.

    Precondition: token ids must lie in [0, base) (default 65536 —
    the packed long is unambiguous for n <= 3 at that base; raise `base`
    to the vocab bound for larger ids, keeping base**n < 2^63).
    """
    import pandas as pd

    if denom < 2:
        raise ValueError("denom must be >= 2 (threshold = total/denom)")
    cap = capacity if capacity is not None else 2 * denom
    if cap < denom:
        raise ValueError(
            f"capacity={cap} < denom={denom}: the MG undercount bound "
            "N/(capacity+1) must be below the threshold N/denom")
    squash_at = compress_at if compress_at is not None else 16 * cap

    grams, width = _gram_exprs(tokens_col, n, base)
    gram_rows = df.select(grams.alias("_grams"))

    def _mg_compress(counts: pd.Series, k: int) -> pd.Series:
        if len(counts) <= k:
            return counts
        kth = counts.nlargest(k + 1).iloc[-1]
        out = counts - kth
        return out[out > 0]

    def sketch(batches):
        import numpy as np

        acc = pd.Series(dtype="int64")
        for pdf in batches:
            arrs = [np.asarray(a, dtype="int64")
                    for a in pdf["_grams"] if a is not None and len(a)]
            if arrs:
                vals, cnts = np.unique(np.concatenate(arrs), return_counts=True)
                acc = acc.add(pd.Series(cnts.astype("int64"), index=vals),
                              fill_value=0)
                if len(acc) > squash_at:
                    acc = _mg_compress(acc, cap)
        acc = _mg_compress(acc, cap)
        yield pd.DataFrame({"gram": acc.index.astype("int64"),
                            "w": acc.values.astype("int64")})

    cands = (
        gram_rows.mapInPandas(sketch, "gram long, w long")
        .select("gram").distinct()
    )
    total = df.agg(F.sum(width).cast("long").alias("_total"))
    exact = (
        df.select(F.explode(grams).alias("gram"))
        .join(F.broadcast(cands), "gram")
        .groupBy("gram").agg(F.count(F.lit(1)).cast("long").alias("cnt"))
    )
    return (
        exact.crossJoin(F.broadcast(total))
        .where(F.col("cnt") * F.lit(denom) >= F.col("_total"))
        .select("gram", "cnt",
                F.round(F.col("cnt") / F.col("_total"), 6).alias("frac"))
    )


def collapse_token_runs(df: DataFrame, tokens_col: str = "tokens",
                        id_col: str = "doc_id") -> DataFrame:
    """(id, tokens_clean, n_tok, n_removed) — collapse every run of
    consecutive identical token ids down to a single occurrence: the
    repair transform for the degenerate sequences `token_run_stats`
    detects (tokenizer loops, stuck-generation spans), applied before
    packing so loops don't eat context budget.

    100 TB shape: one index-aware higher-order filter per row (keep
    position i iff i == 0 or tokens[i-1] != tokens[i]) — JVM-side, no
    UDF, no shuffle, no explode; output order is the input order so the
    transform composes with chunk/pack without a sort."""
    t = F.col(tokens_col)
    clean = F.filter(
        t, lambda x, i: (i == F.lit(0)) | (F.element_at(t, i) != x))
    n_in = F.coalesce(F.size(t), F.lit(0))
    n_out = F.coalesce(F.size(clean), F.lit(0))
    return df.select(
        F.col(id_col),
        clean.alias("tokens_clean"),
        n_out.cast("long").alias("n_tok"),
        (n_in - n_out).cast("long").alias("n_removed"),
    )
