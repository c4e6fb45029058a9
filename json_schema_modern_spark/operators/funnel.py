"""Curation funnel: the standard corpus-preparation pipeline
(quality filter → exact dedup → split assignment) with a per-source
stage-count rollup — the dashboard table every data-curation run reports.

Stages (each a primitive already analyzed for scale elsewhere in this
package; the funnel only composes them):

1. raw          — every ingested row;
2. quality      — rows whose cheap quality score (text.quality_features:
                  length/punct/stopword mix) clears `quality_min`;
3. unique       — one keeper per exact text fingerprint (md5), smallest
                  id wins (dedup.exact_duplicates' keep rule);
4. train        — keepers landing in the train split under the
                  deterministic md5-bucket assignment (splits).

Scale design (10^12 rows): the quality stage is a codegen'd per-row
map fused into the scan; the dedup stage is the single hash-shuffle on
the text fingerprint (uniform by construction — md5); the split stage is
again a per-row map.  The four per-source rollups are |sources|-row
aggregates joined broadcast, so the funnel adds exactly ONE data-sized
shuffle to the scan — the same count as running exact dedup alone.

The returned counts are monotone by construction
(n_raw >= n_quality >= n_unique >= n_train per source) and the DuckDB
oracle replays each stage as a CTE.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .splits import split_bucket
from .text import quality_features


def curation_funnel(
    df: DataFrame,
    quality_min: float = 0.5,
    text_col: str = "text",
    id_col: str = "doc_id",
    source_col: str = "source",
    train_buckets: int = 9800,
    seed: str = "split-v1",
) -> DataFrame:
    """(source, n_raw, n_quality, n_unique, n_train) per source."""
    feats = quality_features(df, text_col=text_col, id_col=id_col,
                             keep_cols=[source_col, text_col])

    raw = df.groupBy(source_col).agg(F.count(F.lit(1)).alias("n_raw"))

    qual = feats.filter(F.col("quality_score") >= quality_min)
    n_qual = qual.groupBy(source_col).agg(F.count(F.lit(1)).alias("n_quality"))

    # smallest-id keeper per exact fingerprint: min over (id, source)
    # structs orders by id first, so the keeper's source rides along
    # without a re-join
    uniq = (qual.groupBy(F.md5(F.col(text_col)).alias("_fp"))
                .agg(F.min(F.struct(F.col(id_col).alias("id"),
                                    F.col(source_col).alias("src"))).alias("k"))
                .select(F.col("k.id").alias(id_col),
                        F.col("k.src").alias(source_col)))
    n_uniq = uniq.groupBy(source_col).agg(F.count(F.lit(1)).alias("n_unique"))

    train = uniq.filter(
        split_bucket(F.col(id_col), seed=seed) < train_buckets)
    n_train = train.groupBy(source_col).agg(F.count(F.lit(1)).alias("n_train"))

    out = raw
    for stage in (n_qual, n_uniq, n_train):
        out = out.join(F.broadcast(stage), source_col, "left")
    return out.select(
        source_col,
        "n_raw",
        F.coalesce("n_quality", F.lit(0)).alias("n_quality"),
        F.coalesce("n_unique", F.lit(0)).alias("n_unique"),
        F.coalesce("n_train", F.lit(0)).alias("n_train"),
    )


def curation_funnel_oracle_sql(table_expr: str, quality_min: float = 0.5,
                               train_buckets: int = 9800,
                               seed: str = "split-v1") -> str:
    """DuckDB replay: same stages as CTEs (quality formula mirrors
    text.quality_features / the text_quality oracle)."""
    return f"""
WITH d AS (SELECT * FROM {table_expr}),
f AS (
  SELECT doc_id, source, text,
         CAST(round(CASE WHEN len(words) < 5 THEN 0.0 ELSE
           least(len(words)/100.0, 1.0)*0.4
           + (1.0 - least(pr*5, 1.0))*0.3
           + least(sr*4, 1.0)*0.3 END, 6) AS DOUBLE) AS quality_score
  FROM (
    SELECT doc_id, source, text, words,
           length(regexp_replace(text, '[A-Za-z0-9\\s]', '', 'g'))*1.0
             / greatest(length(text), 1) AS pr,
           len(list_filter(words, w -> list_contains(
             ['the','a','and','of','to','in','is','that','it','for'], w)))*1.0
             / greatest(len(words), 1) AS sr
    FROM (SELECT doc_id, source, text,
                 string_split_regex(trim(lower(text)), '\\s+') AS words
          FROM d))),
q AS (SELECT * FROM f WHERE quality_score >= {quality_min}),
u AS (SELECT min(doc_id) AS doc_id, arg_min(source, doc_id) AS source
      FROM q GROUP BY md5(text)),
t AS (SELECT * FROM u
      WHERE CAST(concat('0x', substr(md5('{seed}' ||
            CAST(doc_id AS VARCHAR)), 1, 8)) AS BIGINT) % 10000
            < {train_buckets}),
srcs AS (SELECT DISTINCT source FROM d)
SELECT srcs.source,
       coalesce(r.n, 0) AS n_raw,
       coalesce(qc.n, 0) AS n_quality,
       coalesce(uc.n, 0) AS n_unique,
       coalesce(tc.n, 0) AS n_train
FROM srcs
LEFT JOIN (SELECT source, count(*) AS n FROM d GROUP BY 1) r USING (source)
LEFT JOIN (SELECT source, count(*) AS n FROM q GROUP BY 1) qc USING (source)
LEFT JOIN (SELECT source, count(*) AS n FROM u GROUP BY 1) uc USING (source)
LEFT JOIN (SELECT source, count(*) AS n FROM t GROUP BY 1) tc USING (source)
"""


def top_fraction_filter(
    df: DataFrame,
    num: int,
    denom: int,
    score_col: str = "quality_score",
    group_col: str = "source",
    id_col: str = "doc_id",
) -> DataFrame:
    """(id, group, score, keep) — keep the top `num/denom` fraction of
    rows per group by score, with score-cutoff semantics: the cutoff is
    the highest score at which the descending cumulative count first
    reaches target = floor(n_group · num / denom), and every row with
    score ≥ cutoff keeps (boundary ties all keep, so n_kept ≥ target —
    the deterministic, re-ingestion-stable reading of "top 30% quality
    per source").  The fraction is a rational num/denom so target is
    exact integer arithmetic on both engines — no float threshold can
    flip a row.  A target of 0 keeps nothing.

    100 TB shape: NO per-source global sort of the data.  Counts
    aggregate per (group, score) — shuffle O(|distinct scores| per
    group, bounded for any rounded/bucketed score — then the cumulative
    scan and cutoff pick run in a window over those aggregated rows
    only, and the |groups|-row cutoff table broadcasts back onto the
    scan.  A window partitioned by group over RAW rows would serialize
    each source onto one task; this never touches raw rows after the
    count agg."""
    from pyspark.sql import Window

    counts = (
        df.where(F.col(score_col).isNotNull())   # NULL score never keeps
        .groupBy(group_col, score_col)
        .agg(F.count(F.lit(1)).alias("_cnt"))
    )
    totals = counts.groupBy(group_col).agg(F.sum("_cnt").alias("_n"))
    w = (Window.partitionBy(group_col)
         .orderBy(F.desc(score_col))
         .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    ranked = (
        counts.join(F.broadcast(totals), group_col)
        .withColumn("_cum", F.sum("_cnt").over(w))
        # exact integer target, clamped to n so num/denom > 1 keeps all
        .withColumn("_target",
                    F.least(F.expr(f"(_n * {int(num)}) div {int(denom)}"),
                            F.col("_n")))
    )
    cutoff = (
        ranked.where((F.col("_cum") >= F.col("_target")) & (F.col("_target") > 0))
        .groupBy(group_col)
        .agg(F.max(score_col).alias("_cutoff"))
    )
    return (
        df.select(F.col(id_col), F.col(group_col), F.col(score_col))
        .join(F.broadcast(cutoff), group_col, "left_outer")
        .select(
            id_col, group_col, score_col,
            F.coalesce(
                F.col("_cutoff").isNotNull()
                & (F.col(score_col) >= F.col("_cutoff")),
                F.lit(False)).alias("keep"),
        )
    )


def token_budget_filter(
    df: DataFrame,
    budget: int,
    score_col: str = "quality_score",
    weight_col: str = "n_tok",
    group_col: str = "source",
    id_col: str = "doc_id",
) -> DataFrame:
    """(id, group, score, weight, keep) — per-group TOKEN-budget
    selection: walk score levels best-first and keep every level whose
    cumulative token count BEFORE the level is still under `budget`
    (first-crossing-keeps).  The kept set is therefore the smallest
    score-prefix holding ≥ budget tokens (or everything, if the group
    is smaller than the budget); within a score level all rows keep, so
    the answer is re-ingestion-stable — no float threshold and no
    row-order dependence can flip a row.  NULL score or NULL/negative
    weight never keeps (same fail-closed reading as top_fraction_filter
    / pack_next_fit's explicit-coalesce call sites).

    100 TB shape (same skeleton as top_fraction_filter): tokens
    aggregate per (group, score) — shuffle O(|distinct score levels|),
    bounded for any rounded score — the cumulative scan runs over those
    aggregated rows only, and the |groups|-row cutoff broadcasts back
    onto the scan.  No per-group sort of raw rows ever happens."""
    from pyspark.sql import Window

    valid = df.where(
        F.col(score_col).isNotNull()
        & F.col(weight_col).isNotNull() & (F.col(weight_col) >= 0))
    levels = (valid.groupBy(group_col, score_col)
              .agg(F.sum(weight_col).alias("_tok")))
    w = (Window.partitionBy(group_col)
         .orderBy(F.desc(score_col))
         .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    cut = (levels.withColumn("_cum", F.sum("_tok").over(w))
           # keep the level iff the cumulative count BEFORE it is < budget
           .where((F.col("_cum") - F.col("_tok")) < F.lit(int(budget)))
           .groupBy(group_col)
           .agg(F.min(score_col).alias("_cutoff")))
    return (
        df.select(F.col(id_col), F.col(group_col),
                  F.col(score_col), F.col(weight_col))
        .join(F.broadcast(cut), group_col, "left_outer")
        .select(
            id_col, group_col, score_col, weight_col,
            F.coalesce(
                F.col("_cutoff").isNotNull()
                & F.col(score_col).isNotNull()
                & F.col(weight_col).isNotNull() & (F.col(weight_col) >= 0)
                & (F.col(score_col) >= F.col("_cutoff")),
                F.lit(False)).alias("keep"),
        )
    )


def group_cap_filter(
    df: DataFrame,
    cap: int,
    group_cols: list[str] | None = None,
    id_col: str = "doc_id",
    seed: str = "cap-v1",
) -> DataFrame:
    """(id, *groups, keep) — frequency cap: at most `cap` rows per group
    (the per-domain cap every web pipeline applies so one crawler-friendly
    host can't dominate an epoch).  Keepers are the `cap` smallest
    md5(seed || id) values — a deterministic pseudo-random draw, stable
    across re-ingestions and engines (hex strings compare identically
    everywhere; ties broken by id).

    100 TB shape: the rank window runs ONLY over groups that exceed the
    cap.  Per-group counts aggregate first (one |groups|-row table,
    broadcast back); under-cap groups — the overwhelming bulk of a
    domain-keyed corpus — pass through as a codegen'd map with NO window
    and no second shuffle.  Only the over-cap slice (bounded by
    |big groups| × group size) pays the partitioned sort, and that sort
    is per-group parallel."""
    from pyspark.sql import Window

    groups = group_cols or ["source", "lang"]
    counts = (df.groupBy(*groups)
              .agg(F.count(F.lit(1)).alias("_n")))
    key = F.md5(F.concat(F.lit(seed), F.col(id_col).cast("string")))
    # null-safe group join: a NULL domain is still a group (groupBy put
    # it in counts) — a plain equi-join would silently DROP those rows
    base = df.select(F.col(id_col), *[F.col(g) for g in groups])
    cnt = counts
    for g in groups:
        cnt = cnt.withColumnRenamed(g, f"_g_{g}")
    cond = None
    for g in groups:
        c = base[g].eqNullSafe(cnt[f"_g_{g}"])
        cond = c if cond is None else (cond & c)
    tagged = base.join(F.broadcast(cnt), cond).drop(
        *[f"_g_{g}" for g in groups])
    small = tagged.where(F.col("_n") <= cap) \
                  .select(id_col, *groups, F.lit(True).alias("keep"))
    w = Window.partitionBy(*groups).orderBy(key.asc(), F.col(id_col).asc())
    big = (tagged.where(F.col("_n") > cap)
           .withColumn("_rk", F.row_number().over(w))
           .select(id_col, *groups,
                   (F.col("_rk") <= F.lit(int(cap))).alias("keep")))
    return small.unionAll(big)
