"""Deterministic train/validation/test split assignment.

A training-data pipeline needs a split assignment that is (a) stable
across runs and engines — re-ingesting a document must land it in the
same split forever, or eval sets leak into training; (b) a pure per-row
map — no shuffle, no state, no RNG.  Both follow from hashing the
document id: bucket = first 8 hex digits of md5(seed || id) mod
`buckets`.  md5, not Spark's hash(): Spark's Murmur3 is
engine-specific, while md5 reproduces bit-for-bit in any system (the
DuckDB oracle replays it verbatim).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def split_bucket(id_col: Column, seed: str = "split-v1",
                 buckets: int = 10000) -> Column:
    """Deterministic bucket in [0, buckets): first 32 bits of
    md5(seed || id), engine-portable."""
    h = F.md5(F.concat(F.lit(seed), id_col.cast("string")))
    return F.pmod(F.conv(F.substring(h, 1, 8), 16, 10).cast("long"),
                  F.lit(buckets))


def assign_split(
    df: DataFrame,
    id_col: str = "doc_id",
    weights: dict[str, float] | None = None,
    seed: str = "split-v1",
    buckets: int = 10000,
) -> DataFrame:
    """Add a `split` column ('train'/'valid'/'test' by default,
    98/1/1).  Weights must sum to 1; boundaries are cumulative bucket
    thresholds, so a document's split depends only on (seed, id)."""
    weights = weights or {"train": 0.98, "valid": 0.01, "test": 0.01}
    if abs(sum(weights.values()) - 1.0) > 1e-9:
        raise ValueError("split weights must sum to 1")
    b = split_bucket(F.col(id_col), seed, buckets)
    expr = None
    acc = 0.0
    names = list(weights)
    for name in names[:-1]:
        acc += weights[name]
        cond = b < int(round(acc * buckets))
        expr = F.when(cond, name) if expr is None else expr.when(cond, name)
    expr = (F.lit(names[-1]) if expr is None else expr.otherwise(names[-1]))
    return df.withColumn("split", expr)


def split_summary(
    df: DataFrame,
    id_col: str = "doc_id",
    weights: dict[str, float] | None = None,
    seed: str = "split-v1",
    buckets: int = 10000,
) -> DataFrame:
    """(split, n_docs) rollup of the assignment — the sanity check a
    pipeline runs before training."""
    return (
        assign_split(df, id_col, weights, seed, buckets)
        .groupBy("split").agg(F.count(F.lit(1)).alias("n_docs"))
        .orderBy("split")
    )


def split_leakage(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    weights: dict[str, float] | None = None,
    seed: str = "split-v1",
    buckets: int = 10000,
) -> DataFrame:
    """(fingerprint, n_docs, n_splits, splits) for every exact text
    fingerprint that lands in MORE THAN ONE split — the eval-leakage
    audit every split assignment must pass before training.  The id
    hash guarantees a *document* never moves between splits, but exact
    duplicate *texts* with different ids can straddle the boundary;
    this is the table of those stragglers (empty = clean).

    100 TB shape: the split label is a per-row map fused into the scan;
    leakage detection is ONE hash-shuffle on md5(text) (uniform by
    construction) with a map-side-combined distinct on (fp, split) —
    the same single-shuffle count as exact dedup.  `splits` is a
    sorted, comma-joined string so the output hashes identically on
    any engine."""
    tagged = assign_split(df, id_col=id_col, weights=weights, seed=seed,
                          buckets=buckets).where(F.col(text_col).isNotNull())
    per = (tagged.groupBy(F.md5(F.col(text_col)).alias("fingerprint"))
           .agg(F.count(F.lit(1)).alias("n_docs"),
                F.sort_array(F.collect_set("split")).alias("_splits")))
    return (per.where(F.size("_splits") > 1)
            .select("fingerprint", "n_docs",
                    F.size("_splits").cast("int").alias("n_splits"),
                    F.array_join("_splits", ",").alias("splits")))
