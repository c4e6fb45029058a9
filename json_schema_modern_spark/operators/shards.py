"""Deterministic global shuffle + shard/position export for training.

A training run wants the corpus in a *fixed pseudo-random order*, split
into shards a data loader can seek into: re-running the export (or
resuming it after a failure) must produce byte-identical shards, or two
trainers reading "the same" corpus see different batch orders.  RNG-based
shuffles (`ORDER BY rand()`) break that; hashing does not.  Order key =
md5(seed || doc_id) — the same engine-portable construction as
`splits.split_bucket` (md5, not Spark's Murmur3 `hash()`, so the DuckDB
oracle and any future engine replay it bit-for-bit):

    shard = int(md5[:8], 16) mod n_shards        (uniform, stable)
    pos   = rank of md5 hex string within shard   (ties broken by id)

Scale design (10^12 rows): the assignment itself is a pure per-row map —
no shuffle, no state.  Materializing positions costs exactly ONE shuffle
(partition by shard) + a per-shard sort, which is the same shuffle the
shard *writer* needs anyway, so the position column is free at export
time.  One window partition = one shard = one task: pick `n_shards` at
or above cluster parallelism (a 10^12-row corpus exports to 10^4-10^5
shards of ~10^7-10^8 rows, far beyond any executor count) and the
md5-uniform shard sizes make the sort tasks equal-weight — no skew, no
straggler.  For a pure file export without the position column,
`repartition(n_shards, shard).sortWithinPartitions(sort_key)` produces
the identical order with the identical single shuffle.

The reference has no corpus-export notion (it validates documents one at
a time); this operator exists for the training-pipeline surface the
engine feeds.  Cf. the shard-shuffle design in T5/C4 and Megatron-LM
data loaders (fixed shard count, deterministic order, seekable offsets).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def shuffle_key(id_col: Column, seed: str = "shuffle-v1") -> Column:
    """Engine-portable pseudo-random order key: md5(seed || id) hex.

    The full 32-hex-char string (not a truncated integer) so collisions
    are negligible and lexicographic order is the shuffle order."""
    return F.md5(F.concat(F.lit(seed), id_col.cast("string")))


def assign_shards(
    df: DataFrame,
    id_col: str = "doc_id",
    n_shards: int = 8,
    seed: str = "shuffle-v1",
) -> DataFrame:
    """Add (shard, pos): shard in [0, n_shards), pos = 1-based position
    of the row within its shard under the deterministic shuffle order.

    One shuffle (the window's partition-by-shard exchange); everything
    else is per-row arithmetic.  `pos` is dense and gap-free per shard,
    so `(shard, pos)` is a seekable address for a data loader."""
    key = shuffle_key(F.col(id_col), seed)
    shard = F.pmod(
        F.conv(F.substring(key, 1, 8), 16, 10).cast("long"),
        F.lit(n_shards),
    ).cast("int")
    w = Window.partitionBy("shard").orderBy("_key", id_col)
    return (
        df.withColumn("_key", key)
          .withColumn("shard", shard)
          .withColumn("pos", F.row_number().over(w))
          .drop("_key")
    )


def shard_summary(
    df: DataFrame,
    id_col: str = "doc_id",
    n_shards: int = 8,
    seed: str = "shuffle-v1",
) -> DataFrame:
    """(shard, n_rows, max_pos) — the export manifest row per shard;
    max_pos == n_rows asserts the position column is dense."""
    return (
        assign_shards(df, id_col, n_shards, seed)
        .groupBy("shard")
        .agg(F.count(F.lit(1)).alias("n_rows"),
             F.max("pos").alias("max_pos"))
    )


def shards_oracle_sql(table: str, id_col: str = "doc_id",
                      n_shards: int = 8, seed: str = "shuffle-v1") -> str:
    """DuckDB replay of assign_shards over `table` (all columns kept)."""
    key = f"md5('{seed}' || CAST({id_col} AS VARCHAR))"
    shard = (f"CAST(CAST(concat('0x', substr({key}, 1, 8)) AS BIGINT) "
             f"% {n_shards} AS INT)")
    return (
        f"SELECT {id_col}, {shard} AS shard, "
        f"CAST(row_number() OVER (PARTITION BY {shard} "
        f"ORDER BY {key}, {id_col}) AS INT) AS pos "
        f"FROM {table}"
    )
