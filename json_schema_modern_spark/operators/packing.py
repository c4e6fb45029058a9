"""Sequence packing: assign token sequences to fixed-capacity context
windows (training "bins") ahead of example construction.

LLM pre-training consumes fixed-length contexts (2048/4096/8192 tokens);
feeding one short document per context wastes the tail, so pipelines pack
multiple sequences per context.  This operator implements deterministic
NEXT-FIT packing: within each group, documents are visited in a stable
order (`order_col`) and appended to the current open bin; when a document
does not fit, the bin is closed and a new one opens.  Next-fit (rather
than first-fit/best-fit) is chosen deliberately:

- it is ONE sequential O(n) pass with O(1) state per group — no
  open-bin index to maintain, so groups parallelize perfectly and memory
  per task is constant regardless of group size;
- the assignment is a pure function of (group, order, sizes), so
  re-running the job — or running it in a different engine — reproduces
  bit-identical bins (the DuckDB oracle replays it with a recursive CTE);
- its fill ratio on length-skewed corpora is within a few percent of
  first-fit-decreasing once documents are large relative to capacity,
  and FFD's sort breaks the stable-order property that makes packing
  reproducible under resume.

Scale design (10^12 sequences): packing is embarrassingly parallel
across groups, and production packers always shard the corpus first
(e.g. group = (source, split_bucket(doc_id) % N_SHARDS)) so each task
packs a bounded slice — packing has no cross-shard semantics worth a
global serial pass.  The applyInPandas shuffle is one hash exchange on
the group key; within a task the loop is O(rows in group).  A document
longer than `capacity` occupies its own bin (offset 0) — the upstream
chunker (see `sources/sequences.py` max-length contract) should have
split it, and the `oversize` flag makes the leak visible.

Reference parity note: the reference validates documents one at a time
and has no packing stage; this operator is part of the training-data
pipeline surface (brief: "operations a large-scale training-data
pipeline would need").
"""

from __future__ import annotations

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    IntegerType, LongType, StructField, StructType,
)


def pack_next_fit(
    df: DataFrame,
    capacity: int,
    group_col: str = "source",
    order_col: str = "doc_id",
    size_col: str = "n_tok",
    n_salts: int = 1,
) -> DataFrame:
    """Per-row bin assignment: (group, order, size, bin_id, bin_offset,
    oversize).  bin_id restarts at 0 per group; bin_offset is the token
    offset of this document inside its bin.

    Transition rule (replayed by the SQL oracle): a new bin opens iff the
    current bin is non-empty AND fill + size > capacity.  An oversize
    document (size > capacity) therefore lands alone in a bin when the
    bin is fresh, and forces a fresh bin otherwise.

    ``n_salts > 1`` removes the single-giant-group skew ceiling: the
    group's stream is split into ``n_salts`` deterministic sub-streams
    (md5(order) mod n_salts — the same replayable bucketing
    ``splits.py`` uses), each packed independently in parallel tasks,
    and the boundary stitch interleaves bin ids as
    ``local_bin * n_salts + salt`` so ids stay unique within the group
    and the whole assignment remains a pure function of
    (group, order, sizes, n_salts).  Cost of the stitch: each sub-stream
    ends with its own partially-filled bin, so at most ``n_salts - 1``
    extra under-filled bins per group vs the serial pass — negligible
    against the task-parallelism it buys on a 90%-one-source corpus.
    """
    if capacity <= 0:
        raise ValueError("capacity must be positive")
    if n_salts < 1:
        raise ValueError("n_salts must be >= 1")

    out_schema = StructType([
        StructField(group_col, df.schema[group_col].dataType, True),
        StructField(order_col, df.schema[order_col].dataType, True),
        StructField(size_col, LongType(), True),
        StructField("bin_id", LongType(), True),
        StructField("bin_offset", LongType(), True),
        StructField("oversize", IntegerType(), True),
    ])

    cap = capacity

    def pack_group(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(order_col, kind="mergesort").reset_index(drop=True)
        if pdf[size_col].isna().any():
            raise ValueError(
                f"pack_next_fit: NULL {size_col} in group "
                f"{pdf[group_col].iloc[0]!r} — a null size silently corrupts "
                f"fill/bin_offset accounting; coalesce or filter upstream "
                f"(e.g. guard F.size(tokens) with isNull, as oov_stats does)")
        sizes = pdf[size_col].to_numpy()
        if (sizes < 0).any():
            raise ValueError(
                f"pack_next_fit: negative {size_col} in group "
                f"{pdf[group_col].iloc[0]!r} (legacy sizeOfNull=-1?)")
        n = len(sizes)
        bin_ids = [0] * n
        offsets = [0] * n
        fill = 0
        bin_id = 0
        for i in range(n):
            s = int(sizes[i])
            if fill > 0 and fill + s > cap:
                bin_id += 1
                fill = 0
            bin_ids[i] = bin_id
            offsets[i] = fill
            fill += s
        if "_salt" in pdf.columns:
            # interleaved stitch: sub-stream `salt` owns the id residue
            # class salt (mod n_salts) — unique within the group,
            # deterministic, no cross-task coordination
            salt = int(pdf["_salt"].iloc[0])
            bin_ids = [b * n_salts + salt for b in bin_ids]
        return pd.DataFrame({
            group_col: pdf[group_col],
            order_col: pdf[order_col],
            size_col: sizes.astype("int64"),
            "bin_id": bin_ids,
            "bin_offset": offsets,
            "oversize": (sizes > cap).astype("int32"),
        })

    if n_salts == 1:
        src = df.select(group_col, order_col,
                        F.col(size_col).cast("long").alias(size_col))
        return src.groupBy(group_col).applyInPandas(pack_group, schema=out_schema)
    salt = (F.conv(F.substring(F.md5(F.col(order_col).cast("string")), 1, 8),
                   16, 10).cast("long") % n_salts).alias("_salt")
    src = df.select(group_col, order_col,
                    F.col(size_col).cast("long").alias(size_col), salt)
    return src.groupBy(group_col, "_salt").applyInPandas(
        pack_group, schema=out_schema)


def packing_summary(packed: DataFrame, capacity: int,
                    group_col: str = "source",
                    size_col: str = "n_tok") -> DataFrame:
    """Fill-efficiency rollup per group: n_docs, n_bins, n_tokens,
    fill_ratio (tokens / (bins*capacity)) — the number a pipeline owner
    watches to decide whether capacity/sharding is right."""
    return (
        packed.groupBy(group_col)
        .agg(F.count(F.lit(1)).alias("n_docs"),
             (F.max("bin_id") + 1).alias("n_bins"),
             F.sum(size_col).alias("n_tokens"))
        .withColumn(
            "fill_ratio",
            F.round(F.col("n_tokens") / (F.col("n_bins") * F.lit(capacity)), 6))
    )


def pack_next_fit_oracle_sql(table_expr: str, capacity: int,
                             group_col: str = "source",
                             order_col: str = "doc_id",
                             size_col: str = "n_tok",
                             n_salts: int = 1) -> str:
    """ANSI-SQL (DuckDB) replay of pack_next_fit: recursive CTE stepping
    one document per group per iteration (running-sum-with-reset is not
    expressible with plain window functions).  ``n_salts > 1`` replays
    the salted sub-stream split: the recursion groups by
    (group, md5-bucket-of-order) and the final bin id is stitched as
    local_bin * n_salts + salt — the identical derivation to the Spark
    side, so the salted path is hash-verified end-to-end."""
    if n_salts > 1:
        salt = (f"CAST(concat('0x', substr(md5(CAST({order_col} AS VARCHAR)), "
                f"1, 8)) AS BIGINT) % {n_salts}")
    else:
        salt = "CAST(0 AS BIGINT)"
    return f"""
WITH RECURSIVE t AS (
  SELECT {group_col} AS g, {salt} AS salt, {order_col} AS o,
         CAST({size_col} AS BIGINT) AS s,
         row_number() OVER (PARTITION BY {group_col}, {salt}
                            ORDER BY {order_col}) AS rn
  FROM {table_expr}
), rec AS (
  SELECT g, salt, o, s, rn, CAST(0 AS BIGINT) AS bin_id,
         CAST(0 AS BIGINT) AS bin_offset, s AS fill
  FROM t WHERE rn = 1
  UNION ALL
  SELECT t.g, t.salt, t.o, t.s, t.rn,
         CASE WHEN rec.fill > 0 AND rec.fill + t.s > {capacity}
              THEN rec.bin_id + 1 ELSE rec.bin_id END,
         CASE WHEN rec.fill > 0 AND rec.fill + t.s > {capacity}
              THEN 0 ELSE rec.fill END,
         CASE WHEN rec.fill > 0 AND rec.fill + t.s > {capacity}
              THEN t.s ELSE rec.fill + t.s END
  FROM rec JOIN t ON t.g = rec.g AND t.salt = rec.salt AND t.rn = rec.rn + 1
)
SELECT g AS {group_col}, o AS {order_col}, s AS {size_col},
       bin_id * {n_salts} + salt AS bin_id, bin_offset,
       CAST(CASE WHEN s > {capacity} THEN 1 ELSE 0 END AS INT) AS oversize
FROM rec
"""


def chunk_sequences(df: DataFrame, tokens_col: str = "tokens",
                    id_col: str = "doc_id", seq_len: int = 2048,
                    stride: int | None = None, min_tail: int = 1,
                    keep_cols: list[str] | None = None) -> DataFrame:
    """(id, [keep_cols...,] chunk_idx, chunk_tokens, n_chunk_tok) — split
    each token sequence into fixed-length context windows: chunk i covers
    tokens [i*stride, i*stride + seq_len).  `stride` defaults to
    `seq_len` (disjoint windows); stride < seq_len yields the overlapping
    windows used for long-document training continuity.  Tail chunks
    shorter than `min_tail` tokens are dropped; NULL/empty sequences emit
    no chunks.  The upstream half of `pack_next_fit` — chunk long
    documents down to <= capacity, then pack the pieces.

    100 TB shape: per-row `sequence` of starts + `slice` + posexplode —
    all JVM-side, no UDF, no shuffle; output rows ~= total_tokens /
    stride, the same order as the explode every tokenizer already does.
    chunk_idx comes from the start offset, not an engine-ordinal, so the
    output is deterministic under any partitioning."""
    if stride is None:
        stride = seq_len
    if seq_len <= 0 or stride <= 0:
        raise ValueError(f"seq_len/stride must be positive, got "
                         f"{seq_len}/{stride}")
    t = F.col(tokens_col)
    n = F.coalesce(F.size(t), F.lit(0))
    starts = F.filter(
        F.when(n > 0, F.sequence(F.lit(0), n - 1, F.lit(int(stride))))
         .otherwise(F.array().cast("array<int>")),
        lambda st: (n - st) >= min_tail)
    chunked = df.select(
        F.col(id_col),
        *[F.col(c) for c in (keep_cols or [])],
        F.posexplode(
            F.transform(starts,
                        lambda st: F.slice(t, st + 1, seq_len))
        ).alias("chunk_idx", "chunk_tokens"),
    )
    return chunked.select(
        F.col(id_col),
        *[F.col(c) for c in (keep_cols or [])],
        F.col("chunk_idx").cast("long").alias("chunk_idx"),
        "chunk_tokens",
        F.size("chunk_tokens").cast("long").alias("n_chunk_tok"),
    )
