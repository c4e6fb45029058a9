"""Bloom-prefiltered incremental dedup: which documents in an incoming
batch are NEW relative to an existing corpus?

The continuous-ingestion variant of exact dedup (`dedup.exact_duplicates`
is the whole-corpus batch tool).  The naive plan anti-joins the batch
against the corpus fingerprint table — at 10^12 corpus rows that shuffles
the full corpus for every (much smaller) incoming batch.  The classic
scale pattern instead:

1. build a Bloom filter over the corpus fingerprints ONCE (one scan,
   per-partition bitmaps OR-reduced — associative, so map-side partial);
2. broadcast the bitmap; a batch row whose fingerprint misses the filter
   is DEFINITELY new (Bloom filters have no false negatives) — no join;
3. only the hits ("maybe dup": true dups + false positives, ~p of the
   new rows) proceed to the exact anti-join.

The result is EXACT — the filter only prunes join input — so the DuckDB
oracle is the plain anti-join.  A test asserts the prune actually
happens (exact-join input < batch size).

Scale design (10^12 corpus keys): a single broadcast bitmap would need
~1.4 TB at 1% FPR, so the production shape buckets the corpus by
fingerprint prefix (the checkpoint/lineage bucketing in plans/pipeline
already hashes the same way) and keeps ONE bloom per bucket (~1.4 GB per
2^10 buckets), with the batch repartitioned by the same prefix so each
task loads only its bucket's filter.  The single-bitmap implementation
here is that plan with n_buckets=1, which is the right plan at the
10^6-10^9 corpus sizes a per-ingest increment sees; `m_bits` is the
explicit knob.  Hash functions: k slices of the row's md5 digest —
engine-portable and already the corpus fingerprint, so membership needs
no second hash pass.
"""

from __future__ import annotations

import hashlib
from typing import Iterator

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import BinaryType, BooleanType, StructField, StructType


def _bit_positions(hex_digest: str, m_bits: int, k: int) -> list[int]:
    """k bit positions from non-overlapping 15-hex-digit (60-bit) slices
    of the md5 hex digest, wrapping via re-hash when k > 2."""
    positions = []
    d = hex_digest
    while len(positions) < k:
        for i in range(0, len(d) - 14, 15):
            positions.append(int(d[i:i + 15], 16) % m_bits)
            if len(positions) == k:
                return positions
        d = hashlib.md5(d.encode()).hexdigest()
    return positions


def build_bloom(fingerprints: DataFrame, fp_col: str,
                m_bits: int = 1 << 20, k: int = 2) -> bytes:
    """OR-reduce per-partition bitmaps over md5-hex fingerprints.
    Driver collect is bounded: n_partitions × m_bits/8 bytes (128 KiB per
    partition at the default m_bits) — same bounded-collect discipline as
    the pipeline bucket lists."""
    n_bytes = m_bits // 8

    def partition_bitmap(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        bm = np.zeros(n_bytes, dtype=np.uint8)
        seen = False
        for pdf in it:
            for h in pdf[fp_col]:
                if not isinstance(h, str):   # md5(NULL text) -> NULL fp:
                    continue                 # NULL never equi-joins, so it
                seen = True                  # has no bits to contribute
                for pos in _bit_positions(h, m_bits, k):
                    bm[pos >> 3] |= 1 << (pos & 7)
        if seen:
            yield pd.DataFrame({"bitmap": [bm.tobytes()]})

    schema = StructType([StructField("bitmap", BinaryType(), False)])
    parts = fingerprints.mapInPandas(partition_bitmap, schema=schema).collect()
    acc = np.zeros(n_bytes, dtype=np.uint8)
    for row in parts:
        acc |= np.frombuffer(row.bitmap, dtype=np.uint8)
    return acc.tobytes()


def bloom_hits(fp_col, bitmap: bytes, m_bits: int, k: int):
    """Column: fingerprint might be in the set (vectorized Arrow UDF; the
    bitmap rides the task closure exactly once per executor)."""
    bm = np.frombuffer(bitmap, dtype=np.uint8)

    @F.pandas_udf(BooleanType())
    def might_contain(fps: pd.Series) -> pd.Series:
        out = np.empty(len(fps), dtype=bool)
        for i, h in enumerate(fps):
            if not isinstance(h, str):
                # NULL fingerprint: never matches in the exact anti-join
                # either, so report a definite miss (row stays "new")
                out[i] = False
                continue
            hit = True
            for pos in _bit_positions(h, m_bits, k):
                if not (bm[pos >> 3] >> (pos & 7)) & 1:
                    hit = False
                    break
            out[i] = hit
        return pd.Series(out)

    return might_contain(fp_col)


def incremental_new_docs(
    batch: DataFrame,
    corpus: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    m_bits: int = 1 << 20,
    k: int = 2,
) -> DataFrame:
    """Exact set of batch docs whose text fingerprint is absent from the
    corpus: bloom-pruned anti-join (see module docstring).  Output:
    (id_col, fingerprint)."""
    fp = F.md5(F.col(text_col)).alias("fingerprint")
    corpus_fp = corpus.select(fp).distinct()
    batch_fp = batch.select(F.col(id_col), fp)

    bitmap = build_bloom(corpus_fp, "fingerprint", m_bits=m_bits, k=k)
    hit = bloom_hits(F.col("fingerprint"), bitmap, m_bits, k)
    tagged = batch_fp.withColumn("_maybe_dup", hit)

    definite_new = tagged.filter(~F.col("_maybe_dup")).drop("_maybe_dup")
    maybe = tagged.filter(F.col("_maybe_dup")).drop("_maybe_dup")
    verified_new = maybe.join(corpus_fp, "fingerprint", "left_anti") \
                        .select(id_col, "fingerprint")
    return definite_new.select(id_col, "fingerprint").unionAll(verified_new)
