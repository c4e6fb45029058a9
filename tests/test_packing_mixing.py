"""Sequence packing, mixture rebalancing, and bloom incremental dedup.

Each operator is checked two ways: hand-computed expectations on a tiny
frame, and a DuckDB replay of the oracle SQL on the same data (the same
comparison the driver gate runs at sf0.01).
"""

from __future__ import annotations

import duckdb
import pytest

from pyspark.sql import functions as F


# ---------------------------------------------------------------- packing

def test_pack_next_fit_hand_case(spark):
    from json_schema_modern_spark.operators.packing import pack_next_fit

    rows = [
        # group a: sizes 60, 50, 40, 130(oversize? no, cap 128 -> 130 is), 10
        ("a", 1, 60), ("a", 2, 50), ("a", 3, 40), ("a", 4, 130), ("a", 5, 10),
        # group b: single doc
        ("b", 1, 5),
    ]
    df = spark.createDataFrame(rows, "source string, doc_id long, n_tok long")
    out = {(r.source, r.doc_id): (r.bin_id, r.bin_offset, r.oversize)
           for r in pack_next_fit(df, capacity=128).collect()}
    # a: 60 -> bin0@0; 50 -> fits (110) bin0@60; 40 -> 150>128 new bin1@0;
    #    130 -> 170>128 new bin2@0 (oversize); 10 -> 140>128 new bin3@0
    assert out[("a", 1)] == (0, 0, 0)
    assert out[("a", 2)] == (0, 60, 0)
    assert out[("a", 3)] == (1, 0, 0)
    assert out[("a", 4)] == (2, 0, 1)
    assert out[("a", 5)] == (3, 0, 0)
    assert out[("b", 1)] == (0, 0, 0)


def test_pack_capacity_invariant(spark):
    """No bin exceeds capacity unless it holds a single oversize doc."""
    from json_schema_modern_spark.operators.packing import pack_next_fit

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet") \
        .withColumn("n_tok", (F.col("n_chars") % 97 + 3).cast("long"))
    packed = pack_next_fit(docs, capacity=128)
    fills = (packed.groupBy("source", "bin_id")
             .agg(F.sum("n_tok").alias("fill"),
                  F.count(F.lit(1)).alias("n"),
                  F.max("oversize").alias("over"))
             .collect())
    assert fills
    for r in fills:
        assert r.fill <= 128 or (r.n == 1 and r.over == 1), r
    # bins are dense 0..max per group
    per_group = {}
    for r in packed.collect():
        per_group.setdefault(r.source, set()).add(r.bin_id)
    for g, bins in per_group.items():
        assert bins == set(range(len(bins))), g


def test_pack_matches_duckdb_oracle(spark):
    from json_schema_modern_spark.operators.packing import (
        pack_next_fit, pack_next_fit_oracle_sql,
    )

    path = "/root/testdata/sf0.001/documents.parquet"
    docs = spark.read.parquet(path) \
        .withColumn("n_tok", (F.col("n_chars") % 97 + 3).cast("long"))
    got = {(r.source, r.doc_id): (r.n_tok, r.bin_id, r.bin_offset, r.oversize)
           for r in pack_next_fit(docs, capacity=128).collect()}
    sql = pack_next_fit_oracle_sql(
        f"(SELECT source, doc_id, n_chars % 97 + 3 AS n_tok FROM '{path}')",
        capacity=128)
    want = {(s, d): (n, b, o, ov)
            for s, d, n, b, o, ov in duckdb.sql(sql).fetchall()}
    assert got == want


def test_packing_summary(spark):
    from json_schema_modern_spark.operators.packing import (
        pack_next_fit, packing_summary,
    )

    rows = [("a", i, 50) for i in range(10)]  # 2 per 128-bin -> 5 bins
    df = spark.createDataFrame(rows, "source string, doc_id long, n_tok long")
    s = packing_summary(pack_next_fit(df, 128), 128).collect()[0]
    assert (s.n_docs, s.n_bins, s.n_tokens) == (10, 5, 500)
    assert s.fill_ratio == round(500 / (5 * 128), 6)


# ---------------------------------------------------------------- mixing

def test_mixture_thresholds_hand_case(spark):
    from json_schema_modern_spark.operators.mixing import mixture_thresholds

    rows = [("a", 1, 100), ("a", 2, 100), ("b", 3, 50), ("c", 4, 400)]
    df = spark.createDataFrame(rows, "source string, doc_id long, n_tok long")
    out = {r.source: r for r in mixture_thresholds(df).collect()}
    # min_tokens = 50 -> thresholds: a 10000*50//200=2500, b 10000, c 1250
    assert out["a"].keep_threshold == 2500
    assert out["b"].keep_threshold == 10000
    assert out["c"].keep_threshold == 1250
    assert out["c"].expected_tokens == (400 * 1250) // 10000  # 50
    assert out["b"].n_docs == 1 and out["b"].n_tokens == 50


def test_stratified_sample_deterministic_and_exact(spark):
    from json_schema_modern_spark.operators.mixing import (
        mixture_thresholds, stratified_sample,
    )
    from json_schema_modern_spark.operators.splits import split_bucket

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet") \
        .withColumn("n_tok", (F.col("n_chars") % 97 + 3).cast("long"))
    th = mixture_thresholds(docs)
    sampled = stratified_sample(docs, th, seed="mix-v1")
    a = sorted(r.doc_id for r in sampled.collect())
    b = sorted(r.doc_id for r in sampled.collect())
    assert a == b and a  # deterministic, non-empty
    # every kept row clears its threshold; every dropped row misses it
    th_map = {r.source: r.keep_threshold for r in th.collect()}
    kept = set(a)
    check = docs.select("doc_id", "source",
                        split_bucket(F.col("doc_id"), "mix-v1").alias("b")) \
        .collect()
    for r in check:
        assert (r.doc_id in kept) == (r.b < th_map[r.source]), r


def test_mixture_oracle_parity(spark):
    from json_schema_modern_spark.operators.mixing import (
        mixture_thresholds, mixture_thresholds_oracle_sql,
    )

    path = "/root/testdata/sf0.001/documents.parquet"
    docs = spark.read.parquet(path) \
        .withColumn("n_tok", (F.col("n_chars") % 97 + 3).cast("long"))
    got = {r.source: (r.n_docs, r.n_tokens, r.keep_threshold, r.expected_tokens)
           for r in mixture_thresholds(docs).collect()}
    sql = mixture_thresholds_oracle_sql(f"'{path}'", "n_chars % 97 + 3")
    want = {s: (nd, nt, kt, et) for s, nd, nt, kt, et in duckdb.sql(sql).fetchall()}
    assert got == want


# ---------------------------------------------------------------- bloom

def test_bloom_incremental_matches_anti_join(spark):
    from json_schema_modern_spark.operators.bloom import incremental_new_docs

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    corpus = docs.filter(F.col("doc_id") % 7 != 0)
    batch = docs.filter(F.col("doc_id") % 3 == 0)
    got = sorted(r.doc_id for r in
                 incremental_new_docs(batch, corpus).collect())
    want = sorted(r.doc_id for r in batch.join(
        corpus.select(F.md5("text").alias("fp")).distinct(),
        F.md5(batch["text"]) == F.col("fp"), "left_anti").collect())
    assert got == want and got  # non-empty new set


def test_bloom_no_false_negatives_and_prunes(spark):
    """Every true dup hits the filter; a reasonable share of new docs is
    pruned before the join (the point of the operator)."""
    from json_schema_modern_spark.operators.bloom import (
        bloom_hits, build_bloom,
    )

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    corpus = docs.filter(F.col("doc_id") % 7 != 0)
    batch = docs.filter(F.col("doc_id") % 3 == 0)
    corpus_fp = corpus.select(F.md5("text").alias("fingerprint")).distinct()
    bm = build_bloom(corpus_fp, "fingerprint")
    tagged = batch.select(
        "doc_id",
        bloom_hits(F.md5(F.col("text")), bm, 1 << 20, 2).alias("hit"))
    hits = {r.doc_id: r.hit for r in tagged.collect()}
    dups = {r.doc_id for r in batch.filter(F.col("doc_id") % 7 != 0).collect()}
    for d in dups:
        assert hits[d]  # no false negatives
    new_ids = set(hits) - dups
    pruned = sum(1 for d in new_ids if not hits[d])
    # at m=2^20 bits, ~dozens of corpus keys -> FPR ~ 0: all new pruned
    assert pruned >= len(new_ids) * 0.9


def test_bloom_oversized_m_rejected():
    from json_schema_modern_spark.operators.bloom import _bit_positions

    pos = _bit_positions("a" * 32, 1 << 20, 6)
    assert len(pos) == 6 and all(0 <= p < 1 << 20 for p in pos)
    assert len(set(_bit_positions("b" * 32, 1 << 20, 2))) <= 2


def test_pack_null_size_raises(spark):
    """NULL n_tok must fail fast, not corrupt fill accounting (the size(
    NULL) hazard: NaN under ANSI, -1 under legacy sizeOfNull)."""
    from json_schema_modern_spark.operators.packing import pack_next_fit

    df = spark.createDataFrame(
        [("a", 1, 10), ("a", 2, None)],
        "source string, doc_id long, n_tok long")
    with pytest.raises(Exception, match="NULL n_tok"):
        pack_next_fit(df, capacity=128).collect()


def test_pack_negative_size_raises(spark):
    from json_schema_modern_spark.operators.packing import pack_next_fit

    df = spark.createDataFrame(
        [("a", 1, 10), ("a", 2, -1)],
        "source string, doc_id long, n_tok long")
    with pytest.raises(Exception, match="negative n_tok"):
        pack_next_fit(df, capacity=128).collect()


def test_pack_salted_skew(spark):
    """n_salts sub-stream packing: one group holding 90% of rows packs
    across >1 task (VERDICT r4 #7 — the serial-giant-group ceiling)."""
    from json_schema_modern_spark.operators.packing import pack_next_fit

    rows = [("web", i, 40 + (i % 60)) for i in range(900)]
    rows += [("books", i, 40 + (i % 60)) for i in range(100)]
    df = spark.createDataFrame(rows, "source string, doc_id long, n_tok long")

    packed = pack_next_fit(df, capacity=256, n_salts=8)
    # tag each output row with the task-partition that produced it BEFORE
    # any later shuffle: applyInPandas emits rows in the packing task.
    # AQE coalesces this kilobyte-sized test shuffle into one partition
    # (at real scale the partitions stay sized); pin it off so the test
    # observes the salt-driven task spread.
    coalesce_key = "spark.sql.adaptive.coalescePartitions.enabled"
    prev = spark.conf.get(coalesce_key, "true")
    try:
        spark.conf.set(coalesce_key, "false")
        tagged = packed.withColumn("pid", F.spark_partition_id())
        web_pids = {r.pid for r in
                    tagged.filter(F.col("source") == "web").select("pid")
                    .distinct().collect()}
    finally:
        spark.conf.set(coalesce_key, prev)
    assert len(web_pids) > 1, "giant group packed on a single task"

    out = packed.collect()
    assert len(out) == 1000  # every doc assigned exactly once
    # capacity invariant per (group, bin)
    import collections
    fills = collections.Counter()
    for r in out:
        fills[(r.source, r.bin_id)] += r.n_tok
        assert r.bin_offset + r.n_tok <= 256 or r.oversize
    assert all(v <= 256 for v in fills.values())
    # stitch uniqueness: residue class identifies the sub-stream
    assert len({r.bin_id % 8 for r in out if r.source == "web"}) > 1

    # deterministic: a re-run reproduces the identical assignment
    again = {(r.source, r.doc_id): (r.bin_id, r.bin_offset)
             for r in pack_next_fit(df, capacity=256, n_salts=8).collect()}
    assert all(again[(r.source, r.doc_id)] == (r.bin_id, r.bin_offset)
               for r in out)


def test_pack_salted_matches_per_substream_serial(spark):
    """Each sub-stream's packing equals the serial next-fit over just
    that sub-stream's rows (the stitch only renumbers bins)."""
    from json_schema_modern_spark.operators.packing import pack_next_fit

    rows = [("a", i, 30 + (i * 7) % 90) for i in range(200)]
    df = spark.createDataFrame(rows, "source string, doc_id long, n_tok long")
    salted = pack_next_fit(df, capacity=128, n_salts=4).collect()
    by_salt = {}
    for r in salted:
        by_salt.setdefault(r.bin_id % 4, []).append(r)
    # rebuild each sub-stream's input and pack it serially (n_salts=1)
    for salt, rs in by_salt.items():
        sub = spark.createDataFrame(
            [("a", r.doc_id, r.n_tok) for r in rs],
            "source string, doc_id long, n_tok long")
        serial = {r.doc_id: (r.bin_id, r.bin_offset)
                  for r in pack_next_fit(sub, capacity=128).collect()}
        for r in rs:
            assert serial[r.doc_id] == ((r.bin_id - salt) // 4, r.bin_offset)


def test_unimax_hand_case(spark):
    from json_schema_modern_spark.operators.mixing import unimax_allocation

    # caps at 2 epochs: A=20, B=200, C=2000; budget 600 water-fills:
    # A capped (20 <= 600/3), B capped (200 <= 580/2), C takes the
    # remaining 380 — 0.38 epochs.
    rows = ([("a", "A", 10)] + [(f"b{i}", "B", 50) for i in range(2)]
            + [(f"c{i}", "C", 200) for i in range(5)])
    df = spark.createDataFrame(rows, "doc_id string, source string, n_tok int")
    got = {r.source: r for r in unimax_allocation(
        df, budget_tokens=600, max_epochs=2.0).collect()}
    assert got["A"].capped and got["A"].alloc_tokens == 20.0
    assert got["A"].epochs == 2.0
    assert got["B"].capped and got["B"].alloc_tokens == 200.0
    assert not got["C"].capped and got["C"].alloc_tokens == 380.0
    assert got["C"].epochs == 0.38
    # allocations exhaust the budget exactly when any source is uncapped
    assert sum(r.alloc_tokens for r in got.values()) == 600.0


def test_unimax_budget_exceeds_all_caps(spark):
    from json_schema_modern_spark.operators.mixing import unimax_allocation

    df = spark.createDataFrame(
        [("a", "A", 10), ("b", "B", 100)],
        "doc_id string, source string, n_tok int")
    got = {r.source: r for r in unimax_allocation(
        df, budget_tokens=10_000, max_epochs=2.0).collect()}
    # every source capped at max_epochs; no division-by-zero on the
    # empty uncapped set
    assert all(r.capped for r in got.values())
    assert got["A"].alloc_tokens == 20.0 and got["B"].alloc_tokens == 200.0
    assert got["A"].epochs == 2.0 and got["B"].epochs == 2.0


def test_soft_quality_sample_deterministic_and_proportional(spark):
    from json_schema_modern_spark.operators.mixing import soft_quality_sample

    rows = [(i, min(1.0, i / 100.0)) for i in range(200)]
    df = spark.createDataFrame(rows, "doc_id int, quality_score double")
    a = {r.doc_id: r for r in soft_quality_sample(df).collect()}
    b = {r.doc_id: r for r in
         soft_quality_sample(df.repartition(7)).collect()}
    # deterministic: identical keep set under any partitioning
    assert {k: v.keep for k, v in a.items()} == {k: v.keep for k, v in b.items()}
    # boundary semantics: score 0 keeps nothing, score 1 keeps always
    assert not a[0].keep and a[100].keep and a[150].keep
    assert all(r.threshold == 10_000 for r in a.values() if r.score == 1.0)
    # proportional in aggregate: high-score half keeps far more than low
    lo = sum(a[i].keep for i in range(50))
    hi = sum(a[i].keep for i in range(50, 100))
    assert hi > lo


def test_soft_quality_sample_strength_sharpens(spark):
    from json_schema_modern_spark.operators.mixing import soft_quality_sample

    df = spark.createDataFrame(
        [(i, 0.5) for i in range(500)], "doc_id int, quality_score double")
    flat = soft_quality_sample(df, strength=1.0)
    sharp = soft_quality_sample(df, strength=3.0)
    # p = 0.5 -> threshold 5000; p = 0.125 -> threshold 1250
    assert flat.head().threshold == 5_000
    assert sharp.head().threshold == 1_250
    n_flat = flat.where("keep").count()
    n_sharp = sharp.where("keep").count()
    assert n_sharp < n_flat


def test_unimax_floor_cap_and_frac_budget(spark):
    from json_schema_modern_spark.operators.mixing import unimax_allocation

    import pytest as _pt

    # floor, not round: n=10 at 1.25 epochs caps at 12 tokens (1.2
    # epochs), never 13 (1.3 > max_epochs)
    df = spark.createDataFrame(
        [("a", "A", 10), ("b", "B", 1000)],
        "doc_id string, source string, n_tok int")
    got = {r.source: r for r in unimax_allocation(
        df, budget_tokens=400, max_epochs=1.25).collect()}
    assert got["A"].cap_tokens == 12 and got["A"].epochs <= 1.25
    # budget_frac resolves in-plan: 0.5 * 1010 = 505
    got2 = {r.source: r for r in unimax_allocation(
        df, budget_frac=0.5, max_epochs=1.25).collect()}
    assert got2["A"].alloc_tokens + got2["B"].alloc_tokens == 505.0
    # empty input yields an empty frame, not a driver error
    empty = spark.createDataFrame(
        [], "doc_id string, source string, n_tok int")
    assert unimax_allocation(empty, budget_frac=1.2).count() == 0
    with _pt.raises(ValueError):
        unimax_allocation(df)
    with _pt.raises(ValueError):
        unimax_allocation(df, budget_tokens=10, budget_frac=0.5)


def test_soft_quality_sample_null_score_drops(spark):
    from json_schema_modern_spark.operators.mixing import soft_quality_sample

    df = spark.createDataFrame(
        [(1, None), (2, 1.0)], "doc_id int, quality_score double")
    got = {r.doc_id: r for r in soft_quality_sample(df).collect()}
    # NULL score = unscored: threshold 0, never kept (a bare
    # least/greatest clamp would resolve NULL to p=1.0 and keep it)
    assert got[1].threshold == 0 and got[1].keep is False
    assert got[1].score is None
    assert got[2].keep is True
