"""Deterministic split assignment (operators/splits.py) and segment-level
dedup (operators/dedup.segment_duplicates)."""

import hashlib

import pytest
from pyspark.sql import functions as F

from json_schema_modern_spark.operators.dedup import segment_duplicates
from json_schema_modern_spark.operators.splits import assign_split, split_summary


def _expected_bucket(doc_id, seed="split-v1", buckets=10000):
    h = hashlib.md5((seed + str(doc_id)).encode()).hexdigest()
    return int(h[:8], 16) % buckets


def test_assign_split_matches_reference_hash(spark):
    df = spark.range(200).withColumnRenamed("id", "doc_id")
    got = {r.doc_id: r.split for r in assign_split(df).collect()}
    for i in range(200):
        b = _expected_bucket(i)
        want = "train" if b < 9800 else ("valid" if b < 9900 else "test")
        assert got[i] == want, (i, b)


def test_assign_split_stable_under_reordering(spark):
    df = spark.range(100).withColumnRenamed("id", "doc_id")
    a = {r.doc_id: r.split for r in assign_split(df).collect()}
    b = {r.doc_id: r.split
         for r in assign_split(df.orderBy(F.desc("doc_id"))).collect()}
    assert a == b


def test_assign_split_weights_validate(spark):
    df = spark.range(10).withColumnRenamed("id", "doc_id")
    with pytest.raises(ValueError, match="sum to 1"):
        assign_split(df, weights={"train": 0.5, "test": 0.1})


def test_split_summary_counts(spark):
    df = spark.range(1000).withColumnRenamed("id", "doc_id")
    rows = {r.split: r.n_docs for r in split_summary(df).collect()}
    assert sum(rows.values()) == 1000
    assert rows["train"] > 900        # ~98%


def test_segment_duplicates(spark):
    df = spark.createDataFrame(
        [
            (1, "a b c d e f g h " * 2),      # same 8-word segment twice
            (2, "a b c d e f g h unique tail words here padding x y z"),
            (3, "totally different content with no overlap at all okay"),
        ],
        "doc_id int, text string")
    rows = segment_duplicates(df, seg_words=8, min_occurrences=2).collect()
    assert len(rows) == 1
    seg_hash = hashlib.md5(b"a b c d e f g h").hexdigest()
    assert rows[0].seg_hash == seg_hash
    assert rows[0].n_occurrences == 3   # twice in doc 1, once in doc 2
    assert rows[0].n_docs == 2


def test_segment_duplicates_empty_text(spark):
    df = spark.createDataFrame([(1, ""), (2, "   ")], "doc_id int, text string")
    assert segment_duplicates(df).count() == 0


def test_split_leakage_detects_cross_split_dupes(spark):
    from json_schema_modern_spark.operators.splits import (
        assign_split, split_leakage,
    )

    # 200 ids sharing 100 texts; two ids with the same text land in
    # independent buckets, so with 50/25/25 some pair must straddle
    rows = [(i, f"text {i % 100}") for i in range(200)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    weights = {"train": 0.5, "valid": 0.25, "test": 0.25}
    out = split_leakage(df, weights=weights).collect()
    assert out
    tagged = {(r.doc_id, r.split): r
              for r in assign_split(df, weights=weights).collect()}
    # every reported fingerprint really does straddle splits
    import hashlib
    by_fp = {}
    for (doc_id, split) in tagged:
        fp = hashlib.md5(f"text {doc_id % 100}".encode()).hexdigest()
        by_fp.setdefault(fp, set()).add(split)
    for r in out:
        assert r.n_splits > 1
        assert set(r.splits.split(",")) == by_fp[r.fingerprint]
        assert r.splits == ",".join(sorted(r.splits.split(",")))
    # and nothing that straddles is missed
    want = {fp for fp, s in by_fp.items() if len(s) > 1}
    assert {r.fingerprint for r in out} == want


def test_split_leakage_null_text_ignored(spark):
    from json_schema_modern_spark.operators.splits import split_leakage

    df = spark.createDataFrame([(1, None), (2, None), (3, "x")],
                               "doc_id long, text string")
    assert split_leakage(df).collect() == []
