"""Minimum end-to-end slice (SURVEY.md §7.1 step 3): flagship spec over the
synthetic token table — clean data passes, injected corruptions produce
exactly the expected violation locations."""

import pytest
from pyspark.sql import functions as F

from json_schema_modern_spark import Validator
from json_schema_modern_spark.sources.sequences import (
    MAX_LEN,
    VOCAB_SIZE,
    expected_tokens_expr,
    sequences_df,
)

FLAGSHIP = {
    "$id": "https://example.org/specs/token-sequences",
    "type": "object",
    "required": ["doc_id", "tokens", "n_tok", "source"],
    "properties": {
        "doc_id": {"type": "string", "pattern": "^doc-[0-9]{12}$"},
        "tokens": {
            "type": "array",
            "minItems": 1,
            "maxItems": MAX_LEN,
            "items": {"type": "integer", "minimum": 0, "maximum": VOCAB_SIZE - 1},
        },
        "n_tok": {"type": "integer", "minimum": 1, "maximum": MAX_LEN},
        "source": {"enum": ["web", "books", "code", "wiki", "forums"]},
    },
}


@pytest.fixture(scope="module")
def clean(spark):
    return sequences_df(spark, 2000, seed=42).cache()


def test_clean_data_passes(spark, clean):
    v = Validator(FLAGSHIP)
    res = v.validate(clean, id_cols=["doc_id"])
    assert res.violations.count() == 0
    assert res.flag() is True


def test_partition_results_shape(spark, clean):
    v = Validator(FLAGSHIP)
    res = v.validate(clean, id_cols=["doc_id"])
    pr = res.partition_results().collect()
    assert sum(r.doc_count for r in pr) == 2000
    assert all(r.valid for r in pr)
    assert sum(r.error_count for r in pr) == 0


def test_corrupted_rows_flagged(spark):
    df = sequences_df(spark, 2000, seed=42, corrupt=True)
    v = Validator(FLAGSHIP)
    res = v.validate(df, id_cols=["doc_id"])
    viols = res.violations.collect()
    assert res.flag() is False
    by_doc = {}
    for r in viols:
        by_doc.setdefault(r.doc_id, []).append(r)

    # bucket 1: token set to 99999 at last position → items/maximum
    r1 = [r for r in by_doc["doc-000000000001"] if r.keyword == "maximum"]
    assert r1, by_doc.get("doc-000000000001")
    assert r1[0].keyword_location == "/properties/tokens/items/maximum"
    assert r1[0].instance_location.startswith("/tokens/")
    assert r1[0].offending_value == "99999"
    assert (
        r1[0].absolute_keyword_location
        == "https://example.org/specs/token-sequences#/properties/tokens/items/maximum"
    )

    # bucket 2: first token -1 → items/minimum at /tokens/0
    r2 = [r for r in by_doc["doc-000000000002"] if r.keyword == "minimum"]
    assert r2 and r2[0].instance_location == "/tokens/0"

    # bucket 4: null source → required
    r4 = [r for r in by_doc["doc-000000000004"] if r.keyword == "required"]
    assert r4 and r4[0].error == "object is missing property: source"
    assert r4[0].instance_location == ""

    # bucket 5: unknown source → enum
    r5 = [r for r in by_doc["doc-000000000005"] if r.keyword == "enum"]
    assert r5 and r5[0].instance_location == "/source"
    assert r5[0].offending_value == "smuggled"


def test_token_array_equality_invariant(spark, clean, tmp_path):
    """write → read → element-wise identical to the recomputed expectation
    (the per-row invariant from BASELINE.json input_hint)."""
    p = str(tmp_path / "seq")
    clean.write.mode("overwrite").parquet(p)
    back = spark.read.parquet(p)
    idx = F.regexp_extract("doc_id", r"(\d+)", 1).cast("long")
    mismatches = back.filter(
        ~(F.col("tokens") == expected_tokens_expr(idx, F.col("n_tok")))
    ).count()
    assert mismatches == 0


def test_flag_mode_agrees_with_full_mode(spark):
    """Dual-mode consistency — the reference runs every acceptance case in
    normal and short_circuit mode and requires agreement
    (t/lib/Acceptance.pm:55-56,79-91)."""
    for corrupt in (False, True):
        df = sequences_df(spark, 1000, seed=7, corrupt=corrupt)
        res = Validator(FLAGSHIP).validate(df, id_cols=["doc_id"])
        assert res.flag() == (res.violations.count() == 0)


def test_metrics_rollup_consistency(spark):
    """Per-group metrics rollup over annotated: n_valid counts rows with
    zero violation nodes, n_violations sums node counts, and both are
    consistent with the violations DataFrame."""
    df = sequences_df(spark, 1000, seed=11, corrupt=True)
    n = df.count()   # corrupt=True injects an extra duplicate row
    res = Validator(FLAGSHIP).validate(df, id_cols=["doc_id"])
    ann = res.annotated
    agg = ann.agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.sum(F.col("_valid").cast("int")).alias("n_valid"),
        F.sum(F.size("_viols")).alias("n_violations")).head()
    assert agg.n_rows == n
    assert agg.n_valid < n                        # corruption injected
    assert agg.n_violations == res.violations.count()
    n_invalid_rows = ann.filter(~F.col("_valid")).count()
    assert agg.n_valid + n_invalid_rows == n
