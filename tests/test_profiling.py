"""Constraint mining: column_profile / infer_schema / mined_schema."""

import pytest

from json_schema_modern_spark.operators.profiling import (
    column_profile, infer_schema, mined_schema,
)


@pytest.fixture(scope="module")
def df(spark):
    return spark.createDataFrame(
        [(1, "en", "aaaa", 10.0),
         (2, "en", "bbbb", 20.0),
         (3, "fr", "cccc", None),
         (4, None, "dddd", 40.0)],
        "id bigint, lang string, blob string, score double")


def test_profile_measures(df):
    rows = {r.column: r for r in
            column_profile(df, exact_distinct=True).collect()}
    assert rows["id"].inferred_type == "integer"
    assert rows["id"].null_count == 0 and rows["id"].distinct_count == 4
    assert rows["id"].min == "1" and rows["id"].max == "4"
    assert rows["lang"].null_count == 1 and rows["lang"].distinct_count == 2
    assert rows["lang"].min_length == 2 and rows["lang"].max_length == 2
    assert rows["score"].inferred_type == "number"
    assert rows["score"].null_count == 1
    assert rows["id"].min_length is None  # lengths are string-only


def test_enum_gate_blocks_high_cardinality(df):
    rows = {r.column: r for r in
            column_profile(df, max_enum=2, exact_distinct=True).collect()}
    assert list(rows["lang"].enum_vals) == ["en", "fr"]   # 2 <= max_enum
    assert rows["blob"].enum_vals is None                  # 4 > max_enum
    assert rows["id"].enum_vals is None                    # non-string


def test_infer_schema_keywords(df):
    spec = infer_schema(df, max_enum=2, exact_distinct=True,
                        string_lengths=True)
    p = spec["properties"]
    assert spec["required"] == ["id", "blob"]
    assert p["id"]["type"] == "integer"
    assert p["id"]["minimum"] == 1 and p["id"]["maximum"] == 4
    # nullable columns: type union, enum carries null
    assert p["lang"]["type"] == ["string", "null"]
    assert p["lang"]["enum"] == ["en", "fr", None]
    assert p["score"]["type"] == ["number", "null"]
    assert p["score"]["minimum"] == 10.0 and p["score"]["maximum"] == 40.0
    # high-cardinality string falls back to length bounds
    assert p["blob"]["minLength"] == 4 and p["blob"]["maxLength"] == 4
    assert "enum" not in p["blob"]


def test_mined_schema_screens_through_validator(spark, df):
    from json_schema_modern_spark import Validator

    spec = mined_schema(df, columns=["id", "lang"], max_enum=4,
                        exact_distinct=True)
    fresh = spark.createDataFrame(
        [(2, "en"),     # inside all mined constraints
         (9, "en"),     # id above mined maximum
         (3, "zz")],    # lang outside mined enum
        "id bigint, lang string")
    viols = Validator(spec).validate(fresh, id_cols=["id"]) \
        .violations.select("id", "keyword").collect()
    got = {(r.id, r.keyword) for r in viols}
    assert got == {(9, "maximum"), (3, "enum")}
