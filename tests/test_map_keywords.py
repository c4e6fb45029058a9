"""Object-keyword semantics over MapType(String, V) columns — the
open-properties object representation (SURVEY.md §1.1: object →
StructType for fixed fields, MapType for open properties).

Covers the keywords the struct path resolves at compile time but a map
column must resolve at runtime per entry: patternProperties,
additionalProperties, propertyNames, unevaluatedProperties (runtime
coverage), plus required / min-maxProperties interplay.  Reference
semantics: V/Applicator.pm:453-548, V/Unevaluated.pm:100-144.
"""

import pytest

from json_schema_modern_spark import Validator

# (group, sql_type, schema-for-column-v, cases)
# case = (value, expected_valid, required_loc_pairs or None)
GROUPS = [
    ("patternProperties", "map<string,bigint>",
     {"patternProperties": {"^n_": {"minimum": 0}}},
     [({"n_a": 1, "x": -5}, True, None),
      ({"n_a": -1}, False, {("/v/n_a", "/properties/v/patternProperties/^n_/minimum")}),
      ({}, True, None),
      (None, True, None)]),
    ("additionalProperties_false", "map<string,bigint>",
     {"properties": {"a": {"minimum": 0}}, "additionalProperties": False},
     [({"a": 1}, True, None),
      ({"a": 1, "b": 2}, False, {("/v/b", "/properties/v/additionalProperties")}),
      ({"a": -1}, False, {("/v/a", "/properties/v/properties/a/minimum")})]),
    ("additionalProperties_schema", "map<string,bigint>",
     {"properties": {"a": True}, "additionalProperties": {"maximum": 10}},
     [({"a": 99, "z": 10}, True, None),
      ({"z": 11}, False, {("/v/z", "/properties/v/additionalProperties/maximum")})]),
    ("additionalProperties_after_pattern", "map<string,bigint>",
     {"patternProperties": {"^p": True}, "additionalProperties": False},
     [({"p1": 1, "p2": 2}, True, None),
      ({"p1": 1, "q": 2}, False, {("/v/q", "/properties/v/additionalProperties")})]),
    ("propertyNames", "map<string,bigint>",
     {"propertyNames": {"pattern": "^[a-z]+$"}},
     [({"abc": 1}, True, None),
      ({"Bad": 1}, False, {("/v/Bad", "/properties/v/propertyNames/pattern")}),
      ({}, True, None)]),
    ("propertyNames_maxLength", "map<string,bigint>",
     {"propertyNames": {"maxLength": 3}},
     [({"abc": 1}, True, None),
      ({"abcd": 1}, False, {("/v/abcd", "/properties/v/propertyNames/maxLength")})]),
    ("maxProperties_map", "map<string,bigint>",
     {"maxProperties": 2},
     [({"a": 1, "b": 2}, True, None),
      ({"a": 1, "b": 2, "c": 3}, False, {("/v", "/properties/v/maxProperties")})]),
    ("minProperties_map", "map<string,bigint>",
     {"minProperties": 1},
     [({"a": 1}, True, None),
      ({}, False, {("/v", "/properties/v/minProperties")})]),
    ("required_map", "map<string,bigint>",
     {"required": ["k1"]},
     [({"k1": 1}, True, None),
      ({"k2": 1}, False, {("/v", "/properties/v/required")})]),
    ("uneval_props_map_static", "map<string,bigint>",
     {"properties": {"a": True}, "patternProperties": {"^p_": True},
      "unevaluatedProperties": False},
     [({"a": 1, "p_x": 2}, True, None),
      ({"q": 1}, False, {("/v/q", "/properties/v/unevaluatedProperties")})]),
    ("uneval_props_map_schema", "map<string,bigint>",
     {"unevaluatedProperties": {"maximum": 5}},
     [({"x": 5}, True, None),
      ({"x": 6}, False, {("/v/x", "/properties/v/unevaluatedProperties/maximum")})]),
    # map value NULL = JSON null (present): numeric keywords vacuous,
    # type: integer fails
    ("map_null_value_vacuous", "map<string,bigint>",
     {"patternProperties": {".": {"minimum": 0}}},
     [({"a": None}, True, None)]),
    ("map_null_value_type", "map<string,bigint>",
     {"patternProperties": {".": {"type": "integer"}}},
     [({"a": 1}, True, None),
      ({"a": None}, False, {("/v/a", "/properties/v/patternProperties/./type")})]),
    # properties targets a map entry by name (runtime lookup)
    ("properties_on_map", "map<string,double>",
     {"properties": {"score": {"minimum": 0.0}}},
     [({"score": 0.5}, True, None),
      ({"other": -1.0}, True, None),
      ({"score": -0.5}, False, {("/v/score", "/properties/v/properties/score/minimum")})]),
    # pointer escaping of runtime keys (~ → ~0, / → ~1)
    ("map_key_pointer_escape", "map<string,bigint>",
     {"additionalProperties": False},
     [({"a/b": 1}, False, {("/v/a~1b", "/properties/v/additionalProperties")}),
      ({"t~x": 1}, False, {("/v/t~0x", "/properties/v/additionalProperties")})]),
]


def _params():
    out = []
    for name, sql_type, schema, cases in GROUPS:
        for i, (value, expected_valid, locs) in enumerate(cases):
            out.append(pytest.param(sql_type, schema, value, expected_valid,
                                    locs, id=f"{name}-{i}"))
    return out


@pytest.fixture(scope="module")
def validators():
    return {}


@pytest.mark.parametrize("sql_type,schema,value,expected_valid,locs", _params())
def test_map_keyword_case(spark, validators, sql_type, schema, value,
                          expected_valid, locs):
    key = repr((sql_type, sorted(schema.items(), key=lambda kv: str(kv[0]))))
    if key not in validators:
        validators[key] = Validator({"type": "object", "properties": {"v": schema}})
    df = spark.createDataFrame([(value,)], f"v {sql_type}")
    res = validators[key].validate(df, id_cols=[])
    flag = res.flag()
    viol_rows = res.violations.collect()
    assert flag == (len(viol_rows) == 0), "flag mode disagrees with violation mode"
    assert flag == expected_valid, (
        f"validity mismatch: got {flag}, want {expected_valid}; "
        f"violations={[(r.instance_location, r.keyword_location) for r in viol_rows]}"
    )
    if not expected_valid and locs:
        got = {(r.instance_location, r.keyword_location) for r in viol_rows}
        assert locs <= got, f"missing violation locations: {locs - got}; got {got}"


def test_const_enum_deep_equality(spark):
    """const/enum with OBJECT and ARRAY members: deep type-strict equality
    (is_equal, U.pm:242-299) over map, struct and array columns —
    order-insensitive objects, order-sensitive arrays, null members."""
    # map column
    spec = {"type": "object", "properties": {"v": {"const": {"k1": 1, "k2": None}}}}
    v = Validator(spec)
    ok = spark.createDataFrame([({"k2": None, "k1": 1},)], "v map<string,bigint>")
    assert v.validate(ok, id_cols=[]).flag() is True
    for bad in [{"k1": 1}, {"k1": 2, "k2": None}, {"k1": 1, "k2": 3},
                {"k1": 1, "k2": None, "k3": 0}]:
        df = spark.createDataFrame([(bad,)], "v map<string,bigint>")
        assert v.validate(df, id_cols=[]).flag() is False, bad
    # struct column (absent field ⇔ key absent from the const)
    spec_s = {"type": "object", "properties": {"v": {"const": {"a": 1}}}}
    vs = Validator(spec_s)
    df = spark.createDataFrame([((1, None),), ((1, 2),), ((2, None),)],
                               "v struct<a: bigint, b: bigint>")
    flags = [r._valid for r in vs.validate(df, id_cols=[])
             .annotated.select("_valid").collect()]
    assert flags == [True, False, False]
    # array member with a null element; order-sensitive
    spec_a = {"type": "object", "properties": {"v": {"enum": [[0, None], [1, 2]]}}}
    va = Validator(spec_a)
    df = spark.createDataFrame([([0, None],), ([1, 2],), ([2, 1],), ([0],)],
                               "v array<bigint>")
    flags = [r._valid for r in va.validate(df, id_cols=[])
             .annotated.select("_valid").collect()]
    assert flags == [True, True, False, False]


def test_multiple_failing_patterns_single_summary(spark):
    """Several failing patternProperties patterns produce ONE summary row
    (plus per-entry leaves), matching the reference's single rollup."""
    spec = {"type": "object", "properties": {"v": {
        "patternProperties": {"^a": {"minimum": 0}, "^b": {"minimum": 0}}}}}
    df = spark.createDataFrame([({"a1": -1, "b1": -2},)], "v map<string,bigint>")
    rows = Validator(spec).validate(df, id_cols=[]).violations.collect()
    summaries = [r for r in rows if r.keyword == "patternProperties"]
    assert len(summaries) == 1
    assert summaries[0].keyword_location == "/properties/v/patternProperties"
    leaves = {(r.instance_location, r.keyword_location) for r in rows
              if r.keyword == "minimum"}
    assert ("/v/a1", "/properties/v/patternProperties/^a/minimum") in leaves
    assert ("/v/b1", "/properties/v/patternProperties/^b/minimum") in leaves


def test_uneval_props_map_through_ref(spark):
    """Coverage adoption across $ref: the referenced schema's
    patternProperties claims keys for unevaluatedProperties in the
    referencing scope (V/Unevaluated.pm in-scope annotation semantics)."""
    spec = {
        "type": "object",
        "properties": {"v": {
            "$ref": "#/$defs/base",
            "unevaluatedProperties": False,
        }},
        "$defs": {"base": {"patternProperties": {"^a": True}}},
    }
    v = Validator(spec)
    df = spark.createDataFrame([({"ab": 1},), ({"b": 2},)], "v map<string,bigint>")
    rows = v.validate(df, id_cols=[]).violations.collect()
    locs = {(r.instance_location, r.keyword_location) for r in rows}
    assert ("/v/b", "/properties/v/unevaluatedProperties") in locs
    assert not any(il.startswith("/v/ab") for il, _ in locs)


def test_uneval_props_map_conditional_coverage(spark):
    """Guarded coverage: a key matched by a FAILED anyOf branch stays
    unevaluated (annotations from failed subschemas are discarded)."""
    spec = {
        "type": "object",
        "properties": {"v": {
            "anyOf": [
                {"patternProperties": {"^x": {"minimum": 100}}},
                {"minProperties": 1},
            ],
            "unevaluatedProperties": False,
        }},
    }
    v = Validator(spec)
    # branch 1 fails (x=1 < 100) but branch 2 succeeds; x remains
    # unevaluated because only branch 2's (empty) coverage counts
    df = spark.createDataFrame([({"x": 1},)], "v map<string,bigint>")
    rows = v.validate(df, id_cols=[]).violations.collect()
    locs = {(r.instance_location, r.keyword_location) for r in rows}
    assert ("/v/x", "/properties/v/unevaluatedProperties") in locs
    # branch 1 succeeds → x covered → valid
    df2 = spark.createDataFrame([({"x": 100},)], "v map<string,bigint>")
    assert v.validate(df2, id_cols=[]).flag() is True
