"""Keyword-semantics parity corpus (SURVEY.md §5 t2a; FIXTURES.md §4).

Structure mirrors the reference's acceptance harness
(/root/reference/t/lib/Acceptance.pm:76-112): groups of (schema, cases),
each case = (data, expected_valid); failing cases additionally assert the
(instance_location, keyword_location) pairs the reference's ResultNode
would carry (ResultNode.pm:27-96).  Cases are original — written from the
draft2020-12 keyword semantics documented in SURVEY.md §2 — not copied
from the JSON-Schema-Test-Suite.

Each group is tabularized per FIXTURES.md §4: one row per case in a typed
single-column DataFrame (column ``v``), the spec wrapped as
``{"properties": {"v": <schema>}}``, so expected keyword locations carry
the ``/properties/v`` prefix and instance locations the ``/v`` prefix.

Also runs the reference's dual-mode cross-check (Acceptance.pm:79-91):
flag-only mode and full-violation mode must agree on validity.
"""

import pytest
from pyspark.sql import functions as F

from json_schema_modern_spark import Validator

# (group_name, spark_type, schema, cases)
# case = (value, expected_valid, expected_loc_pairs or None)
#   expected_loc_pairs: set of (instance_location, keyword_location) that
#   MUST be present among the violations (subset check — applicator
#   summaries may add more rows, as the reference nests errors too).
GROUPS = [
    ("minimum", "double", {"minimum": 5},
     [(5.0, True, None), (5.1, True, None),
      (4.9, False, {("/v", "/properties/v/minimum")}),
      (None, True, None)]),                      # absent property: vacuous
    ("exclusiveMinimum", "double", {"exclusiveMinimum": 5},
     [(5.0, False, {("/v", "/properties/v/exclusiveMinimum")}),
      (5.1, True, None)]),
    ("maximum", "long", {"maximum": 10},
     [(10, True, None), (11, False, {("/v", "/properties/v/maximum")})]),
    ("exclusiveMaximum", "long", {"exclusiveMaximum": 10},
     [(10, False, {("/v", "/properties/v/exclusiveMaximum")}), (9, True, None)]),
    ("multipleOf_int", "long", {"multipleOf": 3},
     [(9, True, None), (10, False, {("/v", "/properties/v/multipleOf")}),
      (0, True, None), (-6, True, None)]),
    ("multipleOf_frac", "double", {"multipleOf": 0.1},
     # 0.3 % 0.1 in binary floats is nonzero (0.3 ≈ 0.2999…) — the
     # reference gets this right via bignum (V/Validation.pm:119-123),
     # we via decimal pmod
     [(1.0, True, None), (0.3, True, None), (4.3, True, None),
      (4.35, False, {("/v", "/properties/v/multipleOf")})]),
    ("type_integer_on_double", "double", {"type": "integer"},
     # 2.0 is an integer (Utilities.pm:152-156)
     [(2.0, True, None), (2.5, False, {("/v", "/properties/v/type")})]),
    ("minLength", "string", {"minLength": 3},
     [("abc", True, None), ("ab", False, {("/v", "/properties/v/minLength")}),
      ("héé", True, None)]),                     # codepoints, not bytes
    ("maxLength", "string", {"maxLength": 3},
     [("abc", True, None), ("abcd", False, {("/v", "/properties/v/maxLength")})]),
    ("pattern", "string", {"pattern": "^a.*z$"},
     # partial-match semantics: pattern is unanchored unless anchored
     [("az", True, None), ("abz", True, None),
      ("bz", False, {("/v", "/properties/v/pattern")})]),
    ("pattern_partial", "string", {"pattern": "b+"},
     [("abba", True, None), ("aca", False, {("/v", "/properties/v/pattern")})]),
    ("enum_str", "string", {"enum": ["red", "green"]},
     [("red", True, None), ("blue", False, {("/v", "/properties/v/enum")})]),
    ("const_num", "long", {"const": 7},
     [(7, True, None), (8, False, {("/v", "/properties/v/const")})]),
    ("minItems", "array<int>", {"minItems": 2},
     [([1, 2], True, None), ([1], False, {("/v", "/properties/v/minItems")}),
      ([], False, {("/v", "/properties/v/minItems")})]),
    ("maxItems", "array<int>", {"maxItems": 2},
     [([1, 2], True, None), ([1, 2, 3], False, {("/v", "/properties/v/maxItems")})]),
    ("uniqueItems", "array<int>", {"uniqueItems": True},
     [([1, 2, 3], True, None), ([], True, None),
      ([1, 2, 1], False, {("/v", "/properties/v/uniqueItems")})]),
    ("items_range", "array<long>", {"items": {"minimum": 0, "maximum": 9}},
     [([0, 9], True, None), ([], True, None),
      ([0, 10], False, {("/v/1", "/properties/v/items/maximum"),
                        ("/v", "/properties/v/items")}),
      ([-1, 5], False, {("/v/0", "/properties/v/items/minimum")})]),
    ("prefixItems", "array<long>", {"prefixItems": [{"minimum": 1}, {"maximum": 0}]},
     [([1, 0], True, None), ([1], True, None), ([], True, None),
      ([0, 0], False, {("/v/0", "/properties/v/prefixItems/0/minimum")}),
      ([1, 1], False, {("/v/1", "/properties/v/prefixItems/1/maximum")})]),
    ("items_after_prefix", "array<long>",
     {"prefixItems": [{"minimum": 100}], "items": {"maximum": 5}},
     # items only applies past the prefix (V/Applicator.pm:252-266)
     [([100, 5], True, None), ([100], True, None),
      ([100, 6], False, {("/v/1", "/properties/v/items/maximum")}),
      ([1, 2], False, {("/v/0", "/properties/v/prefixItems/0/minimum")})]),
    ("contains", "array<long>", {"contains": {"minimum": 10}},
     [([1, 10], True, None),
      ([1, 2], False, {("/v", "/properties/v/contains")}),
      ([], False, {("/v", "/properties/v/contains")})]),
    ("minContains0", "array<long>", {"contains": {"minimum": 10}, "minContains": 0},
     # minContains: 0 makes even "no matches" valid (V/Applicator.pm:384-405)
     [([], True, None), ([1], True, None)]),
    ("maxContains", "array<long>", {"contains": {"minimum": 10}, "maxContains": 1},
     [([10, 1], True, None),
      ([10, 11], False, {("/v", "/properties/v/maxContains")})]),
    ("allOf", "long", {"allOf": [{"minimum": 0}, {"maximum": 10}]},
     [(5, True, None),
      (-1, False, {("/v", "/properties/v/allOf/0/minimum")}),
      (11, False, {("/v", "/properties/v/allOf/1/maximum")})]),
    ("anyOf", "long", {"anyOf": [{"minimum": 10}, {"multipleOf": 2}]},
     [(4, True, None), (11, True, None),
      (3, False, {("/v", "/properties/v/anyOf")})]),
    ("oneOf", "long", {"oneOf": [{"minimum": 10}, {"multipleOf": 2}]},
     [(11, True, None), (4, True, None),
      (12, False, {("/v", "/properties/v/oneOf")}),    # both match
      (3, False, {("/v", "/properties/v/oneOf")})]),   # none match
    ("not", "long", {"not": {"minimum": 10}},
     # inner errors are discarded (V/Applicator.pm:133-145)
     [(5, True, None), (10, False, {("/v", "/properties/v/not")})]),
    ("if_then_else", "long",
     {"if": {"minimum": 10}, "then": {"multipleOf": 2}, "else": {"multipleOf": 3}},
     [(12, True, None), (11, False, {("/v", "/properties/v/then/multipleOf")}),
      (9, True, None), (8, False, {("/v", "/properties/v/else/multipleOf")})]),
    ("nested_allOf_items", "array<long>",
     {"allOf": [{"items": {"minimum": 0}}, {"minItems": 1}]},
     [([1], True, None),
      ([], False, {("/v", "/properties/v/allOf/1/minItems")}),
      ([-1], False, {("/v/0", "/properties/v/allOf/0/items/minimum")})]),
]


def _group_cases(group):
    name, sql_type, schema, cases = group
    return [
        pytest.param(sql_type, schema, value, expected_valid, locs,
                     id=f"{name}-{i}")
        for i, (value, expected_valid, locs) in enumerate(cases)
    ]


ALL_CASES = [p for g in GROUPS for p in _group_cases(g)]


@pytest.fixture(scope="module")
def validators():
    return {}


def _validator(validators, schema):
    key = repr(sorted(schema.items(), key=lambda kv: kv[0]))
    if key not in validators:
        validators[key] = Validator({"type": "object", "properties": {"v": schema}})
    return validators[key]


@pytest.mark.parametrize("sql_type,schema,value,expected_valid,locs", ALL_CASES)
def test_keyword_case(spark, validators, sql_type, schema, value, expected_valid, locs):
    df = spark.createDataFrame([(value,)], f"v {sql_type}")
    v = _validator(validators, schema)
    res = v.validate(df, id_cols=[])

    # dual-mode cross-check: flag mode and full-violation mode must agree
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
