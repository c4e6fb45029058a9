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
    ("maxContains_without_contains", "array<long>", {"maxContains": 1},
     # min/maxContains do NOTHING without `contains` (they are evaluated
     # inside _eval_keyword_contains, V/Applicator.pm:357-405)
     [([1, 2, 3], True, None), ([], True, None)]),
    ("minContains_without_contains", "array<long>", {"minContains": 2},
     [([1], True, None), ([], True, None)]),
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
    ("uneval_items_prefix", "array<long>",
     {"prefixItems": [{"minimum": 0}], "unevaluatedItems": {"maximum": 5}},
     [([0], True, None), ([], True, None), ([0, 5], True, None),
      ([0, 6], False, {("/v", "/properties/v/unevaluatedItems")}),
      ([-1, 3], False, {("/v/0", "/properties/v/prefixItems/0/minimum")})]),
    ("uneval_items_items_covers", "array<long>",
     # items covers everything — unevaluatedItems never applies
     {"items": {"minimum": 0}, "unevaluatedItems": False},
     [([0, 99], True, None),
      ([-1], False, {("/v/0", "/properties/v/items/minimum")})]),
    ("uneval_items_contains", "array<long>",
     # matched elements count as evaluated (reference matched-index
     # annotations, V/Applicator.pm:360-381 + V/Unevaluated.pm:41-98)
     {"contains": {"minimum": 10}, "unevaluatedItems": {"maximum": 0}},
     [([10, -5], True, None),        # 10 contains-covered, -5 passes uneval
      ([10, 5], False, {("/v", "/properties/v/unevaluatedItems")}),
      ([10], True, None),
      ([1], False, {("/v", "/properties/v/contains"),   # contains failed →
                    ("/v", "/properties/v/unevaluatedItems")}),  # nothing covered
      ([], False, {("/v", "/properties/v/contains")})]),
    ("uneval_items_contains_min0", "array<long>",
     # minContains:0 ⇒ contains always succeeds; only MATCHING elements
     # are covered
     {"contains": {"minimum": 10}, "minContains": 0,
      "unevaluatedItems": {"maximum": 0}},
     [([-5], True, None), ([10, -1], True, None),
      ([5], False, {("/v", "/properties/v/unevaluatedItems")})]),
    ("uneval_items_prefix_and_contains", "array<long>",
     {"prefixItems": [{"minimum": 0}], "contains": {"minimum": 10},
      "unevaluatedItems": False},
     [([5, 10], True, None),         # idx0 prefix-covered, idx1 contains-covered
      ([5, 10, 3], False, {("/v", "/properties/v/unevaluatedItems")}),
      ([5, 10, 11], True, None)]),   # 11 also matches contains → covered
    ("uneval_items_anyof_coverage", "array<long>",
     # index 1 is covered ONLY when the second anyOf branch succeeds —
     # runtime-annotation semantics (V/Unevaluated.pm:41-98) reproduced
     # with when()-guarded static coverage
     {"anyOf": [{"prefixItems": [{"minimum": 100}]},
                {"prefixItems": [{"minimum": 0}, {"maximum": 10}]}],
      "unevaluatedItems": {"maximum": 5}},
     [([100, 7], True, None),     # branch 2 covers index 1 (7 <= 10)
      ([100, 50], False,          # only branch 1 succeeds → index 1 unevaluated
       {("/v", "/properties/v/unevaluatedItems")}),
      ([100, 3], True, None),
      ([0, 50], False, {("/v", "/properties/v/unevaluatedItems")})]),
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


# ---------------------------------------------------------------------------
# unevaluatedProperties needs multi-column rows (root-object coverage)
# ---------------------------------------------------------------------------


def _flags(spark, spec, rows, ddl):
    df = spark.createDataFrame(rows, ddl)
    v = Validator(spec)
    res = v.validate(df, id_cols=[])
    ann = res.annotated.select("_valid").collect()
    return [r._valid for r in ann]


def test_unevaluated_properties_static(spark):
    spec = {"type": "object", "properties": {"a": {}},
            "unevaluatedProperties": False}
    flags = _flags(spark, spec, [(1, None), (1, 2)], "a int, b int")
    assert flags == [True, False]


def test_unevaluated_properties_additional_covers(spark):
    # additionalProperties evaluates every leftover name → nothing unevaluated
    spec = {"type": "object", "properties": {"a": {}},
            "additionalProperties": {"minimum": 0},
            "unevaluatedProperties": False}
    flags = _flags(spark, spec, [(1, 2), (1, -2)], "a int, b int")
    assert flags == [True, False]   # second fails additionalProperties, not unevaluated


def test_unevaluated_properties_conditional_coverage(spark):
    # b is covered only when the first anyOf branch succeeds (b >= 10)
    spec = {"type": "object",
            "anyOf": [{"properties": {"b": {"minimum": 10}}, "required": ["b"]},
                      {"properties": {"a": {"minimum": 0}}, "required": ["a"]}],
            "unevaluatedProperties": False}
    flags = _flags(spark, spec, [(1, 10), (1, 5), (1, None)], "a int, b int")
    # (1,10): branch 1 succeeds, b covered (a covered by branch 2) → valid
    # (1,5): only branch 2 succeeds → b present but unevaluated → invalid
    # (1,None): b absent → nothing unevaluated → valid
    assert flags == [True, False, True]


def test_content_schema_assertion(spark):
    """contentEncoding/contentMediaType/contentSchema in assertion mode
    (reference: validate_content_schemas, V/Content.pm:42-114)."""
    from json_schema_modern_spark.compiler.column_compiler import CompileOptions

    spec = {"type": "object", "properties": {"payload": {
        "contentMediaType": "application/json",
        "contentSchema": {"type": "object", "required": ["k"],
                          "properties": {"k": {"type": "integer", "minimum": 10}}},
    }}}
    rows = [('{"k": 42}',),     # valid
            ('{"k": 3}',),      # k too small
            ('not json',),      # not parseable
            ('{"x": 1}',),      # k missing
            (None,)]            # absent: vacuous
    df = spark.createDataFrame(rows, "payload string")
    v = Validator(spec, CompileOptions(validate_content_schemas=True))
    res = v.validate(df, id_cols=[])
    flags = [r._valid for r in res.annotated.select("_valid").collect()]
    assert flags == [True, False, False, False, True]
    kls = {r.keyword_location for r in res.violations.collect()}
    assert "/properties/payload/contentSchema/properties/k/minimum" in kls
    assert "/properties/payload/contentMediaType" in kls
    assert "/properties/payload/contentSchema/required" in kls


def test_content_encoding_base64(spark):
    from json_schema_modern_spark.compiler.column_compiler import CompileOptions

    spec = {"type": "object",
            "properties": {"blob": {"contentEncoding": "base64",
                                    "contentMediaType": "application/json"}}}
    rows = [("eyJrIjogMX0=",),   # {"k": 1}
            ("!!notb64!!",),
            ("aGVsbG8=",)]       # "hello" — decodes but isn't JSON
    df = spark.createDataFrame(rows, "blob string")
    v = Validator(spec, CompileOptions(validate_content_schemas=True))
    res = v.validate(df, id_cols=[])
    flags = [r._valid for r in res.annotated.select("_valid").collect()]
    assert flags == [True, False, False]


def test_content_encoding_base64url(spark):
    """RFC4648 §5 urlsafe alphabet, optional padding (Modern.pm:1240-1250)."""
    import base64

    from json_schema_modern_spark.compiler.column_compiler import CompileOptions

    spec = {"type": "object",
            "properties": {"blob": {"contentEncoding": "base64url",
                                    "contentMediaType": "application/json"}}}
    payload = base64.urlsafe_b64encode(b'{"k": [1, 2]}').decode().rstrip("=")
    rows = [(payload,),              # unpadded urlsafe: valid JSON inside
            (payload + "=",),        # padded form also accepted
            ("##bad##",),            # not in the alphabet
            ("aGVsbG8",)]            # decodes to "hello" — not JSON
    df = spark.createDataFrame(rows, "blob string")
    v = Validator(spec, CompileOptions(validate_content_schemas=True))
    res = v.validate(df, id_cols=[])
    flags = [r._valid for r in res.annotated.select("_valid").collect()]
    assert flags == [True, True, False, False]


def test_content_media_type_registry(spark):
    """Media types beyond application/json (U.pm:481-743): text/*,
    x-ndjson line-wise JSON, x-www-form-urlencoded with the parsed MAP fed
    to contentSchema, octet-stream opaque."""
    from json_schema_modern_spark.compiler.column_compiler import CompileOptions

    opts = CompileOptions(validate_content_schemas=True)

    nd = {"type": "object", "properties": {"p": {
        "contentMediaType": "application/x-ndjson"}}}
    df = spark.createDataFrame(
        [('{"a":1}\n{"b":2}',), ('{"a":1}\nnot json',), (None,)], "p string")
    flags = [r._valid for r in Validator(nd, opts).validate(df, id_cols=[])
             .annotated.select("_valid").collect()]
    assert flags == [True, False, True]

    txt = {"type": "object", "properties": {"p": {
        "contentMediaType": "text/plain", "contentSchema": {"maxLength": 3}}}}
    df = spark.createDataFrame([("ab",), ("abcd",)], "p string")
    res = Validator(txt, opts).validate(df, id_cols=[])
    flags = [r._valid for r in res.annotated.select("_valid").collect()]
    assert flags == [True, False]
    assert any(r.keyword_location == "/properties/p/contentSchema/maxLength"
               for r in res.violations.collect())

    form = {"type": "object", "properties": {"p": {
        "contentMediaType": "application/x-www-form-urlencoded",
        "contentSchema": {"required": ["a"],
                          "properties": {"a": {"pattern": "^[0-9]+$"}}}}}}
    df = spark.createDataFrame(
        [("a=5&b=x",), ("b=1",), ("a=zz",), ("==&&",)], "p string")
    res = Validator(form, opts).validate(df, id_cols=[])
    flags = [r._valid for r in res.annotated.select("_valid").collect()]
    assert flags == [True, False, False, False]
    locs = {r.keyword_location for r in res.violations.collect()}
    assert "/properties/p/contentSchema/required" in locs
    assert "/properties/p/contentSchema/properties/a/pattern" in locs
    assert "/properties/p/contentMediaType" in locs

    blob = {"type": "object", "properties": {"p": {
        "contentMediaType": "application/octet-stream"}}}
    df = spark.createDataFrame([("anything at all \x00",)], "p string")
    assert Validator(blob, opts).validate(df, id_cols=[]).flag() is True


def test_format_regex_and_idn(spark):
    from json_schema_modern_spark.compiler.column_compiler import CompileOptions

    spec = {"type": "object", "properties": {
        "r": {"format": "regex"},
        "h": {"format": "idn-hostname"},
    }}
    rows = [("^a(b|c)+$", "bücher.example"),     # both valid
            ("(unclosed", "-bad-.example"),      # bad regex, bad hostname
            (None, None)]
    df = spark.createDataFrame(rows, "r string, h string")
    v = Validator(spec, CompileOptions(validate_formats=True))
    res = v.validate(df, id_cols=[])
    flags = [r._valid for r in res.annotated.select("_valid").collect()]
    assert flags == [True, False, True]
    kws = {(r.instance_location, r.keyword_location)
           for r in res.violations.collect()}
    assert ("/r", "/properties/r/format") in kws
    assert ("/h", "/properties/h/format") in kws


def test_stringy_multipleof(spark):
    from json_schema_modern_spark.compiler.column_compiler import CompileOptions

    spec = {"type": "object", "properties": {"v": {"multipleOf": 0.5}}}
    rows = [("2.5",), ("2.3",), ("xyz",), (None,)]
    df = spark.createDataFrame(rows, "v string")
    v = Validator(spec, CompileOptions(stringy_numbers=True))
    res = v.validate(df, id_cols=[])
    flags = [r._valid for r in res.annotated.select("_valid").collect()]
    assert flags == [True, False, True, True]


def test_propertynames_absent_property_vacuous(spark):
    """propertyNames validates only names of PRESENT properties — a NULL
    column (absent property) must not fail the name check (regression:
    the name target was gated on the object's presence, not the
    property's)."""
    spec = {"type": "object", "propertyNames": {"pattern": "^a"}}
    flags = _flags(spark, spec, [(1, None), (1, 2)], "a int, b int")
    assert flags == [True, False]


def test_dynamic_ref_static_fallback(spark):
    """$dynamicRef resolves like $ref when the dynamic scope introduces no
    overriding $dynamicAnchor — the supported static subset (SURVEY §7.4;
    V/Core.pm:327-361 for the full runtime semantics)."""
    spec = {"$id": "https://ex.org/root",
            "$defs": {"limit": {"$dynamicAnchor": "lim", "maximum": 5}},
            "type": "object",
            "properties": {"a": {"$dynamicRef": "#lim"}}}
    df = spark.createDataFrame([(3,), (9,)], "a int")
    res = Validator(spec).validate(df, id_cols=["a"])
    rows = res.violations.collect()
    assert len(rows) == 1 and rows[0].a == 9
    assert rows[0].keyword_location == "/properties/a/$dynamicRef/maximum"


def test_dependencies_legacy_forms(spark):
    """draft4-7 `dependencies`: array form ≡ dependentRequired, schema form
    ≡ dependentSchemas, dispatched at compile time (V/Applicator.pm:190-245).
    In 2019-09+ the keyword no longer exists and is IGNORED (the
    unknownKeyword corpus), so the draft-7 $schema is load-bearing here."""
    spec = {"$schema": "http://json-schema.org/draft-07/schema",
            "type": "object",
            "dependencies": {"a": ["b"], "c": {"required": ["d"]}}}
    rows = [(1, 2, None, None),     # a present → b required: ok
            (1, None, None, None),  # a present, b absent: fail
            (None, None, 3, 4),     # c present → d required: ok
            (None, None, 3, None)]  # c present, d absent: fail
    flags = _flags(spark, spec, rows, "a int, b int, c int, d int")
    assert flags == [True, False, True, False]

    # 2020-12: same schema without the draft-7 $schema — dependencies is
    # an unknown keyword, every row valid
    spec_modern = {"type": "object",
                   "dependencies": {"a": ["b"], "c": {"required": ["d"]}}}
    assert _flags(spark, spec_modern, rows, "a int, b int, c int, d int") \
        == [True, True, True, True]


def test_validate_json_strings(spark):
    """evaluate_json_string analogue (Modern.pm:268-293): decode failure →
    exception-style violation; decoded docs validate as root instances."""
    spec = {"type": "object", "required": ["k"],
            "properties": {"k": {"type": "integer", "minimum": 10}}}
    rows = [(1, '{"k": 42}'), (2, '{"k": 3}'), (3, 'not json'), (4, '{"x": 1}')]
    df = spark.createDataFrame(rows, "rid int, payload string")
    res = Validator(spec).validate_json_strings(df, "payload", id_cols=["rid"])
    viols = {r.rid: (r.keyword, r.instance_location, r.keyword_location)
             for r in res.violations.collect()}
    assert 1 not in viols
    assert viols[2] == ("minimum", "/k", "/properties/k/minimum")
    assert viols[3][0] == "" and "EXCEPTION" in [
        r.error for r in res.violations.collect() if r.rid == 3][0]
    assert viols[4] == ("required", "", "/required")
    # decode-failure rows are invalid in the ANNOTATED view too: flag()
    # and basic_output() must see them (reference: exception Result)
    assert res.flag() is False
    annotated = {r.rid: r["_valid"] for r in res.annotated.collect()}
    assert annotated[3] is False and annotated[1] is True
    only_bad = spark.createDataFrame([(9, "not json")], "rid int, payload string")
    res_bad = Validator(spec).validate_json_strings(only_bad, "payload", id_cols=["rid"])
    assert res_bad.flag() is False


def test_cross_document_ref(spark):
    """add_schema analogue: $ref across registered documents
    (Modern.pm:157-200)."""
    lib = {"$id": "https://ex.org/lib",
           "$defs": {"small": {"maximum": 10}}}
    spec = {"type": "object",
            "properties": {"a": {"$ref": "https://ex.org/lib#/$defs/small"}}}
    df = spark.createDataFrame([(5,), (11,)], "a int")
    res = Validator(spec, extra_schemas=[lib]).validate(df, id_cols=["a"])
    rows = res.violations.collect()
    assert len(rows) == 1 and rows[0].a == 11
    assert rows[0].keyword_location == "/properties/a/$ref/maximum"


def test_basic_output_format(spark):
    """`basic` output format parity (Result.pm:99,153-223): per-row JSON
    with valid flag + error nodes carrying the three location fields."""
    import json

    spec = {"type": "object", "properties": {"a": {"minimum": 5}}}
    df = spark.createDataFrame([(7,), (3,)], "a int")
    res = Validator(spec).validate(df, id_cols=["a"])
    rows = {r.a: json.loads(r.result) for r in res.basic_output().collect()}
    assert rows[7] == {"valid": True}
    assert rows[3]["valid"] is False
    err = rows[3]["errors"][0]
    assert err["instanceLocation"] == "/a"
    assert err["keywordLocation"] == "/properties/a/minimum"
    assert err["error"] == "value is less than 5"


def test_stringy_numbers(spark):
    """Optional coercion: number-looking strings compared numerically
    (reference: stringy_numbers, U.pm:255-261); non-numeric strings stay
    vacuously valid; off by default."""
    from json_schema_modern_spark.compiler.column_compiler import CompileOptions

    spec = {"type": "object", "properties": {"v": {"minimum": 5}}}
    rows = [("7",), ("3",), ("abc",), (None,)]
    strict = _flags(spark, spec, rows, "v string")
    assert strict == [True, True, True, True]     # minimum doesn't apply to strings
    v = Validator(spec, CompileOptions(stringy_numbers=True))
    df = spark.createDataFrame(rows, "v string")
    res = v.validate(df, id_cols=[])
    coerced = [r._valid for r in res.annotated.select("_valid").collect()]
    assert coerced == [True, False, True, True]


def test_unevaluated_properties_through_ref(spark):
    spec = {"$defs": {"base": {"properties": {"a": {"minimum": 0}}}},
            "type": "object",
            "$ref": "#/$defs/base",
            "unevaluatedProperties": False}
    flags = _flags(spark, spec, [(1, None), (1, 2)], "a int, b int")
    assert flags == [True, False]   # $ref's properties cover a, not b
