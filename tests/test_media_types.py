"""Media-type registry parity: RFC9110 parsing, wildcard + parameter
matching, register/delete seam, and content assertions through both tiers
(reference: Utilities.pm:475-743 media-type registry, V/Content.pm:42-114
under validate_content_schemas)."""

import base64

import pytest

from json_schema_modern_spark import Validator
from json_schema_modern_spark.compiler.column_compiler import CompileOptions
from json_schema_modern_spark.pyeval.full import EvalError, PyEvaluator
from json_schema_modern_spark.spec.media_types import (
    _reset_registry,
    decode_media_type,
    delete_media_type,
    match_media_type,
    parse_media_type,
    register_media_type,
)


@pytest.fixture(autouse=True)
def fresh_registry():
    _reset_registry()
    yield
    _reset_registry()


# ---- parsing (U.pm:498-524) ----------------------------------------------

def test_parse_basic():
    assert parse_media_type("text/plain") == {"type": "text", "subtype": "plain"}


def test_parse_case_folds_type_and_param_names():
    p = parse_media_type("Text/HTML; CharSet=UTF-8")
    assert p["type"] == "text" and p["subtype"] == "html"
    # charset VALUES are case-insensitive too (U.pm:517)
    assert p["parameters"] == {"charset": "utf-8"}


def test_parse_quoted_string_with_escapes():
    p = parse_media_type(r'application/json; note="a \"quoted\" value"')
    assert p["parameters"]["note"] == 'a "quoted" value'


def test_parse_rejects_garbage():
    assert parse_media_type("") is None
    assert parse_media_type("nosolidus") is None
    assert parse_media_type("a/b/c") is None


def test_parse_ows_around_semicolon():
    p = parse_media_type("text/plain \t;  charset=ascii")
    assert p["parameters"] == {"charset": "ascii"}


# ---- matching (U.pm:695-742) ---------------------------------------------

def test_match_exact_beats_wildcards():
    assert match_media_type("application/json") == "application/json"


def test_match_parameter_stripping_to_range():
    # VERDICT r4 missing #1: parameterized string must reach the text/*
    # registry row
    assert match_media_type("text/plain;charset=utf-8") == "text/*"
    assert match_media_type("text/plain; charset=utf-8") == "text/*"


def test_match_structured_suffix():
    # text/foo+plain matches text/plain but not text/bar+plain (U.pm:736)
    got = match_media_type("application/geo+json",
                           ["application/json", "application/xml"])
    assert got == "application/json"
    assert match_media_type("text/bar+plain", ["text/foo"]) is None


def test_match_rank_order():
    cands = ["*/*", "text/*", "text/plain"]
    assert match_media_type("text/plain", cands) == "text/plain"
    assert match_media_type("text/html", cands) == "text/*"
    assert match_media_type("image/png", cands) == "*/*"


def test_match_candidate_params_must_all_match():
    cands = ["text/plain;charset=utf-8"]
    # instance missing the candidate's parameter → no match
    assert match_media_type("text/plain", cands) is None
    # wrong value → no match; equal value → match
    assert match_media_type("text/plain;charset=ascii", cands) is None
    assert match_media_type("text/plain;charset=utf-8", cands) == cands[0]
    # extra instance params are fine
    assert match_media_type("text/plain;charset=utf-8;level=1", cands) == cands[0]


def test_match_more_params_ranks_higher():
    cands = ["text/plain", "text/plain;charset=utf-8"]
    assert (match_media_type("text/plain;charset=utf-8", cands)
            == "text/plain;charset=utf-8")


# ---- registry seam (U.pm:618-658) ------------------------------------------

def test_register_and_delete_media_type():
    register_media_type("application/toml", decoder=lambda c, p: {"ok": c})
    assert match_media_type("application/toml") == "application/toml"
    assert decode_media_type("application/toml", "x") == {"ok": "x"}
    delete_media_type("application/toml")
    assert match_media_type("application/toml") is None


def test_register_wildcard_range():
    register_media_type("image/*", decoder=lambda c, p: c)
    assert match_media_type("image/png") == "image/*"
    # exact registered type would still outrank the range
    register_media_type("image/png", decoder=lambda c, p: c)
    assert match_media_type("image/png") == "image/png"


def test_register_duplicate_raises():
    with pytest.raises(ValueError, match="duplicate media-type"):
        register_media_type("application/json", decoder=lambda c, p: c)


def test_register_bad_string_raises():
    with pytest.raises(ValueError, match="bad media-type string"):
        register_media_type("not a media type")


def test_decode_predefined():
    assert decode_media_type("application/json", '{"a": 1}') == {"a": 1}
    assert decode_media_type("application/x-ndjson", '1\n"two"') == [1, "two"]
    assert decode_media_type(
        "application/x-www-form-urlencoded", "a=1&b=2&b=3"
    ) == {"a": "1", "b": ["2", "3"]}
    assert decode_media_type("text/plain;charset=utf-8", b"caf\xc3\xa9") == "café"
    with pytest.raises(ValueError):
        decode_media_type("application/x-ndjson", "1\nnope")


# ---- Column tier through the registry --------------------------------------

def test_column_tier_parameterized_text(spark):
    """contentMediaType with parameters resolves through the registry to
    the text/* handler, so contentSchema sees the decoded string (this
    fell through to annotation-only before the registry existed)."""
    spec = {"type": "object", "properties": {"p": {
        "contentMediaType": "text/plain; charset=utf-8",
        "contentSchema": {"maxLength": 3}}}}
    df = spark.createDataFrame([("abc",), ("toolong",)], "p string")
    v = Validator(spec, CompileOptions(validate_content_schemas=True))
    flags = [r._valid for r in
             v.validate(df, id_cols=[]).annotated.select("_valid").collect()]
    assert flags == [True, False]


def test_column_tier_structured_suffix_json(spark):
    """application/geo+json matches the application/json registry row
    (suffix tier), so JSON well-formedness is asserted."""
    spec = {"type": "object", "properties": {"p": {
        "contentMediaType": "application/geo+json"}}}
    df = spark.createDataFrame([('{"ok": 1}',), ("not json",)], "p string")
    v = Validator(spec, CompileOptions(validate_content_schemas=True))
    flags = [r._valid for r in
             v.validate(df, id_cols=[]).annotated.select("_valid").collect()]
    assert flags == [True, False]


def test_column_tier_custom_registration_annotation_only(spark):
    """A custom python-only registration has no Column handler: the
    Column tier stays annotation-only for it, like the reference's
    decoder-less registry rows (U.pm:668)."""
    register_media_type("application/custom-thing", decoder=lambda c, p: c)
    spec = {"type": "object", "properties": {"p": {
        "contentMediaType": "application/custom-thing"}}}
    df = spark.createDataFrame([("anything",)], "p string")
    v = Validator(spec, CompileOptions(validate_content_schemas=True))
    flags = [r._valid for r in
             v.validate(df, id_cols=[]).annotated.select("_valid").collect()]
    assert flags == [True]


# ---- python tier (PyEvaluator validate_content_schemas) --------------------

def _pv():
    return PyEvaluator(validate_content_schemas=True)


def test_pyeval_content_json_assertion():
    schema = {"contentMediaType": "application/json",
              "contentSchema": {"type": "object", "required": ["k"]}}
    ev = _pv()
    assert ev.evaluate(schema, '{"k": 1}')
    assert not ev.evaluate(schema, '{"x": 1}')
    assert not ev.evaluate(schema, "not json")
    # annotation-only without the option (spec default)
    assert PyEvaluator().evaluate(schema, "not json")


def test_pyeval_content_encoding_chain():
    schema = {"contentEncoding": "base64",
              "contentMediaType": "application/json",
              "contentSchema": {"maximum": 10}}
    ev = _pv()
    ok_payload = base64.b64encode(b"7").decode()
    bad_payload = base64.b64encode(b"99").decode()
    assert ev.evaluate(schema, ok_payload)
    assert not ev.evaluate(schema, bad_payload)
    assert not ev.evaluate(schema, "!!!notb64")


def test_pyeval_parameterized_and_ndjson():
    ev = _pv()
    assert ev.evaluate({"contentMediaType": "text/plain; charset=utf-8",
                        "contentSchema": {"maxLength": 3}}, "abc")
    assert not ev.evaluate({"contentMediaType": "text/plain; charset=utf-8",
                            "contentSchema": {"maxLength": 3}}, "toolong")
    assert ev.evaluate({"contentMediaType": "application/x-ndjson"}, '1\n2')
    assert not ev.evaluate({"contentMediaType": "application/x-ndjson"},
                           '1\nnope')


def test_pyeval_unknown_media_type_aborts():
    # reference aborts when no decoder matches (Content.pm:88-89)
    with pytest.raises(EvalError, match="cannot find decoder"):
        _pv().evaluate({"contentMediaType": "application/does-not-exist"}, "x")


def test_pyeval_content_draft_gating():
    # contentEncoding/contentMediaType are draft7+: inert under draft6
    schema = {"contentMediaType": "application/json"}
    ev6 = PyEvaluator(dialect="6", validate_content_schemas=True)
    assert ev6.evaluate(schema, "not json")
    # contentSchema is 2019-09+: inert under draft7 even in assertion mode
    ev7 = PyEvaluator(dialect="7", validate_content_schemas=True)
    assert not ev7.evaluate(schema, "not json")
    assert ev7.evaluate({"contentMediaType": "application/json",
                         "contentSchema": {"type": "array"}}, '{"k": 1}')
