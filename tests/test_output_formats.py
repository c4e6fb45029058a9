"""Output formats beyond flag/basic (Result.pm:99,153-223) and the
with_defaults repair pass (Result.pm:144-151)."""

import json

from json_schema_modern_spark import Validator


def _res(spark, spec, rows, ddl):
    df = spark.createDataFrame(rows, ddl)
    return Validator(spec).validate(df, id_cols=["rid"])


def test_strict_basic_fragment_uris(spark):
    spec = {"type": "object", "properties": {"v": {"minimum": 5}}}
    res = _res(spark, spec, [(1, 3), (2, 7)], "rid int, v int")
    docs = {r.rid: json.loads(r.result)
            for r in res.strict_basic_output().collect()}
    assert docs[2] == {"valid": True}
    err = docs[1]["errors"][0]
    assert err["instanceLocation"] == "#/v"
    assert err["keywordLocation"] == "#/properties/v/minimum"


def test_terse_drops_applicator_summaries(spark):
    spec = {"type": "object", "properties": {"v": {
        "anyOf": [{"minimum": 10}, {"multipleOf": 2}]}}}
    res = _res(spark, spec, [(1, 3)], "rid int, v int")
    full_kws = {r.keyword for r in res.violations.collect()}
    terse_kws = {r.keyword for r in res.terse_output().collect()}
    assert "anyOf" in full_kws
    assert "anyOf" not in terse_kws
    assert {"minimum", "multipleOf"} <= terse_kws     # leaves survive


def test_terse_keeps_oneof_multiple_valid(spark):
    spec = {"type": "object", "properties": {"v": {
        "oneOf": [{"minimum": 0}, {"multipleOf": 2}]}}}
    res = _res(spark, spec, [(1, 4), (2, -3)], "rid int, v int")
    terse = {(r.rid, r.keyword, r.error) for r in res.terse_output().collect()}
    # rid 1: both branches valid → 'multiple subschemas are valid' kept
    assert any(k == "oneOf" and "multiple" in e for rid, k, e in terse if rid == 1)
    # rid 2: 'no subschemas are valid' dropped; leaf errors kept
    assert not any(k == "oneOf" for rid, k, e in terse if rid == 2)
    assert any(k == "minimum" for rid, k, e in terse if rid == 2)


def test_data_only_output(spark):
    spec = {"type": "object",
            "properties": {"v": {"minimum": 5}, "w": {"maxLength": 2}}}
    res = _res(spark, spec, [(1, 3, "xyz"), (2, 9, "ab")],
               "rid int, v int, w string")
    docs = {r.rid: r.result for r in res.data_only_output().collect()}
    assert docs[2] == "valid"
    assert "'/v': value is less than 5" in docs[1]
    assert "'/w': length is greater than 2" in docs[1]
    assert docs[1].count("\n") == 1


def test_collected_annotations(spark):
    """collect_annotations: MetaData annotations reported for valid rows;
    annotations from untaken/failed branches discarded (U.pm:823-829)."""
    from json_schema_modern_spark.compiler.column_compiler import CompileOptions

    spec = {"type": "object", "title": "row schema",
            "properties": {"v": {
                "description": "the value",
                "anyOf": [
                    {"title": "small", "maximum": 5},
                    {"title": "large", "minimum": 100},
                ]}}}
    df = spark.createDataFrame([(1, 3), (2, 200), (3, 50)], "rid int, v int")
    v = Validator(spec, CompileOptions(collect_annotations=True))
    res = v.validate(df, id_cols=["rid"])
    docs = {r.rid: json.loads(r.result)
            for r in res.basic_output(with_annotations=True).collect()}

    def titles(d):
        out = set()
        for a in d.get("annotations", []):
            val = json.loads(a["annotation"])
            out.add((a["keywordLocation"],
                     tuple(val) if isinstance(val, list) else val))
        return out

    assert ("/title", "row schema") in titles(docs[1])
    assert ("/properties/v/description", "the value") in titles(docs[1])
    # branch guards: row 1 took 'small', row 2 took 'large'
    assert ("/properties/v/anyOf/0/title", "small") in titles(docs[1])
    assert ("/properties/v/anyOf/1/title", "large") not in titles(docs[1])
    assert ("/properties/v/anyOf/1/title", "large") in titles(docs[2])
    assert ("/properties/v/anyOf/0/title", "small") not in titles(docs[2])
    # invalid row: no annotations at all
    assert docs[3]["valid"] is False and "annotations" not in docs[3]
    # absent property: its subtree was never evaluated → no annotations
    df2 = spark.createDataFrame([(9, None)], "rid int, v int")
    res2 = v.validate(df2, id_cols=["rid"])
    d = json.loads(res2.basic_output(with_annotations=True).first().result)
    assert ("/title", "row schema") in titles(d)
    assert not any(a["keywordLocation"].startswith("/properties/v")
                   for a in d.get("annotations", []))
    # default call shape unchanged
    plain = {r.rid: json.loads(r.result) for r in res.basic_output().collect()}
    assert "annotations" not in plain[1]


def test_applicator_and_format_annotations(spark):
    """properties/patternProperties/additionalProperties annotate the
    EVALUATED property names (V/Applicator.pm:448,487,523) and format
    annotates its name independent of assertion mode
    (FormatAnnotation.pm:47-48)."""
    from json_schema_modern_spark.compiler.column_compiler import CompileOptions

    spec = {"type": "object",
            "properties": {"rid": {"type": "integer"},
                           "email": {"type": "string", "format": "email"},
                           "v": {"type": "integer"}},
            "patternProperties": {"^x_": {"type": "string"}},
            "additionalProperties": {"type": "string"}}
    df = spark.createDataFrame(
        [(1, "a@b.co", 3, "yes", "extra"),       # everything present
         (2, None, 7, None, None)],              # only v present
        "rid int, email string, v int, x_tag string, note string")
    v = Validator(spec, CompileOptions(collect_annotations=True,
                                       validate_formats=True))
    res = v.validate(df, id_cols=["rid"])
    docs = {r.rid: json.loads(r.result)
            for r in res.basic_output(with_annotations=True).collect()}

    def ann(d):
        return {(a["keywordLocation"], a["keyword"]): json.loads(a["annotation"])
                for a in d.get("annotations", [])}

    a1, a2 = ann(docs[1]), ann(docs[2])
    assert a1[("/properties", "properties")] == ["email", "rid", "v"]
    assert a1[("/patternProperties", "patternProperties")] == ["x_tag"]
    assert a1[("/additionalProperties", "additionalProperties")] == ["note"]
    # format name annotated on the evaluated (present) string property
    assert a1[("/properties/email/format", "format")] == "email"
    # row 2: only v present — names shrink per row, absent email subtree
    # contributes no format annotation
    assert a2[("/properties", "properties")] == ["rid", "v"]
    assert a2[("/patternProperties", "patternProperties")] == []
    assert a2[("/additionalProperties", "additionalProperties")] == []
    assert ("/properties/email/format", "format") not in a2

    # MapType runtime object: names computed from the live keys
    spec_m = {"type": "object",
              "patternProperties": {"^k": {"type": "string"}},
              "additionalProperties": True}
    dfm = spark.createDataFrame(
        [(1, {"k1": "a", "k2": "b", "other": "c"})],
        "rid int, m map<string,string>")
    vm = Validator({"type": "object", "properties": {"m": spec_m}},
                   CompileOptions(collect_annotations=True))
    dm = json.loads(vm.validate(dfm, id_cols=["rid"])
                    .basic_output(with_annotations=True).first().result)
    am = {a["keywordLocation"]: json.loads(a["annotation"])
          for a in dm["annotations"]}
    assert am["/properties/m/patternProperties"] == ["k1", "k2"]
    assert am["/properties/m/additionalProperties"] == ["other"]


def test_recommended_response(spark):
    spec = {"type": "object", "required": ["k"],
            "properties": {"k": {"type": "integer", "minimum": 10}}}
    df = spark.createDataFrame(
        [(1, '{"k": 42}'), (2, '{"k": 3}'), (3, 'not json')],
        "rid int, payload string")
    res = Validator(spec).validate_json_strings(df, "payload", id_cols=["rid"])
    out = {r.rid: (r.status, r.reason) for r in res.recommended_response().collect()}
    assert out[1] == (200, "OK")
    assert out[2] == (400, "'/k': value is less than 10")
    assert out[3] == (500, "Internal Server Error")


def test_apply_defaults(spark):
    spec = {"type": "object", "properties": {
        "lang": {"type": "string", "default": "en"},
        "score": {"type": "number", "default": 0.5},
        "name": {"type": "string"},
    }}
    v = Validator(spec)
    assert v.defaults_map() == {"/lang": "en", "/score": 0.5}
    df = spark.createDataFrame(
        [(1, None, None, None), (2, "fr", 0.9, "x")],
        "rid int, lang string, score double, name string")
    out = {r.rid: (r.lang, r.score, r.name)
           for r in v.apply_defaults(df).collect()}
    assert out[1] == ("en", 0.5, None)       # defaults filled, no default → untouched
    assert out[2] == ("fr", 0.9, "x")        # present values never overwritten


def test_array_applicator_annotations(spark):
    """items annotates true; prefixItems annotates the largest evaluated
    index or true when it covered the whole array (V/Applicator.pm:314,349)."""
    from json_schema_modern_spark.compiler.column_compiler import CompileOptions

    spec = {"type": "object", "properties": {"v": {
        "type": "array",
        "prefixItems": [{"type": "integer"}, {"type": "integer"}],
        "items": {"type": "integer"}}}}
    df = spark.createDataFrame([(1, [1, 2, 3]), (2, [7])],
                               "rid int, v array<bigint>")
    v = Validator(spec, CompileOptions(collect_annotations=True))
    docs = {r.rid: json.loads(r.result)
            for r in v.validate(df, id_cols=["rid"])
                      .basic_output(with_annotations=True).collect()}

    def ann(d):
        return {a["keywordLocation"]: json.loads(a["annotation"])
                for a in d.get("annotations", [])}

    a1, a2 = ann(docs[1]), ann(docs[2])
    assert a1["/properties/v/items"] is True
    assert a1["/properties/v/prefixItems"] == 1     # longer than the prefix
    assert a2["/properties/v/prefixItems"] is True  # prefix covered it all


def test_outputs_validate_against_official_output_schema(spark):
    """Self-hosting: every basic_output()/strict_basic_output() document
    validates against the OFFICIAL output-format schema bundled from the
    reference's share/draft{2020-12,2019-09}/output/schema.json (the
    reference registers the same URIs at Modern.pm:1064,1073)."""
    from json_schema_modern_spark.pyeval.metaschema import (
        validate_output_document,
    )

    spec = {"type": "object",
            "required": ["v"],
            "properties": {"v": {"type": "integer", "minimum": 5},
                           "s": {"$ref": "#/$defs/short"}},
            "$defs": {"short": {"maxLength": 2}}}
    res = _res(spark, spec, [(1, 3, "toolong"), (2, 7, "ok"), (3, None, None)],
               "rid int, v int, s string")
    for r in res.basic_output().collect():
        doc = json.loads(r.result)
        assert validate_output_document(doc, "2020-12"), doc
    # strict_basic is the 2019-09-flavored rendering (URI-fragment
    # locations); check it against the 2019-09 output schema
    for r in res.strict_basic_output().collect():
        doc = json.loads(r.result)
        assert validate_output_document(doc, "2019-09"), doc
    # negative control: the official schema rejects a non-boolean valid
    assert not validate_output_document({"valid": "yes"}, "2020-12")
    assert not validate_output_document({"errors": []}, "2019-09")


def test_output_schema_uri_resolvable_from_user_schemas():
    """The bundled output-schema URI is registered like any cached
    metaschema, so a user schema can $ref it (Modern.pm:1064)."""
    from json_schema_modern_spark.pyeval.metaschema import (
        metaschema_evaluator,
    )

    ev = metaschema_evaluator("2020-12")
    uri = "https://json-schema.org/draft/2020-12/output/schema"
    assert ev.evaluate_uri(uri, {"valid": True})
    assert not ev.evaluate_uri(uri, {"valid": 1})
