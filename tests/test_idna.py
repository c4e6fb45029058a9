"""IDNA2008 idn-hostname / idn-email (functions/idna.py): punycode
round-trip, RFC 5892 contextual rules, RFC 5893 bidi, reference
fallback-to-raw semantics (FormatAssertion.pm:138-141)."""

import pytest

from json_schema_modern_spark.functions.formats_py import check_format
from json_schema_modern_spark.functions.idna import (
    check_idn_email,
    check_idn_hostname,
    domain_to_ascii,
)


@pytest.mark.parametrize("v,expected", [
    # plain ASCII passes through to the hostname check
    ("example.com", True),
    ("EXAMPLE.COM", True),
    ("ex_ample.com", False),
    ("-leading.example", False),
    ("trailing-.example", False),
    ("127.0.0.1", False),                       # bare IPv4 is not a hostname
    # U-labels
    ("실례.테스트", True),                       # Korean (test-suite case)
    ("ä.example", True),
    ("Ä.example", False),                       # uppercase: casefold-unstable ⇒ DISALLOWED
    ("〮실례.테스트", False),                    # leading combining mark
    # A-labels: canonical round-trip required
    ("xn--4ca.example", True),                  # punycode("ä")
    ("xn--ihqwcrb4cv8a8dqg056pqjye.example", True),
    # CONTEXTO: middle dot only between two 'l's
    ("l·l", True),
    ("a·b", False),
    ("·ll", False),
    ("ll·", False),
    # CONTEXTJ: ZWJ after virama
    ("क्‍ष.example", True),
    ("a‍b.example", False),
    # Arabic digit sets never mix; AN-leading label fails bidi
    ("٠۹.example", False),
    ("א0٠.example", False),                     # RTL label mixing EN and AN
    ("בא.example", True),                       # bidi domain, both labels conform
    # label shape
    ("ab--cd.example", True),                   # raw-fallback: valid RFC1123 hostname
    ("", False),
])
def test_idn_hostname(v, expected):
    assert check_idn_hostname(v) is expected
    assert check_format("idn-hostname", v) is expected


def test_domain_to_ascii_roundtrip():
    assert domain_to_ascii("실례.테스트") == "xn--9n2bp8q.xn--9t4b11yi5a"
    assert domain_to_ascii("example.com") == "example.com"
    assert domain_to_ascii("Ä.example") is None
    # trailing root dot is preserved
    assert domain_to_ascii("ä.example.") == "xn--4ca.example."


@pytest.mark.parametrize("v,expected", [
    ("user@실례.테스트", True),
    ("user@example.com", True),
    ("ätlön@example.com", True),                # UTF-8 local part allowed
    ("u ser@example.com", False),
    ("user@", False),
    ("@example.com", False),
    ("user@〮실례.example", False),
    ("user@[192.168.0.1]", True),               # address literal
])
def test_idn_email(v, expected):
    assert check_idn_email(v) is expected
    assert check_format("idn-email", v) is expected


def test_column_tier_idn_assertion(spark):
    """The Column tier routes idn formats through the same IDNA pipeline
    (pandas UDF, like `regex`)."""
    from json_schema_modern_spark import Validator
    from json_schema_modern_spark.compiler.column_compiler import CompileOptions

    spec = {"type": "object",
            "properties": {"h": {"format": "idn-hostname"}}}
    rows = [("실례.테스트",), ("〮실례.테스트",), ("example.com",),
            ("a·b",), (None,)]
    df = spark.createDataFrame(rows, "h string")
    v = Validator(spec, CompileOptions(validate_formats=True))
    flags = [r._valid for r in
             v.validate(df, id_cols=[]).annotated.select("_valid").collect()]
    assert flags == [True, False, True, False, True]
