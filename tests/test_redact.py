"""PII detection/redaction operator (operators/redact.py)."""

from json_schema_modern_spark.operators.redact import redact_pii


def test_pii_counts_and_redaction(spark):
    df = spark.createDataFrame(
        [(1, "mail a.b-c@test.org or admin@x.io, call +1 555-123-4567, "
             "server 192.168.1.1, card 4111111111111111"),
         (2, "no pii here")],
        "doc_id int, text string")
    out = {r.doc_id: r for r in redact_pii(df, keep_text=True).collect()}
    r1 = out[1]
    assert r1.n_email == 2
    assert r1.n_ipv4 == 1
    assert r1.n_phone >= 1
    assert r1.n_digits == 1
    assert r1.n_pii == r1.n_email + r1.n_phone + r1.n_ipv4 + r1.n_digits
    assert "<EMAIL>" in r1.redacted and "<IP>" in r1.redacted
    assert "@test.org" not in r1.redacted
    assert "4111111111111111" not in r1.redacted
    r2 = out[2]
    assert r2.n_pii == 0 and r2.redacted == "no pii here"


def test_stats_only_has_no_text_column(spark):
    df = spark.createDataFrame([(1, "x@y.zz")], "doc_id int, text string")
    out = redact_pii(df)
    assert "redacted" not in out.columns and "text" not in out.columns
