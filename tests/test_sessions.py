"""Gap-based sessionization (operators/sessions.py) and repetition
scoring (operators/text.py)."""

import datetime as dt

import pytest
from pyspark.sql import functions as F

from json_schema_modern_spark.operators.sessions import session_stats, sessionize
from json_schema_modern_spark.operators.text import repetition_stats


def _ts(minute, second=0):
    return dt.datetime(2024, 1, 1, 0, minute, second)


@pytest.fixture(scope="module")
def ev_df(spark):
    rows = [
        # user 7: events at 0, 10, 50 min → sessions {0,10} and {50}
        (1, _ts(0), 7), (2, _ts(10), 7), (3, _ts(50), 7),
        # user 8: single event
        (4, _ts(5), 8),
        # user 9: exactly 30:00 gap — NOT > gap, same session
        (5, _ts(0), 9), (6, _ts(30), 9),
        # user 9: 30:01 after the second event → new session
        (7, dt.datetime(2024, 1, 1, 1, 0, 1), 9),
    ]
    return spark.createDataFrame(
        rows, "event_id int, ts timestamp, user_id int")


def test_sessionize_gap_semantics(ev_df):
    got = {r.event_id: r.session_idx for r in sessionize(ev_df).collect()}
    assert got == {1: 1, 2: 1, 3: 2, 4: 1, 5: 1, 6: 1, 7: 2}


def test_session_stats_rollup(ev_df):
    rows = session_stats(ev_df).collect()
    by_key = {(r.user_id, r.session_idx): r for r in rows}
    assert by_key[(7, 1)].n_events == 2
    assert by_key[(7, 1)].duration_s == 600
    assert by_key[(7, 2)].n_events == 1
    assert by_key[(7, 2)].duration_s == 0
    assert by_key[(9, 1)].n_events == 2
    assert by_key[(9, 1)].duration_s == 1800
    assert (9, 2) in by_key and len(rows) == 5


def test_repetition_stats(spark):
    df = spark.createDataFrame(
        [
            (1, "a b a b a b"),       # bigrams: ab ba ab ba ab → 5 grams, 2 distinct
            (2, "w x y z"),           # all distinct
            (3, "single"),            # no bigrams
            (4, ""),                  # empty
        ],
        "doc_id int, text string")
    got = {r.doc_id: (r.n_grams, r.n_distinct, r.dup_frac)
           for r in repetition_stats(df, n=2).collect()}
    assert got[1] == (5, 2, 0.6)
    assert got[2] == (3, 3, 0.0)
    assert got[3] == (0, 0, 0.0)
    assert got[4] == (0, 0, 0.0)


def test_repetition_trigram(spark):
    df = spark.createDataFrame([(1, "a b c a b c a b c")], "doc_id int, text string")
    r = repetition_stats(df, n=3).collect()[0]
    # trigrams: abc bca cab abc bca cab abc → 7 grams, 3 distinct
    assert (r.n_grams, r.n_distinct) == (7, 3)
    assert r.dup_frac == round(1 - 3 / 7, 6)
