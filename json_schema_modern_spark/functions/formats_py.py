"""Pure-Python `format` checkers with reference-parity semantics.

These are the driver-side twins of the Column predicates in
``formats.py``, used by the pure-Python evaluator (``pyeval``) that
backs differential testing, the acceptance-corpus port, and metaschema
self-validation.  Semantics follow the reference's per-format subs
(/root/reference/lib/JSON/Schema/Modern/Vocabulary/FormatAssertion.pm:60-180)
including the cases its additional-tests corpus pins down:

- ASCII-only digits everywhere (the reference compiles its regexes with
  the /a flag; Python's ``\\d`` is Unicode, so ``[0-9]`` throughout);
- ``time``: offset REQUIRED; second ``60`` valid only when the
  zulu-normalized wall time is 23:59 (FormatAssertion.pm:124-136);
- ``date-time``: month/day checked against the real calendar (leap
  years); second ``60`` valid only for instants in the published IERS
  leap-second table (the reference defers to DateTime, which carries
  the same table);
- ``duration``: integer quantities, CONTIGUOUS units only — P1Y2D is
  invalid because days may only follow months (the reference's nested
  regex ``Y(M(D)?)?``, FormatAssertion.pm:70-86);
- ``hostname``: rejects a bare IPv4 address (Data::Validate::Domain
  behavior) but accepts numeric labels otherwise.

No Spark imports — unit-testable standalone.
"""

from __future__ import annotations

import datetime
import re
from collections.abc import Callable

# UTC dates whose final second was 23:59:60 (IERS Bulletin C, complete
# through the 2016-12-31 leap second; none have been scheduled since).
LEAP_SECOND_DATES = frozenset({
    "1972-06-30", "1972-12-31", "1973-12-31", "1974-12-31", "1975-12-31",
    "1976-12-31", "1977-12-31", "1978-12-31", "1979-12-31", "1981-06-30",
    "1982-06-30", "1983-06-30", "1985-06-30", "1987-12-31", "1989-12-31",
    "1990-12-31", "1992-06-30", "1993-06-30", "1994-06-30", "1995-12-31",
    "1997-06-30", "1998-12-31", "2005-12-31", "2008-12-31", "2012-06-30",
    "2015-06-30", "2016-12-31",
})

_TIME_RE = re.compile(
    r"^([0-9]{2}):([0-9]{2}):([0-9]{2})(?:\.[0-9]+)?"
    r"([Zz]|([+-])([0-9]{2}):([0-9]{2}))$")
_DATE_RE = re.compile(r"^([0-9]{4})-([0-9]{2})-([0-9]{2})$")
_DATETIME_RE = re.compile(
    r"^([0-9]{4})-([0-9]{2})-([0-9]{2})[Tt]"
    r"([0-9]{2}):([0-9]{2}):([0-9]{2})(?:\.[0-9]+)?"
    r"([Zz]|([+-])([0-9]{2}):([0-9]{2}))$")

# Contiguous-unit ISO-8601 duration (integer quantities): date units are
# Y(M(D)?)? | M(D)? | D, time units H(M(S)?)? | M(S)? | S — skipping a
# middle unit (P1Y2D, PT1H2S) is invalid.
_DUR_TIME = r"T(?:[0-9]+H(?:[0-9]+M(?:[0-9]+S)?)?|[0-9]+M(?:[0-9]+S)?|[0-9]+S)"
_DUR_DATE = r"(?:[0-9]+Y(?:[0-9]+M(?:[0-9]+D)?)?|[0-9]+M(?:[0-9]+D)?|[0-9]+D)"
_DURATION_RE = re.compile(
    rf"^P(?:[0-9]+W|{_DUR_DATE}(?:{_DUR_TIME})?|{_DUR_TIME})$")

_HOSTNAME_RE = re.compile(
    r"^(?=.{1,253}$)([a-zA-Z0-9]([a-zA-Z0-9-]{0,61}[a-zA-Z0-9])?)"
    r"(\.[a-zA-Z0-9]([a-zA-Z0-9-]{0,61}[a-zA-Z0-9])?)*$")
_IPV4_RE = re.compile(
    r"^((25[0-5]|2[0-4][0-9]|1[0-9][0-9]|[1-9]?[0-9])\.){3}"
    r"(25[0-5]|2[0-4][0-9]|1[0-9][0-9]|[1-9]?[0-9])$")
_UUID_RE = re.compile(
    r"^[0-9a-fA-F]{8}-[0-9a-fA-F]{4}-[0-9a-fA-F]{4}-"
    r"[0-9a-fA-F]{4}-[0-9a-fA-F]{12}$")
_EMAIL_RE = re.compile(
    r"^[a-zA-Z0-9.!#$%&'*+/=?^_`{|}~-]+@[a-zA-Z0-9]([a-zA-Z0-9-]{0,61}[a-zA-Z0-9])?"
    r"(\.[a-zA-Z0-9]([a-zA-Z0-9-]{0,61}[a-zA-Z0-9])?)*$")
_JSON_POINTER_RE = re.compile(r"^(/([^/~]|~[01])*)*$")
_REL_JSON_POINTER_RE = re.compile(r"^(0|[1-9][0-9]*)(#|(/([^/~]|~[01])*)*)$")
_URI_RE = re.compile(r"^[a-zA-Z][a-zA-Z0-9+.-]*:[^\s]*$")
_ASCII_RE = re.compile(r"^[\x00-\x7f]*$")
# strict RFC 3986: only unreserved/reserved/pct-encoded characters, at
# most one '#', scheme required for `uri` (the reference delegates to
# Data::Validate::URI — a full-grammar check; the character/shape class
# below is its practical core: rejects spaces, '^', '\', bare '%',
# non-ASCII)
_RFC3986_CH = r"(?:[A-Za-z0-9\-._~:/?\[\]@!$&'()*+,;=]|%[0-9A-Fa-f]{2})*"
_STRICT_URI_RE = re.compile(
    rf"^[A-Za-z][A-Za-z0-9+.\-]*:{_RFC3986_CH}(?:#{_RFC3986_CH})?$")
_STRICT_URIREF_RE = re.compile(rf"^{_RFC3986_CH}(?:#{_RFC3986_CH})?$")


def _leap_time_ok(hh: int, mm: int, tz: str, sign: str | None,
                  oh: int, om: int) -> bool:
    """Second == 60: zulu-normalized wall time must be 23:59
    (FormatAssertion.pm:124-136 arithmetic, including the minute borrow)."""
    if tz in ("Z", "z"):
        return hh == 23 and mm == 59
    s = 1 if sign == "+" else -1
    hour_zulu = hh - oh * s
    min_zulu = mm - om * s
    if min_zulu < 0:
        hour_zulu -= 1
    return hour_zulu % 24 == 23 and min_zulu % 60 == 59


def check_time(v: str) -> bool:
    m = _TIME_RE.match(v)
    if not m:
        return False
    hh, mm, ss = int(m[1]), int(m[2]), int(m[3])
    tz, sign = m[4], m[5]
    oh = int(m[6]) if m[6] else 0
    om = int(m[7]) if m[7] else 0
    if hh > 23 or mm > 59 or ss > 60 or oh > 23 or om > 59:
        return False
    if ss <= 59:
        return True
    return _leap_time_ok(hh, mm, tz, sign, oh, om)


def check_date(v: str) -> bool:
    m = _DATE_RE.match(v)
    if not m:
        return False
    try:
        datetime.date(int(m[1]), int(m[2]), int(m[3]))
        return True
    except ValueError:
        return False


def check_date_time(v: str) -> bool:
    m = _DATETIME_RE.match(v)
    if not m:
        return False
    y, mo, d = int(m[1]), int(m[2]), int(m[3])
    hh, mm, ss = int(m[4]), int(m[5]), int(m[6])
    tz, sign = m[7], m[8]
    oh = int(m[9]) if m[9] else 0
    om = int(m[10]) if m[10] else 0
    if hh > 23 or mm > 59 or ss > 60 or oh > 23 or om > 59:
        return False
    try:
        date = datetime.date(y, mo, d)
    except ValueError:
        return False
    if ss <= 59:
        return True
    # leap second: normalize the full instant to zulu (offset may carry
    # the wall date across midnight) and look it up in the IERS table
    s = 1 if sign == "+" else -1 if sign == "-" else 0
    total_min = hh * 60 + mm - s * (oh * 60 + om)
    date += datetime.timedelta(days=total_min // (24 * 60))
    total_min %= 24 * 60
    return total_min == 23 * 60 + 59 and date.isoformat() in LEAP_SECOND_DATES


def check_hostname(v: str) -> bool:
    # a bare IPv4 address is not a hostname (Data::Validate::Domain);
    # numeric labels elsewhere (192.168.0, 1.2.3.4.example.com) are fine
    return bool(_HOSTNAME_RE.match(v)) and not _IPV4_RE.match(v)


def check_ipv6(v: str) -> bool:
    """Reference's component-counting algorithm (FormatAssertion.pm:144-161):
    hex groups separated by ':', at most one '::' (which must stand for at
    least one zero group), optional embedded dotted-quad tail."""
    m = re.match(r"^(?:[0-9a-fA-F]{0,4}:){1,6}((?:[0-9]{1,3}\.){3}[0-9]{1,3})$", v)
    embedded = None
    if m:
        embedded = m[1]
        if not _IPV4_RE.match(embedded):
            return False
    elif not re.match(r"^(?:[0-9a-fA-F]{0,4}:){0,8}[0-9a-fA-F]{0,4}$", v):
        return False
    if ":::" in v or re.match(r"^:[^:]", v) or re.search(r"[^:]:$", v):
        return False
    double_colons = v.count("::")
    components = len([c for c in re.split(r":+", v) if c])
    if embedded is not None:
        components -= 0  # the dotted quad counts as one component below
    limit = 7 if embedded is not None else 8
    if double_colons == 1:
        return components < limit
    return double_colons == 0 and components == limit


def check_duration(v: str) -> bool:
    return bool(_DURATION_RE.match(v))


FORMAT_CHECKERS: dict[str, Callable[[str], bool]] = {
    "date": check_date,
    "time": check_time,
    "date-time": check_date_time,
    "duration": check_duration,
    "hostname": check_hostname,
    "ipv4": lambda v: bool(_IPV4_RE.match(v)),
    "ipv6": check_ipv6,
    "uuid": lambda v: bool(_UUID_RE.match(v)),
    "email": lambda v: bool(_EMAIL_RE.match(v)) and bool(_ASCII_RE.match(v)),
    "json-pointer": lambda v: bool(_JSON_POINTER_RE.match(v)),
    "relative-json-pointer": lambda v: bool(_REL_JSON_POINTER_RE.match(v)),
    "uri": lambda v: bool(_STRICT_URI_RE.match(v)),
    "uri-reference": lambda v: bool(_STRICT_URIREF_RE.match(v)),
    "iri": lambda v: bool(_URI_RE.match(v)),
    "iri-reference": lambda v: "\\" not in v and not re.search(r"\s", v),
    "regex": lambda v: _regex_compiles(v),
}


def _register_idn() -> None:
    # IDNA2008 pipeline (functions/idna.py) — late import keeps this
    # module importable standalone if idna.py is trimmed from a build
    from json_schema_modern_spark.functions.idna import (
        check_idn_email, check_idn_hostname,
    )

    FORMAT_CHECKERS["idn-hostname"] = check_idn_hostname
    FORMAT_CHECKERS["idn-email"] = check_idn_email


_register_idn()


def _regex_compiles(v: str) -> bool:
    try:
        re.compile(v)
        return True
    except re.error:
        return False


def check_format(name: str, value) -> bool:
    """True unless the format is known AND the string value fails it —
    unknown formats are annotation-only (FormatAnnotation.pm:47-85), and
    non-string instances always pass (formats apply to strings only)."""
    if not isinstance(value, str):
        return True
    fn = FORMAT_CHECKERS.get(name)
    return True if fn is None else fn(value)
