"""`format` keyword validators as JVM-side Column predicates.

The reference implements these as per-string Perl subs
(/root/reference/lib/JSON/Schema/Modern/Vocabulary/FormatAssertion.pm:87-180).
Here each format compiles to a single `rlike` (plus a semantic guard where a
regex can't carry the calendar rules), so format assertion over a billion
rows stays inside whole-stage codegen — no Python in the loop.

Unknown formats validate successfully (annotation-only), matching the
default lenient behavior (FormatAnnotation.pm:47-85); a custom-format
registry lets callers add Column-expression factories, the analogue of the
reference's add_format_validation (Modern.pm:122-134).
"""

from __future__ import annotations

import re
from collections.abc import Callable

import pandas as pd
from pyspark.sql import Column
from pyspark.sql import functions as F

_DATE = r"\d{4}-(0[1-9]|1[0-2])-(0[1-9]|[12]\d|3[01])"
_TIME = r"([01]\d|2[0-3]):[0-5]\d:([0-5]\d|60)(\.\d+)?([Zz]|[+-]([01]\d|2[0-3]):[0-5]\d)"

FORMAT_REGEX: dict[str, str] = {
    "date": rf"^{_DATE}$",
    "time": rf"^{_TIME}$",
    "date-time": rf"^{_DATE}[Tt]{_TIME}$",
    "duration": (
        r"^P(?:\d+W|(?=\d|T\d)(?:\d+Y)?(?:\d+M)?(?:\d+D)?"
        r"(?:T(?=\d)(?:\d+H)?(?:\d+M)?(?:\d+S)?)?)$"
    ),
    "uuid": r"^[0-9a-fA-F]{8}-[0-9a-fA-F]{4}-[0-9a-fA-F]{4}-[0-9a-fA-F]{4}-[0-9a-fA-F]{12}$",
    "ipv4": (
        r"^((25[0-5]|2[0-4]\d|1\d\d|[1-9]?\d)\.){3}"
        r"(25[0-5]|2[0-4]\d|1\d\d|[1-9]?\d)$"
    ),
    "ipv6": (
        r"^(([0-9a-fA-F]{1,4}:){7}[0-9a-fA-F]{1,4}|"
        r"([0-9a-fA-F]{1,4}:){1,7}:|"
        r"([0-9a-fA-F]{1,4}:){1,6}:[0-9a-fA-F]{1,4}|"
        r"([0-9a-fA-F]{1,4}:){1,5}(:[0-9a-fA-F]{1,4}){1,2}|"
        r"([0-9a-fA-F]{1,4}:){1,4}(:[0-9a-fA-F]{1,4}){1,3}|"
        r"([0-9a-fA-F]{1,4}:){1,3}(:[0-9a-fA-F]{1,4}){1,4}|"
        r"([0-9a-fA-F]{1,4}:){1,2}(:[0-9a-fA-F]{1,4}){1,5}|"
        r"[0-9a-fA-F]{1,4}:((:[0-9a-fA-F]{1,4}){1,6})|"
        r":((:[0-9a-fA-F]{1,4}){1,7}|:))$"
    ),
    "hostname": (
        r"^(?=.{1,253}$)([a-zA-Z0-9]([a-zA-Z0-9-]{0,61}[a-zA-Z0-9])?)"
        r"(\.[a-zA-Z0-9]([a-zA-Z0-9-]{0,61}[a-zA-Z0-9])?)*$"
    ),
    "email": r"^[a-zA-Z0-9.!#$%&'*+/=?^_`{|}~-]+@[a-zA-Z0-9]([a-zA-Z0-9-]{0,61}[a-zA-Z0-9])?(\.[a-zA-Z0-9]([a-zA-Z0-9-]{0,61}[a-zA-Z0-9])?)*$",
    "json-pointer": r"^(/([^/~]|~[01])*)*$",
    "relative-json-pointer": r"^(0|[1-9]\d*)(#|(/([^/~]|~[01])*)*)$",
    "uri": r"^[a-zA-Z][a-zA-Z0-9+.-]*:[^\s]*$",
    "uri-reference": r"^[^\s\\]*$",
    "iri": r"^[a-zA-Z][a-zA-Z0-9+.-]*:[^\s]*$",
    "iri-reference": r"^[^\s\\]*$",
    # idn-* are documented rlike APPROXIMATIONS of the reference's
    # Net::IDN / Data::Validate::Domain behavior
    # (FormatAssertion.pm:138-141): unicode letters/digits allowed per
    # label, 63-char labels, 253-char total, no leading/trailing hyphen —
    # without the full IDNA2008 mapping/bidi rules
    "idn-hostname": (
        r"^(?=.{1,253}$)((?!-)[\p{L}\p{N}-]{1,63}(?<!-))"
        r"(\.((?!-)[\p{L}\p{N}-]{1,63}(?<!-)))*$"
    ),
    "idn-email": (
        r"^[^@\s]+@(?=.{1,253}$)((?!-)[\p{L}\p{N}-]{1,63}(?<!-))"
        r"(\.((?!-)[\p{L}\p{N}-]{1,63}(?<!-)))*$"
    ),
}

# date formats additionally need a real-calendar check: regex admits Feb 30.
_SEMANTIC_DATE = {"date", "date-time"}

_custom: dict[str, Callable[[Column], Column]] = {}


def register_format(name: str, factory: Callable[[Column], Column]) -> None:
    """Custom format → Column-predicate factory (reference:
    add_format_validation, Modern.pm:122-134)."""
    _custom[name] = factory


def _regex_format_predicate(col: Column) -> Column:
    """`regex` format: does the string compile as a regex?

    The reference tests Perl qr// compilation (FormatAssertion.pm:173-176);
    here a vectorized pandas UDF tests Python-re compilation — a documented
    dialect approximation, and the only format that needs Python (pattern
    VALIDITY isn't expressible as a match).  Cold path by nature: `regex`
    formats validate schema-like columns, not token data."""

    @F.pandas_udf("boolean")
    def _re_ok(s: pd.Series) -> pd.Series:
        def ok(x):
            if x is None:
                return None
            try:
                re.compile(x)
                return True
            except re.error:
                return False
        return s.map(ok)

    return _re_ok(col)


def format_predicate(name: str, col: Column) -> Column | None:
    """Boolean Column: value conforms to the named format.
    None ⇒ unknown format (annotation-only, always valid)."""
    if name in _custom:
        return _custom[name](col)
    if name == "regex":
        return _regex_format_predicate(col)
    pat = FORMAT_REGEX.get(name)
    if pat is None:
        return None
    ok = col.rlike(pat)
    if name in _SEMANTIC_DATE:
        date_part = F.substring(col, 1, 10)
        ok = ok & F.try_to_timestamp(date_part, F.lit("yyyy-MM-dd")).isNotNull()
    return ok
