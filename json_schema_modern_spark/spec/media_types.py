"""Media-type registry with RFC9110 parsing, wildcard + parameter matching.

Mirrors the reference's media-type registry semantics
(Utilities.pm:475-743 — ``_parse_media_type`` / ``match_media_type`` /
``add_media_type`` / ``delete_media_type`` / ``_predefined_media_types``):

- a ``contentMediaType`` string is parsed per RFC9110 §8.3.1 ABNF
  (token/quoted-string, OWS around ';', backslash unquoting inside
  quoted-strings, case-folded type/subtype/param names, case-folded
  ``charset`` values, ≤64 parameters);
- matching against the registry prefers an exact registry-key hit, then
  ranks parsed candidates: exact type/subtype (2^10) > structured-suffix
  ``type/foo+bar`` vs ``type/bar`` (2^9) > ``type/*`` (2^8) > ``*/*``
  (0), each plus the number of candidate parameters matched; a candidate
  that declares parameters only matches when EVERY declared parameter is
  present with an equal value in the instance string (extra instance
  parameters are fine);
- ``register_media_type`` / ``delete_media_type`` are the public seam
  mirroring the reference's ``add_media_type`` (duplicate registration of
  the same parsed type is an error, as there).

The registry lookup runs at COMPILE time: ``contentMediaType`` is a
literal in the schema, so the Column tier resolves the handler once and
emits whole-column expressions — no per-row registry work.  Python
decoders attached to entries serve the pyeval tier
(``PyEvaluator(validate_content_schemas=True)``), matching the
reference's ``validate_content_schemas`` option (Modern.pm): content
keywords are annotation-only by default per the 2020-12 spec.
"""

from __future__ import annotations

import base64
import codecs
import json
import re
import threading
from dataclasses import dataclass, field
from typing import Any, Callable
from urllib.parse import parse_qs

_OWS = r"[\x09\x20]*"
_TOKEN = r"[a-zA-Z0-9!#$%&'*+.^_`|~-]+"
# RFC9110 §5.6.4 quoted-string (qdtext / quoted-pair)
_QUOTED = r'"((?:[\x09\x20\x21\x23-\x5B\x5D-\x7E\x80-\xFF]|\x5C[\x09\x20-\x7E\x80-\xFF])*)"'

_TYPE_RE = re.compile(rf"^({_TOKEN})/({_TOKEN})\Z")
_PARAM_RE = re.compile(rf"^({_TOKEN})=(?:({_TOKEN})|{_QUOTED})\Z")
_SPLIT_RE = re.compile(rf"{_OWS};{_OWS}")
# some parameter VALUES are case-insensitive; enumerate them (U.pm:517)
_CI_PARAM_VALUES = ("charset",)


def parse_media_type(s: str) -> dict | None:
    """``{"type", "subtype", "parameters"}`` or None if unparseable.

    Faithful to ``_parse_media_type`` (Utilities.pm:498-524): split on
    OWS-padded ';', match ``token/token``, parameters as
    ``token=(token|quoted-string)`` with quoted-pair unescaping;
    unparseable parameters are silently dropped (the reference's map
    yields nothing for them)."""
    if not s:
        return None
    head, *raw_params = _SPLIT_RE.split(s)
    m = _TYPE_RE.match(head or "")
    if not m:
        return None
    params: dict[str, str] = {}
    for p in raw_params:
        pm = _PARAM_RE.match(p)
        if not pm:
            continue
        name = pm.group(1).casefold()
        val = pm.group(2)
        if val is None:
            val = re.sub(r"\x5C(.)", r"\1", pm.group(3))
        params[name] = val
    for name in _CI_PARAM_VALUES:
        if name in params:
            params[name] = params[name].casefold()
    if len(params) > 64:
        raise ValueError("cannot parse more than 64 parameters")
    out: dict[str, Any] = {"type": m.group(1).casefold(),
                           "subtype": m.group(2).casefold()}
    if params:
        out["parameters"] = params
    return out


@dataclass
class MediaTypeEntry:
    """One registry row.

    ``handler`` names the Column-tier strategy the compiler dispatches on
    ("json" | "octet-stream" | "text" | "ndjson" | "form" | None).  A
    custom registration usually carries only ``decoder`` (python tier);
    the Column tier treats such entries as annotation-only, exactly like
    the reference treats a decoder-less registry row (U.pm:668: "return
    if not $definition->{decode}")."""
    name: str
    parsed: dict
    handler: str | None = None
    decoder: Callable[[Any, dict], Any] | None = None
    owner: Any = field(default=None, repr=False)


def _decode_json(content: Any, params: dict) -> Any:
    if isinstance(content, bytes):
        content = content.decode("utf-8")
    return json.loads(content)


def _decode_octet(content: Any, params: dict) -> Any:
    return content


def _decode_text(content: Any, params: dict) -> Any:
    # RFC2046 §4.1.2: charset is case-insensitive; strict decode, like
    # Encode::DIE_ON_ERR (U.pm:557-560)
    cs = params.get("charset")
    if cs is not None:
        codecs.lookup(cs)  # unknown charset → LookupError, matching croak
        if isinstance(content, bytes):
            return content.decode(cs, errors="strict")
        # round-trip a str to enforce the charset can represent it
        return content.encode(cs, errors="strict").decode(cs)
    return content


def _decode_ndjson(content: Any, params: dict) -> Any:
    if isinstance(content, bytes):
        content = content.decode("utf-8")
    out = []
    for lineno, line in enumerate(re.split(r"\r?\n", content), start=1):
        try:
            out.append(json.loads(line))
        except Exception as e:  # noqa: BLE001 - reported with line number
            raise ValueError(f"parse error at line {lineno}: {e}") from e
    return out


def _decode_form(content: Any, params: dict) -> Any:
    if isinstance(content, bytes):
        content = content.decode("utf-8")
    # Mojo::Parameters->to_hash: repeated keys become lists, single keys
    # scalars (U.pm:571-573)
    parsed = parse_qs(content, keep_blank_values=True, strict_parsing=False)
    return {k: v[0] if len(v) == 1 else v for k, v in parsed.items()}


_PREDEFINED: tuple[tuple[str, str, Callable], ...] = (
    ("application/json", "json", _decode_json),
    ("application/octet-stream", "octet-stream", _decode_octet),
    ("text/*", "text", _decode_text),
    ("application/x-www-form-urlencoded", "form", _decode_form),
    ("application/x-ndjson", "ndjson", _decode_ndjson),
)

_LOCK = threading.Lock()
_REGISTRY: dict[str, MediaTypeEntry] = {}


def _reset_registry() -> None:
    """(Re)populate the registry with the reference's predefined list
    (Utilities.pm:480-489).  Test seam."""
    with _LOCK:
        _REGISTRY.clear()
        for name, handler, dec in _PREDEFINED:
            _REGISTRY[name] = MediaTypeEntry(
                name=name, parsed=parse_media_type(name), handler=handler,
                decoder=dec)


_reset_registry()


def register_media_type(media_type: str,
                        decoder: Callable[[Any, dict], Any] | None = None,
                        handler: str | None = None,
                        owner: Any = None) -> None:
    """Public seam mirroring ``add_media_type`` (Utilities.pm:618-645).

    ``media_type`` may be a concrete type, a ``type/*`` range, or
    ``*/*``, optionally with parameters (a parameterized registration
    only matches instances carrying those parameters).  Duplicate
    registration of the same PARSED type raises, as in the reference."""
    parsed = parse_media_type(media_type)
    if parsed is None:
        # the reference's TOKEN never matches '*', so wildcards are parsed
        # here explicitly (the reference injects them pre-parsed)
        wm = re.match(rf"^({_TOKEN}|\*)/({_TOKEN}|\*)((?:{_OWS};{_OWS}.*)?)\Z",
                      media_type or "")
        if not wm:
            raise ValueError(f'bad media-type string "{media_type}"')
        rest = parse_media_type(f"x/x{wm.group(3)}") if wm.group(3) else None
        parsed = {"type": wm.group(1).casefold(),
                  "subtype": wm.group(2).casefold()}
        if rest and "parameters" in rest:
            parsed["parameters"] = rest["parameters"]
    with _LOCK:
        for e in _REGISTRY.values():
            if e.parsed == parsed:
                raise ValueError("duplicate media-type found")
        _REGISTRY[media_type] = MediaTypeEntry(
            name=media_type, parsed=parsed, handler=handler, decoder=decoder,
            owner=owner)


def delete_media_type(media_type: str) -> None:
    with _LOCK:
        _REGISTRY.pop(media_type, None)


def match_media_type(media_type: str,
                     candidates: list[str] | None = None) -> str | None:
    """Best registry (or ``candidates``) match for ``media_type``, or None.

    Ranking per ``match_media_type`` (Utilities.pm:695-742): exact
    registry-key string first; otherwise parse both sides and score —
    a candidate's declared parameters must ALL be present and equal in
    the instance (more matched parameters rank higher within a tier);
    tiers: exact type/subtype 2^10 > structured-suffix 2^9 > ``type/*``
    2^8 > ``*/*`` 0."""
    if not media_type:
        return None
    with _LOCK:
        if candidates is None:
            pool = {name: e.parsed for name, e in _REGISTRY.items()}
        else:
            pool = {c: (parse_media_type(c) or _parse_range(c)) for c in candidates}
    if media_type in pool:
        return media_type
    mt = parse_media_type(media_type)
    if mt is None:
        return None
    inst_params = mt.get("parameters", {})
    matches: list[tuple[int, str]] = []
    for name, cand in pool.items():
        if cand is None:
            continue
        matched_params = 0
        ok = True
        for pname, pval in (cand.get("parameters") or {}).items():
            if inst_params.get(pname) != pval:
                ok = False
                break
            matched_params += 1
        if not ok:
            continue
        if cand["type"] == "*" and cand["subtype"] == "*":
            matches.append((matched_params, name))
        elif cand["subtype"] == "*" and cand["type"] == mt["type"]:
            matches.append((2**8 + matched_params, name))
        elif cand["type"] == mt["type"]:
            if cand["subtype"] == mt["subtype"]:
                matches.append((2**10 + matched_params, name))
            else:
                # text/foo+plain matches text/plain but not text/bar+plain
                suffix = re.match(r"^.+\+(.+)\Z", mt["subtype"])
                if suffix and cand["subtype"] == suffix.group(1):
                    matches.append((2**9 + matched_params, name))
    if not matches:
        return None
    return max(matches, key=lambda rc: rc[0])[1]


def _parse_range(s: str) -> dict | None:
    """Parse a candidate that may contain ``*`` wildcards."""
    p = parse_media_type(s)
    if p is not None:
        return p
    m = re.match(rf"^({_TOKEN}|\*)/({_TOKEN}|\*)\Z", s or "")
    if not m:
        return None
    return {"type": m.group(1).casefold(), "subtype": m.group(2).casefold()}


def get_media_type(media_type: str) -> MediaTypeEntry | None:
    """Resolve a contentMediaType string through wildcard/parameter
    matching to its registry entry (``_get_media_type_decoder``,
    Utilities.pm:607-616)."""
    name = match_media_type(media_type)
    if name is None:
        return None
    with _LOCK:
        return _REGISTRY.get(name)


def decode_media_type(media_type: str, content: Any) -> Any:
    """Decode ``content`` via the matched entry's python decoder, passing
    the INSTANCE string's parameters (``decode_media_type``,
    Utilities.pm:661-673).  Raises KeyError if no decoder matches."""
    entry = get_media_type(media_type)
    if entry is None or entry.decoder is None:
        raise KeyError(f"no decoder for media type {media_type!r}")
    params = (parse_media_type(media_type) or {}).get("parameters", {})
    return entry.decoder(content, params)


def decode_content_encoding(encoding: str, content: str) -> Any:
    """contentEncoding decode shared by the pyeval tier: base64 /
    base64url (RFC4648 §4/§5, padding optional) / identity."""
    enc = (encoding or "").casefold()
    if enc == "base64":
        compact = re.sub(r"\s", "", content)
        if not re.match(r"^[A-Za-z0-9+/]*={0,2}\Z", compact) or len(compact) % 4:
            raise ValueError("could not decode base64 string")
        return base64.b64decode(compact, validate=True)
    if enc == "base64url":
        compact = re.sub(r"\s", "", content)
        if not re.match(r"^[A-Za-z0-9_\-]*={0,2}\Z", compact):
            raise ValueError("could not decode base64url string")
        unpadded = compact.rstrip("=")
        if len(unpadded) % 4 == 1:
            raise ValueError("could not decode base64url string")
        return base64.urlsafe_b64decode(unpadded + "=" * (-len(unpadded) % 4))
    if enc in ("identity", ""):
        return content
    return content  # unknown encodings: annotation-only (lenient)
