"""IRI minting and validation.

Re-implements, from public specification knowledge (RFC 3986/3987), the
behavior the reference gets from ``iribaker.to_iri`` +
``rfc3987.parse(iri, rule='IRI')`` (used at
``/root/reference/src/converter/csvw.py:897-914`` ``expandURL``):
percent-encode, per URI component, exactly those characters that are
not legal in an IRI (keeping non-ASCII ``ucschar`` intact, since IRIs
allow them), then validate the overall IRI structure, raising on
failure.

Pure functions, no external deps — safe to call inside Ray workers.
"""

from __future__ import annotations

import re
from urllib.parse import urlsplit, urlunsplit

# RFC 3986 character classes, extended per RFC 3987 with non-ASCII
# (handled by the ord(c) > 127 test rather than enumeration).
_UNRESERVED = "ABCDEFGHIJKLMNOPQRSTUVWXYZabcdefghijklmnopqrstuvwxyz0123456789-._~"
_SUB_DELIMS = "!$&'()*+,;="
_PCHAR = _UNRESERVED + _SUB_DELIMS + ":@"
_PATH_SAFE = _PCHAR + "/"
_QUERY_SAFE = _PCHAR + "/?"
_FRAGMENT_SAFE = _PCHAR + "/?"
# userinfo@host:port — keep the structural chars legal
_AUTHORITY_SAFE = _UNRESERVED + _SUB_DELIMS + ":@[]"

_HEX = "0123456789abcdefABCDEF"


def _escape_component(s: str, safe: str) -> str:
    """Percent-encode chars of ``s`` not in ``safe`` (ASCII) and not
    allowed IRI ucschars (non-ASCII is kept verbatim).  Existing
    ``%XX`` escapes are preserved; a stray ``%`` is escaped."""
    if not s:
        return s
    out = []
    i = 0
    n = len(s)
    while i < n:
        c = s[i]
        if c == "%":
            if i + 2 < n and s[i + 1] in _HEX and s[i + 2] in _HEX:
                out.append(s[i : i + 3])
                i += 3
                continue
            out.append("%25")
            i += 1
            continue
        if c in safe or ord(c) > 127:
            out.append(c)
        else:
            for b in c.encode("utf-8"):
                out.append("%%%02X" % b)
        i += 1
    return "".join(out)


def to_iri(value: str) -> str:
    """Turn ``value`` into a syntactically valid IRI by escaping the
    illegal characters of each component.

    Mirrors the reference's ``iribaker.to_iri`` contract: the input must
    already look like an absolute IRI (have a scheme); only offending
    characters (spaces, braces, quotes, ...) are percent-encoded;
    non-ASCII characters are kept (IRI, not URI); already-escaped
    ``%XX`` sequences are left alone.  Raises ``ValueError`` when no
    scheme can be found.
    """
    if value is None:
        raise ValueError("cannot convert None to IRI")
    value = str(value)
    scheme, netloc, path, query, fragment = urlsplit(value)
    if not scheme:
        raise ValueError(f"Cannot convert `{value}` to valid IRI (no scheme)")
    netloc = _escape_component(netloc, _AUTHORITY_SAFE)
    path = _escape_component(path, _PATH_SAFE)
    query = _escape_component(query, _QUERY_SAFE)
    fragment = _escape_component(fragment, _FRAGMENT_SAFE)
    return urlunsplit((scheme, netloc, path, query, fragment))


# Validation: a practical RFC-3987 IRI shape check (scheme + opaque or
# hierarchical rest, no whitespace/control/illegal-ASCII chars).  The
# reference uses rfc3987.parse(rule='IRI'); inputs here have already
# been escaped by to_iri, so this is a structural guard, not a full
# grammar.
_IRI_ILLEGAL = re.compile(r'[\x00-\x20<>"{}|\\^`\x7f]')
_SCHEME_RE = re.compile(r"^[A-Za-z][A-Za-z0-9+.\-]*:")


def validate_iri(iri: str) -> str:
    """Raise ``ValueError`` if ``iri`` is not a structurally valid IRI;
    return it unchanged otherwise."""
    if not iri or not _SCHEME_RE.match(iri):
        raise ValueError(f"Cannot convert `{iri}` to valid IRI")
    if _IRI_ILLEGAL.search(iri):
        raise ValueError(f"Cannot convert `{iri}` to valid IRI")
    return iri


def expand_url(rendered: str) -> str:
    """``to_iri`` + validation, the reference's ``expandURL`` tail
    (``csvw.py:906-912``): any failure raises ``ValueError``."""
    iri = to_iri(rendered)
    return validate_iri(iri)


# Fast-path detector for the vectorized kernel: a rendered URL that is
# pure "nice" ASCII needs neither escaping nor a second validation
# (beyond the scheme check done at rule-compile time for the constant
# prefix).  Anything that trips this regex goes through expand_url row
# by row.
NEEDS_ESCAPE_RE = re.compile(r'[^A-Za-z0-9\-._~!$&\'()*+,;=:@/?#%]|%(?![0-9A-Fa-f]{2})')


def needs_escape(s: str) -> bool:
    return bool(NEEDS_ESCAPE_RE.search(s))
