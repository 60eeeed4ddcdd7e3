"""Template compilation and rendering.

Reproduces the reference's pattern semantics
(``/root/reference/src/converter/csvw.py:831-869`` ``render_pattern``
and ``docs/index.rst`` "Template Expansion"): a pattern is rendered
**first** as a Jinja2 template against the row dict, and the result is
**then** passed through Python ``str.format(**row)``.  Both steps see
every column plus the ``_row`` pseudo-column.  Any error from the
format step propagates (the reference's except branch retries the same
call, which re-raises — net effect: propagation).

For Ray-scale execution each pattern is classified once, at
rule-compile time, into:

* ``CONST``   — no braces: the rendered value is the pattern itself;
* ``SIMPLE``  — only bare ``{field}`` substitutions (no Jinja
  delimiters, no format specs): vectorized with
  ``pyarrow.compute.binary_join_element_wise`` over Arrow columns;
* ``COMPLEX`` — anything else (``{{ }}``, ``{% %}``, format specs,
  stray braces): evaluated row-wise with a Jinja template compiled
  **once per worker** (the reference compiles per ``BurstConverter``,
  ``csvw.py:841-844``).

Cell-normalization convention (this engine, and its oracle, both use
it): a null cell renders as the empty string; non-string cells render
as ``str(value)``.
"""

from __future__ import annotations

import re
from typing import Any

import pyarrow as pa
import pyarrow.compute as pc

CONST = "const"
SIMPLE = "simple"
COMPLEX = "complex"

_SIMPLE_FIELD_RE = re.compile(r"\{([A-Za-z_][A-Za-z0-9_]*)\}")
_JINJA_DELIMS = ("{{", "{%", "{#")

# one compiled-Template cache per worker process
_jinja_cache: dict[str, Any] = {}


def _jinja_template(pattern: str):
    t = _jinja_cache.get(pattern)
    if t is None:
        from jinja2 import Template

        t = _jinja_cache[pattern] = Template(pattern)
    return t


def normalize_value(v: Any) -> str:
    """Engine-wide cell→string convention shared by the vectorized
    kernel and the row-wise oracle: None → "", everything else →
    ``str(v)`` (matching CSV-world all-cells-are-strings semantics)."""
    if v is None:
        return ""
    if isinstance(v, str):
        return v
    if isinstance(v, bytes):
        return v.decode("utf-8", "replace")
    return str(v)


def normalize_column(arr: pa.ChunkedArray | pa.Array) -> pa.Array:
    """Vectorized ``normalize_value`` over an Arrow column.  Fast paths
    for string and integer types; falls back to a Python pass (which is
    definitionally consistent with ``normalize_value``) otherwise."""
    if isinstance(arr, pa.ChunkedArray):
        arr = arr.combine_chunks()
    t = arr.type
    if pa.types.is_string(t) or pa.types.is_large_string(t):
        return pc.fill_null(arr, "")
    if pa.types.is_integer(t):
        return pc.fill_null(pc.cast(arr, pa.string()), "")
    # floats / timestamps / binary / anything exotic: python round-trip
    return pa.array([normalize_value(v) for v in arr.to_pylist()], type=pa.string())


class CompiledTemplate:
    """A pattern classified and compiled once; renderable per row or per
    Arrow batch."""

    __slots__ = ("pattern", "kind", "parts", "fields", "lowering")

    def __init__(self, pattern: str):
        self.pattern = pattern
        self.kind, self.parts, self.fields = self._classify(pattern)
        self.lowering = (
            _compile_lowering(pattern) if self.kind == COMPLEX else None
        )

    @staticmethod
    def _classify(pattern: str):
        if "{" not in pattern and "}" not in pattern:
            return CONST, None, frozenset()
        if any(d in pattern for d in _JINJA_DELIMS) or "}}" in pattern:
            return COMPLEX, None, CompiledTemplate._complex_fields(pattern)
        # candidate SIMPLE: strip bare {field} groups; nothing brace-like
        # may remain
        stripped = _SIMPLE_FIELD_RE.sub("", pattern)
        if "{" in stripped or "}" in stripped:
            return COMPLEX, None, CompiledTemplate._complex_fields(pattern)
        parts: list[tuple[str, str | None]] = []  # (literal, field-or-None)
        pos = 0
        for m in _SIMPLE_FIELD_RE.finditer(pattern):
            parts.append((pattern[pos : m.start()], m.group(1)))
            pos = m.end()
        parts.append((pattern[pos:], None))
        fields = frozenset(f for _, f in parts if f)
        return SIMPLE, parts, fields

    @staticmethod
    def _complex_fields(pattern: str) -> frozenset[str]:
        """Best-effort referenced-column extraction for COMPLEX patterns
        (used only to decide which columns to normalize; over-approx is
        fine — the row dict passed to Jinja/format always holds every
        column)."""
        names = set(_SIMPLE_FIELD_RE.findall(pattern))
        names.update(re.findall(r"[A-Za-z_][A-Za-z0-9_]*", pattern))
        return frozenset(names)

    # ---- row-wise (oracle + COMPLEX batch fallback) ----

    def render_row(self, row: dict) -> str:
        """Jinja render, then str.format — the reference ordering."""
        if self.kind == CONST:
            return self.pattern
        if self.kind == SIMPLE:
            # row[f] raises KeyError for a missing column, mirroring
            # str.format(**row)
            return "".join(
                lit + (normalize_value(row[f]) if f is not None else "")
                for lit, f in self.parts
            )
        rendered = _jinja_template(self.pattern).render(**row)
        return rendered.format(**row)

    # ---- vectorized (Arrow batch) ----

    def render_batch(self, cols: dict[str, pa.Array], n: int) -> pa.Array:
        """Vectorized render for CONST/SIMPLE patterns.  ``cols`` maps
        column name → Arrow string array already passed through
        :func:`normalize_column` (``_row`` included, as its decimal
        string form).  COMPLEX patterns are the caller's job (the
        triple-emission kernel renders them row-wise over typed row
        dicts so Jinja sees ``_row`` as an int, exactly like the
        reference)."""
        if self.kind == CONST:
            return pa.array([self.pattern] * n, type=pa.string())
        if self.kind != SIMPLE:
            raise TypeError("render_batch only handles CONST/SIMPLE patterns")
        args: list[Any] = []
        for lit, f in self.parts:
            if lit:
                args.append(lit)
            if f is not None:
                args.append(cols[f])
        if len(args) == 1 and isinstance(args[0], str):
            return pa.array([args[0]] * n, type=pa.string())
        args.append("")  # separator
        return pc.binary_join_element_wise(*args)


# ---- COMPLEX-pattern lowering (SURVEY.md §2.7 cookbook) ----
#
# A handful of Jinja cookbook shapes cover most real rule documents.
# When a whole pattern matches one of these, the kernel evaluates it
# with Arrow kernels and only routes rows the lowering can't PROVE
# equivalent (guard mask) through the exact Jinja path — the same
# guarded-fast-path structure as IRI minting.  The oracle never uses
# lowering; equivalence is asserted by the kernel-vs-oracle tests.

_LOWER_CASE_RE = re.compile(r"^\{\{\s*([A-Za-z_]\w*)\s*\|\s*(lower|upper)\s*\}\}$")
_ZEROPAD_RE = re.compile(
    r"^\{\{\s*'%0(\d+)d'\s*\|\s*format\(\s*([A-Za-z_]\w*)\s*\|\s*int\s*\)\s*\}\}$"
)
_IF_EQ_RE = re.compile(
    r"^\{%\s*if\s+([A-Za-z_]\w*)\s*==\s*'([^']*)'\s*%\}([^{}%]*)"
    r"\{%\s*else\s*%\}([^{}%]*)\{%\s*endif\s*%\}$"
)
_NON_ASCII_RE = r"[^\x00-\x7F]"
_PURE_DIGITS_RE = r"^[0-9]+$"


def _compile_lowering(pattern: str):
    """Return ``fn(cols, n) -> (pa.Array, fallback_mask)`` or None.
    ``fallback_mask`` marks rows that must re-render via Jinja."""
    m = _LOWER_CASE_RE.match(pattern)
    if m:
        col, op = m.group(1), m.group(2)
        kernel = pc.utf8_lower if op == "lower" else pc.utf8_upper

        def case_fn(cols, n, _col=col, _kernel=kernel):
            arr = cols[_col]
            out = _kernel(arr)
            # exact path for: non-ASCII (utf8proc vs str casing) and any
            # value containing braces (the reference runs .format() on
            # the RENDERED value — csvw.py:857-866 — which substitutes
            # or raises on braces)
            need = pc.or_(
                pc.fill_null(pc.match_substring_regex(arr, _NON_ASCII_RE), True),
                pc.fill_null(pc.match_substring_regex(arr, r"[{}]"), True),
            )
            return out, need

        return case_fn
    m = _ZEROPAD_RE.match(pattern)
    if m:
        width, col = int(m.group(1)), m.group(2)

        def pad_fn(cols, n, _col=col, _w=width):
            arr = cols[_col]
            out = pc.utf8_lpad(arr, _w, "0")
            # '%0Nd' % int(x): equivalent to lpad ONLY for pure-digit
            # strings (no sign/space/empty; int() would strip/raise/0)
            # AND not leading-zero values longer than the width —
            # int("00123") strips to "0123" under %04d while lpad keeps
            # "00123"
            digits = pc.fill_null(
                pc.match_substring_regex(arr, _PURE_DIGITS_RE), False
            )
            long_lz = pc.fill_null(
                pc.match_substring_regex(arr, rf"^0[0-9]{{{_w},}}$"), False
            )
            need = pc.or_(pc.invert(digits), long_lz)
            return out, need

        return pad_fn
    m = _IF_EQ_RE.match(pattern)
    if m:
        col, lit, then_v, else_v = m.groups()

        def if_fn(cols, n, _col=col, _lit=lit, _t=then_v, _e=else_v):
            arr = cols[_col]
            out = pc.if_else(pc.equal(arr, _lit), _t, _e)
            return out, pa.repeat(False, n)

        return if_fn
    return None


_template_cache: dict[str, CompiledTemplate] = {}


def compile_template(pattern: str) -> CompiledTemplate:
    t = _template_cache.get(pattern)
    if t is None:
        t = _template_cache[pattern] = CompiledTemplate(pattern)
    return t


def render_pattern(pattern: str, row: dict) -> str:
    """Reference-faithful scalar entry point (``csvw.py:831-869``)."""
    return compile_template(pattern).render_row(row)
