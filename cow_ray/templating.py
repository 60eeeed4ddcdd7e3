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

# user-registered Jinja filters (reference docs/index.rst footnote f3
# lists a custom-filter registry as future work; here it is a real
# extension surface).  Registered on the DRIVER before building the
# pipeline; the dict is captured in the pickled rule kernels, so
# filters must be importable/self-contained functions.  Registering a
# new filter invalidates the per-worker template cache.
_custom_filters: dict[str, Any] = {}


def register_filter(name: str, fn) -> None:
    """Make ``fn`` available as a Jinja filter (``{{col|name}}``) in
    every COMPLEX template rendered by this engine."""
    if not callable(fn):
        raise TypeError(f"filter {name!r} is not callable")
    _custom_filters[name] = fn
    _jinja_cache.clear()


def unregister_filter(name: str) -> None:
    _custom_filters.pop(name, None)
    _jinja_cache.clear()


def _jinja_template(pattern: str):
    t = _jinja_cache.get(pattern)
    if t is None:
        from jinja2 import Environment

        env = Environment()
        env.filters.update(_custom_filters)
        t = _jinja_cache[pattern] = env.from_string(pattern)
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

_LOWER_CASE_RE = re.compile(
    r"^\{\{\s*([A-Za-z_]\w*)\s*\|\s*(lower|upper)\s*(?:\(\s*\))?\s*\}\}$"
)
_ZEROPAD_RE = re.compile(
    r"^\{\{\s*'%0(\d+)d'\s*\|\s*format\(\s*([A-Za-z_]\w*)\s*\|\s*int\s*\)\s*\}\}$"
)
_IF_EQ_RE = re.compile(
    r"^\{%\s*if\s+([A-Za-z_]\w*)\s*==\s*'([^']*)'\s*%\}([^{}%]*)"
    r"\{%\s*else\s*%\}([^{}%]*)\{%\s*endif\s*%\}$"
)
_NON_ASCII_RE = r"[^\x00-\x7F]"
_PURE_DIGITS_RE = r"^[0-9]+$"

# concat chain: {{a ~ '-' ~ b}} — names / quoted literals joined by ~
_CONCAT_OPERAND = r"(?:[A-Za-z_]\w*|'[^'{}]*')"
_CONCAT_RE = re.compile(
    r"^\{\{\s*(" + _CONCAT_OPERAND + r"(?:\s*~\s*" + _CONCAT_OPERAND
    + r")+)\s*\}\}$"
)
_CONCAT_OPERAND_RE = re.compile(_CONCAT_OPERAND)
# string slice: {{name[n:m]}} (either bound optional, Python semantics)
_SLICE_RE = re.compile(
    r"^\{\{\s*([A-Za-z_]\w*)\s*\[\s*(-?\d+)?\s*:\s*(-?\d+)?\s*\]\s*\}\}$"
)
# arithmetic: {{name|float() * 1000}} / {{name|int + 1}} etc.
_ARITH_RE = re.compile(
    r"^\{\{\s*([A-Za-z_]\w*)\s*\|\s*(int|float)\s*(?:\(\s*\))?\s*"
    r"([*+/-])\s*(-?\d+(?:\.\d+)?)\s*\}\}$"
)
# fast-path numeric cell shapes (anything else → exact Jinja fallback:
# jinja's int/float filters have soft-fail semantics — default 0 —
# plus whitespace/exponent/underscore acceptance we don't reproduce)
_PLAIN_FLOAT_RE = r"^-?[0-9]{1,15}(\.[0-9]{1,15})?$"
_PLAIN_INT_RE = r"^-?[0-9]{1,15}$"


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
    m = _CONCAT_RE.match(pattern)
    if m:
        ops: list[tuple[str, str]] = []  # ("lit"|"col", value)
        for tok in _CONCAT_OPERAND_RE.findall(m.group(1)):
            if tok.startswith("'"):
                ops.append(("lit", tok[1:-1]))
            else:
                ops.append(("col", tok))
        cols_used = [v for k, v in ops if k == "col"]

        def concat_fn(cols, n, _ops=tuple(ops), _cu=tuple(cols_used)):
            if any(c not in cols for c in _cu):
                # jinja renders a missing name as '' — let the exact
                # path decide, don't guess
                return pa.nulls(n, pa.string()), pa.repeat(True, n)
            args: list = []
            need = None
            for kind, v in _ops:
                if kind == "lit":
                    args.append(v)
                else:
                    arr = cols[v]
                    args.append(arr)
                    # post-render .format() consumes braces in VALUES
                    b = pc.fill_null(
                        pc.match_substring_regex(arr, r"[{}]"), True
                    )
                    need = b if need is None else pc.or_(need, b)
            args.append("")  # separator
            out = pc.binary_join_element_wise(*args)
            return out, (need if need is not None else pa.repeat(False, n))

        return concat_fn
    m = _SLICE_RE.match(pattern)
    if m:
        col = m.group(1)
        start = int(m.group(2)) if m.group(2) is not None else 0
        stop = int(m.group(3)) if m.group(3) is not None else None

        def slice_fn(cols, n, _col=col, _s=start, _e=stop):
            arr = cols.get(_col)
            if arr is None:
                return pa.nulls(n, pa.string()), pa.repeat(True, n)
            # utf8_slice_codeunits slices by codepoint with Python
            # semantics (negative bounds, out-of-range clamps) — the
            # same unit Python str slicing uses
            out = pc.utf8_slice_codeunits(
                arr, start=_s,
                stop=(2**31 - 1) if _e is None else _e,
            )
            need = pc.fill_null(pc.match_substring_regex(arr, r"[{}]"), True)
            return out, need

        return slice_fn
    m = _ARITH_RE.match(pattern)
    if m:
        col, cast, op, lit_s = m.groups()
        as_float = cast == "float" or "." in lit_s or op == "/"
        if op == "/" and float(lit_s) == 0:
            # Python raises ZeroDivisionError (→ swallowed per-row
            # error); IEEE float division would emit inf — no fast path
            return None
        lit = float(lit_s) if as_float else int(lit_s)
        guard_re = _PLAIN_FLOAT_RE if cast == "float" else _PLAIN_INT_RE
        # _checked kernels: int64 overflow must not wrap silently —
        # Python ints are unbounded, so an overflowing batch falls back
        # to the exact Jinja path wholesale
        kernels = {"+": pc.add_checked, "-": pc.subtract_checked,
                   "*": pc.multiply_checked, "/": pc.divide_checked}

        def arith_fn(cols, n, _col=col, _op=kernels[op], _lit=lit,
                     _f=as_float, _g=guard_re):
            arr = cols.get(_col)
            if arr is None:
                return pa.nulls(n, pa.string()), pa.repeat(True, n)
            plain = pc.fill_null(pc.match_substring_regex(arr, _g), False)
            need = pc.invert(plain)
            # compute only over guard-clean rows; the rest re-render
            safe = pc.if_else(plain, arr, "0")
            try:
                num = pc.cast(safe, pa.float64() if _f else pa.int64())
                res = _op(num, _lit)
            except pa.ArrowInvalid:
                return pa.nulls(n, pa.string()), pa.repeat(True, n)
            if _f or pa.types.is_floating(res.type):
                out = _pyfloat_strings(res)
                # Python str() switches to exponent notation below 1e-4
                # and above 1e16; Arrow below ~1e-4 (different shortest
                # form) and already at 1e10 — route both disagreement
                # bands through exact Jinja instead of replicating the
                # format boundaries (measured: 2500.0→'2500' vs '2500.0'
                # agree after the .0 repair; 1e10→'1e+10' vs
                # '10000000000.0' cannot)
                absr = pc.abs(res)
                band = pc.or_(
                    pc.and_(pc.less(absr, 1e-3), pc.not_equal(res, 0.0)),
                    pc.greater_equal(absr, 1e10),
                )
                need = pc.or_(need, pc.fill_null(band, False))
            else:
                out = pc.cast(res, pa.string())
            return out, need

        return arith_fn
    return None


def _pyfloat_strings(arr: pa.Array) -> pa.Array:
    """float64 array → strings formatted exactly like Python
    ``str(float)`` (what Jinja emits): shortest round-trip repr, a
    trailing ``.0`` on integral values, two-digit exponents."""
    s = pc.cast(arr, pa.string())
    # Arrow emits single-digit exponents ("1e-7"); Python pads ("1e-07")
    s = pc.replace_substring_regex(s, pattern=r"e([+-])([0-9])$",
                                   replacement=r"e\10\2")
    # Arrow drops ".0" on integral floats ("2500"); Python keeps it
    integral = pc.invert(pc.match_substring_regex(s, r"[.en]"))
    return pc.if_else(integral, pc.binary_join_element_wise(s, ".0", ""), s)


_template_cache: dict[str, CompiledTemplate] = {}


def compile_template(pattern: str) -> CompiledTemplate:
    t = _template_cache.get(pattern)
    if t is None:
        t = _template_cache[pattern] = CompiledTemplate(pattern)
    return t


def render_pattern(pattern: str, row: dict) -> str:
    """Reference-faithful scalar entry point (``csvw.py:831-869``)."""
    return compile_template(pattern).render_row(row)
