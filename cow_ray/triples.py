"""Vectorized triple emission: the Arrow-batch kernel behind
``Dataset.map_batches``.

This is the Ray-Data-native replacement for the reference's
``BurstConverter.process`` row loop (``/root/reference/src/converter/
csvw.py:488-557``): one call consumes a ``pyarrow.Table`` batch of
input rows (with the ``_row`` pseudo-column already assigned by the
source, see ``cow_ray.sources``) and returns a triple-table batch
``(subj, pred, obj_lex, obj_kind, obj_datatype, obj_lang)`` with
``~n_rules × n_rows`` rows.

Per rule, everything row-independent was resolved at compile time
(``cow_ray.rules``); the kernel's job per batch is:

1. normalize each referenced input column once (null→"", cast→string);
2. evaluate CONST/SIMPLE templates with ``pyarrow.compute`` kernels
   (zero Python per row); COMPLEX (Jinja) templates row-wise over a
   shared, lazily-built list of row dicts;
3. mint IRIs with a vectorized fast path: rows whose rendered URL
   contains only unreserved/legal ASCII skip escaping entirely (regex
   flag via ``pc.match_substring_regex``); flagged rows go through the
   exact ``expand_url`` used by the oracle;
4. apply the reference's null semantics as boolean masks
   (``pc.equal`` / ``pc.is_in``), then emit per-rule filtered columns.

Row-level failures replicate the reference's error isolation: the
offending triple is dropped and counted, the batch continues
(``csvw.py:551-552``).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from .iri import expand_url
from .namespaces import PROV, RDF, SKOS
from .oracle import KIND_IRI, KIND_LITERAL
from .rules import ColumnRule, RuleDoc
from .templating import COMPLEX, CONST, SIMPLE, compile_template, normalize_column

TRIPLE_SCHEMA = pa.schema(
    [
        ("subj", pa.string()),
        ("pred", pa.string()),
        ("obj_lex", pa.string()),
        ("obj_kind", pa.string()),
        ("obj_datatype", pa.string()),
        ("obj_lang", pa.string()),
    ]
)

# RE2-compatible (no lookahead): flag any char outside the always-legal
# ASCII set, plus any '%' (the python path preserves valid %XX escapes)
# and any '?'/'#' (urlsplit→urlunsplit drops *empty* query/fragment
# parts, so those strings must take the exact python path too).
_NEEDS_WORK_RE = r"[^A-Za-z0-9\-._~!$&'()*+,;=:@/]"
_HAS_SCHEME_RE = r"^[A-Za-z][A-Za-z0-9+.\-]*:"


def _bools(parr) -> np.ndarray:
    """Arrow boolean array (possibly with nulls) → numpy bool mask."""
    return np.asarray(
        pc.fill_null(parr, False).to_numpy(zero_copy_only=False), dtype=bool
    )


def empty_triple_table() -> pa.Table:
    return TRIPLE_SCHEMA.empty_table()


# sideband marker rows (obj_kind=MARKER_KIND) carry per-row error /
# null-skip counts through the store's subject-hash scatter so
# finish_part can attribute them per partition; they are stripped
# before triples.parquet is written.  A row whose subject failed to
# mint is attributed to subj "" (the catch-all partition hash("")%N).
MARKER_KIND = "__marker__"
MARKER_ERRORS = "urn:x-cow-ray:errors"
MARKER_NULL_SKIPS = "urn:x-cow-ray:null-skips"


def marker_table(ctx: _BatchCtx, subj_arr: pa.Array, subj_ok: np.ndarray,
                 origin: str | None) -> pa.Table | None:
    """Build the marker rows for one batch (None when clean).  One row
    per (input row, counter kind): subj = attributed subject, obj_lex =
    global row id, obj_lang = rule-doc origin tag (together unique
    under the distinct), obj_datatype = count."""
    if not (ctx.err_rows.any() or ctx.skip_rows.any()):
        return None
    subj = np.where(
        subj_ok, np.asarray(subj_arr.to_numpy(zero_copy_only=False)), ""
    )
    if "_row" in ctx.cols:
        row_ids = ctx.cols["_row"].to_numpy(zero_copy_only=False)
    else:  # degenerate: batch-local ids (convert pipelines always
        # carry _row; only bare map_batches tests land here)
        row_ids = np.arange(ctx.n).astype(str)
    tables = []
    for pred, counts in ((MARKER_ERRORS, ctx.err_rows),
                         (MARKER_NULL_SKIPS, ctx.skip_rows)):
        idx = np.nonzero(counts)[0]
        if not idx.size:
            continue
        tables.append(pa.table({
            "subj": pa.array(subj[idx], type=pa.string()),
            "pred": pa.array([pred] * len(idx), type=pa.string()),
            "obj_lex": pa.array(row_ids[idx].astype(str), type=pa.string()),
            "obj_kind": pa.array([MARKER_KIND] * len(idx), type=pa.string()),
            "obj_datatype": pa.array(counts[idx].astype(str),
                                     type=pa.string()),
            "obj_lang": pa.array([origin or ""] * len(idx),
                                 type=pa.string()),
        }))
    return pa.concat_tables(tables) if tables else None


class _BatchCtx:
    """Shared per-batch evaluation context: normalized columns, lazily
    built row dicts, per-row error/skip counters (row-attributed so the
    store can carry per-partition error breakdowns)."""

    __slots__ = ("table", "n", "cols", "_py_rows", "err_rows", "skip_rows")

    def __init__(self, table: pa.Table, fields: set[str]):
        self.table = table
        self.n = table.num_rows
        self.cols: dict[str, pa.Array] = {}
        names = set(table.column_names)
        for f in fields | {"_row"}:
            if f in names:
                self.cols[f] = normalize_column(table[f])
        self._py_rows: list[dict] | None = None
        self.err_rows = np.zeros(self.n, dtype=np.int64)
        self.skip_rows = np.zeros(self.n, dtype=np.int64)

    @property
    def errors(self) -> int:
        return int(self.err_rows.sum())

    def py_rows(self) -> list[dict]:
        """Typed row dicts for COMPLEX (Jinja) evaluation: normalized
        string cells + integer ``_row`` (the reference passes the int,
        ``csvw.py:507``).  Built once per batch, shared by all rules."""
        if self._py_rows is None:
            data = {k: v.to_pylist() for k, v in self.cols.items() if k != "_row"}
            keys = list(data)
            if "_row" in self.table.column_names:
                row_ids = self.table["_row"].to_pylist()
                self._py_rows = [
                    {**{k: data[k][i] for k in keys}, "_row": row_ids[i]}
                    for i in range(self.n)
                ]
            else:
                self._py_rows = [
                    {k: data[k][i] for k in keys} for i in range(self.n)
                ]
        return self._py_rows


def _render(tmpl, ctx: _BatchCtx, sel: np.ndarray) -> tuple[pa.Array, np.ndarray]:
    """Evaluate a template over the batch → (string array, ok mask ⊆
    sel).  Only rows in ``sel`` are attempted/counted — the oracle
    short-circuits per column, so rows masked out by earlier gates must
    not contribute errors (reference at most one swallowed error per
    (row, column), ``csvw.py:544-552``)."""
    if tmpl.kind in (CONST, SIMPLE):
        try:
            arr = tmpl.render_batch(ctx.cols, ctx.n)
        except KeyError:
            # referenced column absent from the batch → every selected
            # row fails (reference: str.format KeyError swallowed)
            ctx.err_rows += sel
            return pa.nulls(ctx.n, pa.string()), np.zeros(ctx.n, dtype=bool)
        return arr, sel.copy()
    lowering = getattr(tmpl, "lowering", None)
    if lowering is not None:
        # cookbook fast path (templating._compile_lowering): Arrow
        # kernels for all rows, exact-Jinja re-render only where the
        # guard mask says equivalence isn't proven
        try:
            arr, need = lowering(ctx.cols, ctx.n)
        except KeyError:
            ctx.err_rows += sel
            return pa.nulls(ctx.n, pa.string()), np.zeros(ctx.n, dtype=bool)
        need = _bools(need) & sel
        ok = sel.copy()
        if need.any():
            vals = arr.to_pylist()
            rows = ctx.py_rows()
            render_row = tmpl.render_row
            for i in np.nonzero(need)[0]:
                try:
                    vals[i] = render_row(rows[i])
                except Exception:
                    ok[i] = False
                    ctx.err_rows[i] += 1
            arr = pa.array(vals, type=pa.string())
        return arr, ok
    rows = ctx.py_rows()
    out: list[str | None] = [None] * ctx.n
    ok = np.zeros(ctx.n, dtype=bool)
    render_row = tmpl.render_row
    for i in np.nonzero(sel)[0]:
        try:
            out[i] = render_row(rows[i])
            ok[i] = True
        except Exception:
            ctx.err_rows[i] += 1
    return pa.array(out, type=pa.string()), ok


def _mint(arr: pa.Array, ok: np.ndarray, ctx: _BatchCtx) -> tuple[pa.Array, np.ndarray]:
    """Vectorized ``expandURL``: escape+validate rendered URLs.
    Returns (iri array, valid ⊆ ok); rows in ``ok`` that fail to mint
    are counted as errors."""
    needs = _bools(pc.match_substring_regex(arr, _NEEDS_WORK_RE)) & ok
    valid = ok & _bools(pc.match_substring_regex(arr, _HAS_SCHEME_RE))
    if needs.any():
        vals = arr.to_pylist()
        for i in np.nonzero(needs)[0]:
            try:
                vals[i] = expand_url(vals[i])
                valid[i] = True
            except Exception:
                valid[i] = False
        arr = pa.array(vals, type=pa.string())
    ctx.err_rows += ok & ~valid
    return arr, valid


def _null_mask(values: pa.Array, rule: ColumnRule, schema_null: str | None) -> np.ndarray:
    """Vectorized ``isValueNull`` (oracle ``is_value_null``; reference
    ``csvw.py:916-930`` incl. its quirks) → True where the cell is
    null-skipped."""
    empty = _bools(pc.equal(values, ""))
    if rule.null_scalar is not None:
        matches = _bools(
            pc.is_in(
                values,
                value_set=pa.array(
                    [rule.null_scalar, *set(rule.null_scalar)]
                    + ([schema_null] if schema_null is not None else [])
                ),
            )
        )
    elif rule.null_list is not None:
        matches = _bools(
            pc.is_in(
                values,
                value_set=pa.array(
                    rule.null_list
                    + ([schema_null] if schema_null is not None else [])
                ),
            )
        )
    else:
        # no column-level null spec → schema null NOT consulted (quirk)
        matches = None
    if rule.parse_on_empty:
        # reference short-circuits isValueNull to False on an empty
        # cell when parseOnEmpty is set — even '' in the null spec
        # must not drop the triple
        if matches is None:
            return np.zeros(len(values), dtype=bool)
        return matches & ~empty
    return empty if matches is None else empty | matches


def _condition_mask(rule: ColumnRule, ctx: _BatchCtx) -> np.ndarray:
    """Cross-column ``@list`` nulls (reference ``equal_to_null``,
    ``csvw.py:476-487``) → True where the column is skipped."""
    m = np.zeros(ctx.n, dtype=bool)
    for col, val in rule.null_conditions:
        arr = ctx.cols.get(col)
        if arr is None:
            continue
        m |= _bools(pc.equal(arr, val))
    return m


def _basename(arr: pa.Array) -> pa.Array:
    """Vectorized ``os.path.basename`` over IRI strings (everything
    after the last '/'), matching ``csvw.py:580``."""
    return pc.replace_substring_regex(arr, pattern="^.*/", replacement="")


class EmitTriples:
    """Callable-class UDF for ``Dataset.map_batches(...,
    batch_format="pyarrow")``.  Construction (rule binding, template
    compilation) happens once per worker — the Ray analogue of the
    per-chunk ``BurstConverter`` setup, amortized across all batches.
    """

    def __init__(self, doc: RuleDoc, metrics=None, error_markers: bool = False):
        self.doc = doc
        self.metrics = metrics  # optional MetricsCollector actor handle
        # error_markers: additionally emit one __marker__ row per input
        # row that had errors / null-skips, subject-attributed, so the
        # materialized store can report per-partition breakdowns
        # (markers ride the same subject-hash scatter and are counted +
        # stripped in finish_part — they never reach triples.parquet)
        self.error_markers = error_markers
        self.fields = doc.referenced_fields()
        # precompile linkURI brace fragments (reference
        # `_extract_between_braces`, csvw.py:624-625)
        self._link_frag = {}
        for i, rule in enumerate(doc.columns):
            if rule.is_link_uri and rule.about is not None and rule.value_url is not None:
                self._link_frag[i] = (
                    compile_template(_between(rule.about.pattern)),
                    compile_template(_between(rule.value_url.pattern)),
                )
        self.errors = 0
        self.null_skips = 0
        # capture driver-registered custom Jinja filters so they travel
        # with the pickled UDF into every worker (module globals do not)
        from .templating import _custom_filters

        self._filters = dict(_custom_filters)

    def __call__(self, batch: pa.Table) -> pa.Table:
        if self._filters:
            from . import templating as _tpl

            if any(_tpl._custom_filters.get(k) is not v
                   for k, v in self._filters.items()):
                _tpl._custom_filters.update(self._filters)
                _tpl._jinja_cache.clear()
        ctx = _BatchCtx(batch, self.fields)
        if ctx.n == 0:
            return empty_triple_table()

        # default subject (reference csvw.py:511): minting failures drop
        # the row for every rule (the reference would kill the chunk;
        # we degrade to row-drop + count, see SURVEY.md §7d)
        all_rows = np.ones(ctx.n, dtype=bool)
        subj_arr, subj_ok = _render(self.doc.about, ctx, all_rows)
        subj_arr, subj_ok = _mint(subj_arr, subj_ok, ctx)

        pieces: list[pa.Table] = []
        for i, rule in enumerate(self.doc.columns):
            t = self._emit_rule(i, rule, ctx, subj_arr, subj_ok)
            if t is not None and t.num_rows:
                pieces.append(t)

        self.errors += ctx.errors
        batch_skips = int(ctx.skip_rows.sum())
        self.null_skips += batch_skips
        out = pa.concat_tables(pieces) if pieces else empty_triple_table()
        if self.metrics is not None:
            # fire-and-forget: one tiny RPC per batch, no data-path wait
            self.metrics.add.remote(
                rows_in=ctx.n, triples_out=out.num_rows,
                errors=ctx.errors, null_skips=batch_skips,
            )
            self.null_skips = 0  # flushed
        if self.error_markers:
            m = marker_table(ctx, subj_arr, subj_ok, self.doc.doc_hash[:8])
            if m is not None:
                out = pa.concat_tables([out, m])
        return out

    # ---- per-rule emission ----

    def _emit_rule(
        self,
        rule_idx: int,
        rule: ColumnRule,
        ctx: _BatchCtx,
        subj_arr: pa.Array,
        subj_ok: np.ndarray,
    ) -> pa.Table | None:
        doc = self.doc
        emit = subj_ok.copy() if rule.about is None else np.ones(ctx.n, dtype=bool)

        # --- null gates (csvw.py:517-533) ---
        values = ctx.cols.get(rule.name) if rule.name is not None else None
        if values is not None:
            nm = _null_mask(values, rule, doc.schema_null)
            if rule.null_conditions:
                nm |= _condition_mask(rule, ctx)
            ctx.skip_rows += nm
            emit &= ~nm
        elif rule.null_conditions:
            cm = _condition_mask(rule, ctx)
            ctx.skip_rows += cm
            emit &= ~cm
        if not emit.any():
            return None

        # --- subject (about override, csvw.py:569-572) ---
        if rule.about is not None:
            s_arr, s_ok = _render(rule.about, ctx, emit)
            s_arr, s_ok = _mint(s_arr, s_ok, ctx)
            emit &= s_ok
        else:
            s_arr = subj_arr

        # --- predicate (csvw.py:574, get_property_url) ---
        if rule.property_const is not None:
            p_arr = None  # constant; filled at table build
        else:
            p_arr, p_ok = _render(rule.property_tmpl, ctx, emit)
            p_arr, p_ok = _mint(p_arr, p_ok, ctx)
            emit &= p_ok

        extra: list[pa.Table] = []

        if rule.value_url is not None:
            o_arr, o_ok = _render(rule.value_url, ctx, emit)
            o_arr, o_ok = _mint(o_arr, o_ok, ctx)
            emit &= o_ok
            # null-basename drop (csvw.py:577-581): drops main triple
            # AND the SKOS expansion, no error counted
            bn_null = _null_mask(_basename(o_arr), rule, doc.schema_null)
            emit &= ~bn_null

            if rule.virtual and rule.datatype is not None:
                if rule.is_any_uri:
                    # object = IRI-baked raw cell (csvw.py:583-586); no
                    # validation in the reference either
                    if values is None:
                        ctx.err_rows += emit
                        return None
                    o_arr, any_ok = _mint_no_validate(values, emit, ctx)
                    emit &= any_ok
                elif rule.is_link_uri and rule_idx not in self._link_frag:
                    # missing aboutUrl/valueUrl: the reference's
                    # _extract_between_braces on None raises per row →
                    # swallowed, no triple, no SKOS (csvw.py:588-592)
                    ctx.err_rows += emit
                    return None
                elif rule.is_link_uri:
                    s_t, o_t = self._link_frag[rule_idx]
                    s_arr, s_ok = _render(s_t, ctx, emit)
                    s_arr, s_ok = _mint(s_arr, s_ok, ctx)
                    emit &= s_ok
                    o_arr, o_ok2 = _render(o_t, ctx, emit)
                    o_arr, o_ok2 = _mint(o_arr, o_ok2, ctx)
                    emit &= o_ok2

            if not emit.any():
                return None

            if rule.collection_url is not None:
                c_arr, c_ok = _render(rule.collection_url, ctx, emit)
                c_arr, c_ok = _mint(c_arr, c_ok, ctx)
                emit &= c_ok  # expand failure kills the column for the row
                cmask = pa.array(emit)
                coll = pc.filter(c_arr, cmask)
                objs = pc.filter(o_arr, cmask)
                extra.append(_iri_table(coll, RDF + "type", SKOS + "Collection"))
                extra.append(_iri_table(objs, RDF + "type", SKOS + "Concept"))
                extra.append(_iri_pair_table(coll, SKOS + "member", objs))
            if rule.scheme_url is not None:
                sc_arr, sc_ok = _render(rule.scheme_url, ctx, emit)
                sc_arr, sc_ok = _mint(sc_arr, sc_ok, ctx)
                emit &= sc_ok  # scheme failure keeps earlier collection
                # triples but drops scheme+main (oracle ordering)
                smask = pa.array(emit)
                scheme = pc.filter(sc_arr, smask)
                objs = pc.filter(o_arr, smask)
                extra.append(_iri_table(scheme, RDF + "type", SKOS + "Scheme"))
                extra.append(_iri_table(objs, RDF + "type", SKOS + "Concept"))
                extra.append(_iri_pair_table(objs, SKOS + "inScheme", scheme))

            mask = pa.array(emit)
            main = _build(
                pc.filter(s_arr, mask),
                self._pred(rule, p_arr, mask),
                pc.filter(o_arr, mask),
                KIND_IRI,
                None,
                None,
            )
            out = extra + [main]
        else:
            # --- literal path (csvw.py:600-622) ---
            if rule.value_tmpl is not None:
                v_arr, v_ok = _render(rule.value_tmpl, ctx, emit)
                emit &= v_ok
            elif values is not None:
                v_arr = values
            else:
                ctx.err_rows += emit
                return None
            if not emit.any():
                return None

            if rule.is_any_uri:
                v_arr, any_ok = _mint_no_validate(v_arr, emit, ctx)
                emit &= any_ok
                mask = pa.array(emit)
                out = [
                    _build(
                        pc.filter(s_arr, mask),
                        self._pred(rule, p_arr, mask),
                        pc.filter(v_arr, mask),
                        KIND_IRI,
                        None,
                        None,
                    )
                ]
            elif rule.is_lang_string:
                l_arr, l_ok = _render(rule.lang, ctx, emit)
                emit &= l_ok
                mask = pa.array(emit)
                out = [
                    _build(
                        pc.filter(s_arr, mask),
                        self._pred(rule, p_arr, mask),
                        pc.filter(v_arr, mask),
                        KIND_LITERAL,
                        None,
                        pc.filter(l_arr, mask),
                    )
                ]
            else:
                dt = rule.datatype
                from .namespaces import XSD_STRING

                if dt == XSD_STRING:
                    dt = None  # RDF 1.1 plain (see oracle docstring)
                mask = pa.array(emit)
                out = [
                    _build(
                        pc.filter(s_arr, mask),
                        self._pred(rule, p_arr, mask),
                        pc.filter(v_arr, mask),
                        KIND_LITERAL,
                        dt,
                        None,
                    )
                ]

        if doc.emit_column_prov and rule.column_id:
            preds = self._pred(rule, p_arr, mask)
            out.append(_iri_pair_table(preds, PROV + "wasDerivedFrom",
                                       _const_arr(rule.column_id, len(preds))))

        out = [t for t in out if t.num_rows]
        if not out:
            return None
        return pa.concat_tables(out)

    @staticmethod
    def _pred(rule: ColumnRule, p_arr: pa.Array | None, mask: pa.Array) -> pa.Array:
        if p_arr is None:
            n = pc.sum(mask).as_py() or 0
            return _const_arr(rule.property_const, n)
        return pc.filter(p_arr, mask)


def _between(pattern: str) -> str:
    return pattern[pattern.find("{") : pattern.find("}") + 1]


def _mint_no_validate(
    arr: pa.Array, sel: np.ndarray, ctx: _BatchCtx
) -> tuple[pa.Array, np.ndarray]:
    """``URIRef(iribaker.to_iri(value))`` without rfc3987 validation
    (the anyURI path, csvw.py:583-586/616-617).  to_iri still requires
    a scheme → failures among ``sel`` are dropped+counted."""
    from .iri import to_iri

    needs = _bools(pc.match_substring_regex(arr, _NEEDS_WORK_RE)) & sel
    ok = sel & _bools(pc.match_substring_regex(arr, _HAS_SCHEME_RE))
    if needs.any():
        vals = arr.to_pylist()
        for i in np.nonzero(needs & ok)[0]:
            try:
                vals[i] = to_iri(vals[i])
            except Exception:
                ok[i] = False
        arr = pa.array(vals, type=pa.string())
    ctx.err_rows += sel & ~ok
    return arr, ok


def _const_arr(value: str, n: int) -> pa.Array:
    if n == 0:
        return pa.array([], type=pa.string())
    return pa.repeat(pa.scalar(value, type=pa.string()), n)


def _build(s, p, o, kind: str, datatype: str | None, lang) -> pa.Table:
    n = len(s)
    return pa.Table.from_arrays(
        [
            s,
            p,
            o,
            _const_arr(kind, n),
            pa.nulls(n, pa.string()) if datatype is None else _const_arr(datatype, n),
            pa.nulls(n, pa.string()) if lang is None else lang,
        ],
        schema=TRIPLE_SCHEMA,
    )


def _iri_table(subjects: pa.Array, pred: str, obj: str) -> pa.Table:
    n = len(subjects)
    return _build(subjects, _const_arr(pred, n), _const_arr(obj, n), KIND_IRI, None, None)


def _iri_pair_table(subjects: pa.Array, pred: str, objects: pa.Array) -> pa.Table:
    n = len(subjects)
    return _build(subjects, _const_arr(pred, n), objects, KIND_IRI, None, None)
