"""Basic-graph-pattern matching over a triple Dataset — the query
side of the KG-construction engine (SPARQL BGP semantics, Prud'hommeaux
& Seaborne, W3C SPARQL 1.0/1.1: conjunctive triple patterns, bag
semantics, inner-join on shared variables).

A pattern is ``(s, p, o)`` where each term is a constant string or a
variable ``"?name"``.  ``bgp_match`` folds left over the patterns:

* each pattern becomes ONE filtered scan of the triple Dataset
  (constants → vectorized equality masks; variables → projected and
  renamed binding columns; a repeated variable inside one pattern →
  an equality mask);
* consecutive binding sets meet in a distributed hash join:
  partition both sides on the FIRST shared variable (rows with equal
  values co-locate), then a per-partition ``pyarrow.Table.join`` on
  the full shared-variable set.  The exchange carries bindings, never
  the triple store.

Bag semantics mean results match a plain SQL self-join chain row for
row — which is exactly how the DuckDB oracle is written
(``pipelines.queries.SQL_KG_BGP``).  Join (re)ordering is the
caller's responsibility, as in any BGP engine without a cost model:
put selective patterns first.  Patterns with no shared variable with
the accumulated bindings would be a cartesian product — refused
loudly.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

_POS_COLS = ("subj", "pred", "obj_lex")


def _is_var(term: str) -> bool:
    return isinstance(term, str) and term.startswith("?")


def _pattern_out_vars(pattern, cols=_POS_COLS) -> list:
    """Binding column names a pattern produces, in position order
    (first occurrence wins) — derived statically so the planner never
    executes a Dataset just to probe its schema (each
    ``Dataset.schema()`` on a lazy pipeline runs a limit-1 plan:
    ~1 s of fixed cost per probe on this box)."""
    out, seen = [], set()
    for c, t in zip(cols, pattern):
        if _is_var(t) and t[1:] not in seen:
            out.append(t[1:])
            seen.add(t[1:])
    return out


def _match_pattern(triples, pattern, cols=_POS_COLS):
    """One pattern → Dataset of binding columns (bag semantics)."""
    consts = [(c, t) for c, t in zip(cols, pattern) if not _is_var(t)]
    vars_ = [(c, t[1:]) for c, t in zip(cols, pattern) if _is_var(t)]
    if not vars_:
        raise ValueError(f"pattern {pattern} binds no variables")
    # repeated variable inside the pattern → intra-row equality
    names = [v for _, v in vars_]
    dup_pairs = [(vars_[i][0], vars_[j][0])
                 for i in range(len(vars_)) for j in range(i + 1,
                                                           len(vars_))
                 if vars_[i][1] == vars_[j][1]]
    out_vars: list[tuple[str, str]] = []
    seen = set()
    for c, v in vars_:
        if v not in seen:
            out_vars.append((c, v))
            seen.add(v)

    def scan(batch: pa.Table) -> pa.Table:
        mask = None
        for c, t in consts:
            m = pc.equal(batch[c], t)
            mask = m if mask is None else pc.and_(mask, m)
        for ca, cb in dup_pairs:
            m = pc.equal(batch[ca], batch[cb])
            mask = m if mask is None else pc.and_(mask, m)
        sel = batch.filter(pc.fill_null(mask, False)) \
            if mask is not None else batch
        return pa.table({v: sel[c] for c, v in out_vars})

    return triples.map_batches(scan, batch_format="pyarrow")


def _hash_join(left, right, shared, num_partitions: int,
               l_cols: list, r_cols: list,
               join_type: str = "inner"):
    """Distributed join on ``shared`` binding variables: partition
    both sides on the first shared var, join per partition.  Column
    lists are passed statically (no schema probes).  ``join_type``
    "left outer" is globally correct per-partition because every left
    row lands in exactly one key partition alongside ALL of its
    potential matches."""
    from ..stages.canonicalize import hash_mod

    key = shared[0]

    def tag(side):
        def f(batch: pa.Table) -> pa.Table:
            return batch.append_column(
                "__side", pa.array(
                    np.full(batch.num_rows, side, dtype=np.int8))
            ).append_column(
                "__part", hash_mod(batch[key], num_partitions))

        return f

    def pad(batch: pa.Table, cols) -> pa.Table:
        # union needs one schema: absent columns ride as nulls
        out = {}
        for c in cols:
            out[c] = (batch[c] if c in batch.schema.names else
                      pa.nulls(batch.num_rows, type=pa.string()))
        out["__side"] = batch["__side"]
        out["__part"] = batch["__part"]
        return pa.table(out)

    all_cols = l_cols + [c for c in r_cols if c not in l_cols]
    u = (left.map_batches(tag(0), batch_format="pyarrow")
         .map_batches(lambda b: pad(b, all_cols),
                      batch_format="pyarrow")
         .union(right.map_batches(tag(1), batch_format="pyarrow")
                .map_batches(lambda b: pad(b, all_cols),
                             batch_format="pyarrow")))

    def merge(g: pa.Table) -> pa.Table:
        schema = pa.schema([(c, pa.string()) for c in all_cols])
        if g.num_rows == 0:
            return schema.empty_table()
        side = g["__side"].to_numpy(zero_copy_only=False)
        lt = g.filter(pa.array(side == 0)).select(l_cols)
        rt = g.filter(pa.array(side == 1)).select(r_cols)
        if lt.num_rows == 0:
            return schema.empty_table()
        if rt.num_rows == 0:
            if join_type == "inner":
                return schema.empty_table()
            # left outer with an empty match side: keep lt, null-pad
            out = {c: lt[c] for c in l_cols}
            for c in all_cols:
                if c not in l_cols:
                    out[c] = pa.nulls(lt.num_rows, type=pa.string())
            return pa.table(out).select(all_cols)
        j = lt.join(rt, keys=list(shared), join_type=join_type,
                    use_threads=False)
        return j.select(all_cols)

    return u.groupby("__part").map_groups(merge, batch_format="pyarrow")


BGP_BROADCAST_MAX = 1_000_000  # binding rows worth shipping whole
# a row cap alone ignores width (bindings are long-IRI string columns):
# byte bound on the driver-concatenated broadcast table as well
BGP_BROADCAST_MAX_BYTES = 256 * 1024 * 1024


def _broadcast_join(acc_tbl, right, shared):
    """Small-side broadcast join: the accumulated bindings ride
    ``ray.put`` once and every scan task joins its batch locally —
    ONE pass over the pattern's matches, no exchange at all.  This is
    the standard small-side strategy (selective first patterns make
    it the common case); the hash join remains the unbounded path."""
    import ray

    handle = ray.put(acc_tbl)
    l_cols = acc_tbl.schema.names
    keys = list(shared)

    def scan_join(batch: pa.Table) -> pa.Table:
        left = ray.get(handle)
        out_cols = l_cols + [c for c in batch.schema.names
                             if c not in l_cols]
        if batch.num_rows == 0 or left.num_rows == 0:
            return pa.schema([(c, pa.string())
                              for c in out_cols]).empty_table()
        j = left.join(batch, keys=keys, join_type="inner",
                      use_threads=False)
        return j.select(out_cols)

    return right.map_batches(scan_join, batch_format="pyarrow")


def bgp_match(triples, patterns, num_partitions: int = 16,
              filters=None, optional=None):
    """Conjunctive BGP over a triple Dataset with columns
    ``subj, pred, obj_lex`` → Dataset of bindings (one string column
    per variable, bag semantics).

    Join strategy per step: the accumulated bindings are materialized
    (they are bindings, never the triple store); when they fit
    ``BGP_BROADCAST_MAX`` rows AND ``BGP_BROADCAST_MAX_BYTES`` bytes
    they broadcast-join against the next pattern's filtered scan (no
    exchange), else both sides meet in a partitioned hash join.

    ``filters``: SPARQL FILTER specs ``("?var", op, value)`` with op
    in ``= != < <= > >= regex contains`` — numeric when ``value`` is
    an int/float (type errors exclude the row, SPARQL 1.1 §17.2).
    Each filter is PUSHED DOWN to the earliest fold step where its
    variable is bound, shrinking every later join's build side; a
    filter naming a variable no pattern binds raises.

    ``optional``: SPARQL OPTIONAL patterns (one left-join group per
    pattern) applied AFTER the required fold — unmatched rows keep
    their bindings with nulls for the optional variables (bag
    semantics = a SQL LEFT JOIN chain).  Each optional pattern must
    share at least one REQUIRED-bound variable (always non-null, so
    the per-partition left-outer join is exact); filters naming
    optional variables run after that join, and a null (unbound)
    value excludes the row — SPARQL's outer-FILTER type-error rule.
    FILTERs scoped *inside* an OPTIONAL group are not modeled."""
    import ray

    if not patterns:
        raise ValueError("empty pattern list")
    pending = list(filters or [])
    for f in pending:
        _filter_spec_vars(f)  # validate shape early

    def apply_ready(acc, bound: set):
        nonlocal pending
        ready = [f for f in pending
                 if _filter_spec_vars(f) <= bound]
        if ready:
            acc = _filter_bindings(acc, ready)
            pending = [f for f in pending if f not in ready]
        return acc

    acc = _match_pattern(triples, patterns[0])
    acc_cols = _pattern_out_vars(patterns[0])
    acc_vars = set(acc_cols)
    acc = apply_ready(acc, acc_vars)
    for pat in patterns[1:]:
        nxt_cols = _pattern_out_vars(pat)
        nxt = _match_pattern(triples, pat)
        shared = [v for v in nxt_cols if v in acc_vars]
        if not shared:
            raise ValueError(
                f"pattern {pat} shares no variable with the bindings "
                "accumulated so far (cartesian product refused); "
                "reorder the patterns")
        acc = acc.materialize()
        if (acc.count() <= BGP_BROADCAST_MAX
                and (acc.size_bytes() or 0) <= BGP_BROADCAST_MAX_BYTES):
            refs = [r for b in acc.iter_internal_ref_bundles()
                    for r in b.block_refs]
            tabs = [t for t in ray.get(refs) if t.num_rows]
            acc_tbl = (pa.concat_tables(tabs) if tabs else
                       pa.schema([(c, pa.string()) for c in
                                  acc_cols]).empty_table())
            acc = _broadcast_join(acc_tbl, nxt, shared)
        else:
            acc = _hash_join(acc, nxt, shared, num_partitions,
                             list(acc_cols), list(nxt_cols))
        acc_cols = acc_cols + [c for c in nxt_cols if c not in acc_vars]
        acc_vars |= set(nxt_cols)
        acc = apply_ready(acc, acc_vars)
    required_vars = set(acc_vars)
    for pat in (optional or []):
        nxt_cols = _pattern_out_vars(pat)
        nxt = _match_pattern(triples, pat)
        shared = [v for v in nxt_cols if v in required_vars]
        if not shared:
            raise ValueError(
                f"OPTIONAL pattern {pat} shares no REQUIRED-bound "
                "variable with the base patterns (left-join key must "
                "be always-bound)")
        opt_shared = [v for v in nxt_cols
                      if v in acc_vars and v not in required_vars]
        if opt_shared:
            # joining through a possibly-unbound variable needs
            # SPARQL compatibility semantics (unbound matches
            # anything) which a plain left join cannot express — and
            # pyarrow would emit the column twice.  Refuse at plan
            # time instead of crashing in a worker.
            raise ValueError(
                f"OPTIONAL pattern {pat} re-uses optional-bound "
                f"variable(s) {opt_shared}; chained OPTIONALs may "
                "share only required-bound variables")
        acc = _hash_join(acc, nxt, shared, num_partitions,
                         list(acc_cols), list(nxt_cols),
                         join_type="left outer")
        acc_cols = acc_cols + [c for c in nxt_cols if c not in acc_vars]
        acc_vars |= set(nxt_cols)
        acc = apply_ready(acc, acc_vars)
    if pending:
        raise ValueError(
            f"FILTER(s) {pending} reference variables no pattern "
            f"binds (bound: {sorted(acc_vars)})")
    return acc


# ------------------------------------------------------------- FILTER

_CMP_OPS = {"=": pc.equal, "!=": pc.not_equal, "<": pc.less,
            "<=": pc.less_equal, ">": pc.greater, ">=": pc.greater_equal}

# numeric lexical space aligned with DuckDB TRY_CAST / SPARQL xsd
# numerics: optional sign, "1", "1.5", ".5", "5.", exponent, and
# surrounding ASCII whitespace (trimmed before the cast).  Non-finite
# lexicals ("inf"/"nan") are deliberately a type error on BOTH the
# engine and any oracle that guards with the same pattern — DuckDB's
# NaN ordering (NaN = NaN is TRUE there) would otherwise diverge
# from IEEE.
_NUM_RE = r"^[+-]?([0-9]+\.?[0-9]*|\.[0-9]+)([eE][+-]?[0-9]+)?$"


def _filter_spec_vars(spec) -> set:
    var, _, _ = spec
    if not _is_var(var):
        raise ValueError(f"FILTER {spec}: first term must be a ?var")
    return {var[1:]}


def _filter_bindings(ds, specs):
    """Apply FILTER specs to a binding Dataset — one vectorized mask
    pass, SPARQL error semantics (a binding whose value errors under
    the filter expression is EXCLUDED: non-numeric strings under a
    numeric comparison drop, per SPARQL 1.1 §17.2 effective boolean
    value of a type error)."""

    def fn(batch: pa.Table) -> pa.Table:
        mask = None
        for var, op, val in specs:
            col = batch[var[1:]]
            if op == "regex":
                m = pc.match_substring_regex(col, val)
            elif op == "contains":
                m = pc.match_substring(col, val)
            elif isinstance(val, bool):
                # RDF/SPARQL boolean lexical forms, not Python's
                m = _CMP_OPS[op](col, "true" if val else "false")
            elif not isinstance(val, (int, float)):
                m = _CMP_OPS[op](col, str(val))
            else:
                trimmed = pc.utf8_trim_whitespace(col)
                valid = pc.fill_null(
                    pc.match_substring_regex(trimmed, _NUM_RE), False)
                num = pc.cast(pc.if_else(valid, trimmed, "nan"),
                              pa.float64())
                # AND with validity: a type error excludes the row for
                # EVERY operator (IEEE alone would let '!=' pass NaN)
                m = pc.and_(valid, _CMP_OPS[op](num, float(val)))
            mask = m if mask is None else pc.and_(mask, m)
        return batch.filter(pc.fill_null(mask, False))

    return ds.map_batches(fn, batch_format="pyarrow")


def bgp_union(triples, groups, num_partitions: int = 16):
    """SPARQL UNION: bag union of independently-matched BGP groups
    (each a dict accepted by :func:`bgp_match`'s keyword surface, or a
    bare pattern list).  Output columns are the union of every
    group's variables in first-seen order; a group that does not bind
    a variable contributes nulls for it (SPARQL 1.1 §17.3 — UNION
    branches need not share variables).  Pure ``Dataset.union`` —
    no exchange beyond what each branch already does."""
    if not groups:
        raise ValueError("empty UNION group list")
    norm = []
    for g in groups:
        if isinstance(g, dict):
            norm.append(g)
        else:
            norm.append({"patterns": g})
    all_vars: list[str] = []
    per_group_vars: list[list[str]] = []
    for g in norm:
        vs: list[str] = []
        for pat in list(g["patterns"]) + list(g.get("optional") or []):
            for v in _pattern_out_vars(pat):
                if v not in vs:
                    vs.append(v)
        per_group_vars.append(vs)
        for v in vs:
            if v not in all_vars:
                all_vars.append(v)

    def pad_to(cols_present):
        def fn(batch: pa.Table) -> pa.Table:
            out = {}
            for v in all_vars:
                out[v] = (batch[v] if v in cols_present else
                          pa.nulls(batch.num_rows, type=pa.string()))
            return pa.table(out)

        return fn

    acc = None
    for g, vs in zip(norm, per_group_vars):
        branch = bgp_match(triples, g["patterns"],
                           num_partitions=num_partitions,
                           filters=g.get("filters"),
                           optional=g.get("optional"))
        branch = branch.map_batches(pad_to(set(vs)),
                                    batch_format="pyarrow")
        acc = branch if acc is None else acc.union(branch)
    return acc


def bgp_construct(triples, patterns, template, num_partitions: int = 16,
                  filters=None, optional=None):
    """SPARQL CONSTRUCT: match a BGP (full :func:`bgp_match` surface)
    and instantiate ``template`` — a list of ``(s, p, o)`` terms where
    each term is a constant or a bound ``?var`` — once per binding row
    (bag semantics; SPARQL 1.1 §16.2: a template triple containing an
    UNBOUND variable is skipped for that solution, not an error).

    Output is a triple Dataset ``(subj, pred, obj_lex)`` — the same
    columns the matcher consumes, so CONSTRUCT results pipe straight
    back into ``bgp_match``/``materialize_triples`` (this is the
    KG-construction loop: derive new edges from matched patterns).
    One vectorized pass over the bindings; no extra exchange."""
    if not template:
        raise ValueError("empty CONSTRUCT template")
    bound: set[str] = set()
    for pat in list(patterns) + list(optional or []):
        bound |= set(_pattern_out_vars(pat))
    for tpat in template:
        if len(tpat) != 3:
            raise ValueError(f"template triple {tpat} must have 3 terms")
        for t in tpat:
            if _is_var(t) and t[1:] not in bound:
                raise ValueError(
                    f"template variable {t} is bound by no pattern")

    bindings = bgp_match(triples, patterns,
                         num_partitions=num_partitions,
                         filters=filters, optional=optional)

    def instantiate(batch: pa.Table) -> pa.Table:
        outs = []
        n = batch.num_rows
        for s, p, o in template:
            # SPARQL 16.2: skip a template triple for solutions where
            # any of its variables is unbound (nulls from OPTIONAL)
            mask = None
            for t in (s, p, o):
                if _is_var(t):
                    m = pc.invert(pc.is_null(batch[t[1:]]))
                    mask = m if mask is None else pc.and_(mask, m)
            t3 = pa.table({
                "subj": (batch[s[1:]] if _is_var(s)
                         else pa.array([s] * n, pa.string())),
                "pred": (batch[p[1:]] if _is_var(p)
                         else pa.array([p] * n, pa.string())),
                "obj_lex": (batch[o[1:]] if _is_var(o)
                            else pa.array([o] * n, pa.string())),
            })
            if mask is not None:
                t3 = t3.filter(pc.fill_null(mask, False))
            outs.append(t3)
        return pa.concat_tables(outs)

    return bindings.map_batches(instantiate, batch_format="pyarrow")


def bgp_ask(triples, patterns, num_partitions: int = 16,
            filters=None, optional=None) -> bool:
    """SPARQL ASK: does at least one solution exist?  (SPARQL 1.1
    §16.3.)  Evaluates the BGP lazily and stops at the first binding
    row — ``Dataset.limit(1)`` lets the streaming executor cancel the
    rest of the pipeline once a row materializes."""
    bindings = bgp_match(triples, patterns,
                         num_partitions=num_partitions,
                         filters=filters, optional=optional)
    return bindings.limit(1).count() > 0


def bgp_describe(triples, iris, cols=_POS_COLS):
    """SPARQL DESCRIBE (the W3C-recommended simple form: every triple
    whose subject is a described resource; SPARQL 1.1 §16.4 leaves the
    exact shape implementation-defined).  ``iris`` is a list of
    constants or a ``ray.ObjectRef`` to one — broadcast membership,
    one filtered scan, no exchange."""
    import pyarrow as _pa

    def scan(batch: pa.Table) -> pa.Table:
        vals = iris
        try:
            import ray

            if isinstance(vals, ray.ObjectRef):
                vals = ray.get(vals)
        except ImportError:  # pragma: no cover
            pass
        m = pc.fill_null(pc.is_in(
            batch[cols[0]], value_set=_pa.array(list(vals))), False)
        return batch.filter(m)

    return triples.map_batches(scan, batch_format="pyarrow")
