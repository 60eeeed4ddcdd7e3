"""SHACL-style constraint validation over a triple Dataset — the
data-quality gate of KG construction (W3C SHACL, 2017: a core subset
— ``sh:pattern`` on a predicate's objects, ``sh:minCount`` /
``sh:maxCount`` on a predicate per focus node).  A production KG
pipeline runs this between construction and publication; violations
are data, not exceptions.

Constraint forms (plain dicts, the rule-document style of the rest of
the engine):

* ``{"id", "kind": "pattern", "pred", "regex"}`` — every object of
  ``pred`` must match ``regex`` (RE2, shared-engine semantics with
  the DuckDB oracle);
* ``{"id", "kind": "minCount", "focus_pred", "pred", "min"}`` —
  every subject bearing ``focus_pred`` must carry ``pred`` at least
  ``min`` times;
* ``{"id", "kind": "maxCount", "pred", "max"}`` — no subject may
  carry ``pred`` more than ``max`` times.

Output: a violations Dataset ``(subj, constraint, detail)`` —
``detail`` is the offending lexical value for pattern constraints and
the observed count for cardinality ones.

Scale shape: pattern checks are a single filtered scan (no
exchange).  ALL cardinality constraints share ONE subject-keyed
exchange: per-batch partials collapse to distinct ``(subj, pred)``
counts over only the predicates any constraint mentions, partitions
are subject-disjoint, and each partition evaluates every count
constraint vectorized (sorted-subject segment sums)."""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

_VIOL_SCHEMA = pa.schema([("subj", pa.string()),
                          ("constraint", pa.string()),
                          ("detail", pa.string())])


def _check_constraints(constraints) -> tuple[list, list]:
    pats, cnts = [], []
    for c in constraints:
        kind = c.get("kind")
        if kind == "pattern":
            pats.append(c)
        elif kind == "minCount":
            if not c.get("focus_pred"):
                # without a focus predicate the evaluation scope would
                # be "subjects that happen to carry some OTHER
                # constraint's predicate" — co-submission-dependent
                # results; SHACL min counts are always node-scoped
                raise ValueError(
                    f"minCount constraint {c.get('id')!r} needs a "
                    "focus_pred (the node-scope predicate)")
            cnts.append(c)
        elif kind == "maxCount":
            cnts.append(c)
        else:
            raise ValueError(f"unknown constraint kind: {c!r}")
        if "id" not in c:
            raise ValueError(f"constraint missing id: {c!r}")
    return pats, cnts


def validate_triples(triples, constraints, num_partitions: int = 16):
    """Validate ``triples`` (columns ``subj, pred, obj_lex``) against
    ``constraints``; returns the violations Dataset (empty = conformant,
    like ``sh:conforms``)."""
    from ..stages.canonicalize import hash_mod

    pats, cnts = _check_constraints(constraints)

    outs = []
    if pats:
        def pattern_scan(batch: pa.Table) -> pa.Table:
            vs = []
            for c in pats:
                m = pc.fill_null(pc.equal(batch["pred"], c["pred"]),
                                 False)
                t = batch.filter(m)
                lex = t["obj_lex"]
                if pa.types.is_null(lex.type):  # all-null block
                    lex = lex.cast(pa.string())
                # null lexicals are NOT violations (SQL: NOT
                # regexp_matches(NULL, ..) is NULL -> excluded)
                bad = pc.invert(pc.fill_null(pc.match_substring_regex(
                    lex, c["regex"]), True))
                t = t.filter(bad)
                vs.append(pa.table({
                    "subj": t["subj"].cast(pa.string()),
                    "constraint": pa.array([c["id"]] * t.num_rows,
                                           pa.string()),
                    "detail": t["obj_lex"].cast(pa.string())}))
            return (pa.concat_tables(vs) if vs
                    else _VIOL_SCHEMA.empty_table())

        outs.append(triples.map_batches(pattern_scan,
                                        batch_format="pyarrow"))

    if cnts:
        needed = sorted({c["pred"] for c in cnts}
                        | {c["focus_pred"] for c in cnts
                           if c.get("focus_pred")})

        def partial(batch: pa.Table) -> pa.Table:
            m = pc.fill_null(pc.is_in(
                batch["pred"], value_set=pa.array(needed)), False)
            t = batch.filter(m).select(["subj", "pred"])
            agg = (t.group_by(["subj", "pred"], use_threads=False)
                   .aggregate([([], "count_all")])
                   .rename_columns(["subj", "pred", "c"]))
            return agg.append_column(
                "__part", hash_mod(agg["subj"], num_partitions))

        def per_part(g: pa.Table) -> pa.Table:
            if g.num_rows == 0:
                return _VIOL_SCHEMA.empty_table()
            agg = (g.select(["subj", "pred", "c"])
                   .group_by(["subj", "pred"], use_threads=False)
                   .aggregate([("c", "sum")])
                   .rename_columns(["subj", "pred", "c"]))
            subj = agg["subj"].to_numpy(zero_copy_only=False)
            pred = agg["pred"].to_numpy(zero_copy_only=False)
            cc = agg["c"].to_numpy(zero_copy_only=False)
            order = np.argsort(subj, kind="stable")
            subj, pred, cc = subj[order], pred[order], cc[order]
            usubj, starts = np.unique(subj, return_index=True)

            def count_of(p: str) -> np.ndarray:
                sel = np.where(pred == p, cc, 0)
                return np.add.reduceat(
                    sel, starts) if len(sel) else sel

            vs = []
            for c in cnts:
                pcnt = count_of(c["pred"])
                if c["kind"] == "minCount":
                    focus = count_of(c["focus_pred"]) > 0
                    bad = focus & (pcnt < int(c["min"]))
                else:
                    bad = pcnt > int(c["max"])
                vs.append(pa.table({
                    "subj": pa.array(usubj[bad].tolist(), pa.string()),
                    "constraint": pa.array([c["id"]] * int(bad.sum()),
                                           pa.string()),
                    "detail": pa.array(
                        [str(int(x)) for x in pcnt[bad]], pa.string()),
                }))
            return (pa.concat_tables(vs) if vs
                    else _VIOL_SCHEMA.empty_table())

        outs.append(
            triples.map_batches(partial, batch_format="pyarrow")
            .groupby("__part")
            .map_groups(lambda g: per_part(g.drop_columns(["__part"])),
                        batch_format="pyarrow"))

    if not outs:
        raise ValueError("no constraints given")
    acc = outs[0]
    for o in outs[1:]:
        acc = acc.union(o)
    return acc
