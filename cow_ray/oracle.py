"""Row-wise oracle: a faithful single-process re-derivation of the
reference's row→triples semantics (``/root/reference/src/converter/
csvw.py:488-637`` ``BurstConverter.process`` / ``_process_column``),
used to generate golden outputs for testing the vectorized Ray kernel.

Deliberately preserved reference quirks (SURVEY.md §7 "hard parts"):

* per-column exceptions are swallowed — the triple is dropped, the row
  continues (``csvw.py:551-552``);
* object-property triples whose object-IRI basename is null are
  dropped *including* their SKOS expansion (``csvw.py:577-581``);
* SKOS collection/scheme triples are emitted *before* the main triple,
  so an error in between keeps the earlier ones (``csvw.py:594-598`` vs
  ``csvw.py:546``);
* the null check's exception-abort semantics: a column with **no**
  ``null`` spec never consults the schema-level null (the reference's
  ``value in [ ... for n in c.csvw_null]`` raises ``TypeError`` over
  ``None`` and the whole check returns False, ``csvw.py:916-930``);
* a scalar column null also matches any *single character* of the null
  string (the reference iterates the scalar string);
* ``xsd:string`` + ``lang`` produces a language-tagged literal and
  **drops** the datatype (``csvw.py:618-619``);
* typed literals keep their lexical form unnormalized
  (``csvw.py:621`` ``normalize=False``);
* ``xsd:anyURI`` objects go through IRI escaping but *not* IRI
  validation (``csvw.py:616-617`` has no ``rfc3987.parse``).

Emission-side normalization (both oracle and kernel): a literal typed
``xsd:string`` is emitted as a plain literal — RDF 1.1 semantics, and
what rdflib's N-Quads serializer writes.
"""

from __future__ import annotations

import os
from dataclasses import dataclass, field

from .iri import expand_url, to_iri
from .namespaces import PROV, RDF, SKOS, XSD_STRING
from .rules import ColumnRule, RuleDoc
from .templating import normalize_value

KIND_IRI = "iri"
KIND_LITERAL = "literal"

# a triple is (subj, pred, obj_lex, obj_kind, obj_datatype, obj_lang)
Triple = tuple[str, str, str, str, str | None, str | None]


@dataclass
class RowResult:
    triples: list[Triple] = field(default_factory=list)
    errors: int = 0
    null_skips: int = 0


def make_row(cells: dict, row_id: int) -> dict:
    """Build the template-rendering context for one input row: every
    cell normalized to a string plus the integer ``_row`` pseudo-column
    (reference: ``csvw.py:502-509``; ``docs/index.rst`` "Template
    Expansion")."""
    row = {k: normalize_value(v) for k, v in cells.items()}
    row["_row"] = row_id
    return row


def is_value_null(value: str, rule: ColumnRule, schema_null: str | None) -> bool:
    """Reference ``isValueNull`` (``csvw.py:916-930``) with its
    exception-abort semantics made explicit."""
    if len(value) == 0 and rule.parse_on_empty:
        return False
    if len(value) == 0:
        return True
    if rule.null_scalar is not None:
        if value == rule.null_scalar:
            return True
        if value in set(rule.null_scalar):  # char-membership quirk
            return True
        return schema_null is not None and value == schema_null
    if rule.null_list is not None:
        if value in rule.null_list:
            return True
        return schema_null is not None and value == schema_null
    # no column-level null (or @list conditions): the reference's
    # iteration raises and the check short-circuits to False — the
    # schema-level null is NOT consulted.
    return False


def matches_null_condition(rule: ColumnRule, row: dict) -> bool:
    """Reference ``equal_to_null`` (``csvw.py:476-487``)."""
    for col, val in rule.null_conditions:
        if row.get(col) == val:
            return True
    return False


def _make_object_literal(
    value: str, rule: ColumnRule, row: dict
) -> tuple[str, str, str | None, str | None]:
    """Reference ``_determine_object`` (``csvw.py:614-622``) →
    (obj_lex, kind, datatype, lang)."""
    if rule.datatype is not None:
        if rule.is_any_uri:
            return to_iri(value), KIND_IRI, None, None
        if rule.is_lang_string:
            return value, KIND_LITERAL, None, rule.lang.render_row(row)
        if rule.datatype == XSD_STRING:
            return value, KIND_LITERAL, None, None  # RDF 1.1: plain
        return value, KIND_LITERAL, rule.datatype, None
    return value, KIND_LITERAL, None, None


def process_row(cells: dict, row_id: int, doc: RuleDoc) -> RowResult:
    """Emit all triples for one input row under ``doc``.

    Raises on a default-subject minting failure (the reference lets
    that exception kill the whole chunk, ``csvw.py:511``); per-column
    failures only increment ``errors``.
    """
    row = make_row(cells, row_id)
    res = RowResult()

    default_subject = expand_url(doc.about.render_row(row))

    for rule in doc.columns:
        # --- null gates (csvw.py:517-533) ---
        if rule.name is not None and rule.name in row:
            value = row[rule.name]
            if is_value_null(value, rule, doc.schema_null):
                res.null_skips += 1
                continue
            if rule.null_conditions and matches_null_condition(rule, row):
                res.null_skips += 1
                continue
        else:
            # KeyError path (virtual columns): only the cross-column
            # conditions apply
            if rule.null_conditions and matches_null_condition(rule, row):
                res.null_skips += 1
                continue

        try:
            _emit_column(rule, row, default_subject, doc, res)
        except Exception:
            res.errors += 1  # csvw.py:551-552 swallow

    return res


def _emit_column(
    rule: ColumnRule, row: dict, default_subject: str, doc: RuleDoc, res: RowResult
) -> None:
    """Reference ``_process_column`` (``csvw.py:559-604``)."""
    s = expand_url(rule.about.render_row(row)) if rule.about is not None else default_subject

    if rule.property_const is not None:
        p = rule.property_const
    else:
        p = expand_url(rule.property_tmpl.render_row(row))

    if rule.value_url is not None:
        o = expand_url(rule.value_url.render_row(row))
        if is_value_null(os.path.basename(o), rule, doc.schema_null):
            return  # dropped triple AND its SKOS expansion (csvw.py:580-581)

        if rule.virtual and rule.datatype is not None:
            if rule.is_any_uri:
                o = to_iri(row[rule.name])  # KeyError → swallowed upstream
            elif rule.is_link_uri:
                s = expand_url(_between_braces(rule.about.pattern).render_row(row))
                o = expand_url(_between_braces(rule.value_url.pattern).render_row(row))

        if rule.collection_url is not None:
            coll = expand_url(rule.collection_url.render_row(row))
            res.triples.append((coll, RDF + "type", SKOS + "Collection", KIND_IRI, None, None))
            res.triples.append((o, RDF + "type", SKOS + "Concept", KIND_IRI, None, None))
            res.triples.append((coll, SKOS + "member", o, KIND_IRI, None, None))
        if rule.scheme_url is not None:
            scheme = expand_url(rule.scheme_url.render_row(row))
            res.triples.append((scheme, RDF + "type", SKOS + "Scheme", KIND_IRI, None, None))
            res.triples.append((o, RDF + "type", SKOS + "Concept", KIND_IRI, None, None))
            res.triples.append((o, SKOS + "inScheme", scheme, KIND_IRI, None, None))

        res.triples.append((s, p, o, KIND_IRI, None, None))
    else:
        if rule.value_tmpl is not None:
            value = rule.value_tmpl.render_row(row)
        elif rule.name is not None:
            value = row[rule.name]  # KeyError → swallowed upstream
        else:
            raise ValueError("no 'name' or 'value' for column specification")
        obj_lex, kind, dt, lang = _make_object_literal(value, rule, row)
        res.triples.append((s, p, obj_lex, kind, dt, lang))

    if doc.emit_column_prov and rule.column_id:
        res.triples.append(
            (p, PROV + "wasDerivedFrom", rule.column_id, KIND_IRI, None, None)
        )


def _between_braces(pattern: str):
    """Reference ``_extract_between_braces`` (``csvw.py:624-625``)
    applied to the expanded template pattern, recompiled."""
    from .templating import compile_template

    frag = pattern[pattern.find("{") : pattern.find("}") + 1]
    return compile_template(frag)


def process_table(
    rows: list[dict], doc: RuleDoc, start_row_id: int = 0
) -> tuple[list[Triple], int, int]:
    """Oracle over a list of row dicts; returns (triples, errors,
    null_skips).  Triples are in emission order and NOT deduplicated
    (the reference's per-chunk rdflib graph set-dedups within a chunk;
    set-level comparison is the caller's choice)."""
    triples: list[Triple] = []
    errors = 0
    skips = 0
    for i, cells in enumerate(rows):
        r = process_row(cells, start_row_id + i, doc)
        triples.extend(r.triples)
        errors += r.errors
        skips += r.null_skips
    return triples, errors, skips
