"""RDF serialization beyond N-Quads: Turtle and TriG exports.

Reference counterpart: the format transcoder (``csvw_tool.py:60-78``)
re-parses the whole ``.nq`` into one in-memory rdflib graph and
re-serializes (xml/n3/turtle/nt/trix/trig) — "a deliberately
non-scalable edge step" (SURVEY.md §2.1 S6).  Here the same stance:
these are driver-streamed edge utilities for small/medium exports; the
canonical distributed store is partitioned Parquet.  Turtle grouping
(one subject block, ``;``/``,`` abbreviation) requires subject-sorted
input — which the materialized store already is.
"""

from __future__ import annotations

from ..namespaces import DEFAULT_NAMESPACES, RDF
from .nq import escape_literal, format_term


def _prefix_table(namespaces: dict[str, str] | None):
    ns = dict(DEFAULT_NAMESPACES if namespaces is None else namespaces)
    # longest-namespace-first so the most specific prefix wins
    return sorted(ns.items(), key=lambda kv: -len(kv[1]))


def _qname(iri: str, prefixes) -> str | None:
    for pfx, ns in prefixes:
        if iri.startswith(ns):
            local = iri[len(ns):]
            # PN_LOCAL-conservative: first char must be alphabetic or
            # '_' (a leading '-'/'.'/digit makes 'sdv:-foo'-style names
            # that Turtle parsers reject) and no trailing '.'
            if local and all(c.isalnum() or c in "_-." for c in local) \
               and (local[0].isalpha() or local[0] == "_") \
               and not local.endswith("."):
                return f"{pfx}:{local}"
    return None


def _term(lex, kind, dt, lang, prefixes) -> str:
    if kind == "iri":
        q = _qname(lex, prefixes)
        if q:
            return q
        return f"<{lex}>"
    lit = f'"{escape_literal(lex)}"'
    if lang:
        return f"{lit}@{lang}"
    if dt:
        q = _qname(dt, prefixes)
        return f"{lit}^^{q}" if q else f"{lit}^^<{dt}>"
    return lit


def triples_to_turtle(rows, namespaces: dict[str, str] | None = None) -> str:
    """Sorted triple rows → Turtle text with prefix header and
    subject/predicate grouping.  ``rows`` is an iterable of dicts with
    the triple-table columns, sorted by (subj, pred)."""
    prefixes = _prefix_table(namespaces)
    used: set[str] = set()
    body: list[str] = []

    cur_s = None
    cur_p = None
    parts: list[str] = []

    def flush():
        if parts:
            body.append(" ;\n".join(parts) + " .\n")

    for r in rows:
        s, p = r["subj"], r["pred"]
        term_s = _term(s, "iri", None, None, prefixes)
        pred_iri = p
        if pred_iri == RDF + "type":
            term_p = "a"
        else:
            term_p = _term(p, "iri", None, None, prefixes)
        term_o = _term(r["obj_lex"], r["obj_kind"], r.get("obj_datatype"),
                       r.get("obj_lang"), prefixes)
        for t in (term_s, term_p, term_o):
            if t.startswith('"'):
                # typed literal: the datatype qname after ^^ counts
                if "^^" in t and not t.endswith(">"):
                    used.add(t.rsplit("^^", 1)[1].split(":", 1)[0])
            elif ":" in t and not t.startswith("<"):
                used.add(t.split(":", 1)[0])
        if s != cur_s:
            flush()
            parts = [f"{term_s} {term_p} {term_o}"]
            cur_s, cur_p = s, p
        elif p != cur_p:
            parts.append(f"    {term_p} {term_o}")
            cur_p = p
        else:
            parts[-1] += f", {term_o}"
    flush()

    header = [
        f"@prefix {pfx}: <{ns}> ."
        for pfx, ns in sorted(prefixes)
        if pfx in used
    ]
    return "\n".join(header) + ("\n\n" if header else "") + "".join(body)


def export_turtle(ds, path: str, namespaces: dict[str, str] | None = None,
                  sort: bool = True) -> int:
    """Driver-streamed Turtle export of a triple Dataset."""
    rows = _collect_sorted(ds) if sort else [
        r for b in ds.iter_batches(batch_size=65536, batch_format="pyarrow")
        for r in b.to_pylist()
    ]
    with open(path, "w", encoding="utf-8") as f:
        f.write(triples_to_turtle(rows, namespaces))
    return len(rows)


def export_trig(quads_rows, path: str,
                namespaces: dict[str, str] | None = None) -> int:
    """Quad rows (with a ``graph`` column) → TriG text: one
    ``<graph> { ... }`` block per named graph (the nanopublication
    export shape, reference ``docs/index.rst`` worked example)."""
    by_graph: dict[str, list[dict]] = {}
    for r in quads_rows:
        by_graph.setdefault(r.get("graph") or "", []).append(r)
    prefixes = _prefix_table(namespaces)
    out = []
    header_used: set[str] = set()
    blocks = []
    for g in sorted(by_graph):
        rows = sorted(by_graph[g], key=lambda r: (r["subj"], r["pred"]))
        body = triples_to_turtle(rows, namespaces)
        # split off the prefix header turtle generated
        lines = body.splitlines()
        data_lines = [ln for ln in lines if not ln.startswith("@prefix")]
        for ln in lines:
            if ln.startswith("@prefix"):
                header_used.add(ln)
        indented = "\n".join("    " + ln if ln else "" for ln in data_lines
                             ).strip("\n")
        gterm = f"<{g}>" if g else ""
        blocks.append(f"{gterm} {{\n{indented}\n}}\n")
    out = sorted(header_used) + [""] + blocks
    text = "\n".join(out)
    with open(path, "w", encoding="utf-8") as f:
        f.write(text)
    return sum(len(v) for v in by_graph.values())


# ---- RDF/XML and TriX (S6 parity: the reference's remaining formats) ----

import re as _re

# XML 1.0 cannot represent most C0 control chars at all (not even as
# entities); replace with U+FFFD so the export stays parseable (lossy —
# the lossless serializations are the N-Quads/Turtle family)
_XML_ILLEGAL_RE = _re.compile(
    "[\x00-\x08\x0b\x0c\x0e-\x1f]")
# longest XML-NCName suffix of a predicate IRI (the RDF/XML split point)
_NCNAME_SUFFIX_RE = _re.compile(r"[A-Za-z_][A-Za-z0-9_.\-]*$")


def _xml_escape(s: str) -> str:
    s = _XML_ILLEGAL_RE.sub("\ufffd", s)
    return (s.replace("&", "&amp;").replace("<", "&lt;")
             .replace(">", "&gt;").replace('"', "&quot;"))


def _split_predicate(p: str) -> tuple[str, str]:
    """RDF/XML predicate split: namespace + XML-legal local name whose
    concatenation is exactly the IRI.  Raises for predicates RDF/XML
    genuinely cannot express (ending in '/' or '#', digit-only tails) —
    the same limitation rdflib's serializer has."""
    m = _NCNAME_SUFFIX_RE.search(p)
    if not m or m.start() == 0:
        raise ValueError(
            f"predicate {p!r} is not expressible in RDF/XML (no valid "
            "XML-name suffix); use nquads/turtle/trig instead")
    return p[: m.start()], p[m.start():]


def triples_to_rdfxml(rows) -> str:
    """Plain rdf:Description serialization (no qname abbreviation of
    predicates beyond the split required by XML element names).  Rows
    sorted by subject give one Description block per subject."""
    out = ['<?xml version="1.0" encoding="utf-8"?>',
           '<rdf:RDF xmlns:rdf="http://www.w3.org/1999/02/22-rdf-syntax-ns#">']
    cur = None
    opened = False
    for r in rows:
        s = r["subj"]
        if s != cur:
            if opened:
                out.append("</rdf:Description>")
            out.append(f'<rdf:Description rdf:about="{_xml_escape(s)}">')
            cur = s
            opened = True
        p = r["pred"]
        ns, local = _split_predicate(p)
        attrs = f' xmlns:p="{_xml_escape(ns)}"'
        if r["obj_kind"] == "iri":
            out.append(f'  <p:{local}{attrs} '
                       f'rdf:resource="{_xml_escape(r["obj_lex"])}"/>')
        else:
            extra = ""
            if r.get("obj_lang"):
                extra = f' xml:lang="{_xml_escape(r["obj_lang"])}"'
            elif r.get("obj_datatype"):
                extra = f' rdf:datatype="{_xml_escape(r["obj_datatype"])}"'
            out.append(f'  <p:{local}{attrs}{extra}>'
                       f'{_xml_escape(r["obj_lex"])}</p:{local}>')
    if opened:
        out.append("</rdf:Description>")
    out.append("</rdf:RDF>")
    return "\n".join(out)


_RDF_TYPE = "http://www.w3.org/1999/02/22-rdf-syntax-ns#type"


def triples_to_pretty_xml(rows) -> str:
    """rdflib-style "pretty-xml": subjects grouped as in the plain
    serializer PLUS (1) typed nodes — a subject's first expressible
    ``rdf:type`` becomes the element name — and (2) nesting — an IRI
    object that is itself a subject and is referenced exactly once in
    the graph is inlined as a nested description.  Cycles fall back to
    ``rdf:resource`` (stack check), depth capped at 20."""
    from collections import Counter

    by_subj: dict[str, list] = {}
    for r in rows:
        by_subj.setdefault(r["subj"], []).append(r)
    refs = Counter(
        r["obj_lex"] for r in rows
        if r["obj_kind"] == "iri" and r["obj_lex"] in by_subj
        and r["obj_lex"] != r["subj"]
    )
    inlinable = {s for s, c in refs.items() if c == 1}
    emitted: set[str] = set()
    out = ['<?xml version="1.0" encoding="utf-8"?>',
           '<rdf:RDF xmlns:rdf="http://www.w3.org/1999/02/22-rdf-syntax-ns#">']

    def try_split(iri: str):
        try:
            return _split_predicate(iri)
        except ValueError:
            return None

    def emit(s: str, ind: str, stack: frozenset, depth: int):
        emitted.add(s)
        rows_s = by_subj[s]
        type_row = next(
            (r for r in rows_s
             if r["pred"] == _RDF_TYPE and r["obj_kind"] == "iri"
             and try_split(r["obj_lex"])),
            None,
        )
        if type_row is not None:
            tns, tlocal = _split_predicate(type_row["obj_lex"])
            tag = f"t:{tlocal}"
            topen = (f'{ind}<{tag} xmlns:t="{_xml_escape(tns)}" '
                     f'rdf:about="{_xml_escape(s)}">')
        else:
            tag = "rdf:Description"
            topen = f'{ind}<{tag} rdf:about="{_xml_escape(s)}">'
        out.append(topen)
        for r in rows_s:
            if r is type_row:
                continue
            ns, local = _split_predicate(r["pred"])
            attrs = f' xmlns:p="{_xml_escape(ns)}"'
            if r["obj_kind"] == "iri":
                o = r["obj_lex"]
                if (o in inlinable and o not in emitted and o not in stack
                        and depth < 20):
                    out.append(f'{ind}  <p:{local}{attrs}>')
                    emit(o, ind + "    ", stack | {s}, depth + 1)
                    out.append(f'{ind}  </p:{local}>')
                else:
                    out.append(f'{ind}  <p:{local}{attrs} '
                               f'rdf:resource="{_xml_escape(o)}"/>')
            else:
                extra = ""
                if r.get("obj_lang"):
                    extra = f' xml:lang="{_xml_escape(r["obj_lang"])}"'
                elif r.get("obj_datatype"):
                    extra = (f' rdf:datatype='
                             f'"{_xml_escape(r["obj_datatype"])}"')
                out.append(f'{ind}  <p:{local}{attrs}{extra}>'
                           f'{_xml_escape(r["obj_lex"])}</p:{local}>')
        out.append(f"{ind}</{tag}>")

    # roots first (subjects nobody inlines), then leftovers (detached
    # cycles of inlinable subjects)
    for s in sorted(by_subj):
        if s not in emitted and s not in inlinable:
            emit(s, "", frozenset(), 0)
    for s in sorted(by_subj):
        if s not in emitted:
            emit(s, "", frozenset(), 0)
    out.append("</rdf:RDF>")
    return "\n".join(out)


def export_pretty_xml(ds, path: str) -> int:
    rows = _collect_sorted(ds)
    with open(path, "w", encoding="utf-8") as f:
        f.write(triples_to_pretty_xml(rows))
    return len(rows)


def triples_to_trix(rows, graph: str | None = None) -> str:
    """TriX serialization (one <graph> block)."""
    out = ['<?xml version="1.0" encoding="utf-8"?>',
           '<TriX xmlns="http://www.w3.org/2004/03/trix/trix-1/">',
           "<graph>"]
    if graph:
        out.append(f"  <uri>{_xml_escape(graph)}</uri>")
    for r in rows:
        out.append("  <triple>")
        out.append(f"    <uri>{_xml_escape(r['subj'])}</uri>")
        out.append(f"    <uri>{_xml_escape(r['pred'])}</uri>")
        if r["obj_kind"] == "iri":
            out.append(f"    <uri>{_xml_escape(r['obj_lex'])}</uri>")
        elif r.get("obj_lang"):
            out.append(f'    <plainLiteral xml:lang="{_xml_escape(r["obj_lang"])}">'
                       f'{_xml_escape(r["obj_lex"])}</plainLiteral>')
        elif r.get("obj_datatype"):
            out.append(f'    <typedLiteral datatype="{_xml_escape(r["obj_datatype"])}">'
                       f'{_xml_escape(r["obj_lex"])}</typedLiteral>')
        else:
            out.append(f"    <plainLiteral>{_xml_escape(r['obj_lex'])}"
                       f"</plainLiteral>")
        out.append("  </triple>")
    out.append("</graph>")
    out.append("</TriX>")
    return "\n".join(out)


def _collect_sorted(ds):
    rows = []
    for batch in ds.sort(["subj", "pred", "obj_lex"]).iter_batches(
            batch_size=65536, batch_format="pyarrow"):
        rows.extend(batch.to_pylist())
    return rows


def export_rdfxml(ds, path: str) -> int:
    rows = _collect_sorted(ds)
    with open(path, "w", encoding="utf-8") as f:
        f.write(triples_to_rdfxml(rows))
    return len(rows)


def export_trix(ds, path: str, graph: str | None = None) -> int:
    rows = _collect_sorted(ds)
    with open(path, "w", encoding="utf-8") as f:
        f.write(triples_to_trix(rows, graph))
    return len(rows)
