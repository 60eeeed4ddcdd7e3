"""Mapping-rule document: parse → validate → compile.

The rule document is this engine's equivalent of the reference's CSVW
JSON-LD sidecar schema (``/root/reference/src/converter/csvw.py:214-318``
loads it via rdflib; we interpret the same JSON structure directly —
no JSON-LD machinery needed because COW's schemas use a fixed, known
shape).  Both the reference key spellings (``csvw:value``,
``{"csvw:name": ..., "csvw:null": ...}``) and bare spellings are
accepted, so a reference user's metadata files load unchanged.

Semantics preserved (see SURVEY.md §2.2):

* URL-valued attributes (``aboutUrl``/``propertyUrl``/``valueUrl``/
  ``collectionUrl``/``schemeUrl``) are IRI templates resolved against
  the document ``@base`` unless they carry a known namespace prefix or
  an absolute scheme (JSON-LD ``@id`` coercion, ``docs/index.rst``
  "Template Expansion").
* ``datatype`` resolves through the csvw.json alias table
  (``"string"`` → xsd:string, ...), then prefixes, then ``@base``.
* default predicate for a column without ``propertyUrl`` is
  ``<vocab>/<column name>`` (reference ``get_property_url``,
  ``csvw.py:871-894``).
* ``null`` may be a scalar, a list of scalars, or a list of
  ``{name, null}`` cross-column conditions (reference ``equal_to_null``
  / ``isValueNull``, ``csvw.py:476-487, 916-930``).

Everything row-independent is resolved at compile time, on the driver,
so the per-batch kernel touches only the row-dependent parts.  The
compiled document is a small plain-Python object captured in the
``map_batches`` UDF closure (broadcast once per worker by Ray).
"""

from __future__ import annotations

import hashlib
import json
import re
from dataclasses import dataclass, field

from .iri import expand_url
from .namespaces import (
    DATATYPE_ALIASES,
    DEFAULT_BASE,
    DEFAULT_NAMESPACES,
    XSD_ANYURI,
    XSD_LINKURI,
    XSD_STRING,
)
from .templating import COMPLEX, CONST, CompiledTemplate, compile_template

_PREFIX_RE = re.compile(r"^([A-Za-z][A-Za-z0-9_.\-]*):(?!//)(.*)$")
_SCHEME_RE = re.compile(r"^[A-Za-z][A-Za-z0-9+.\-]*://")


class RuleError(ValueError):
    """Invalid rule document (fails fast on the driver, before any Ray
    work is launched — reference analogue: term pre-validation at
    ``csvw.py:281-293``)."""


def expand_term(value: str, base: str, namespaces: dict[str, str]) -> str:
    """JSON-LD-style IRI-template expansion: prefixed name → namespace,
    absolute IRI → unchanged, otherwise resolved against ``base``."""
    m = _PREFIX_RE.match(value)
    if m and m.group(1) in namespaces:
        return namespaces[m.group(1)] + m.group(2)
    if _SCHEME_RE.match(value) or value.startswith("urn:"):
        return value
    return base + value


def resolve_datatype(value, base: str, namespaces: dict[str, str]) -> str:
    """Resolve a datatype spec (alias / prefixed / absolute / dict) to a
    full IRI."""
    if isinstance(value, dict):
        value = value.get("@id") or value.get("base") or value.get("id")
        if value is None:
            raise RuleError(f"unintelligible datatype spec: {value!r}")
    value = str(value)
    if value in DATATYPE_ALIASES:
        return DATATYPE_ALIASES[value]
    return expand_term(value, base, namespaces)


def _get(d: dict, *keys, default=None):
    for k in keys:
        if k in d:
            return d[k]
    return default


def _as_bool(v) -> bool:
    if isinstance(v, bool):
        return v
    return str(v).lower() == "true"


@dataclass
class ColumnRule:
    """One compiled column spec (reference: one member of the
    ``tableSchema.columns`` rdf:List, ``csvw.py:308,513-557``)."""

    name: str | None
    virtual: bool = False
    about: CompiledTemplate | None = None       # subject override (expanded)
    property_tmpl: CompiledTemplate | None = None
    property_const: str | None = None           # pre-minted predicate IRI
    value_url: CompiledTemplate | None = None   # object-IRI template (expanded)
    value_tmpl: CompiledTemplate | None = None  # csvw:value literal template
    datatype: str | None = None                 # full IRI
    lang: CompiledTemplate | None = None
    null_scalar: str | None = None
    null_list: list[str] | None = None
    null_conditions: list[tuple[str, str]] = field(default_factory=list)
    parse_on_empty: bool = False
    collection_url: CompiledTemplate | None = None
    scheme_url: CompiledTemplate | None = None
    column_id: str | None = None                # column @id (provenance)

    # derived flags
    @property
    def is_any_uri(self) -> bool:
        return self.datatype == XSD_ANYURI

    @property
    def is_link_uri(self) -> bool:
        return self.datatype == XSD_LINKURI

    @property
    def is_lang_string(self) -> bool:
        return self.datatype == XSD_STRING and self.lang is not None


@dataclass
class RuleDoc:
    """A fully compiled mapping-rule document."""

    base: str
    vocab: str
    namespaces: dict[str, str]
    about: CompiledTemplate                     # table-level aboutUrl
    schema_null: str | None
    primary_key: str | None
    columns: list[ColumnRule]
    dataset_name: str = "dataset"
    dialect: dict = field(default_factory=dict)  # delimiter/quoteChar/encoding
    # M17 (reference convert_info, csvw.py:321-361): metadata terms whose
    # IRI form differs from the authored string after escaping —
    # recorded as (escaped_iri, original) and emitted into the
    # provenance graph as (escaped, prov:wasDerivedFrom, "original")
    escape_derivations: list = field(default_factory=list)
    doc_hash: str = ""
    emit_column_prov: bool = False  # M14; off by default to match the
    # reference's observable golden output (docs/index.rst assertion
    # graph carries no per-column prov links)

    def referenced_fields(self) -> set[str]:
        """All row fields any template of this document references."""
        out: set[str] = set()
        for c in self.columns:
            for t in (
                c.about,
                c.property_tmpl,
                c.value_url,
                c.value_tmpl,
                c.lang,
                c.collection_url,
                c.scheme_url,
            ):
                if t is not None:
                    out |= set(t.fields)
            if c.name:
                out.add(c.name)
            for n, _ in c.null_conditions:
                out.add(n)
        out |= set(self.about.fields)
        return out


def _compile_url_template(
    raw: str | None, base: str, namespaces: dict[str, str]
) -> CompiledTemplate | None:
    if raw is None:
        return None
    return compile_template(expand_term(str(raw), base, namespaces))


def parse_rules(doc: dict | str) -> RuleDoc:
    """Parse + compile a rule document (dict or JSON text).

    Accepts both this engine's native shape::

        {"base": ..., "namespaces": {...}, "aboutUrl": ...,
         "null": ..., "columns": [...]}

    and the reference's CSVW metadata shape (``@context`` list with an
    ``@base`` entry, ``tableSchema`` holding aboutUrl/primaryKey/null/
    columns) — so existing COW schema files convert as-is.
    """
    if isinstance(doc, str):
        doc = json.loads(doc)

    # --- base + namespaces ---
    base = DEFAULT_BASE
    extra_ns: dict[str, str] = {}
    if "@context" in doc and isinstance(doc["@context"], list):
        for entry in doc["@context"]:
            if isinstance(entry, dict):
                if entry.get("@base"):
                    base = str(entry["@base"])
                for k, v in entry.items():
                    if not k.startswith("@") and isinstance(v, str):
                        extra_ns[k] = v
    if doc.get("base"):
        base = str(doc["base"])
        if not base.endswith("/"):
            base += "/"
    namespaces = dict(DEFAULT_NAMESPACES)
    namespaces.update(extra_ns)
    namespaces.update(doc.get("namespaces", {}))
    vocab = doc.get("vocab") or namespaces.get("sdv") or base + "vocab/"
    namespaces.setdefault("sdr", base)
    namespaces.setdefault("sdv", vocab)

    schema = doc.get("tableSchema", doc)

    about_raw = _get(schema, "aboutUrl", "about")
    if about_raw is None:
        raise RuleError("rule document needs a table-level aboutUrl")
    about = _compile_url_template(about_raw, base, namespaces)

    schema_null = _get(schema, "null")
    if isinstance(schema_null, list):
        # reference stores schema-level null as a scalar; tolerate a
        # one-element list
        schema_null = schema_null[0] if schema_null else None
    schema_null = None if schema_null is None else str(schema_null)

    columns: list[ColumnRule] = []
    for spec in schema.get("columns", []):
        columns.append(_parse_column(spec, base, vocab, namespaces))

    name = doc.get("dc:title") or doc.get("name") or doc.get("url") or "dataset"
    dialect = doc.get("dialect") or {}
    canon = json.dumps(doc, sort_keys=True, ensure_ascii=False).encode()
    rd = RuleDoc(
        base=base,
        vocab=vocab,
        namespaces=namespaces,
        about=about,
        schema_null=schema_null,
        primary_key=_get(schema, "primaryKey"),
        columns=columns,
        dataset_name=str(name),
        dialect=dict(dialect),
        doc_hash=hashlib.sha1(canon).hexdigest(),
        emit_column_prov=_as_bool(doc.get("emitColumnProv", False)),
    )
    _validate(rd)
    _collect_escape_derivations(rd)
    return rd


def _parse_column(
    spec: dict, base: str, vocab: str, namespaces: dict[str, str]
) -> ColumnRule:
    name = _get(spec, "name", "csvw:name")
    name = None if name is None else str(name)
    virtual = _as_bool(_get(spec, "virtual", "csvw:virtual", default=False))

    datatype = _get(spec, "datatype", "csvw:datatype")
    datatype_iri = (
        None if datatype is None else resolve_datatype(datatype, base, namespaces)
    )

    # nulls: scalar / list of scalars / list of {name,null} conditions
    null_raw = _get(spec, "null", "csvw:null")
    null_scalar = None
    null_list = None
    null_conditions: list[tuple[str, str]] = []
    if null_raw is not None:
        if isinstance(null_raw, list):
            if null_raw and isinstance(null_raw[0], dict):
                for cond in null_raw:
                    null_conditions.append(
                        (
                            str(_get(cond, "name", "csvw:name")),
                            str(_get(cond, "null", "csvw:null")),
                        )
                    )
            else:
                null_list = [str(v) for v in null_raw]
        else:
            null_scalar = str(null_raw)

    prop_raw = _get(spec, "propertyUrl", "csvw:propertyUrl")
    if prop_raw is not None:
        property_tmpl = _compile_url_template(prop_raw, base, namespaces)
    else:
        if name is None:
            raise RuleError("column without name needs an explicit propertyUrl")
        # reference default: default-ns/sdv + column name
        # (csvw.py:885-891); still a template because names may carry
        # braces
        property_tmpl = compile_template(vocab + name)
    property_const = (
        expand_url(property_tmpl.pattern) if property_tmpl.kind == CONST else None
    )

    lang_raw = _get(spec, "lang", "csvw:lang")
    value_raw = _get(spec, "value", "csvw:value")

    return ColumnRule(
        name=name,
        virtual=virtual,
        about=_compile_url_template(
            _get(spec, "aboutUrl", "csvw:aboutUrl"), base, namespaces
        ),
        property_tmpl=property_tmpl,
        property_const=property_const,
        value_url=_compile_url_template(
            _get(spec, "valueUrl", "csvw:valueUrl"), base, namespaces
        ),
        value_tmpl=None if value_raw is None else compile_template(str(value_raw)),
        datatype=datatype_iri,
        lang=None if lang_raw is None else compile_template(str(lang_raw)),
        null_scalar=null_scalar,
        null_list=null_list,
        null_conditions=null_conditions,
        parse_on_empty=_as_bool(
            _get(spec, "parseOnEmpty", "csvw:parseOnEmpty", default=False)
        ),
        collection_url=_compile_url_template(
            _get(spec, "collectionUrl", "csvw:collectionUrl"), base, namespaces
        ),
        scheme_url=_compile_url_template(
            _get(spec, "schemeUrl", "csvw:schemeUrl"), base, namespaces
        ),
        column_id=_get(spec, "@id", "id"),
    )


def _collect_escape_derivations(doc: RuleDoc) -> None:
    """Reference ``convert_info`` (``csvw.py:321-361``): for every
    URL-valued metadata term, if iribaker-style escaping changes it,
    record the derivation for the provenance graph."""
    seen = set()
    for c in doc.columns:
        for t in (c.about, c.property_tmpl, c.value_url, c.collection_url,
                  c.scheme_url):
            if t is None or t.kind != CONST:
                continue
            try:
                escaped = expand_url(t.pattern)
            except ValueError:
                continue
            if escaped != t.pattern and (escaped, t.pattern) not in seen:
                seen.add((escaped, t.pattern))
                doc.escape_derivations.append((escaped, t.pattern))


def _validate_complex_url(t, placeholder_row: dict) -> None:
    """Fail-fast check of a COMPLEX (Jinja) URL template against a
    placeholder header row — the reference renders *every* metadata
    term against ``{headers…, _row: 0}`` and IRI-validates before
    converting (``csvw.py:281-293``, ``util/__init__.py:111-135``).

    Jinja *syntax* errors always raise RuleError.  Render/IRI failures
    raise too, EXCEPT for patterns with ``{% %}`` statements (row-value
    conditionals — the placeholder render only sees one branch), which
    downgrade to a warning."""
    import warnings

    from jinja2 import TemplateSyntaxError

    from .templating import _jinja_template

    try:
        # the shared env so user-registered custom filters validate
        tmpl = _jinja_template(t.pattern)
    except TemplateSyntaxError as e:
        raise RuleError(
            f"malformed Jinja template {t.pattern!r}: {e}"
        ) from e
    row = dict(placeholder_row)
    for f in t.fields:
        row.setdefault(f, "x")
    try:
        try:
            rendered = tmpl.render(**row)
        except TypeError:
            # reference quirk (util/__init__.py:122-127): LD/Jinja
            # interactions like {{_row + 'x'}} — strip the statement
            # and assume the rest is fine
            rendered = re.sub(r"/\{\{.+\}\}", "", t.pattern)
        expand_url(rendered.format(**row))
    except Exception as e:
        if "{%" in t.pattern:
            warnings.warn(
                f"cannot pre-validate conditional template {t.pattern!r} "
                f"({e}); IRI errors will surface per-row at runtime",
                stacklevel=2,
            )
        else:
            raise RuleError(
                f"template {t.pattern!r} cannot mint a valid IRI: {e}"
            ) from e


def _validate(doc: RuleDoc) -> None:
    """Fail-fast validation of all metadata terms (reference analogue:
    ``validateTerm`` over every metadata term, ``csvw.py:289-293`` +
    ``util/__init__.py:111-135``).  CONST templates must mint valid
    IRIs outright; SIMPLE templates are checked with a placeholder
    substitution; COMPLEX (Jinja) templates are compiled (syntax
    errors fail fast) and URL-valued ones are additionally rendered
    against a placeholder row and IRI-validated."""
    from jinja2 import TemplateSyntaxError

    from .templating import _jinja_template

    placeholder_row: dict[str, object] = {"_row": 0}
    for c in doc.columns:
        # literal/lang COMPLEX templates: syntax must compile (a typo'd
        # Jinja rule must not surface as a million swallowed row errors)
        for t in (c.value_tmpl, c.lang):
            if t is not None and t.kind == COMPLEX:
                try:
                    _jinja_template(t.pattern)
                except TemplateSyntaxError as e:
                    raise RuleError(
                        f"malformed Jinja template {t.pattern!r}: {e}"
                    ) from e
        for t in (c.about, c.property_tmpl, c.value_url, c.collection_url, c.scheme_url):
            if t is None:
                continue
            if t.kind == CONST:
                try:
                    expand_url(t.pattern)
                except ValueError as e:
                    raise RuleError(str(e)) from e
            elif t.kind == "simple":
                row = dict(placeholder_row)
                for f in t.fields:
                    row.setdefault(f, "x")
                try:
                    expand_url(t.render_row(row))
                except (ValueError, KeyError) as e:
                    raise RuleError(
                        f"template {t.pattern!r} cannot mint a valid IRI: {e}"
                    ) from e
            else:
                _validate_complex_url(t, placeholder_row)
    if doc.about.kind == CONST:
        try:
            expand_url(doc.about.pattern)
        except ValueError as e:
            raise RuleError(str(e)) from e
    elif doc.about.kind == COMPLEX:
        _validate_complex_url(doc.about, placeholder_row)
