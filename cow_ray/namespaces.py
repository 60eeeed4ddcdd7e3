"""Default namespace prefix table and CSVW datatype aliases.

The prefix table mirrors the reference's
``src/converter/util/namespaces.yaml`` (public vocabulary IRIs); the
datatype alias table mirrors the JSON-LD ``@context`` aliases in the
reference's ``csvw.json`` (``"string": "xsd:string"`` etc.).

Unlike the reference — which mutates ``namespaces.yaml`` on disk per run
(``util/__init__.py:99-109``) — the table here is an immutable module
constant; per-job ``sdr``/``sdv`` bases are carried in the compiled rule
document, never in global state.
"""

from __future__ import annotations

XSD = "http://www.w3.org/2001/XMLSchema#"
RDF = "http://www.w3.org/1999/02/22-rdf-syntax-ns#"
RDFS = "http://www.w3.org/2000/01/rdf-schema#"
SKOS = "http://www.w3.org/2004/02/skos/core#"
PROV = "http://www.w3.org/ns/prov#"
CSVW = "http://www.w3.org/ns/csvw#"
NP = "http://www.nanopub.org/nschema#"
DC = "http://purl.org/dc/terms/"
SCHEMA = "http://schema.org/"
FOAF = "http://xmlns.com/foaf/0.1/"
OWL = "http://www.w3.org/2002/07/owl#"

DEFAULT_BASE = "https://example.com/id/"

# prefix -> namespace IRI (reference: util/namespaces.yaml:1-39)
DEFAULT_NAMESPACES: dict[str, str] = {
    "csvw": CSVW,
    "dc": DC,
    "dcterms": DC,
    "dc11": "http://purl.org/dc/elements/1.1/",
    "dbo": "http://dbpedia.org/ontology/",
    "foaf": FOAF,
    "np": NP,
    "owl": OWL,
    "prov": PROV,
    "qb": "http://purl.org/linked-data/cube#",
    "rdf": RDF,
    "rdfs": RDFS,
    "schema": SCHEMA,
    "sdmx-concept": "http://purl.org/linked-data/sdmx/2009/concept#",
    "sdmx-dimension": "http://purl.org/linked-data/sdmx/2009/dimension#",
    "skos": SKOS,
    "time": "http://www.w3.org/2006/time#",
    "wgs84": "http://www.w3.org/2003/01/geo/wgs84_pos#",
    "xml": "http://www.w3.org/XML/1998/namespace/",
    "xsd": XSD,
}

# bare-name datatype aliases from the reference csvw.json @context
# (e.g. csvw.json: "string": "xsd:string", "number": "xsd:double", ...)
DATATYPE_ALIASES: dict[str, str] = {
    name: XSD + local
    for name, local in {
        "any": "anyAtomicType",
        "anyAtomicType": "anyAtomicType",
        "anyURI": "anyURI",
        "base64Binary": "base64Binary",
        "binary": "base64Binary",
        "boolean": "boolean",
        "byte": "byte",
        "date": "date",
        "dateTime": "dateTime",
        "datetime": "dateTime",
        "dateTimeStamp": "dateTimeStamp",
        "dayTimeDuration": "dayTimeDuration",
        "decimal": "decimal",
        "double": "double",
        "duration": "duration",
        "float": "float",
        "gDay": "gDay",
        "gMonth": "gMonth",
        "gMonthDay": "gMonthDay",
        "gYear": "gYear",
        "gYearMonth": "gYearMonth",
        "hexBinary": "hexBinary",
        "int": "int",
        "integer": "integer",
        "language": "language",
        "long": "long",
        "Name": "Name",
        "NCName": "NCName",
        "NMTOKEN": "NMTOKEN",
        "negativeInteger": "negativeInteger",
        "nonNegativeInteger": "nonNegativeInteger",
        "nonPositiveInteger": "nonPositiveInteger",
        "normalizedString": "normalizedString",
        "number": "double",
        "positiveInteger": "positiveInteger",
        "QName": "QName",
        "short": "short",
        "string": "string",
        "time": "time",
        "token": "token",
        "unsignedByte": "unsignedByte",
        "unsignedInt": "unsignedInt",
        "unsignedLong": "unsignedLong",
        "unsignedShort": "unsignedShort",
        "yearMonthDuration": "yearMonthDuration",
    }.items()
}

XSD_STRING = XSD + "string"
XSD_ANYURI = XSD + "anyURI"
# COW-invented pseudo-datatype (reference csvw.py:588 `XSD.linkURI`):
# rdflib's XSD namespace happily mints it even though it's not real XSD.
XSD_LINKURI = XSD + "linkURI"
