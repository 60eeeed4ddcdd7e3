"""Nanopublication-style provenance graphs, Arrow-native.

Re-derives the reference's 4-graph nanopublication shape
(``/root/reference/src/converter/util/__init__.py:148-247``): a default
graph holding the np index, plus assertion / provenance / pubinfo named
graphs, with graph URIs minted from
``<base><name>/<graph-kind>/<short-hash>/<version>``.

Differences, deliberate (SURVEY.md §1.2):

* the version component is derived from the **job hash** (rule-doc hash
  + input fingerprint) instead of a wall-clock minute — provenance URIs
  are then deterministic, which is what makes exact resume and golden
  tests possible; pass ``version=`` to override (e.g. a real
  timestamp).
* quads are plain Arrow rows ``(graph, subj, pred, obj_lex, obj_kind,
  obj_datatype, obj_lang)``, not an rdflib store; serialization to
  N-Quads happens only at the edge (``cow_ray.stages.nq``).
"""

from __future__ import annotations

import hashlib

import pyarrow as pa

from .namespaces import DC, NP, PROV, XSD
from .oracle import KIND_IRI, KIND_LITERAL
from .triples import TRIPLE_SCHEMA

QUAD_SCHEMA = pa.schema([("graph", pa.string())] + list(TRIPLE_SCHEMA))


def file_fingerprint(path: str) -> str:
    """Git-blob-style sha1 of a file (reference
    ``open_file_then_apply_git_hash``, ``util/__init__.py:64-83``)."""
    import os

    h = hashlib.sha1()
    size = os.path.getsize(path)
    h.update(f"blob {size}\0".encode())
    with open(path, "rb") as f:
        for chunk in iter(lambda: f.read(1 << 20), b""):
            h.update(chunk)
    return h.hexdigest()


def job_hash(rule_doc_hash: str, input_paths: list[str]) -> str:
    """Deterministic job identity: rule doc + input file identities
    (path + size + mtime_ns; cheap — no data read).  mtime catches
    same-size content edits, so a resume against modified inputs
    REFUSES (job-hash mismatch) instead of silently serving stale
    partitions; use :func:`file_fingerprint` when content-hash
    certainty is worth a full read."""
    import os

    h = hashlib.sha1()
    h.update(rule_doc_hash.encode())
    for p in sorted(input_paths):
        h.update(p.encode())
        try:
            st = os.stat(p)
            h.update(str(st.st_size).encode())
            h.update(str(st.st_mtime_ns).encode())
        except OSError:
            pass
    return h.hexdigest()


class Nanopub:
    """Computes the graph URIs and the fixed quads of one
    nanopublication."""

    def __init__(self, base: str, name: str, source_hash: str,
                 version: str | None = None):
        self.base = base
        self.name = name
        self.source_hash = source_hash
        short = source_hash[:8]
        self.version = version or source_hash[8:16]
        part = f"{short}/{self.version}"
        self.uri = f"{base}{name}/nanopublication/{part}"
        self.assertion_graph = f"{base}{name}/assertion/{part}"
        self.provenance_graph = f"{base}{name}/provenance/{part}"
        self.pubinfo_graph = f"{base}{name}/pubinfo/{part}"
        self.default_graph = f"{base}{name}/np-index/{part}"
        self.dataset_version_uri = f"{base}{source_hash}"

    def quads(self, generator_uri: str = "https://github.com/ray-project/ray",
              source_path: str | None = None) -> list[tuple]:
        """The fixed nanopub skeleton (reference ``Nanopublication.__init__``
        quads, ``util/__init__.py:186-247``)."""
        g0, ag, pg, pig = (self.default_graph, self.assertion_graph,
                           self.provenance_graph, self.pubinfo_graph)
        rdf_type = "http://www.w3.org/1999/02/22-rdf-syntax-ns#type"

        def iri(g, s, p, o):
            return (g, s, p, o, KIND_IRI, None, None)

        def lit(g, s, p, o, dt=None):
            return (g, s, p, o, KIND_LITERAL, dt, None)

        q = [
            iri(g0, self.uri, rdf_type, NP + "Nanopublication"),
            iri(g0, self.uri, NP + "hasAssertion", ag),
            iri(g0, ag, rdf_type, NP + "Assertion"),
            iri(g0, self.uri, NP + "hasProvenance", pg),
            iri(g0, pg, rdf_type, NP + "Provenance"),
            iri(g0, self.uri, NP + "hasPublicationInfo", pig),
            iri(g0, pig, rdf_type, NP + "PublicationInfo"),
            lit(g0, self.dataset_version_uri, self.base + "vocab/sha1_hash",
                self.source_hash, XSD + "string"),
            iri(pg, ag, PROV + "wasDerivedFrom", self.dataset_version_uri),
            lit(pg, ag, PROV + "generatedAtTime", self.version, XSD + "string"),
            iri(pig, self.uri, PROV + "wasGeneratedBy", generator_uri),
            lit(pig, self.uri, PROV + "generatedAtTime", self.version,
                XSD + "string"),
        ]
        if source_path is not None:
            q.append(lit(g0, self.dataset_version_uri, self.base + "vocab/path",
                         source_path, XSD + "string"))
        return q


def escape_derivation_quads(np_: Nanopub, derivations) -> list[tuple]:
    """Reference ``convert_info`` derivation pairs (``csvw.py:341-343``):
    (escaped IRI, prov:wasDerivedFrom, "original string"^^xsd:string)
    in the provenance graph."""
    g = np_.provenance_graph
    return [
        (g, escaped, PROV + "wasDerivedFrom", original, KIND_LITERAL,
         XSD + "string", None)
        for escaped, original in derivations
    ]


def partition_lineage_quads(
    np_: Nanopub, part_id: int, num_triples: int, content_sha1: str,
    input_desc: str,
) -> list[tuple]:
    """Per-partition lineage manifest as RDF (north rule:
    "per-partition lineage manifests"): every output partition is a
    prov:Entity derived from the job's assertion graph and its input
    slice."""
    part_uri = f"{np_.assertion_graph}/part/{part_id:05d}"
    v = np_.base + "vocab/"
    rdf_type = "http://www.w3.org/1999/02/22-rdf-syntax-ns#type"
    g = np_.provenance_graph
    return [
        (g, part_uri, rdf_type, PROV + "Entity", KIND_IRI, None, None),
        (g, part_uri, PROV + "wasDerivedFrom", np_.dataset_version_uri,
         KIND_IRI, None, None),
        (g, part_uri, DC + "isPartOf", np_.assertion_graph, KIND_IRI, None, None),
        (g, part_uri, v + "tripleCount", str(num_triples), KIND_LITERAL,
         XSD + "integer", None),
        (g, part_uri, v + "contentSha1", content_sha1, KIND_LITERAL,
         XSD + "string", None),
        (g, part_uri, v + "inputSlice", input_desc, KIND_LITERAL,
         XSD + "string", None),
    ]


def quads_table(quads: list[tuple]) -> pa.Table:
    cols = list(zip(*quads)) if quads else [[] for _ in QUAD_SCHEMA]
    return pa.Table.from_arrays(
        [pa.array(list(c), type=f.type) for c, f in zip(cols, QUAD_SCHEMA)],
        schema=QUAD_SCHEMA,
    )
