"""owl:sameAs entity-merge canonicalization — the entity-resolution
step of KG construction (Hogan et al., "Knowledge Graphs", 2021 §3.3
canonicalization; every production KG pipeline folds sameAs cliques
into one canonical node so downstream queries see a single entity).

Semantics: the sameAs relation's transitive-symmetric closure
partitions the mentioned IRIs into cliques; every triple's subject —
and IRI-kind object — rewrites to its clique's canonical member (the
LEXICOGRAPHICALLY SMALLEST IRI: deterministic, mirrorable by SQL
``least``/``min``); the sameAs triples themselves are dropped from
the output (their information is now the rewrite).

Scale shape:

* the CORPUS never shuffles: one filtered scan extracts the sameAs
  edge list, one broadcast-lookup scan rewrites;
* the closure runs on the (small) alias graph only: edge IRIs are
  dictionary-encoded driver-side into dense ranks of the SORTED
  distinct-IRI array (bounded by ``max_entities`` with a loud error —
  alias tables are millions of rows when corpora are billions), so
  ``ops/graph.connected_components``'s min-label convergence IS
  lexicographic-min-IRI convergence (rank order = byte order);
* the rank→canonical-IRI map broadcasts once via ``ray.put``;
  rewrite is two ``np.searchsorted`` probes per batch.

IRI comparison is Python codepoint order == DuckDB byte order for
ASCII IRIs (the usual case); non-ASCII IRIs compare differently only
beyond the BMP-boundary cases the oracle fixture pins.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

OWL_SAMEAS = "http://www.w3.org/2002/07/owl#sameAs"


def _lookup(values: pa.Array, keys: np.ndarray,
            repl: np.ndarray) -> pa.Array:
    """Vectorized string→string map: values found in the sorted
    ``keys`` array become ``repl`` at the same position, others —
    including nulls — pass through unchanged."""
    v = values.to_numpy(zero_copy_only=False)
    if len(keys) == 0 or len(v) == 0:
        return values
    nn = np.fromiter((x is not None for x in v), dtype=bool,
                     count=len(v))
    out = v.copy()
    if nn.any():
        vv = v[nn]
        pos = np.minimum(np.searchsorted(keys, vv), len(keys) - 1)
        hit = keys[pos] == vv
        out[nn] = np.where(hit, repl[pos], vv)
    return pa.array(out.tolist(), type=pa.string())


def merge_sameas(triples, sameas_pred: str = OWL_SAMEAS,
                 num_partitions: int = 16,
                 max_entities: int = 5_000_000):
    """Rewrite ``triples`` (columns ``subj, pred, obj_lex, obj_kind``;
    extra columns pass through) through the sameAs closure.  Returns
    the rewritten Dataset with the sameAs triples removed."""
    import ray

    from .graph import connected_components

    def edge_scan(batch: pa.Table) -> pa.Table:
        m = pc.fill_null(pc.equal(batch["pred"], sameas_pred), False)
        t = batch.filter(m)
        return pa.table({"a": t["subj"].cast(pa.string()),
                         "b": t["obj_lex"].cast(pa.string())})

    # alias graph is small by contract — bounded driver pull
    edge_tabs = []
    n_rows = 0
    for b in (triples.map_batches(edge_scan, batch_format="pyarrow")
              .iter_batches(batch_format="pyarrow", batch_size=None)):
        n_rows += b.num_rows
        if n_rows > max_entities:
            raise ValueError(
                f"merge_sameas: >{max_entities} sameAs edges — raise "
                "max_entities or pre-aggregate the alias table")
        if b.num_rows:
            edge_tabs.append(b)
    if not edge_tabs:
        return triples  # no aliases: identity
    edges = pa.concat_tables(edge_tabs)
    iris = np.unique(np.concatenate([
        edges["a"].to_numpy(zero_copy_only=False),
        edges["b"].to_numpy(zero_copy_only=False)]))
    if len(iris) > max_entities:
        raise ValueError(
            f"merge_sameas: >{max_entities} distinct alias IRIs")
    ra = np.searchsorted(iris, edges["a"].to_numpy(zero_copy_only=False))
    rb = np.searchsorted(iris, edges["b"].to_numpy(zero_copy_only=False))

    edge_ds = ray.data.from_arrow(pa.table(
        {"id_a": pa.array(ra.astype(np.int64)),
         "id_b": pa.array(rb.astype(np.int64))}))
    comp = connected_components(edge_ds, num_partitions=num_partitions)
    # bounded pull: one row per alias IRI; component label is the
    # min rank == lexicographically smallest IRI of the clique
    node_arrs = []
    label_arrs = []
    for b in comp.iter_batches(batch_format="pyarrow", batch_size=None):
        node_arrs.append(b["node"].to_numpy(zero_copy_only=False))
        label_arrs.append(b["component"].to_numpy(zero_copy_only=False))
    canon = iris.copy()
    if node_arrs:  # all-self-loop alias graphs yield no components
        node = np.concatenate(node_arrs)
        label = np.concatenate(label_arrs)
        canon[node] = iris[label]
    handle = ray.put((iris, canon))

    def rewrite(batch: pa.Table) -> pa.Table:
        keys, repl = ray.get(handle)
        keep = pc.invert(pc.fill_null(
            pc.equal(batch["pred"], sameas_pred), False))
        t = batch.filter(keep)
        subj = _lookup(t["subj"].combine_chunks()
                       if isinstance(t["subj"], pa.ChunkedArray)
                       else t["subj"], keys, repl)
        obj = t["obj_lex"]
        if isinstance(obj, pa.ChunkedArray):
            obj = obj.combine_chunks()
        if pa.types.is_null(obj.type):  # all-null block
            obj = obj.cast(pa.string())
        is_iri = pc.fill_null(pc.equal(t["obj_kind"], "iri"), False)
        mapped = _lookup(obj, keys, repl)
        obj_out = pc.if_else(is_iri, mapped, obj)
        out = t.set_column(t.schema.get_field_index("subj"), "subj",
                           subj)
        return out.set_column(out.schema.get_field_index("obj_lex"),
                              "obj_lex", obj_out.cast(pa.string()))

    return triples.map_batches(rewrite, batch_format="pyarrow")
