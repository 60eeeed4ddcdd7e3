"""cow_ray — a Ray-Data-native knowledge-graph construction engine.

From-scratch re-expression of the semantics of the CLARIAH/COW CSVW
CSV→RDF converter (see /root/reference and SURVEY.md) as a streaming
``ray.data.Dataset`` pipeline over zero-copy Arrow batches:

* declarative JSON mapping-rule documents (CSVW-equivalent: URI/value
  templates, null semantics, datatype/language-tag handling, SKOS
  expansion) compiled once on the driver (``cow_ray.rules``),
* vectorized triple emission via ``map_batches`` (``cow_ray.triples``),
* HTML→text extraction + entity linking actor-pool stages
  (``cow_ray.stages``),
* salted groupby canonicalization + exact dedup shuffles
  (``cow_ray.stages.canonicalize``),
* sorted partitioned-Parquet triple-store materialization with
  per-partition nanopublication-style lineage manifests and resume
  markers (``cow_ray.stages.materialize``),
* a faithful row-wise oracle of the reference semantics for golden
  testing (``cow_ray.oracle``).

No module in this package calls ``ray.init()`` — the embedding
application (bench.py, CLI, tests fixture, or the evaluation driver)
owns the Ray session.
"""

__version__ = "0.1.0"
