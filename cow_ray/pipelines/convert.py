"""The flagship pipeline: pages Parquet → knowledge-graph triple store.

Ray-Data-native lifecycle (SURVEY.md §3.4)::

    rules.json + pages parquet
      → driver: parse/validate/compile rules, fingerprint inputs
      → read_parquet_with_row_ids            (deterministic _row)
      → ExtractText map_batches              (stateless; drops html)
      → derived columns (e.g. host)          (vectorized map_batches)
      → EmitTriples map_batches              (stateless, rules in closure)
      → EntityLinker map_batches             (actor pool, warm gazetteer)
        → EmitTriples over mentions          (mention rules)
      → union → dedup (hash-partitioned distinct)
      → materialize (sorted partitioned parquet + lineage + resume)

Reference counterpart: ``CSVWConverter.convert`` (``csvw.py:363-428``)
— the whole multiprocessing fan-out/fan-in is replaced by the streaming
executor; nothing here materializes the full dataset on the driver.
"""

from __future__ import annotations

from dataclasses import dataclass, field

import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq

from ..nanopub import Nanopub, escape_derivation_quads, job_hash
from ..rules import RuleDoc, parse_rules
from ..sources.parquet import _expand_paths, read_parquet_with_row_ids
from ..stages.canonicalize import dedup_triples
from ..stages.extract import ExtractText
from ..stages.linker import EntityLinker
from ..stages.materialize import materialize_triples
from ..triples import EmitTriples


def derive_host(batch: pa.Table, url_col: str = "url",
                out_col: str = "host") -> pa.Table:
    """Vectorized URL → hostname derived column."""
    h = pc.replace_substring_regex(
        batch[url_col], pattern=r"^[A-Za-z][A-Za-z0-9+.\-]*://", replacement=""
    )
    h = pc.replace_substring_regex(h, pattern=r"/.*$", replacement="")
    return batch.append_column(out_col, h)


class FusedTripleEmitter:
    """Actor-pool UDF: page-rule triples + entity linking + mention-rule
    triples in one pass over each batch (gazetteer/regex state warm in
    ``__init__``)."""

    def __init__(self, doc, mdoc, gazetteer, carry, metrics=None,
                 error_markers=False):
        self.page_emitter = EmitTriples(doc, metrics=metrics,
                                        error_markers=error_markers)
        self.mention_emitter = EmitTriples(mdoc, metrics=metrics,
                                           error_markers=error_markers)
        self.linker = EntityLinker(gazetteer, carry=carry)

    def __call__(self, batch: pa.Table) -> pa.Table:
        page_t = self.page_emitter(batch)
        mention_t = self.mention_emitter(self.linker(batch))
        return pa.concat_tables([page_t, mention_t])


@dataclass
class ConvertConfig:
    """Stage knobs.

    Batch sizes default to ``None`` = whole Ray blocks: forcing a batch
    size that straddles block boundaries makes Ray's batcher
    concatenate blocks per batch, which measured 3.5× slower than the
    entire pipeline.  Control granularity at the SOURCE (Parquet
    row-group size → block size) instead; only set a batch size when a
    stage genuinely needs smaller slices than a block (e.g. huge html
    payloads vs actor heap)."""

    batch_size: int | None = None
    extract_batch_size: int | None = None
    link_batch_size: int | None = None
    link_concurrency: int | tuple | None = None  # actor pool size
    num_parts: int = 16               # output partitions (≈ bytes/256MiB)
    shuffle: str | None = None        # store shuffle: actors|storage (see
                                      # stages.materialize)
    stage_blocks: int | None = None   # coalesce before the stage write
    collect_metrics: bool = False     # MetricsCollector actor (opt-in)
    dedup: bool = True
    resume: bool = True
    append: bool = False              # delta-ingest into a COMPLETE store
                                      # (stages.materialize.append_triples)
    derived: dict = field(default_factory=dict)  # col -> fn | (fn, [input_cols])


def convert_pages(
    paths,
    rule_doc: dict | RuleDoc,
    out_dir: str | None = None,
    *,
    gazetteer: dict | None = None,
    mention_rules: dict | RuleDoc | None = None,
    config: ConvertConfig | None = None,
):
    """Run the flagship conversion.  Returns ``(triples_dataset,
    manifests)`` — ``manifests`` is ``None`` when ``out_dir`` is None
    (the caller consumes the Dataset directly; nothing has been
    materialized)."""
    cfg = config or ConvertConfig()
    doc = rule_doc if isinstance(rule_doc, RuleDoc) else parse_rules(rule_doc)
    mdoc = None
    if mention_rules is not None:
        mdoc = (
            mention_rules
            if isinstance(mention_rules, RuleDoc)
            else parse_rules(mention_rules)
        )

    files = _expand_paths(paths)
    schema = pq.read_schema(files[0])
    available = set(schema.names)

    needed = doc.referenced_fields() & available
    has_html = "html" in available
    if has_html:
        needed |= {"html"}
    if gazetteer is not None:
        needed |= {"text"} if "text" in available or has_html else set()
        if mdoc is not None:
            needed |= mdoc.referenced_fields() & available
    derived: dict = {}
    for col, spec in cfg.derived.items():
        # a derived entry is fn or (fn, [input_cols]); its inputs must
        # survive column pruning.  Bare fns contribute 'url' (the
        # builtin host deriver's input) for back-compat.
        if isinstance(spec, tuple):
            fn, inputs = spec
            needed |= set(inputs) & available
        else:
            fn = spec
            needed |= {"url"} & available
        derived[col] = fn
    needed.discard("_row")

    metrics = None
    if cfg.collect_metrics:
        from ..state import create_metrics_collector

        metrics = create_metrics_collector()

    ds = read_parquet_with_row_ids(files, columns=sorted(needed))

    if has_html:
        ds = ds.map_batches(
            ExtractText(), batch_format="pyarrow",
            batch_size=cfg.extract_batch_size,
        )
    for col, fn in derived.items():
        ds = ds.map_batches(fn, batch_format="pyarrow", batch_size=cfg.batch_size)

    # subject-attributed error/skip markers only matter when a store is
    # being materialized (finish_part strips + counts them per
    # partition); a plain Dataset return must stay marker-free
    markers = out_dir is not None

    if gazetteer is not None and mdoc is not None:
        # FUSED single pass: page triples + (link → mention triples) in
        # one actor-pool stage.  Two separate branches would make Ray
        # re-execute the whole read+extract lineage once per branch
        # (Datasets have no common-subexpression reuse), and the union
        # would add a second scan — measured 2× on the flagship bench.
        carry = sorted((mdoc.referenced_fields() - {"surface", "entity_id",
                                                    "begin", "end", "_row"})
                       & (needed | {"url"}))
        if cfg.link_concurrency is None:
            # cheap state (small gazetteer): stateless tasks — the
            # instance pickles per task in ~ms and avoids actor-pool
            # ramp-up lag (measured 2× on the flagship).  For a big
            # gazetteer/embedding index, set link_concurrency to get an
            # actor pool and pass a ray.put handle as the gazetteer.
            fused = FusedTripleEmitter(doc, mdoc, gazetteer, carry,
                                       metrics=metrics, error_markers=markers)

            def emit_fused(batch: pa.Table) -> pa.Table:
                return fused(batch)

            triples = ds.map_batches(
                emit_fused, batch_format="pyarrow",
                batch_size=cfg.link_batch_size,
            )
        else:
            triples = ds.map_batches(
                FusedTripleEmitter,
                fn_constructor_kwargs={
                    "doc": doc, "mdoc": mdoc, "gazetteer": gazetteer,
                    "carry": carry, "metrics": metrics,
                    "error_markers": markers,
                },
                batch_format="pyarrow",
                batch_size=cfg.link_batch_size,
                concurrency=cfg.link_concurrency,
            )
    else:
        triples = ds.map_batches(
            EmitTriples(doc, metrics=metrics, error_markers=markers),
            batch_format="pyarrow",
            batch_size=cfg.batch_size,
        )

    if out_dir is None:
        if cfg.dedup:
            triples = dedup_triples(triples, num_parts=cfg.num_parts)
        return triples, None

    # when materializing, dedup fuses into the store's subject-hash
    # shuffle — one all-to-all instead of two
    jh = job_hash(doc.doc_hash, files)
    np_ = Nanopub(doc.base, doc.dataset_name, jh)
    np_.extra_quads = escape_derivation_quads(np_, doc.escape_derivations)
    if cfg.append:
        from ..stages.materialize import append_triples, read_triple_store

        # the store keeps its original job id; only touched
        # partitions rewrite (delta cost, not store cost)
        manifests = append_triples(triples, out_dir, dedup=cfg.dedup,
                                   input_desc=";".join(files))
        return read_triple_store(out_dir), manifests
    manifests = materialize_triples(
        triples,
        out_dir,
        num_parts=cfg.num_parts,
        job=jh,
        nanopub=np_,
        resume=cfg.resume,
        dedup=cfg.dedup,
        stage_blocks=cfg.stage_blocks,
        input_desc=";".join(files),
        shuffle=cfg.shuffle,
    )
    if metrics is not None:
        from ..state.metrics import fetch_stable

        counts = fetch_stable(metrics)
        import json as _json
        import os as _os

        with open(_os.path.join(out_dir, "_metrics.json"), "w") as f:
            _json.dump(counts, f)

    # the returned Dataset must contain ONLY real triples — the
    # sideband error/skip markers are a store-internal protocol
    # (counted + stripped by finish_part); a caller consuming the
    # Dataset directly must never see them
    from ..triples import MARKER_KIND

    def strip_markers(batch: pa.Table) -> pa.Table:
        return batch.filter(
            pc.invert(
                pc.fill_null(pc.equal(batch["obj_kind"], MARKER_KIND), False)
            )
        )

    return triples.map_batches(strip_markers, batch_format="pyarrow"), \
        manifests
