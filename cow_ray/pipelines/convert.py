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

from ..nanopub import Nanopub, job_hash
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


@dataclass
class ConvertConfig:
    batch_size: int = 4096
    extract_batch_size: int = 512     # html rows are wide — small batches
    link_batch_size: int = 2048
    link_concurrency: int | tuple | None = None  # actor pool size
    num_parts: int = 16               # output partitions (≈ bytes/256MiB)
    dedup: bool = True
    resume: bool = True
    derived: dict = field(default_factory=dict)  # col -> batch fn


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
    for col, fn in cfg.derived.items():
        # a derived column's inputs must be read; conservatively keep
        # url for the builtin host deriver
        needed |= {"url"} & available
    needed.discard("_row")

    ds = read_parquet_with_row_ids(files, columns=sorted(needed))

    if has_html:
        ds = ds.map_batches(
            ExtractText(), batch_format="pyarrow",
            batch_size=cfg.extract_batch_size,
        )
    for col, fn in cfg.derived.items():
        ds = ds.map_batches(fn, batch_format="pyarrow", batch_size=cfg.batch_size)

    page_triples = ds.map_batches(
        EmitTriples(doc), batch_format="pyarrow", batch_size=cfg.batch_size
    )

    triples = page_triples
    if gazetteer is not None and mdoc is not None:
        carry = sorted((mdoc.referenced_fields() - {"surface", "entity_id",
                                                    "begin", "end", "_row"})
                       & (needed | {"url"}))
        mentions = ds.map_batches(
            EntityLinker(gazetteer, carry=carry),
            batch_format="pyarrow",
            batch_size=cfg.link_batch_size,
            concurrency=cfg.link_concurrency,
        )
        mention_triples = mentions.map_batches(
            EmitTriples(mdoc), batch_format="pyarrow", batch_size=cfg.batch_size
        )
        triples = triples.union(mention_triples)

    if cfg.dedup:
        triples = dedup_triples(triples, num_parts=cfg.num_parts)

    if out_dir is None:
        return triples, None

    jh = job_hash(doc.doc_hash, files)
    np_ = Nanopub(doc.base, doc.dataset_name, jh)
    manifests = materialize_triples(
        triples,
        out_dir,
        num_parts=cfg.num_parts,
        job=jh,
        nanopub=np_,
        resume=cfg.resume,
        input_desc=";".join(files),
    )
    return triples, manifests
