"""Driver contract for the graft builder (Ray Data target).

Ray is initialised by the driver BEFORE this module is imported; no
``ray.init()`` / ``ray.shutdown()`` happens here or anywhere in
``cow_ray``.
"""

from __future__ import annotations

from collections.abc import Callable
from typing import Any

SF0001 = "/root/testdata/sf0.001"


def entry() -> Any:
    """Flagship pipeline on /root/testdata/sf0.001: the documents table
    as a no-html pages corpus → COW-style rule-driven triple emission +
    entity linking (actor pool, warm gazetteer) → mention triples →
    exact dedup shuffle.  Returns the deduplicated triple Dataset."""
    from cow_ray.pipelines.queries import (
        DOC_GAZETTEER,
        DOC_RULES,
        MENTION_RULES,
        _docs,
    )
    from cow_ray.rules import parse_rules
    from cow_ray.stages.canonicalize import dedup_triples
    from cow_ray.stages.linker import EntityLinker
    from cow_ray.triples import EmitTriples

    docs = _docs(SF0001)
    doc_triples = docs.map_batches(
        EmitTriples(parse_rules(DOC_RULES)), batch_format="pyarrow"
    )
    mentions = docs.map_batches(
        EntityLinker(DOC_GAZETTEER, carry=["doc_id"]),
        batch_format="pyarrow",
        batch_size=256,
        concurrency=2,
    )
    mention_triples = mentions.map_batches(
        EmitTriples(parse_rules(MENTION_RULES)), batch_format="pyarrow"
    )
    return dedup_triples(doc_triples.union(mention_triples), num_parts=8)


def queries() -> dict[str, Callable[[str], Any]]:
    """One entry per implemented operator family (SURVEY.md §2 + the
    training-data ops), DuckDB-oracled entries first.  Sized/ordered to
    the driver's ~50-entry correctness window so every entry gets a
    driver row; additional rows-only variants (ANN index flavors,
    simhash pairs, spans/packing, k-means, multimodal audio, ...) live
    in cow_ray.pipelines.queries.EXTRA_QUERIES with the identical
    fn(sf_dir) contract, exercised by tests/ and tools/check_queries.py.
    See cow_ray/pipelines/queries.py for the implementations and the
    cross-engine float discipline."""
    from cow_ray.pipelines.queries import QUERIES

    return dict(QUERIES)


def oracle_sql() -> dict[str, str]:
    """DuckDB-equivalent SQL for every SQL-expressible query (identical
    column names/semantics).  Keys absent here (linker mentions,
    minhash/simhash signatures + their candidate/verified pair sets,
    rolling fp, LSH/IVF/IVF-PQ ANN, langid, multimodal image/audio,
    HLL sketch, bigram entropy, near-dup curation, winnowing dup
    spans + span removal, FFD sequence packing, unigram-LM
    perplexity (its integer-nano NLL core doc_nll IS oracled),
    containment verify, iterative k-means + SemDeDup) are genuinely
    non-SQL-expressible or not hash-stable cross-engine (float
    log-sums) → rows-only check.  Note connected components IS oracled
    (recursive CTE), as are the Gopher/C4/BPE text-quality signals
    (exact integer ppm arithmetic; shared RE2 engine), benchmark
    n-gram decontamination (list-lateral gram join), BM25 retrieval
    (integer-nano score accumulation), URL normalization / domain
    stats (shared RE2 semantics), and fixed-iteration PageRank
    (integer ranks, unrolled CTE layers)."""
    from cow_ray.pipelines.queries import ORACLES, QUERIES

    # ORACLES also covers oracled EXTRA_QUERIES entries (e.g. the
    # exact substring-dedup audit pass) that sit outside the driver's
    # ~50-entry window — tools/check_queries.py hash-verifies those;
    # the driver contract is keys(oracle_sql()) ⊆ keys(queries())
    return {k: v for k, v in ORACLES.items() if k in QUERIES}
