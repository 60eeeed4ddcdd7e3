"""Deterministic sequence packing — bin documents into fixed
token-budget training examples.

The packing step of LLM data pipelines (Raffel et al. 2020 §2.2 pack
multiple short sequences per example; GPT training concatenates to the
context length): given a token budget B, group documents into packs
whose token totals stay ≤ B, minimizing padding waste.  Bin packing is
NP-hard; the standard practical answer is FIRST-FIT-DECREASING (FFD,
≤ 11/9·OPT + 6/9 bins — Dósa 2007, public literature), which is what
this implements per partition.

Scale shape: ONE keyed exchange.  Token counts are computed map-side
with the oracled BPE proxy counter (``ops/textstats.BPE_RE``) — the
text itself never crosses the wire, only (id, n_tokens).  Docs
hash-partition by id; each partition runs FFD over its own docs
(vectorized sort, per-doc heap loop bounded by partition size), so
pack quality is per-partition-FFD — the distributed trade: a global
FFD would need a global sort of all token counts.  Pack ids embed the
partition (``part << 40 | local``), disjoint by construction.

Determinism: FFD over (n_tokens DESC, doc_id ASC) with first-fit over
bins in creation order — byte-stable across runs and cluster sizes
(the partition of a doc depends only on its id).

A document alone exceeding the budget gets its own oversized pack
(flagged) — chunk upstream (``ops/scrub.chunk_documents``) if that is
not acceptable.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from .graph import _hash_part
from .textstats import BPE_RE

_PACKED_SCHEMA = pa.schema(
    [("doc_id", pa.int64()), ("n_tokens", pa.int64()),
     ("pack_id", pa.int64()), ("pack_tokens", pa.int64()),
     ("pack_docs", pa.int32()), ("oversized", pa.int8())]
)


def pack_sequences(ds, *, budget: int = 2048, num_parts: int = 16,
                   id_col: str = "doc_id", text_col: str = "text"):
    """documents → one row per doc with its assigned pack:
    ``(doc_id, n_tokens, pack_id, pack_tokens, pack_docs, oversized)``.
    See module docstring for the FFD / determinism / scale contract."""
    if budget <= 0:
        raise ValueError(f"budget must be positive, got {budget}")

    def count_tokens(batch: pa.Table) -> pa.Table:
        ids = batch[id_col].to_numpy(zero_copy_only=False).astype(np.int64)
        n = pc.cast(pc.count_substring_regex(
            pc.fill_null(batch[text_col], ""), BPE_RE), pa.int64())
        return pa.table(
            {"__part": pa.array(_hash_part(ids, num_parts)),
             "doc_id": pa.array(ids),
             "n_tokens": n})

    def ffd(group: pa.Table) -> pa.Table:
        if group.num_rows == 0:
            return _PACKED_SCHEMA.empty_table()
        part = int(group["__part"][0].as_py())
        ids = group["doc_id"].to_numpy(zero_copy_only=False)
        toks = group["n_tokens"].to_numpy(zero_copy_only=False)
        order = np.lexsort((ids, -toks))  # tokens DESC, id ASC
        ids, toks = ids[order], toks[order]
        # first-fit over bins in creation order; bins are scanned via a
        # "first bin with enough room" linear probe kept short by the
        # decreasing order (classic FFD behaviour)
        bin_room: list[int] = []
        assign = np.empty(len(ids), dtype=np.int64)
        for i, t in enumerate(toks):
            t = int(t)
            for b, room in enumerate(bin_room):
                if room >= t:
                    assign[i] = b
                    bin_room[b] = room - t
                    break
            else:
                assign[i] = len(bin_room)
                bin_room.append(max(budget - t, 0))
        n_bins = len(bin_room)
        pack_tokens = np.zeros(n_bins, dtype=np.int64)
        pack_docs = np.zeros(n_bins, dtype=np.int32)
        np.add.at(pack_tokens, assign, toks)
        np.add.at(pack_docs, assign, 1)
        base = np.int64(part) << np.int64(40)
        return pa.table(
            {"doc_id": pa.array(ids),
             "n_tokens": pa.array(toks.astype(np.int64)),
             "pack_id": pa.array(base + assign),
             "pack_tokens": pa.array(pack_tokens[assign]),
             "pack_docs": pa.array(pack_docs[assign]),
             "oversized": pa.array(
                 (pack_tokens[assign] > budget).astype(np.int8))})

    counted = ds.map_batches(count_tokens, batch_format="pyarrow")
    return counted.groupby("__part").map_groups(ffd,
                                                batch_format="pyarrow")
