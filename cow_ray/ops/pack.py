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
(vectorized sort, then a max-segment-tree first-fit — O(n log n), not
the naive O(n²) bin probe), so pack quality is per-partition-FFD —
the distributed trade: a global FFD would need a global sort of all
token counts.  Pack ids embed the
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
        # first-fit over bins in creation order via a max-segment-tree
        # on per-bin room: "leftmost leaf with room >= t" descends in
        # O(log n), so a partition packs in O(n log n) — a linear bin
        # probe is O(n^2) on packing-hostile inputs and does not
        # survive data-sized partitions
        n = len(ids)
        size = 1
        while size < max(n, 1):
            size <<= 1
        tree = np.zeros(2 * size, dtype=np.int64)  # max room/subtree
        assign = np.empty(n, dtype=np.int64)
        n_bins = 0
        for i in range(n):
            t = int(toks[i])
            # n_bins guard: a 0-token doc must not descend into an
            # unopened leaf (room 0 "fits" it) before any bin exists
            if n_bins > 0 and tree[1] >= t:
                node = 1
                while node < size:  # leftmost child with room >= t
                    node = 2 * node if tree[2 * node] >= t \
                        else 2 * node + 1
                b = node - size
                room = tree[node] - t
            else:
                b = n_bins
                n_bins += 1
                node = size + b
                room = max(budget - t, 0)  # oversized doc → own pack
            assign[i] = b
            tree[node] = room
            node >>= 1
            while node:
                tree[node] = max(tree[2 * node], tree[2 * node + 1])
                node >>= 1
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
