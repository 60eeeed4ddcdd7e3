"""Sequence packing (ops/pack.py): FFD invariants, determinism,
oversized handling, partition-disjoint pack ids."""

import numpy as np
import pyarrow as pa
import pytest

from cow_ray.ops.pack import pack_sequences


def docs_of(sizes):
    # all-letter words → exactly 1 BPE pre-token per word, so
    # n_tokens == sizes[i] (letter/digit alternation would split)
    return [{"doc_id": i, "text": " ".join(
        chr(97 + j % 26) * (j % 5 + 1) for j in range(s))}
        for i, s in enumerate(sizes)]


class TestPackSequences:
    def _run(self, ray_session, sizes, budget, num_parts=4):
        import ray.data

        ds = ray.data.from_items(docs_of(sizes))
        return pack_sequences(ds, budget=budget,
                              num_parts=num_parts).take_all()

    def test_every_doc_packed_once_and_budget_respected(self,
                                                        ray_session):
        sizes = [10, 20, 30, 5, 7, 50, 3, 60, 2, 40, 25, 15]
        rows = self._run(ray_session, sizes, budget=64)
        assert sorted(r["doc_id"] for r in rows) == list(range(len(sizes)))
        packs = {}
        for r in rows:
            packs.setdefault(r["pack_id"], []).append(r)
        for pid, members in packs.items():
            total = sum(m["n_tokens"] for m in members)
            assert all(m["pack_tokens"] == total for m in members)
            assert all(m["pack_docs"] == len(members) for m in members)
            if len(members) > 1:
                assert total <= 64  # only singleton packs may overflow
            for m in members:
                assert m["oversized"] == (1 if total > 64 else 0)

    def test_oversized_doc_gets_own_flagged_pack(self, ray_session):
        rows = self._run(ray_session, [100, 4, 4], budget=16)
        big = next(r for r in rows if r["doc_id"] == 0)
        assert big["oversized"] == 1 and big["pack_docs"] == 1
        assert all(r["oversized"] == 0 for r in rows if r["doc_id"] != 0)

    def test_deterministic_across_runs(self, ray_session):
        sizes = list(range(1, 40))
        a = sorted(map(tuple, (
            (r["doc_id"], r["pack_id"], r["pack_tokens"])
            for r in self._run(ray_session, sizes, budget=48))))
        b = sorted(map(tuple, (
            (r["doc_id"], r["pack_id"], r["pack_tokens"])
            for r in self._run(ray_session, sizes, budget=48))))
        assert a == b

    def test_pack_ids_disjoint_across_partitions(self, ray_session):
        rows = self._run(ray_session, [8] * 50, budget=24, num_parts=8)
        by_pack = {}
        for r in rows:
            by_pack.setdefault(r["pack_id"], set()).add(
                r["pack_id"] >> 40)
        # a pack id encodes exactly one partition
        assert all(len(p) == 1 for p in by_pack.values())

    def test_ffd_quality_vs_naive(self, ray_session):
        """FFD in ONE partition must not use more bins than the
        11/9·OPT+1 bound for a crafted case."""
        sizes = [30, 30, 30, 18, 18, 18, 10, 10, 10, 10]
        rows = self._run(ray_session, sizes, budget=60, num_parts=1)
        n_bins = len({r["pack_id"] for r in rows})
        opt = int(np.ceil(sum(sizes) / 60))
        assert n_bins <= int(np.ceil(11 / 9 * opt)) + 1

    def test_segment_tree_matches_naive_ffd(self, ray_session):
        """The O(n log n) segment-tree first-fit must produce the
        EXACT assignment of the textbook linear-probe FFD."""
        rng = np.random.default_rng(5)
        sizes = rng.integers(1, 40, size=120).tolist() + [0, 0]
        budget = 48
        rows = self._run(ray_session, sizes, budget=budget, num_parts=1)
        got = {r["doc_id"]: r["pack_id"] & ((1 << 40) - 1) for r in rows}
        # naive reference FFD over (tokens DESC, id ASC)
        order = sorted(range(len(sizes)), key=lambda i: (-sizes[i], i))
        room, want = [], {}
        for i in order:
            t = sizes[i]
            for b in range(len(room)):
                if room[b] >= t:
                    want[i] = b
                    room[b] -= t
                    break
            else:
                want[i] = len(room)
                room.append(max(budget - t, 0))
        assert got == want

    def test_budget_validation(self, ray_session):
        import ray.data

        with pytest.raises(ValueError, match="budget"):
            pack_sequences(ray.data.from_items(docs_of([3])), budget=0)
