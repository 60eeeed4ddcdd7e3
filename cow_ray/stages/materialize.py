"""Sorted, partitioned, resumable triple-store materialization.

North rule: "sorted materialization of the triple store as partitioned
Parquet with per-partition lineage manifests and checkpoint markers
enabling exact resume".  Reference counterpart: the ordered
append-per-chunk ``.nq`` writer (``csvw.py:421-422``) — which is
neither partitioned nor resumable; this stage replaces input-order
with *determinism* (stable subject-hash partitioning + in-partition
sort), which is the property that survives distributed execution.

Execution shape — a **two-phase filesystem shuffle**, not a Ray
``groupby``:

1. *scatter*: every map task assigns ``part_id = hash64(subj) %
   num_parts`` (after a local distinct) and Ray's hive-partitioned
   ``write_parquet(..., partition_cols=["part_id"])`` appends each
   task's slice under ``_stage/part_id=N/`` — **no all-to-all
   exchange**; the object store never holds more than the in-flight
   blocks.
2. *gather*: one independent Ray task per partition reads its stage
   files, deduplicates (exact global distinct — every copy of a triple
   shares a subject, hence a partition), sorts by
   ``(subj, pred, obj_lex)``, and atomically publishes
   ``part-000NN/{triples.parquet, manifest.json, _DONE}``.

Why not ``groupby(part_id).map_groups``: Ray's sort-based shuffle on a
16-value key measured 70 s where this path takes ~6 s (400k pages,
32 cpus); on a multi-node cluster phase 1 writes to shared storage and
phase 2 reads back — the standard shuffle-through-storage pattern for
jobs larger than aggregate RAM, and it is exactly what makes resume
free: finished partitions are skipped *before* phase 1.

Layout::

    out_dir/
      part-00000/{triples.parquet, manifest.json, _DONE}
      ...
      _provenance/quads.parquet   # nanopub + per-partition lineage
      _job.json                   # job hash, num_parts
      _SUCCESS

Resume: rerunning with the same inputs/rules (same job hash) filters
finished partitions out of phase 1 and re-finishes only the missing
ones.  A different job hash refuses to write into the directory.
"""

from __future__ import annotations

import glob as _glob
import hashlib
import json
import os
import shutil

import pyarrow as pa
import pyarrow.parquet as pq

from ..nanopub import Nanopub, partition_lineage_quads, quads_table
from .canonicalize import TRIPLE_COLS, hash_mod, local_distinct

MANIFEST_SCHEMA = pa.schema(
    [
        ("part_id", pa.int32()),
        ("num_triples", pa.int64()),
        ("content_sha1", pa.string()),
        ("errors", pa.int64()),
        ("null_skips", pa.int64()),
        ("path", pa.string()),
    ]
)


def _part_dir(out_dir: str, part_id: int) -> str:
    return os.path.join(out_dir, f"part-{part_id:05d}")


def completed_parts(out_dir: str) -> set[int]:
    """Partitions with a valid _DONE marker (for resume)."""
    done: set[int] = set()
    if not os.path.isdir(out_dir):
        return done
    for name in os.listdir(out_dir):
        if name.startswith("part-") and os.path.exists(
            os.path.join(out_dir, name, "_DONE")
        ):
            try:
                done.add(int(name.split("-")[1]))
            except ValueError:
                pass
    return done


def _file_sha1(path: str) -> str:
    """Integrity hash of the published part file (deterministic: the
    parquet writer is deterministic for a given sorted table +
    library version)."""
    h = hashlib.sha1()
    with open(path, "rb") as f:
        for chunk in iter(lambda: f.read(1 << 20), b""):
            h.update(chunk)
    return h.hexdigest()


class _HashingFile:
    """File wrapper that sha1-hashes bytes as they are written, so the
    manifest hash costs zero extra passes (the gather phase is
    bandwidth-bound; a re-read of the published file was a full extra
    pass — round-1 scaling audit)."""

    def __init__(self, f):
        self._f = f
        self._h = hashlib.sha1()

    def write(self, data):
        self._h.update(data)
        return self._f.write(data)

    def hexdigest(self) -> str:
        return self._h.hexdigest()

    def __getattr__(self, name):
        return getattr(self._f, name)


def _finalize_lazy(lf, dedup: bool):
    """Shared partition-finishing kernel over a polars LazyFrame of
    triple rows (possibly including sideband error/skip markers):
    count+strip markers → optional global distinct → sort → canonical
    Arrow table.  Returns ``(table, errors, null_skips)``.

    One engine pass end-to-end — the gather side is bandwidth-bound,
    and every extra materialization of the partition costs a full DRAM
    round trip (round-1 scaling audit).  Markers are counted from a
    column-pruned side pass (obj_kind is a tiny dictionary column)."""
    import polars as pl

    from ..triples import MARKER_ERRORS, MARKER_KIND, TRIPLE_SCHEMA

    errors = null_skips = 0
    mdf = (
        lf.filter(pl.col("obj_kind") == MARKER_KIND)
        .select([pl.col("pred"),
                 pl.col("obj_datatype").cast(pl.Int64).alias("n")])
        .collect()
    )
    if mdf.height:
        total = int(mdf["n"].sum())
        errors = int(mdf.filter(pl.col("pred") == MARKER_ERRORS)["n"]
                     .sum() or 0)
        null_skips = total - errors
        lf = lf.filter(pl.col("obj_kind") != MARKER_KIND)
    if dedup:
        lf = lf.unique()
    df = lf.sort(["subj", "pred", "obj_lex"]).collect()
    return df.to_arrow().cast(TRIPLE_SCHEMA), errors, null_skips


def _publish_part(out_dir: str, part_id: int, table: pa.Table, job: str,
                  errors: int, null_skips: int,
                  replace: bool = False,
                  generation: int | None = None) -> dict:
    """Atomically publish one finished partition (tmp dir + rename);
    short-circuits to the existing manifest on a resume race.

    ``replace=True`` (the append path) REPLACES an existing partition
    instead of short-circuiting: the old directory is renamed aside
    to ``part-N.old-<pid>`` before the new one swaps in, so the live
    triples are never deleted before their replacement exists — a
    crash between the two renames leaves the backup for
    :func:`append_triples`'s recovery pass to restore."""
    final = _part_dir(out_dir, part_id)
    if not replace and os.path.exists(os.path.join(final, "_DONE")):
        with open(os.path.join(final, "manifest.json")) as f:
            m = json.load(f)
        return {
            "part_id": part_id,
            "num_triples": m["num_triples"],
            "content_sha1": m["content_sha1"],
            "errors": m.get("errors", 0),
            "null_skips": m.get("null_skips", 0),
            "path": os.path.join(final, "triples.parquet"),
        }

    tmp = final + f".tmp-{os.getpid()}"
    os.makedirs(tmp, exist_ok=True)
    with open(os.path.join(tmp, "triples.parquet"), "wb") as raw:
        hf = _HashingFile(raw)
        pq.write_table(table, hf)
    sha = hf.hexdigest()
    manifest = {
        "part_id": part_id,
        "num_triples": table.num_rows,
        "content_sha1": sha,
        "errors": errors,
        "null_skips": null_skips,
        "job": job,
    }
    if generation is not None:
        # append-generation stamp: lets a crash-resumed append tell
        # "already merged this delta" from "pre-append bytes", making
        # the error/skip-count accumulation idempotent
        manifest["generation"] = generation
    with open(os.path.join(tmp, "manifest.json"), "w") as f:
        json.dump(manifest, f)
    with open(os.path.join(tmp, "_DONE"), "w") as f:
        f.write(job)
    if replace and os.path.exists(final):
        bak = final + f".old-{os.getpid()}"
        os.replace(final, bak)
        os.replace(tmp, final)
        shutil.rmtree(bak, ignore_errors=True)
    elif os.path.exists(final):  # concurrent winner
        shutil.rmtree(tmp)
    else:
        os.replace(tmp, final)
    return {
        "part_id": part_id,
        "num_triples": table.num_rows,
        "content_sha1": sha,
        "errors": errors,
        "null_skips": null_skips,
        "path": os.path.join(final, "triples.parquet"),
    }


def finish_part(
    out_dir: str, stage_dir: str, part_id: int, job: str, dedup: bool
) -> dict:
    """Storage-shuffle phase-2 worker: stage files of one partition →
    final sorted, deduplicated, atomically-published part.  Pure
    filesystem work — runs as an independent ``ray.remote`` task (or
    inline in tests)."""
    from ..triples import TRIPLE_SCHEMA

    import time as _time

    _t0 = _time.time()
    files = sorted(
        _glob.glob(os.path.join(stage_dir, f"part_id={part_id}", "*.parquet"))
    )
    if files:
        import polars as pl

        table, errors, null_skips = _finalize_lazy(pl.scan_parquet(files),
                                                   dedup)
    else:
        table, errors, null_skips = TRIPLE_SCHEMA.empty_table(), 0, 0
    out = _publish_part(out_dir, part_id, table, job, errors, null_skips)
    if os.environ.get("GRAFT_TIMING") == "1":
        print(f"[finish_part] p{part_id} rows {table.num_rows} "
              f"{_time.time() - _t0:.2f}s files {len(files)}", flush=True)
    return out


def _ipc_compress(table: pa.Table) -> pa.Buffer:
    """Arrow table → zstd-compressed IPC stream buffer.  Compression
    happens IN THE MAP TASK (CPU, which scales with cores) so the
    shuffle moves ~5× fewer bytes (triple text compresses well) —
    moving raw string batches through the object store measured 3-5×
    slower on a DRAM-saturated box than shipping compressed buffers."""
    sink = pa.BufferOutputStream()
    opts = pa.ipc.IpcWriteOptions(compression="zstd")
    with pa.ipc.new_stream(sink, table.schema, options=opts) as w:
        w.write_table(table)
    return sink.getvalue()


def _ipc_decompress(buf: pa.Buffer) -> pa.Table:
    with pa.ipc.open_stream(buf) as r:
        return r.read_all()


class PartReducer:
    """Object-store shuffle reducer: one actor owns a contiguous range
    of output partitions.  ``append`` only *pins* the incoming
    PER-PARTITION zstd-compressed IPC slice (the buffer stays in
    plasma where the map task put it; at cluster scale Ray spills
    plasma to local disk, so the reducer never holds a partition in
    heap before its turn).  ``finalize`` processes owned partitions
    ONE AT A TIME: decompress that partition's slices, run the shared
    dedup→sort→publish kernel, release.

    Round-3 root-cause of the "actor finalize 4× slower than identical
    polars work in plain tasks" mystery: the old per-REDUCER slices
    forced decompress-all → concat-all → partition_by-all — three full
    in-memory passes over the reducer's whole share before any useful
    work, each DRAM-bound with every reducer bursting at once, while
    storage mode streams each partition once off compressed parquet.
    Per-partition slices remove all three passes and bound the working
    set at one partition.

    This replaces the storage shuffle's write+read round trip of every
    staged byte through the scratch filesystem — the round-1 scaling
    audit's #1 ask (the gather read was a second full pass over DRAM
    bandwidth that does not scale with cores)."""

    def __init__(self, out_dir: str, job: str, dedup: bool):
        self.out_dir = out_dir
        self.job = job
        self.dedup = dedup
        # part_id → pinned zstd IPC slices of that partition
        self.by_part: dict[int, list[pa.Buffer]] = {}

    def warmup(self, mb: int = 256) -> None:
        """Pre-fault allocator arenas in this FRESH actor process —
        called fire-and-forget right after creation, overlapping the
        map stage.  Finalize's burst of large allocations (decompress,
        concat, polars sort) otherwise lands on cold pages in every
        reducer at once, and concurrent first-touch page faults were
        measured to make identical polars work ~8× slower than in the
        long-lived (warm) map worker pool."""
        import numpy as np

        # touch pages through each allocator finalize will use; keep
        # this CHEAP (~0.3 s) — actor tasks are ordered, so an
        # expensive warmup would stall the first appends and the map
        # stage behind them (measured: a full polars-sort warmup moved
        # the cost into phase 1 instead of removing it)
        a = np.empty(mb << 20, dtype=np.uint8)
        a[::4096] = 1
        del a
        buf = pa.allocate_buffer(mb << 20)
        np.frombuffer(buf, dtype=np.uint8)[::4096] = 1
        del buf
        import polars as pl

        # initialize polars' allocator pools only (arena setup, not a
        # full page warm)
        pl.DataFrame({"s": ["w"] * 4096}).sort("s")

    def append(self, part_id: int, buf: pa.Buffer) -> None:
        self.by_part.setdefault(part_id, []).append(buf)

    def finalize(self, owned: list[int]) -> list[dict]:
        import time as _time

        import polars as pl

        from ..triples import TRIPLE_SCHEMA

        timing = os.environ.get("GRAFT_TIMING") == "1"
        out = []
        t_fin = t_pub = 0.0
        rows = 0
        for p in owned:
            bufs = self.by_part.pop(p, None)
            ta = _time.time()
            if not bufs:
                table, errors, skips = TRIPLE_SCHEMA.empty_table(), 0, 0
            else:
                # rechunk=False: one partition's slices sort just as
                # fast chunked, and the rechunk copy is a full DRAM
                # pass ×every reducer at once (measured slower)
                lf = pl.from_arrow(
                    pa.concat_tables(_ipc_decompress(b) for b in bufs),
                    rechunk=False,
                ).lazy()
                del bufs
                table, errors, skips = _finalize_lazy(lf, self.dedup)
                rows += table.num_rows
            tb = _time.time()
            out.append(
                _publish_part(self.out_dir, p, table, self.job, errors, skips)
            )
            t_fin += tb - ta
            t_pub += _time.time() - tb
        if timing:
            print(f"[reducer] fin {t_fin:.2f}s pub {t_pub:.2f}s "
                  f"rows {rows}", flush=True)
        return out


def materialize_triples(
    ds,
    out_dir: str,
    *,
    num_parts: int = 64,
    job: str = "job",
    nanopub: Nanopub | None = None,
    resume: bool = True,
    dedup: bool = False,
    stage_blocks: int | None = None,
    input_desc: str = "",
    shuffle: str | None = None,
):
    """Write the triple Dataset as a sorted partitioned store.  Returns
    the manifest list (one small dict per partition).

    ``shuffle``: ``"storage"`` (default; two-phase zstd-compressed
    filesystem shuffle through ``out_dir/_stage``) or ``"actors"``
    (object-store shuffle via PartReducer — see its docstring; the
    right shape when scratch storage is slow/shared).  ``None`` reads
    ``$GRAFT_SHUFFLE`` then defaults to storage."""
    import ray

    os.makedirs(out_dir, exist_ok=True)
    job_file = os.path.join(out_dir, "_job.json")
    if os.path.exists(job_file):
        with open(job_file) as f:
            prev = json.load(f)
        if prev.get("job") != job:
            raise ValueError(
                f"output dir {out_dir} belongs to job {prev.get('job')!r}, "
                f"refusing to resume as {job!r}"
            )
        # resuming with a different modulus would filter done partitions
        # against part ids computed with the new one — silent duplication
        if prev.get("num_parts") not in (None, num_parts):
            raise ValueError(
                f"output dir {out_dir} was written with num_parts="
                f"{prev['num_parts']}, refusing to resume with {num_parts}"
            )
    else:
        meta = {"job": job, "num_parts": num_parts}
        if nanopub is not None:
            meta["graphs"] = {
                "assertion": nanopub.assertion_graph,
                "provenance": nanopub.provenance_graph,
                "pubinfo": nanopub.pubinfo_graph,
                "np_index": nanopub.default_graph,
            }
        with open(job_file, "w") as f:
            json.dump(meta, f)

    done = completed_parts(out_dir) if resume else set()
    if not resume:
        # explicit rebuild: clear published partitions so finish_part
        # doesn't short-circuit on stale _DONE markers
        for name in list(os.listdir(out_dir)):
            if name.startswith("part-"):
                shutil.rmtree(os.path.join(out_dir, name), ignore_errors=True)
        for f in ("_SUCCESS",):
            try:
                os.remove(os.path.join(out_dir, f))
            except OSError:
                pass
    stage_dir = os.path.join(out_dir, "_stage")
    # stale intermediates from a crashed run must not double-count:
    # the stage dir AND any part-*.tmp-<pid> left by a finish_part that
    # crashed between populate and os.replace (its _DONE marker would
    # otherwise make the part look published)
    shutil.rmtree(stage_dir, ignore_errors=True)
    for name in list(os.listdir(out_dir)):
        if name.startswith("part-") and ".tmp-" in name:
            shutil.rmtree(os.path.join(out_dir, name), ignore_errors=True)

    def assign_part(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return batch.append_column("part_id", pa.array([], type=pa.int32()))
        if dedup:
            batch = local_distinct(batch)  # shrink phase 1 early
        batch = batch.append_column("part_id", hash_mod(batch["subj"], num_parts))
        if done:
            import pyarrow.compute as pc

            keep = pc.invert(
                pc.is_in(batch["part_id"],
                         value_set=pa.array(sorted(done), type=pa.int32()))
            )
            batch = batch.filter(keep)
        return batch

    import time as _time

    _timing = os.environ.get("GRAFT_TIMING") == "1"
    _t0 = _time.time()
    todo = [p for p in range(num_parts) if p not in done]
    if shuffle is None:
        # storage is the measured default on this box: staged bytes are
        # zstd-compressed (5×) and /dev/shm scratch is itself
        # memory-speed, so the round trip beats raw-buffer plasma
        # ingestion (actors mode measured 6-15s gather vs 1.4s at 16
        # cpus on the 2M-page flagship — DRAM bandwidth, not file IO,
        # is the scarce resource).  actors mode remains the right shape
        # when scratch is a slow shared filesystem.
        shuffle = os.environ.get("GRAFT_SHUFFLE", "storage")

    if shuffle == "actors":
        # ---- object-store shuffle (opt-in; storage is the default) ----
        # Map tasks push per-reducer slices straight into plasma-backed
        # reducer actors; no staged byte is ever written to / read back
        # from scratch storage.  The per-batch ray.get on the appends
        # is both the delivery barrier (finalize may only run after
        # every append) and natural backpressure.  Reducers take
        # num_cpus=0: they do no work during ingest (append just pins
        # the slice) and their finalize CPU burst runs after the map
        # stage has drained.  At 100-TB scale plasma spills slices to
        # local disk instead of holding them in heap memory.
        cpus = int(ray.cluster_resources().get("CPU", 4))
        n_red = max(1, min(num_parts, cpus))
        ppa = -(-num_parts // n_red)  # parts per reducer (ceil)
        Reducer = ray.remote(PartReducer)
        reducers = [
            Reducer.options(num_cpus=0).remote(out_dir, job, dedup)
            for _ in range(n_red)
        ]
        # fire-and-forget allocator warmup, overlapped with the map
        # stage (actor tasks run in order, so it completes before the
        # first append is processed)
        for r in reducers:
            r.warmup.remote()

        def scatter(batch: pa.Table) -> pa.Table:
            batch = assign_part(batch)
            n = batch.num_rows
            if n:
                import numpy as np

                pid = batch["part_id"].to_numpy(zero_copy_only=False)
                body = batch.drop_columns(["part_id"])
                refs = [
                    reducers[int(p) // ppa].append.remote(
                        int(p),
                        _ipc_compress(body.filter(pa.array(pid == p))),
                    )
                    for p in np.unique(pid)
                ]
                ray.get(refs)
            return pa.table({"rows": pa.array([n], type=pa.int64())})

        ds.map_batches(scatter, batch_format="pyarrow").count()
        _t1 = _time.time()
        if _timing:
            print(f"[materialize] phase1 scatter: {_t1 - _t0:.2f}s",
                  flush=True)
        owned = [
            [p for p in todo if p // ppa == k] for k in range(n_red)
        ]
        manifests = [
            m
            for ms in ray.get(
                [reducers[k].finalize.remote(owned[k])
                 for k in range(n_red)]
            )
            for m in ms
        ]
        for r in reducers:
            ray.kill(r)
        if _timing:
            print(f"[materialize] phase2 gather: {_time.time() - _t1:.2f}s",
                  flush=True)
    elif shuffle == "storage":
        # ---- two-phase filesystem shuffle ----
        # For partitions larger than a reducer's plasma/disk budget or
        # when the scratch tier is the durable medium: phase 1 appends
        # hive-partitioned zstd stage files (triple text compresses
        # 4-6×, and the gather read is bandwidth-bound — decompression
        # cost scales with cores, bytes moved do not); phase 2 is one
        # independent task per partition.
        staged = ds.map_batches(assign_part, batch_format="pyarrow")
        if stage_blocks is not None:
            staged = staged.repartition(stage_blocks)
        staged.write_parquet(
            stage_dir, partition_cols=["part_id"], compression="zstd"
        )
        _t1 = _time.time()
        if _timing:
            print(f"[materialize] phase1 scatter: {_t1 - _t0:.2f}s",
                  flush=True)
        finish = ray.remote(finish_part)
        manifests = list(
            ray.get(
                [finish.remote(out_dir, stage_dir, p, job, dedup)
                 for p in todo]
            )
        )
        shutil.rmtree(stage_dir, ignore_errors=True)
        if _timing:
            print(f"[materialize] phase2 gather: {_time.time() - _t1:.2f}s",
                  flush=True)
    else:
        raise ValueError(f"unknown shuffle mode {shuffle!r}")

    for part_id in sorted(done):
        mf = os.path.join(_part_dir(out_dir, part_id), "manifest.json")
        if os.path.exists(mf):
            with open(mf) as f:
                m = json.load(f)
            manifests.append(
                {
                    "part_id": m["part_id"],
                    "num_triples": m["num_triples"],
                    "content_sha1": m["content_sha1"],
                    "errors": m.get("errors", 0),
                    "null_skips": m.get("null_skips", 0),
                    "path": os.path.join(_part_dir(out_dir, part_id),
                                         "triples.parquet"),
                }
            )
    manifests.sort(key=lambda m: m["part_id"])

    # job-level provenance partition (driver-side, small)
    if nanopub is not None:
        quads = nanopub.quads()
        quads.extend(getattr(nanopub, "extra_quads", []) or [])
        for m in manifests:
            quads.extend(
                partition_lineage_quads(
                    nanopub, m["part_id"], m["num_triples"], m["content_sha1"],
                    input_desc,
                )
            )
        prov_dir = os.path.join(out_dir, "_provenance")
        os.makedirs(prov_dir, exist_ok=True)
        pq.write_table(quads_table(quads), os.path.join(prov_dir, "quads.parquet"))

    with open(os.path.join(out_dir, "_SUCCESS"), "w") as f:
        f.write(job)
    return manifests


def read_triple_store(out_dir: str):
    """Read a materialized store back as a Dataset (data partitions
    only)."""
    import ray.data

    # canonical layout only — never match a part-*.tmp-<pid> leftover.
    # NB: {part_id:05d} widens beyond 5 digits for num_parts >= 100000
    # (DESIGN.md sizes num_parts in the millions at petabyte scale), so
    # filter by exact name shape rather than a fixed-width glob.
    import re as _re

    name_ok = _re.compile(r"^part-[0-9]+$")
    paths = sorted(
        p
        for p in _glob.glob(os.path.join(out_dir, "part-*",
                                         "triples.parquet"))
        if name_ok.match(os.path.basename(os.path.dirname(p)))
    )
    return ray.data.read_parquet(paths)


def append_triples(
    ds,
    out_dir: str,
    *,
    job: str | None = None,
    dedup: bool = True,
    input_desc: str = "",
):
    """Incrementally ingest NEW triples into a COMPLETE store.

    Delta semantics: new rows are hash-scattered with the store's own
    subject modulus (read from ``_job.json``), and ONLY partitions that
    receive data are re-finalized — existing parquet + staged delta
    merge reduce-side in one polars pass per partition (optional
    ``dedup`` makes the merge a distinct-union, so re-appending the
    same shard is idempotent).  Untouched partitions keep their bytes
    and manifests.  Cost is proportional to the delta × its partition
    fan-out, never the store size.

    Equivalence contract (tested): append(A) then append(B) publishes
    byte-identical partition content to a one-shot materialize(A ∪ B)
    with ``dedup=True`` — same modulus, same sort, same distinct.

    Crash contract: an ``_append.json`` marker is written before
    ``_SUCCESS`` is removed, so an interrupted append is detectable
    AND resumable — a re-run with the marker present is accepted,
    restores any ``part-N.old-*`` backup whose replacement swap was
    interrupted (the live partition is never deleted before its
    replacement exists, see ``_publish_part(replace=True)``), skips
    partitions whose manifest already carries this append's
    generation stamp (so error/skip counters and lineage stay
    idempotent), and re-derives staging from the inputs (the
    distinct-union merge makes re-merging the rest idempotent).
    Resume therefore REQUIRES ``dedup=True``: the marker records the
    original run's dedup flag and a resume is refused when either run
    has ``dedup=False`` — partitions published before the crash
    without a generation stamp cannot be told apart from pre-append
    bytes, and a non-distinct re-merge would silently duplicate rows.
    """
    import ray

    from ..stages.canonicalize import hash_mod

    job_file = os.path.join(out_dir, "_job.json")
    append_marker = os.path.join(out_dir, "_append.json")
    success = os.path.join(out_dir, "_SUCCESS")
    resuming = (os.path.exists(append_marker)
                and not os.path.exists(success))
    if not os.path.exists(success) and not os.path.exists(append_marker):
        raise ValueError(
            f"append_triples: {out_dir} has no _SUCCESS marker — "
            "append only targets complete stores (finish or rebuild "
            "the base job first)")
    if resuming:
        with open(append_marker) as f:
            marker_meta = json.load(f)
        if not dedup or not marker_meta.get("dedup", True):
            raise ValueError(
                f"append_triples: {out_dir} holds an interrupted "
                "append and resume requires dedup=True on BOTH runs "
                f"(marker dedup={marker_meta.get('dedup', True)}, "
                f"this call dedup={dedup}) — without the distinct-"
                "union merge, partitions that published before the "
                "crash would re-merge the delta and duplicate rows. "
                "Re-run with dedup=True, or rebuild the store.")
    with open(job_file) as f:
        meta = json.load(f)
    num_parts = meta["num_parts"]
    if resuming and "generation_target" in marker_meta:
        # crash-resume MUST reuse the interrupted run's target: if the
        # crash fell between the _job.json generation bump and the
        # marker removal, recomputing from _job.json would aim one
        # generation too high, defeating the per-partition skip check
        # below and double-counting error/skip counters
        gen_target = marker_meta["generation_target"]
    else:
        gen_target = meta.get("generation", 1) + 1
    if job is None:
        job = meta["job"]
    elif job != meta["job"]:
        raise ValueError(
            f"store {out_dir} belongs to job {meta['job']!r}, refusing "
            f"to append as {job!r}")

    # recovery from an interrupted append: restore any backup whose
    # replacement swap did not complete; drop completed backups and
    # stale tmp dirs
    for name in list(os.listdir(out_dir)):
        path = os.path.join(out_dir, name)
        if name.startswith("part-") and ".old-" in name:
            final = os.path.join(out_dir, name.split(".old-", 1)[0])
            if os.path.exists(final):
                shutil.rmtree(path, ignore_errors=True)
            else:
                os.replace(path, final)
        elif name.startswith("part-") and ".tmp-" in name:
            shutil.rmtree(path, ignore_errors=True)

    with open(append_marker, "w") as f:
        json.dump({"job": job, "dedup": dedup,
                   "generation_target": gen_target},
                  f)
    if os.path.exists(success):
        os.remove(success)
    stage_dir = os.path.join(out_dir, "_stage")
    shutil.rmtree(stage_dir, ignore_errors=True)

    def assign(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return batch.append_column(
                "part_id", pa.array([], type=pa.int32()))
        if dedup:
            batch = local_distinct(batch)
        return batch.append_column(
            "part_id", hash_mod(batch["subj"], num_parts))

    (ds.map_batches(assign, batch_format="pyarrow")
       .write_parquet(stage_dir, partition_cols=["part_id"]))

    affected = sorted(
        int(name.split("=", 1)[1])
        for name in os.listdir(stage_dir)
        if name.startswith("part_id="))

    @ray.remote
    def merge_part(part_id: int) -> dict:
        import polars as pl

        from ..triples import TRIPLE_SCHEMA

        staged = sorted(_glob.glob(
            os.path.join(stage_dir, f"part_id={part_id}", "*.parquet")))
        final = _part_dir(out_dir, part_id)
        existing = os.path.join(final, "triples.parquet")
        prev_err = prev_skip = 0
        cols = TRIPLE_SCHEMA.names
        # select, not drop: write_parquet(partition_cols=...) may or
        # may not keep part_id inside the files
        scans = [pl.scan_parquet(staged).select(cols)]
        if os.path.exists(existing):
            with open(os.path.join(final, "manifest.json")) as f:
                m = json.load(f)
            if m.get("generation") == gen_target:
                # crash-resume: this partition already published this
                # append generation — skip the re-merge so its
                # error/skip counters aren't double-counted
                m["path"] = existing
                return m
            prev_err = m.get("errors", 0)
            prev_skip = m.get("null_skips", 0)
            scans.append(pl.scan_parquet(existing).select(cols))
        table, errors, null_skips = _finalize_lazy(
            pl.concat(scans, how="vertical_relaxed"), dedup)
        table = table.cast(TRIPLE_SCHEMA)
        # replace-mode publish: the old partition is renamed aside
        # (never deleted) until the new one is fully in place
        return _publish_part(out_dir, part_id, table, job,
                             prev_err + errors, prev_skip + null_skips,
                             replace=True, generation=gen_target)

    new_manifests = {m["part_id"]: m
                     for m in ray.get([merge_part.remote(p)
                                       for p in affected])}
    shutil.rmtree(stage_dir, ignore_errors=True)

    manifests = []
    for p in range(num_parts):
        if p in new_manifests:
            manifests.append(new_manifests[p])
            continue
        mf = os.path.join(_part_dir(out_dir, p), "manifest.json")
        if os.path.exists(mf):
            with open(mf) as f:
                m = json.load(f)
            m["path"] = os.path.join(_part_dir(out_dir, p),
                                     "triples.parquet")
            manifests.append(m)
    _update_provenance(out_dir, meta, new_manifests, input_desc,
                       gen_target)
    meta["generation"] = gen_target
    with open(job_file, "w") as f:
        json.dump(meta, f)
    os.remove(append_marker)
    with open(os.path.join(out_dir, "_SUCCESS"), "w") as f:
        f.write(job)
    return manifests


def _update_provenance(out_dir: str, meta: dict, new_manifests: dict,
                       input_desc: str, generation: int) -> None:
    """Surgical per-partition lineage refresh after an append: for
    every rewritten partition, the ``tripleCount`` / ``contentSha1`` /
    ``inputSlice`` literal quads are replaced with the new manifest
    values (graph URI and vocab prefix recovered from the existing
    quads — the original Nanopub is not reconstructible from
    ``_job.json`` alone).  Without this the stored lineage would
    contradict the rewritten partitions' actual hashes."""
    prov_path = os.path.join(out_dir, "_provenance", "quads.parquet")
    assertion = (meta.get("graphs") or {}).get("assertion")
    if not os.path.exists(prov_path) or not assertion or not new_manifests:
        return
    t = pq.read_table(prov_path)
    subj = t["subj"].to_pylist()
    pred = t["pred"].to_pylist()
    # vocab prefix discovery: any existing tripleCount quad
    vocab = next((p[: -len("tripleCount")] for p in pred
                  if p.endswith("tripleCount")), None)
    if vocab is None:
        return
    part_uris = {f"{assertion}/part/{p:05d}": p for p in new_manifests}
    mutable = {vocab + "tripleCount", vocab + "contentSha1",
               vocab + "inputSlice"}
    keep = [i for i in range(t.num_rows)
            if not (subj[i] in part_uris and pred[i] in mutable)]
    graph_of = {}
    old_slice = {}
    for i in range(t.num_rows):
        if subj[i] in part_uris:
            graph_of[subj[i]] = t["graph"][i].as_py()
            if pred[i] == vocab + "inputSlice":
                old_slice[subj[i]] = t["obj_lex"][i].as_py()
    kept = t.take(pa.array(keep, type=pa.int64()))
    from ..nanopub import XSD as xsd, quads_table
    from ..oracle import KIND_LITERAL
    fresh = []
    for uri, p in part_uris.items():
        m = new_manifests[p]
        g = graph_of.get(uri)
        if g is None:  # partition had no lineage rows (unexpected)
            continue
        slice_ = old_slice.get(uri, "")
        # each append generation contributes its own tagged component:
        # crash-resume of the SAME generation finds its tag and stays
        # idempotent, while a legitimate later re-append of the same
        # input (new generation, e.g. a regenerated daily delta) is
        # still recorded as a separate ingest
        if input_desc:
            tagged = f"{input_desc}@g{generation}"
            if tagged not in slice_.split(";"):
                slice_ = (slice_ + ";" + tagged) if slice_ else tagged
        fresh += [
            (g, uri, vocab + "tripleCount", str(m["num_triples"]),
             KIND_LITERAL, xsd + "integer", None),
            (g, uri, vocab + "contentSha1", m["content_sha1"],
             KIND_LITERAL, xsd + "string", None),
            (g, uri, vocab + "inputSlice", slice_,
             KIND_LITERAL, xsd + "string", None),
        ]
    out = pa.concat_tables([kept, quads_table(fresh)])
    tmp = prov_path + ".tmp"
    pq.write_table(out, tmp)
    os.replace(tmp, prov_path)
