"""Sorted, partitioned, resumable triple-store materialization.

North rule: "sorted materialization of the triple store as partitioned
Parquet with per-partition lineage manifests and checkpoint markers
enabling exact resume".  Reference counterpart: the ordered
append-per-chunk ``.nq`` writer (``csvw.py:421-422``) — which is
neither partitioned nor resumable; this stage replaces input-order
with *determinism* (stable subject-hash partitioning + in-partition
sort), which is the property that survives distributed execution.

Layout::

    out_dir/
      part-00000/
        triples.parquet      # sorted by (subj, pred, obj_lex)
        manifest.json        # part_id, rows, content sha1, job hash
        _DONE                # atomic completion marker
      part-00001/ ...
      _provenance/quads.parquet   # nanopub + per-partition lineage
      _job.json                   # job hash, rule doc hash, num_parts
      _SUCCESS

Resume: rerunning with the same inputs/rules (same job hash) filters
out every triple whose partition already has a valid ``_DONE`` —
the shuffle only carries the unfinished remainder.  A changed job hash
refuses to resume into the same directory.

Partitioning is ``hash64(subj) % num_parts`` — all triples of one
subject co-locate (entity-locality for downstream reads), and the
in-partition ``(subj, pred, obj_lex)`` sort gives deterministic,
diff-able part files.  Each partition is materialized on one worker by
``groupby(part).map_groups`` — size ``num_parts`` so a partition fits
worker heap (≈ total triple bytes / 256 MiB).
"""

from __future__ import annotations

import hashlib
import json
import os

import pyarrow as pa
import pyarrow.parquet as pq

from ..nanopub import Nanopub, partition_lineage_quads, quads_table
from .canonicalize import TRIPLE_COLS, content_key, hash_mod

MANIFEST_SCHEMA = pa.schema(
    [
        ("part_id", pa.int32()),
        ("num_triples", pa.int64()),
        ("content_sha1", pa.string()),
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


class _WritePart:
    """map_groups UDF: one partition table → written part dir + one
    manifest row."""

    def __init__(self, out_dir: str, job: str):
        self.out_dir = out_dir
        self.job = job

    def __call__(self, group: pa.Table) -> pa.Table:
        part_id = group["__part"][0].as_py()
        table = group.drop_columns(["__part"]).sort_by(
            [("subj", "ascending"), ("pred", "ascending"), ("obj_lex", "ascending")]
        )
        key_arr = content_key(table, table.column_names)
        if isinstance(key_arr, pa.ChunkedArray):
            key_arr = key_arr.combine_chunks()
        h = hashlib.sha1()
        for buf in key_arr.cast(pa.large_string()).buffers()[1:]:
            if buf is not None:
                h.update(buf)
        sha = h.hexdigest()

        final = _part_dir(self.out_dir, part_id)
        if os.path.exists(os.path.join(final, "_DONE")):
            # resume race / rerun: already complete
            path = os.path.join(final, "triples.parquet")
        else:
            tmp = final + f".tmp-{os.getpid()}"
            os.makedirs(tmp, exist_ok=True)
            pq.write_table(table, os.path.join(tmp, "triples.parquet"))
            with open(os.path.join(tmp, "manifest.json"), "w") as f:
                json.dump(
                    {
                        "part_id": part_id,
                        "num_triples": table.num_rows,
                        "content_sha1": sha,
                        "job": self.job,
                    },
                    f,
                )
            with open(os.path.join(tmp, "_DONE"), "w") as f:
                f.write(self.job)
            if os.path.exists(final):  # concurrent winner
                import shutil

                shutil.rmtree(tmp)
            else:
                os.replace(tmp, final)
            path = os.path.join(final, "triples.parquet")

        return pa.Table.from_pylist(
            [
                {
                    "part_id": part_id,
                    "num_triples": table.num_rows,
                    "content_sha1": sha,
                    "path": path,
                }
            ],
            schema=MANIFEST_SCHEMA,
        )


def materialize_triples(
    ds,
    out_dir: str,
    *,
    num_parts: int = 64,
    job: str = "job",
    nanopub: Nanopub | None = None,
    resume: bool = True,
    input_desc: str = "",
):
    """Write the triple Dataset as a sorted partitioned store.

    Returns the manifest as a list of dicts (small — one per
    partition).  The shuffle is the ``groupby(part)`` exchange; with
    resume, finished partitions are filtered *before* it, so a restart
    moves only missing data.
    """
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
    else:
        with open(job_file, "w") as f:
            json.dump({"job": job, "num_parts": num_parts}, f)

    done = completed_parts(out_dir) if resume else set()

    def assign_part(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return batch.append_column("__part", pa.array([], type=pa.int32()))
        part = hash_mod(batch["subj"], num_parts)
        batch = batch.append_column("__part", part)
        if done:
            import pyarrow.compute as pc

            keep = pc.invert(
                pc.is_in(batch["__part"], value_set=pa.array(sorted(done),
                                                             type=pa.int32()))
            )
            batch = batch.filter(keep)
        return batch

    staged = ds.map_batches(assign_part, batch_format="pyarrow")
    writer = _WritePart(out_dir, job)

    def write_part(group: pa.Table) -> pa.Table:
        return writer(group)

    manifests = (
        staged.groupby("__part")
        .map_groups(write_part, batch_format="pyarrow")
        .take_all()
    )

    # merge with pre-existing manifests (resumed parts)
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
                    "path": os.path.join(_part_dir(out_dir, part_id),
                                         "triples.parquet"),
                }
            )
    manifests.sort(key=lambda m: m["part_id"])

    # job-level provenance partition (driver-side, small)
    if nanopub is not None:
        quads = nanopub.quads()
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
    import glob

    import ray.data

    paths = sorted(glob.glob(os.path.join(out_dir, "part-*", "triples.parquet")))
    return ray.data.read_parquet(paths)
