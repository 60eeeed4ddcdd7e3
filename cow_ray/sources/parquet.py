"""Parquet source with deterministic global row ids.

The reference derives its ``_row`` pseudo-column from
``chunk_index * chunksize + offset`` under an *ordered* ``pool.imap``
(``/root/reference/src/converter/csvw.py:489,507``).  Ray Data executes
blocks in arbitrary order, so the row id must come from immutable input
metadata instead (SURVEY.md §2.8): we plan read tasks on the driver
from footer metadata only, carrying ``(path, row_group, start,
row_start)``, and each task attaches ``_row = row_start +
arange(num_rows)`` when it reads its slice.

Row-group splitting (round 4): a single giant row group used to become
a single read task, which serialized not just the decode but every
*fused downstream map* behind it (observed: the sf0.1 lineitem file is
one 600k-row group — decode is 0.12 s but the fused query chain ran
serially for seconds).  Oversized row groups are now split into row
sub-ranges; each sub-task streams the group via ``iter_batches`` and
keeps only its window.  Cost model, measured and documented:

* parquet can't seek below a page without a page index, so a sub-task
  covering rows ``[s, e)`` decodes ``[0, e)`` and discards the prefix —
  K splits cost ~(K+1)/2 redundant decode *CPU*, spread across K
  parallel tasks, in exchange for K× parallelism of the (usually far
  heavier) fused downstream compute.  At sf0.1 the whole-group decode
  is ~0.1 s, so the waste is milliseconds.
* at 100 TB with sane 100 MB–1 GB row groups nothing splits (the
  auto threshold is per-task row count); the splitter exists for the
  pathological single-giant-row-group input a real user will
  eventually feed us.
* ``_row`` ids depend only on (sorted file list × row-group order ×
  row offset) — NEVER on the split factor — so checkpoint-resume and
  determinism are unaffected by how many CPUs planned the read.

Scale notes:
* parallelism = number of (possibly split) row groups — at 100 TB that
  is O(100k) tasks of ~100 MB each, exactly the granularity Ray's
  streaming executor wants; the driver-side plan is footer reads only.
* ``columns=`` prunes at the read (only requested columns leave
  storage).
"""

from __future__ import annotations

import glob
import os

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq


def _expand_paths(paths: str | list[str]) -> list[str]:
    if isinstance(paths, str):
        paths = [paths]
    out: list[str] = []
    for p in paths:
        if os.path.isdir(p):
            out.extend(sorted(glob.glob(os.path.join(p, "*.parquet"))))
        elif any(ch in p for ch in "*?["):
            out.extend(sorted(glob.glob(p)))
        else:
            out.append(p)
    return sorted(dict.fromkeys(out))


def _auto_rows_per_task(total_rows: int, n_groups: int) -> int:
    """Pick the per-task row cap when the caller didn't: aim for ~2
    tasks per CPU across the whole plan, floored at 32k rows so tiny
    inputs don't shatter into confetti blocks."""
    try:
        import ray

        cpus = int(ray.cluster_resources().get("CPU", 0)) if ray.is_initialized() else 0
    except Exception:  # pragma: no cover - ray import/cluster edge
        cpus = 0
    cpus = cpus or os.cpu_count() or 8
    target_tasks = max(2 * cpus, n_groups)
    return max(32_768, -(-total_rows // target_tasks))


def plan_row_groups(
    paths: str | list[str], max_rows_per_task: int | None = None
) -> list[dict]:
    """Driver-side read plan (footer metadata only): one entry per row
    group, sub-split into row ranges when a group exceeds
    ``max_rows_per_task`` rows.  Each entry carries its global
    ``row_start`` — split-factor independent."""
    groups: list[tuple[str, int, int, int]] = []  # path, rg, rows, bytes
    total_rows = 0
    for path in _expand_paths(paths):
        md = pq.ParquetFile(path).metadata
        for rg in range(md.num_row_groups):
            r = md.row_group(rg)
            groups.append((path, rg, r.num_rows, r.total_byte_size))
            total_rows += r.num_rows
    if max_rows_per_task is None:
        max_rows_per_task = _auto_rows_per_task(total_rows, len(groups))

    tasks: list[dict] = []
    offset = 0
    for path, rg, n, size in groups:
        k = max(1, -(-n // max_rows_per_task)) if n else 1
        base, rem = divmod(n, k)
        start = 0
        for i in range(k):
            cnt = base + (1 if i < rem else 0)
            tasks.append(
                {
                    "path": path,
                    "row_group": rg,
                    "start": start,
                    "num_rows": cnt,
                    "row_start": offset + start,
                    "size_bytes": max(1, size * cnt // n) if n else size,
                }
            )
            start += cnt
        offset += n
    return tasks


def _attach_row_ids(t: pa.Table, row_start: int) -> pa.Table:
    ids = pa.array(np.arange(row_start, row_start + t.num_rows, dtype=np.int64))
    return t.append_column("_row", ids)


def _read_one(task: dict, columns: list[str] | None, with_row_ids: bool) -> pa.Table:
    pf = pq.ParquetFile(task["path"])
    group_rows = pf.metadata.row_group(task["row_group"]).num_rows
    start, cnt = task["start"], task["num_rows"]
    if start == 0 and cnt == group_rows:
        t = pf.read_row_group(task["row_group"], columns=columns)
    else:
        # sub-range: stream the group and keep only [start, start+cnt).
        # Early break caps decode at rows [0, start+cnt); the skipped
        # prefix is the documented (K+1)/2 split overhead.
        end = start + cnt
        pos = 0
        parts: list[pa.RecordBatch] = []
        for b in pf.iter_batches(
            batch_size=65_536, row_groups=[task["row_group"]], columns=columns
        ):
            b_start, b_end = pos, pos + b.num_rows
            pos = b_end
            if b_end <= start:
                continue
            s, e = max(start, b_start), min(end, b_end)
            parts.append(b.slice(s - b_start, e - s))
            if b_end >= end:
                break
        t = pa.Table.from_batches(parts)  # cnt >= 1, so parts is non-empty
    if with_row_ids:
        t = _attach_row_ids(t, task["row_start"])
    return t


from ray.data.block import BlockMetadata
from ray.data.datasource import Datasource, ReadTask


class RowIdParquetDatasource(Datasource):
    """Custom ``ray.data.Datasource``: one ReadTask per (possibly
    sub-split) Parquet row group, each attaching its deterministic
    ``_row`` range.  A real Datasource (rather than ``from_items`` +
    ``map_batches``) is load-bearing: task descriptors are ~100 bytes,
    so the map operator would size-bundle ALL of them into a single
    task and the whole read+downstream chain would run serially
    (observed: 1 task for a 100-row-group input)."""

    def __init__(
        self,
        paths,
        columns: list[str] | None = None,
        *,
        max_rows_per_task: int | None = None,
        with_row_ids: bool = True,
    ):
        self.tasks = plan_row_groups(paths, max_rows_per_task)
        if not self.tasks:
            raise FileNotFoundError(f"no parquet files under {paths!r}")
        self.columns = columns
        self.with_row_ids = with_row_ids

    def get_name(self) -> str:
        return "RowIdParquet"

    def estimate_inmemory_data_size(self):
        return sum(t["size_bytes"] for t in self.tasks)

    def get_read_tasks(self, parallelism: int):
        cols = self.columns
        with_ids = self.with_row_ids
        out = []
        for task in self.tasks:
            meta = BlockMetadata(
                num_rows=task["num_rows"],
                size_bytes=task["size_bytes"],
                exec_stats=None,
                input_files=[task["path"]],
            )
            out.append(
                ReadTask(
                    lambda t=dict(task): [_read_one(t, cols, with_ids)], meta
                )
            )
        return out


def read_parquet_with_row_ids(
    paths: str | list[str],
    columns: list[str] | None = None,
    *,
    concurrency: int | None = None,
    max_rows_per_task: int | None = None,
):
    """``ray.data.read_parquet`` equivalent that attaches a
    deterministic global ``_row`` column (0-based over the sorted file
    list, file-order × row-group-order — execution-order independent).
    Oversized row groups split into parallel sub-range tasks; ``_row``
    is split-invariant.
    """
    import ray.data

    return ray.data.read_datasource(
        RowIdParquetDatasource(paths, columns, max_rows_per_task=max_rows_per_task),
        concurrency=concurrency,
    )


def read_parquet_split(
    paths: str | list[str],
    columns: list[str] | None = None,
    *,
    concurrency: int | None = None,
    max_rows_per_task: int | None = None,
):
    """Plain parquet read (no ``_row`` column) through the same
    row-group-splitting planner — for query inputs where a single-row-
    group file would otherwise serialize the whole fused chain behind
    one read task."""
    import ray.data

    return ray.data.read_datasource(
        RowIdParquetDatasource(
            paths, columns, max_rows_per_task=max_rows_per_task, with_row_ids=False
        ),
        concurrency=concurrency,
    )
