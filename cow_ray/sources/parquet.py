"""Parquet source with deterministic global row ids.

The reference derives its ``_row`` pseudo-column from
``chunk_index * chunksize + offset`` under an *ordered* ``pool.imap``
(``/root/reference/src/converter/csvw.py:489,507``).  Ray Data executes
blocks in arbitrary order, so the row id must come from immutable input
metadata instead (SURVEY.md §2.8): we plan one task per Parquet
row group on the driver (footer metadata only — no data read), carrying
``(path, row_group, row_start)``, and each task attaches
``_row = row_start + arange(num_rows)`` when it reads its row group.

Scale notes:
* parallelism = number of row groups — at 100 TB that is O(100k) tasks
  of ~100 MB each, exactly the granularity Ray's streaming executor
  wants; the driver-side plan is footer reads only.
* ``columns=`` prunes at the read (only requested columns leave
  storage).
* re-running the plan is deterministic: same files (sorted) → same
  row ids, which is what makes checkpoint-resume exact.
"""

from __future__ import annotations

import glob
import os

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


def plan_row_groups(paths: str | list[str]) -> list[dict]:
    """Driver-side read plan: one entry per row group with its global
    row offset (footer metadata only)."""
    tasks: list[dict] = []
    offset = 0
    for path in _expand_paths(paths):
        md = pq.ParquetFile(path).metadata
        for rg in range(md.num_row_groups):
            n = md.row_group(rg).num_rows
            tasks.append(
                {"path": path, "row_group": rg, "row_start": offset, "num_rows": n}
            )
            offset += n
    return tasks


def _read_one(task: dict, columns: list[str] | None) -> pa.Table:
    pf = pq.ParquetFile(task["path"])
    t = pf.read_row_group(task["row_group"], columns=columns)
    row_ids = pa.array(
        range(task["row_start"], task["row_start"] + t.num_rows),
        type=pa.int64(),
    )
    return t.append_column("_row", row_ids)


from ray.data.block import BlockMetadata
from ray.data.datasource import Datasource, ReadTask


class RowIdParquetDatasource(Datasource):
    """Custom ``ray.data.Datasource``: one ReadTask per Parquet row
    group, each attaching its deterministic ``_row`` range.  A real
    Datasource (rather than ``from_items`` + ``map_batches``) is
    load-bearing: task descriptors are ~100 bytes, so the map operator
    would size-bundle ALL of them into a single task and the whole
    read+downstream chain would run serially (observed: 1 task for a
    100-row-group input)."""

    def __init__(self, paths, columns: list[str] | None = None):
        self.tasks = plan_row_groups(paths)
        if not self.tasks:
            raise FileNotFoundError(f"no parquet files under {paths!r}")
        self.columns = columns
        # per-row-group compressed sizes for scheduler estimates
        self._sizes: list[int] = []
        by_path: dict[str, pq.ParquetFile] = {}
        for t in self.tasks:
            pf = by_path.setdefault(t["path"], pq.ParquetFile(t["path"]))
            self._sizes.append(
                pf.metadata.row_group(t["row_group"]).total_byte_size
            )

    def get_name(self) -> str:
        return "RowIdParquet"

    def estimate_inmemory_data_size(self):
        return sum(self._sizes)

    def get_read_tasks(self, parallelism: int):
        cols = self.columns
        out = []
        for task, size in zip(self.tasks, self._sizes):
            meta = BlockMetadata(
                num_rows=task["num_rows"],
                size_bytes=size,
                exec_stats=None,
                input_files=[task["path"]],
            )
            out.append(
                ReadTask(lambda t=dict(task): [_read_one(t, cols)], meta)
            )
        return out


def read_parquet_with_row_ids(
    paths: str | list[str],
    columns: list[str] | None = None,
    *,
    concurrency: int | None = None,
):
    """``ray.data.read_parquet`` equivalent that attaches a
    deterministic global ``_row`` column (0-based over the sorted file
    list, file-order × row-group-order — execution-order independent).
    """
    import ray.data

    return ray.data.read_datasource(
        RowIdParquetDatasource(paths, columns), concurrency=concurrency
    )
