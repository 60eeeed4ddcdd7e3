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


class _ReadRowGroup:
    """Stateless-task UDF: task-descriptor batch → data batch with
    ``_row`` attached."""

    def __init__(self, columns: list[str] | None):
        self.columns = columns

    def __call__(self, batch: pa.Table) -> pa.Table:
        tables = []
        for task in batch.to_pylist():
            pf = pq.ParquetFile(task["path"])
            t = pf.read_row_group(task["row_group"], columns=self.columns)
            row_ids = pa.array(
                range(task["row_start"], task["row_start"] + t.num_rows),
                type=pa.int64(),
            )
            tables.append(t.append_column("_row", row_ids))
        return pa.concat_tables(tables)


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

    tasks = plan_row_groups(paths)
    if not tasks:
        raise FileNotFoundError(f"no parquet files under {paths!r}")
    ds = ray.data.from_items(tasks)
    # one task-descriptor row per map task → per-row-group parallelism
    return ds.map_batches(
        _ReadRowGroup(columns),
        batch_size=1,
        batch_format="pyarrow",
        concurrency=concurrency,
    )
