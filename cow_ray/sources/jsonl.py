"""Newline-delimited JSON (JSONL/NDJSON) source with deterministic
global ``_row`` ids — the wire format of web-text corpora (C4, The
Pile, Common Crawl derivatives ship as JSONL shards, usually gzipped).

Reference scope: the reference engine reads CSV only
(``/root/reference/src/converter/csvw.py``); JSONL extends the same
source contract (all files = ONE job with one unified row space,
deterministic ``_row``) to the corpus format a 100-TB webtext pipeline
actually ingests.

Why this is simpler than the CSV planner (``sources/csv.py``): JSON
string literals MUST escape control characters (RFC 8259 §7), so a raw
``0x0A`` byte in a JSONL file is ALWAYS a record boundary — no quote
parity, no in-field newlines.  Chunking is therefore:

* plain files — cut at arbitrary byte offsets; a chunk owns every
  record that STARTS inside ``[s, e)`` (record starts are byte 0 and
  each byte following a newline).  The reader seeks one byte early to
  see the boundary newline and reads over ``e`` to finish its tail
  record.  Record counts per chunk (for ``_row`` offsets) come from a
  newline-count pass: a driver scan below ``driver_scan_max_bytes``
  (~GB/s on a local page cache), a Ray-task wave above it — O(1) bytes
  per chunk return to the driver either way.
* ``.gz`` files — one member stream, not byte-addressable: one task
  per file (real corpora ship thousands of shards, so file-level
  parallelism is the contract at scale), counts from a Ray-task wave
  that decompresses once at plan time.

Parsing is Arrow's C++ NDJSON reader (``pyarrow.json``) — vectorized,
no per-row Python.  Pass ``schema`` for cross-chunk stability on
heterogeneous shards (absent keys → null, unexpected keys ignored =
projection pushdown at the parse); without it each chunk infers its
own schema and Ray unifies, which is fine for homogeneous corpora.

Blank lines are skipped (count and parse agree: a record start is a
non-newline byte at position 0 or after a newline).
"""

from __future__ import annotations

import gzip
import os

import numpy as np
import pyarrow as pa


def _count_record_starts(data: bytes, is_file_start: bool) -> int:
    """Record starts inside a window of file bytes.  A start is byte 0
    (file start, non-newline) or any byte following a newline that is
    itself not a newline — i.e. the first byte of a non-empty line.
    (Whitespace-only lines COUNT as records and fail loudly at parse —
    the count pass sees one byte of lookahead, not whole lines, so the
    strict contract is the only one both passes can agree on.)

    A newline at the window's LAST byte is never counted: callers tile
    the file with windows overlapping by ONE byte, so the successor
    byte — and the start decision — belongs to the next window; at EOF
    there is no successor and no start.  Every '\\n'→start edge is
    therefore seen by exactly one window."""
    n = 0
    if is_file_start and data[:1] not in (b"", b"\n"):
        n += 1
    i = data.find(b"\n")
    while i != -1:
        if i + 1 < len(data) and data[i + 1 : i + 2] != b"\n":
            n += 1
        i = data.find(b"\n", i + 1)
    return n


def _plan_plain_counts(path: str, chunks: list[tuple[int, int]],
                       use_wave: bool) -> list[int]:
    """Per-chunk record-start counts.  Windows are ``[s-1, e)`` so
    adjacent windows overlap by one byte and every ``\\n``→start edge
    is seen by exactly one window (the one OWNING the start byte)."""

    def count_one(s: int, e: int) -> int:
        base = max(s - 1, 0)
        with open(path, "rb") as f:
            f.seek(base)
            data = f.read(e - base)
        return _count_record_starts(data, s == 0)

    if not use_wave:
        return [count_one(s, e) for s, e in chunks]

    import ray

    @ray.remote(num_cpus=1)
    def _remote_count(s: int, e: int) -> int:
        return count_one(s, e)

    return ray.get([_remote_count.remote(s, e) for s, e in chunks])


def _read_plain_chunk(path: str, start: int, end: int) -> bytes:
    """Bytes of every record starting in ``[start, end)`` — skips the
    partial head line (owned by the previous chunk), reads past
    ``end`` to finish the tail record."""
    size = os.path.getsize(path)
    base = max(start - 1, 0)
    with open(path, "rb") as f:
        f.seek(base)
        data = f.read(end - base)
        if start > 0:
            # first record start in window = after the first newline
            nl = data.find(b"\n")
            if nl == -1:
                return b""
            data = data[nl + 1 :]
            if not data:
                # the only newline sat on the window's last byte: the
                # start it opens is at ``end`` — owned by the NEXT
                # chunk; overscanning here would steal its record
                return b""
        # read over until the tail record terminates
        pos = end
        while pos < size and not data.endswith(b"\n"):
            more = f.read(1 << 20)
            if not more:
                break
            nl = more.find(b"\n")
            if nl == -1:
                data += more
                pos += len(more)
            else:
                data += more[: nl + 1]
                break
    return data


def _parse_ndjson(data: bytes, schema: pa.Schema | None) -> pa.Table:
    """Arrow C++ NDJSON parse; blank lines stripped first (Arrow
    errors on them)."""
    from pyarrow import json as pj

    # drop EMPTY lines only (matching the count pass); a whitespace-
    # only line is a counted record and fails loudly here — see
    # _count_record_starts
    lines = [ln for ln in data.split(b"\n") if ln]
    if not lines:
        return (pa.schema([]) if schema is None else schema).empty_table()
    buf = b"\n".join(lines) + b"\n"
    parse = None
    if schema is not None:
        parse = pj.ParseOptions(explicit_schema=schema,
                                unexpected_field_behavior="ignore")
    return pj.read_json(pa.BufferReader(buf), parse_options=parse)


def read_jsonl_with_row_ids(
    path: str | list[str],
    *,
    schema: pa.Schema | None = None,
    columns: list[str] | None = None,
    target_chunk_bytes: int = 32 << 20,
    driver_scan_max_bytes: int = 256 << 20,
):
    """JSONL file(s) (plain or ``.gz``) → ONE Dataset with a
    deterministic global ``_row`` (file order × in-file record order).

    ``columns`` selects output fields (applied after parse; with
    ``schema`` the parse itself drops unlisted fields).  See module
    docstring for the chunking/count contract."""
    import ray
    import ray.data
    from ray.data.block import BlockMetadata
    from ray.data.datasource import Datasource, ReadTask

    files = list(path) if isinstance(path, (list, tuple)) else [path]
    if not files:
        raise ValueError("no input JSONL files")

    # ---- plan: (path, start, end, gz, row_start, n_rows) ----
    task_specs: list[tuple[str, int, int, bool, int, int]] = []

    @ray.remote(num_cpus=1)
    def _gz_count(p: str) -> int:
        """Streamed decompress-and-count: blocks overlap by one byte
        (``prev``) so boundary '\\n'→start edges land in exactly one
        window — same tiling contract as ``_plan_plain_counts``."""
        n = 0
        prev = b""
        first = True
        with gzip.open(p, "rb") as f:
            while True:
                block = f.read(1 << 22)
                if not block:
                    break
                n += _count_record_starts(prev + block, first)
                prev = block[-1:]
                first = False
        return n

    gz_counts: dict[str, "ray.ObjectRef"] = {}
    for p in files:
        if p.endswith(".gz"):
            gz_counts[p] = _gz_count.remote(p)

    row_base = 0
    total_bytes = 0
    for p in files:
        size = os.path.getsize(p)
        total_bytes += size
        if p.endswith(".gz"):
            n = ray.get(gz_counts[p])
            task_specs.append((p, 0, size, True, row_base, n))
            row_base += n
            continue
        if size == 0:
            continue
        n_chunks = max(1, (size + target_chunk_bytes - 1)
                       // target_chunk_bytes)
        cuts = np.linspace(0, size, n_chunks + 1, dtype=np.int64)
        chunks = [(int(cuts[i]), int(cuts[i + 1]))
                  for i in range(n_chunks) if cuts[i] < cuts[i + 1]]
        counts = _plan_plain_counts(p, chunks,
                                    use_wave=size > driver_scan_max_bytes)
        for (s, e), n in zip(chunks, counts):
            task_specs.append((p, s, e, False, row_base, n))
            row_base += n

    def make_read(fpath: str, start: int, end: int, gz: bool,
                  row_start: int):
        def read() -> list[pa.Table]:
            if gz:
                with gzip.open(fpath, "rb") as f:
                    data = f.read()
            else:
                data = _read_plain_chunk(fpath, start, end)
            t = _parse_ndjson(data, schema)
            if columns is not None and (schema is not None
                                        or t.num_rows > 0):
                # schema-less empty chunks have no columns to select;
                # Ray drops/unifies the empty block downstream
                t = t.select(columns)
            return [
                t.append_column(
                    "_row",
                    pa.array(np.arange(row_start, row_start + t.num_rows,
                                       dtype=np.int64)),
                )
            ]

        return read

    class _JsonlSource(Datasource):
        def get_name(self):
            return "RowIdJsonl"

        def estimate_inmemory_data_size(self):
            return total_bytes * 2

        def get_read_tasks(self, parallelism: int):
            tasks = []
            for fpath, s, e, gz, off, n in task_specs:
                meta = BlockMetadata(num_rows=n, size_bytes=(e - s) * 2,
                                     exec_stats=None,
                                     input_files=[fpath])
                tasks.append(
                    ReadTask(make_read(fpath, s, e, gz, off), meta))
            return tasks

    return ray.data.read_datasource(_JsonlSource())


def convert_jsonl(
    jsonl_path: str | list[str],
    rule_doc,
    out_dir: str | None = None,
    *,
    config=None,
    schema: pa.Schema | None = None,
):
    """``convert`` over the corpus wire format: JSONL shard(s) + one
    rule document → triple store — the same contract as
    ``sources.csv.convert_csv`` (a list of shards converts as ONE job
    with a unified global ``_row`` space).  Values keep their JSON
    types (ints stay ints, like the parquet path); absent keys arrive
    as nulls and flow through the rule document's null semantics."""
    from ..pipelines.convert import ConvertConfig
    from ..rules import RuleDoc, parse_rules
    from ..triples import EmitTriples

    doc = rule_doc if isinstance(rule_doc, RuleDoc) else parse_rules(rule_doc)
    ds = read_jsonl_with_row_ids(jsonl_path, schema=schema)
    cfg = config or ConvertConfig()
    triples = ds.map_batches(
        EmitTriples(doc, error_markers=out_dir is not None),
        batch_format="pyarrow", batch_size=cfg.batch_size,
    )
    if out_dir is None:
        return triples, None
    from ..nanopub import Nanopub, job_hash
    from ..stages.materialize import materialize_triples

    file_list = (list(jsonl_path)
                 if isinstance(jsonl_path, (list, tuple)) else [jsonl_path])
    jh = job_hash(doc.doc_hash, file_list)
    np_ = Nanopub(doc.base, doc.dataset_name, jh)
    if cfg.append:
        from ..stages.materialize import append_triples, read_triple_store

        manifests = append_triples(triples, out_dir, dedup=cfg.dedup,
                                   input_desc=";".join(file_list))
        return read_triple_store(out_dir), manifests
    manifests = materialize_triples(
        triples, out_dir, num_parts=cfg.num_parts, job=jh, nanopub=np_,
        resume=cfg.resume, dedup=cfg.dedup, input_desc=";".join(file_list),
    )
    import pyarrow.compute as pc

    from ..triples import MARKER_KIND

    def strip_markers(batch: pa.Table) -> pa.Table:
        return batch.filter(
            pc.invert(
                pc.fill_null(pc.equal(batch["obj_kind"], MARKER_KIND),
                             False)
            )
        )

    return triples.map_batches(strip_markers, batch_format="pyarrow"), \
        manifests


def jsonl_header(path: str, sample_records: int = 100) -> list[str]:
    """Field names of a JSONL file in first-seen order over the first
    ``sample_records`` records — the skeleton-builder probe (driver
    side, reads only the head of one shard)."""
    import json as _json

    opener = gzip.open if path.endswith(".gz") else open
    header: list[str] = []
    seen = set()
    with opener(path, "rt", encoding="utf-8", errors="replace") as f:
        n = 0
        for line in f:
            if not line.strip():
                continue
            try:
                rec = _json.loads(line)
            except ValueError:
                continue
            if isinstance(rec, dict):
                for k in rec:
                    if k not in seen:
                        seen.add(k)
                        header.append(k)
            n += 1
            if n >= sample_records:
                break
    return header


_shard_seq = __import__("itertools").count()


def write_jsonl_shards(ds, out_dir: str, *, gzip_shards: bool = True,
                       suffix: str | None = None):
    """Distributed Dataset -> JSONL shard export (the corpus wire
    format, completing the source/sink pair): each batch serializes
    with polars' vectorized NDJSON writer (no per-row Python) into
    one ``part-<sha1>-<pid>-<seq>.jsonl[.gz]`` shard — the sha1
    prefix is the batch's content hash (debuggability), the pid/seq
    suffix guarantees uniqueness even for byte-identical batches
    (content-only names would silently collapse duplicated crawl
    segments into one file, changing bag cardinality).  Write into an
    EMPTY directory; re-runs append new files, and the returned
    manifest Dataset ``(path, records, bytes)`` is the source of
    truth for what a run produced."""
    import gzip as _gz
    import hashlib

    import pyarrow as pa

    os.makedirs(out_dir, exist_ok=True)
    ext = suffix or (".jsonl.gz" if gzip_shards else ".jsonl")

    def write_batch(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return pa.table({"path": pa.array([], pa.string()),
                             "records": pa.array([], pa.int64()),
                             "bytes": pa.array([], pa.int64())})
        import polars as pl

        blob = pl.from_arrow(batch).write_ndjson().encode("utf-8")
        if gzip_shards:
            import io

            buf = io.BytesIO()
            with _gz.GzipFile(fileobj=buf, mode="wb", mtime=0) as g:
                g.write(blob)
            blob = buf.getvalue()
        seq = next(_shard_seq)
        name = (f"part-{hashlib.sha1(blob).hexdigest()[:16]}"
                f"-{os.getpid()}-{seq}{ext}")
        path = os.path.join(out_dir, name)
        tmp = f"{path}.tmp"
        with open(tmp, "wb") as f:
            f.write(blob)
        os.replace(tmp, path)
        return pa.table({"path": [path],
                         "records": pa.array([batch.num_rows],
                                             pa.int64()),
                         "bytes": pa.array([os.path.getsize(path)],
                                           pa.int64())})

    return ds.map_batches(write_batch, batch_format="pyarrow")
