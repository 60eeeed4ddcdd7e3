"""WARC (ISO 28500) source + sink — the wire format Common Crawl
actually ships (the ``input_hint`` pages table *is* a parsed WARC:
``(url, warc_ts, html, ...)``).

Reference scope: the reference engine reads CSV only
(``/root/reference/src/converter/csvw.py``); WARC extends the repo's
source contract (all files = ONE job, deterministic global ``_row``
over the kept records, file order x in-file record order) to the crawl
format itself, so a pipeline can start from raw crawl shards instead
of a pre-parsed parquet.

Format facts this module relies on (all public, ISO 28500 / the
Common-Crawl conventions):

* a record is ``WARC/1.0\\r\\n`` + named headers + blank line +
  ``Content-Length`` payload bytes + ``\\r\\n\\r\\n`` trailer;
* payloads are OPAQUE — they may legally contain the bytes
  ``"\\r\\n\\r\\nWARC/1.0"`` (an HTML page quoting a WARC!), so record
  boundaries can NOT be found by pattern scan.  The only exact walk is
  header-jump: read a header block, seek ``Content-Length`` bytes,
  repeat.  For PLAIN files that walk touches only header bytes (~
  hundreds per record) regardless of payload size, so the plan pass is
  cheap: one Ray task per file (driver-side below
  ``driver_scan_max_bytes``) emits chunk cut offsets + per-chunk kept-
  record counts — O(1) driver bytes per chunk, the
  ``sources/jsonl.py`` planner contract.
* ``.warc.gz`` files are per-record gzip MEMBERS (the Common-Crawl
  convention enabling offset random access *with an index*; without
  one the stream is not byte-addressable) — one read task per file,
  kept-record counts from a plan-time decompress wave.  Real crawls
  ship thousands of ~1 GB shards, so file-level parallelism is the
  scale contract, exactly like the JSONL ``.gz`` path.

Per-record Python in the parse is inherent to the format (headers are
per-record text); the cost amortizes over KB..MB payloads and every
public WARC reader (warcio et al.) has the same shape.  Batch assembly
and all downstream processing stay Arrow-columnar.
"""

from __future__ import annotations

import gzip
import hashlib
import io
import os

import numpy as np
import pyarrow as pa

_CRLF = b"\r\n"
_HDR_END = b"\r\n\r\n"

#: output schema of :func:`read_warc_pages` (before ``_row``) — the
#: ``input_hint`` pages shape plus the record metadata a curation
#: pipeline filters on (status, mime).
PAGES_SCHEMA = pa.schema(
    [
        ("url", pa.string()),
        ("warc_ts", pa.timestamp("us")),
        ("status", pa.int32()),
        ("mime", pa.string()),
        ("html", pa.binary()),
    ]
)


# --------------------------------------------------------------- write


def format_warc_record(
    url: str,
    payload: bytes,
    *,
    warc_type: str = "response",
    date: str = "2026-01-01T00:00:00Z",
    http: bool = True,
    status: int = 200,
    mime: str = "text/html",
) -> bytes:
    """One ISO 28500 record as bytes.  ``http=True`` wraps ``payload``
    in a minimal HTTP/1.1 response (the Common-Crawl ``response``
    convention); the WARC ``Content-Length`` then covers the whole HTTP
    block.  Record id is content-addressed (``urn:sha1:...``) — no
    randomness, so fixture WARCs are byte-deterministic."""
    if http:
        body = (
            f"HTTP/1.1 {status} OK\r\nContent-Type: {mime}\r\n"
            f"Content-Length: {len(payload)}\r\n\r\n"
        ).encode("ascii") + payload
        ctype = f'application/http;msgtype={warc_type}'
    else:
        body = payload
        ctype = mime
    rid = hashlib.sha1(
        url.encode("utf-8", "surrogateescape") + date.encode() + payload
    ).hexdigest()
    head = (
        "WARC/1.0\r\n"
        f"WARC-Type: {warc_type}\r\n"
        f"WARC-Record-ID: <urn:sha1:{rid}>\r\n"
        f"WARC-Date: {date}\r\n"
        f"WARC-Target-URI: {url}\r\n"
        f"Content-Type: {ctype}\r\n"
        f"Content-Length: {len(body)}\r\n\r\n"
    ).encode("utf-8", "surrogateescape")
    return head + body + _HDR_END


def write_warc(path: str, records: list[bytes],
               gzip_members: bool | None = None) -> None:
    """Concatenate formatted records into one WARC file.  A ``.gz``
    path (or ``gzip_members=True``) gets one gzip MEMBER per record
    (the Common-Crawl layout; ``mtime=0`` keeps output
    byte-deterministic)."""
    if gzip_members is None:
        gzip_members = path.endswith(".gz")
    if gzip_members:
        with open(path, "wb") as f:
            for rec in records:
                buf = io.BytesIO()
                with gzip.GzipFile(fileobj=buf, mode="wb", mtime=0) as g:
                    g.write(rec)
                f.write(buf.getvalue())
    else:
        with open(path, "wb") as f:
            for rec in records:
                f.write(rec)


# --------------------------------------------------------------- parse


def _parse_headers(block: bytes) -> dict[str, str]:
    """WARC header block (starting at ``WARC/``) -> lower-cased name
    map.  Tolerates LF-only lines (seen in the wild)."""
    out: dict[str, str] = {}
    for line in block.split(b"\n")[1:]:  # [0] is the version line
        line = line.rstrip(b"\r")
        if not line:
            break
        k, _, v = line.partition(b":")
        if _:
            out[k.strip().lower().decode("latin-1")] = (
                v.strip().decode("utf-8", "surrogateescape"))
    return out


def _walk_plain(path: str,
                keep: frozenset[str]) -> list[tuple[int, int, bool]]:
    """Exact record table of a plain WARC: [(offset, next_offset,
    is_kept_type)].  Seeks over payloads — reads only header bytes, so
    a multi-GB file plans in milliseconds of I/O."""
    size = os.path.getsize(path)
    recs: list[tuple[int, int, bool]] = []
    with open(path, "rb") as f:
        pos = 0
        while pos < size:
            f.seek(pos)
            head = f.read(8192)
            if not head.strip():
                break
            if not head.startswith(b"WARC/"):
                raise ValueError(
                    f"{path}: expected record header at byte {pos}")
            he = head.find(_HDR_END)
            while he == -1 and len(head) < (1 << 20):
                more = f.read(65536)
                if not more:
                    break
                head += more
                he = head.find(_HDR_END)
            if he == -1:
                raise ValueError(f"{path}: unterminated header at {pos}")
            hdrs = _parse_headers(head[:he])
            clen = int(hdrs.get("content-length", "0"))
            nxt = pos + he + len(_HDR_END) + clen
            # tolerate 0..2 trailing CRLFs (spec says exactly two)
            f.seek(nxt)
            tail = f.read(4)
            if tail.startswith(_HDR_END):
                nxt += 4
            elif tail.startswith(_CRLF):
                nxt += 2
            recs.append((pos, nxt, hdrs.get("warc-type", "") in keep))
            pos = nxt
    return recs


def _parse_records(data: bytes, keep_types: frozenset[str]):
    """All records in ``data`` (a whole gz-decompressed file or one
    plain-file chunk) -> list of per-record field tuples for the kept
    WARC-Types, in order."""
    out = []
    pos = 0
    n = len(data)
    while pos < n:
        # skip inter-record padding
        while pos < n and data[pos : pos + 1] in (b"\r", b"\n"):
            pos += 1
        if pos >= n:
            break
        if not data.startswith(b"WARC/", pos):
            raise ValueError(f"expected record header at byte {pos}")
        he = data.find(_HDR_END, pos)
        if he == -1:
            raise ValueError(f"unterminated header at byte {pos}")
        hdrs = _parse_headers(data[pos:he])
        clen = int(hdrs.get("content-length", "0"))
        body = data[he + 4 : he + 4 + clen]
        pos = he + 4 + clen
        wtype = hdrs.get("warc-type", "")
        if wtype in keep_types:
            out.append((
                hdrs.get("warc-target-uri", ""),
                hdrs.get("warc-date", ""),
                hdrs.get("content-type", ""),
                body,
            ))
    return out


def _split_http(ctype: str, body: bytes):
    """(status, mime, payload) — unwraps ``application/http`` bodies,
    passes others through (resource records)."""
    if not ctype.startswith("application/http"):
        return None, ctype.split(";")[0].strip() or None, body
    he = body.find(_HDR_END)
    if he == -1:
        return None, None, body
    status = None
    mime = None
    head = body[:he].split(b"\n")
    first = head[0].rstrip(b"\r").split(b" ")
    if len(first) >= 2 and first[0].startswith(b"HTTP/"):
        try:
            status = int(first[1])
        except ValueError:
            pass
    for line in head[1:]:
        k, _, v = line.rstrip(b"\r").partition(b":")
        if _ and k.strip().lower() == b"content-type":
            mime = v.strip().split(b";")[0].decode("latin-1")
            break
    return status, mime, body[he + 4 :]


def _records_to_table(recs) -> pa.Table:
    urls, tss, stats, mimes, bodies = [], [], [], [], []
    for url, date, ctype, body in recs:
        status, mime, payload = _split_http(ctype, body)
        urls.append(url)
        tss.append(date or None)
        stats.append(status)
        mimes.append(mime)
        bodies.append(payload)
    ts = pa.array(tss, pa.string())
    import pyarrow.compute as pc

    ts_us = pc.strptime(
        pc.replace_substring(ts, "Z", ""), format="%Y-%m-%dT%H:%M:%S",
        unit="us", error_is_null=True)
    return pa.table(
        {
            "url": pa.array(urls, pa.string()),
            "warc_ts": ts_us,
            "status": pa.array(stats, pa.int32()),
            "mime": pa.array(mimes, pa.string()),
            "html": pa.array(bodies, pa.binary()),
        }
    )


# ---------------------------------------------------------------- read


def read_warc_pages(
    path: str | list[str],
    *,
    record_types: tuple[str, ...] = ("response",),
    target_chunk_bytes: int = 32 << 20,
    driver_scan_max_bytes: int = 256 << 20,
):
    """WARC file(s) (plain or per-record-member ``.gz``) -> ONE Dataset
    with schema :data:`PAGES_SCHEMA` + deterministic global ``_row``
    over the KEPT records (``record_types`` filter; crawl shards
    interleave request/response/metadata records and a pipeline wants
    the responses).

    Plan pass: plain files get an exact header-jump walk (driver-side
    when the file is small, a Ray task above ``driver_scan_max_bytes``)
    producing ~``target_chunk_bytes`` cuts on record boundaries;
    ``.gz`` files get a decompress-count task each.  Only cut offsets
    and kept counts return to the driver."""
    import ray
    import ray.data
    from ray.data.block import BlockMetadata
    from ray.data.datasource import Datasource, ReadTask

    files = list(path) if isinstance(path, (list, tuple)) else [path]
    if not files:
        raise ValueError("no input WARC files")
    keep = frozenset(record_types)

    def plan_plain(p: str):
        """[(start, end, kept_count)] cuts on record boundaries."""
        cuts = []
        cs, ce, k = None, None, 0
        for s, e, kept in _walk_plain(p, keep):
            if cs is None:
                cs, ce, k = s, e, 0
            if kept:
                k += 1
            ce = e
            if ce - cs >= target_chunk_bytes:
                cuts.append((cs, ce, k))
                cs = None
        if cs is not None:
            cuts.append((cs, ce, k))
        return cuts

    def count_gz(p: str) -> int:
        with gzip.open(p, "rb") as f:
            data = f.read()
        return len(_parse_records(data, keep))

    plan_plain_r = ray.remote(num_cpus=1)(plan_plain)
    count_gz_r = ray.remote(num_cpus=1)(count_gz)

    pending: dict[str, object] = {}
    for p in files:
        if p.endswith(".gz"):
            pending[p] = count_gz_r.remote(p)
        elif os.path.getsize(p) > driver_scan_max_bytes:
            pending[p] = plan_plain_r.remote(p)

    # (path, start, end|None=gz-whole-file, row_start, n_kept)
    task_specs: list[tuple[str, int, int | None, int, int]] = []
    row_base = 0
    total_bytes = 0
    for p in files:
        size = os.path.getsize(p)
        total_bytes += size
        if p.endswith(".gz"):
            n = ray.get(pending[p])
            task_specs.append((p, 0, None, row_base, n))
            row_base += n
            continue
        if size == 0:
            continue
        cuts = ray.get(pending[p]) if p in pending else plan_plain(p)
        for s, e, k in cuts:
            task_specs.append((p, s, e, row_base, k))
            row_base += k

    def make_read(fpath: str, start: int, end: int | None, row_start: int):
        def read() -> list[pa.Table]:
            if end is None:
                with gzip.open(fpath, "rb") as f:
                    data = f.read()
            else:
                with open(fpath, "rb") as f:
                    f.seek(start)
                    data = f.read(end - start)
            t = _records_to_table(_parse_records(data, keep))
            return [
                t.append_column(
                    "_row",
                    pa.array(np.arange(row_start, row_start + t.num_rows,
                                       dtype=np.int64)),
                )
            ]

        return read

    class _WarcSource(Datasource):
        def get_name(self):
            return "RowIdWarc"

        def estimate_inmemory_data_size(self):
            return total_bytes * 3

        def get_read_tasks(self, parallelism: int):
            tasks = []
            for fpath, s, e, off, n in task_specs:
                nbytes = (os.path.getsize(fpath) if e is None else e - s)
                meta = BlockMetadata(num_rows=n, size_bytes=nbytes * 3,
                                     exec_stats=None, input_files=[fpath])
                tasks.append(ReadTask(make_read(fpath, s, e, off), meta))
            return tasks

    return ray.data.read_datasource(_WarcSource())


# ---------------------------------------------------------------- sink


_shard_seq = __import__("itertools").count()


def write_warc_shards(
    ds,
    out_dir: str,
    *,
    url_col: str = "url",
    html_col: str = "html",
    ts_col: str | None = "warc_ts",
    mime: str = "text/html",
):
    """Distributed pages -> WARC export: each batch becomes one
    ``part-<sha1>-<pid>-<seq>.warc.gz`` shard — sha1 of the content
    for debuggability, pid/seq for uniqueness (content-only names
    would collapse byte-identical batches into one file, silently
    changing bag cardinality).  Write into an EMPTY directory;
    re-runs append new files.  Returns the manifest Dataset
    ``(path, records, bytes)`` — the source of truth for a run."""
    os.makedirs(out_dir, exist_ok=True)

    def write_batch(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return pa.table({"path": pa.array([], pa.string()),
                             "records": pa.array([], pa.int64()),
                             "bytes": pa.array([], pa.int64())})
        urls = batch[url_col].to_pylist()
        htmls = batch[html_col].to_pylist()
        if ts_col is not None and ts_col in batch.column_names:
            import pyarrow.compute as pc

            dates = pc.strftime(batch[ts_col],
                                format="%Y-%m-%dT%H:%M:%SZ").to_pylist()
        else:
            dates = [None] * len(urls)
        recs = []
        for u, h, d in zip(urls, htmls, dates):
            body = h if isinstance(h, bytes) else str(h).encode()
            recs.append(format_warc_record(
                u or "", body, date=d or "2026-01-01T00:00:00Z",
                mime=mime))
        blob = b"".join(recs)
        seq = next(_shard_seq)
        name = (f"part-{hashlib.sha1(blob).hexdigest()[:16]}"
                f"-{os.getpid()}-{seq}.warc.gz")
        path = os.path.join(out_dir, name)
        tmp = f"{path}.tmp"
        write_warc(tmp, recs, gzip_members=True)
        os.replace(tmp, path)
        return pa.table({"path": [path],
                         "records": pa.array([len(recs)], pa.int64()),
                         "bytes": pa.array([os.path.getsize(path)],
                                           pa.int64())})

    return ds.map_batches(write_batch, batch_format="pyarrow")


# ----------------------------------------------------- crawl ingestion


def is_warc(path: str) -> bool:
    return path.endswith(".warc") or path.endswith(".warc.gz")


def stage_warc_to_parquet(warc_paths, staging_dir: str, *,
                          record_types: tuple[str, ...] = ("response",),
                          resume: bool = True) -> list[str]:
    """Crawl-ingestion phase 1: parse WARC shards ONCE into the
    columnar pages layout everything downstream reads — ``(url,
    warc_ts, status, mime, html, warc_row)``.  The parse is cached
    behind a ``_STAGED`` marker recording each input's (path, size,
    mtime); with ``resume=True`` an unchanged input list skips the
    re-parse entirely.

    Why a staging step instead of streaming WARC straight into the
    converter: WARC is a sequential wire format that costs a
    decompress+parse per read, while a 100-TB pipeline reads its
    corpus many times (conversion, dedup, stats, re-runs) — pay the
    parse exactly once and let every later pass do pruned columnar
    reads (the same reason Common Crawl publishes a parquet index).
    The crawl-order ``_row`` is preserved as ``warc_row``; the
    converter attaches its own ``_row`` from the staged files'
    row-group offsets, deterministic for a fixed staging."""
    import shutil

    files = (list(warc_paths)
             if isinstance(warc_paths, (list, tuple)) else [warc_paths])
    if not files:
        raise ValueError("no input WARC files")
    key = hashlib.sha1()
    for p in sorted(files):
        st = os.stat(p)
        key.update(f"{p}|{st.st_size}|{st.st_mtime_ns}\n".encode())
    key.update(",".join(sorted(record_types)).encode())
    tag = key.hexdigest()
    marker = os.path.join(staging_dir, "_STAGED")
    if resume and os.path.exists(marker):
        with open(marker) as f:
            if f.read().strip() == tag:
                staged = sorted(
                    os.path.join(staging_dir, f)
                    for f in os.listdir(staging_dir)
                    if f.endswith(".parquet"))
                if staged:  # marker outliving its files -> restage
                    return staged
    if (os.path.isdir(staging_dir) and os.listdir(staging_dir)
            and not os.path.exists(marker)):
        # never wipe a directory this module did not create
        raise ValueError(
            f"staging_dir {staging_dir!r} is non-empty and carries no "
            "_STAGED marker; refusing to delete it — point staging at "
            "a fresh directory")
    shutil.rmtree(staging_dir, ignore_errors=True)
    os.makedirs(staging_dir)
    ds = read_warc_pages(files, record_types=record_types)

    def rename_row(batch: pa.Table) -> pa.Table:
        i = batch.schema.get_field_index("_row")
        return batch.set_column(i, "warc_row", batch["_row"])

    ds.map_batches(rename_row,
                   batch_format="pyarrow").write_parquet(staging_dir)
    with open(marker, "w") as f:
        f.write(tag)
    return sorted(os.path.join(staging_dir, f)
                  for f in os.listdir(staging_dir)
                  if f.endswith(".parquet"))


def convert_warc(warc_paths, rule_doc, out_dir: str | None = None, *,
                 staging_dir: str | None = None,
                 record_types: tuple[str, ...] = ("response",),
                 config=None, gazetteer=None, mention_rules=None):
    """Raw crawl → knowledge graph: stage WARC shards to columnar
    pages (cached, :func:`stage_warc_to_parquet`) and run the FULL
    flagship conversion over them — HTML text extraction, optional
    entity linking, triple emission, dedup, partitioned store with
    provenance.  Same return contract as
    ``pipelines.convert_pages``."""
    from ..pipelines.convert import convert_pages

    if staging_dir is None:
        if out_dir is None:
            raise ValueError(
                "convert_warc needs staging_dir when out_dir is None")
        staging_dir = out_dir.rstrip("/") + ".staging"
    staged = stage_warc_to_parquet(warc_paths, staging_dir,
                                   record_types=record_types)
    return convert_pages(staged, rule_doc, out_dir,
                         gazetteer=gazetteer,
                         mention_rules=mention_rules, config=config)
