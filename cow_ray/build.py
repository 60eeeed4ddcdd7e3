"""Skeleton rule-document builder — the reference's ``build`` mode
(``/root/reference/src/converter/csvw.py:45-150`` ``build_schema``):
inspect an input table, emit a rule document typing every column as
``string`` with ``aboutUrl = "{_row}"`` and the first column as
primaryKey.  Driver-side, small."""

from __future__ import annotations

import datetime
import json
import os


def is_jsonl(path: str) -> bool:
    """True for ``.jsonl`` / ``.ndjson`` files, optionally ``.gz``."""
    p = path[:-3] if path.endswith(".gz") else path
    return p.endswith((".jsonl", ".ndjson"))


def build_rules(
    infile: str,
    base: str = "https://example.com/id/",
    dataset_name: str | None = None,
    delimiter: str | None = None,
    quotechar: str = '"',
    encoding: str | None = None,
    today: str | None = None,
) -> dict:
    """Build a skeleton rule doc for a CSV or Parquet file.  Mirrors the
    reference's metadata shape (dialect, dc boilerplate, one string
    column per header, ``@id`` per column) minus the giant namespace
    context (namespaces are engine defaults, not per-document)."""
    url = os.path.basename(infile)
    dataset_name = dataset_name or url
    base = base.rstrip("/")
    today = today or datetime.datetime.now(datetime.timezone.utc).strftime(
        "%Y-%m-%d"
    )

    if infile.endswith(".parquet"):
        import pyarrow.parquet as pq

        header = pq.read_schema(infile).names
        dialect = {}
    elif is_jsonl(infile):
        from .sources.jsonl import jsonl_header

        header = jsonl_header(infile)
        dialect = {}
    else:
        from .sources.csv import detect_encoding, read_header, sniff_delimiter

        encoding = encoding or detect_encoding(infile)
        delimiter = delimiter or sniff_delimiter(infile, encoding)
        header = read_header(infile, delimiter, quotechar, encoding)
        dialect = {"delimiter": delimiter, "encoding": encoding,
                   "quoteChar": quotechar}

    from .iri import to_iri

    doc = {
        "base": f"{base}/",
        "url": url,
        "dc:title": dataset_name,
        "dc:license": {"@id": "http://opendefinition.org/licenses/cc-by/"},
        "dc:modified": {"@value": today, "@type": "xsd:date"},
        "@id": to_iri(f"{base}/{url}"),
        "dialect": dialect,
        "tableSchema": {
            "aboutUrl": "{_row}",
            "primaryKey": header[0] if header else None,
            "columns": [
                {
                    "name": h,
                    "datatype": "string",
                    "@id": to_iri(f"{base}/{url}/column/{h}"),
                }
                for h in header
            ],
        },
    }
    return doc


def build_rules_file(infile: str, outfile: str | None = None, **kw) -> str:
    outfile = outfile or f"{infile}-rules.json"
    doc = build_rules(infile, **kw)
    with open(outfile, "w") as f:
        json.dump(doc, f, indent=1, ensure_ascii=False)
    return outfile
