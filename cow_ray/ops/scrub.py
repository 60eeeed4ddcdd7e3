"""Text scrubbing and chunking for training-data preparation.

* :func:`scrub_pii` — vectorized redaction of email / phone / IPv4
  patterns (the standard cheap PII pass before corpus release).  Pure
  ``pyarrow.compute`` RE2 kernels, so DuckDB's ``regexp_replace``
  reproduces the output byte-for-byte (the query oracle relies on the
  patterns being RE2-compatible in both engines).
* :func:`chunk_documents` — split documents into ~``chunk_chars``
  character windows with ``overlap`` carry-over (sequence-packing
  precursor): a ``flat_map``-shaped batch transform (one input row →
  many chunk rows) that never materializes more than a batch.
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc

# RE2-compatible (no backrefs/lookaround); keep in sync with the SQL
# oracle in pipelines/queries.py
EMAIL_RE = r"[A-Za-z0-9._%+\-]+@[A-Za-z0-9.\-]+\.[A-Za-z]{2,}"
PHONE_RE = r"\+?[0-9][0-9()\-\s]{6,}[0-9]"
IPV4_RE = r"\b[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\b"

_DEFAULT_RULES = (
    (EMAIL_RE, "<EMAIL>"),
    (IPV4_RE, "<IP>"),
    (PHONE_RE, "<PHONE>"),
)


def scrub_pii(batch: pa.Table, text_col: str = "text",
              out_col: str = "clean_text",
              rules: tuple = _DEFAULT_RULES) -> pa.Table:
    """Apply the redaction rules in order (order matters: IPs are
    scrubbed before phones so dotted quads never half-match the
    phone pattern)."""
    t = pc.fill_null(batch[text_col], "")
    for pattern, replacement in rules:
        t = pc.replace_substring_regex(t, pattern=pattern,
                                       replacement=replacement)
    return batch.append_column(out_col, t)


def chunk_documents(ds, *, chunk_chars: int = 512, overlap: int = 64,
                    text_col: str = "text", id_col: str = "doc_id"):
    """Documents → chunk rows ``(doc_id, chunk_id, chunk_text)``.
    Stride = ``chunk_chars - overlap``; the final partial chunk is
    kept (training pipelines pad or pack it downstream).  Per-batch
    Python over documents, vectorized slicing per document — chunking
    is string copying, which IS the work."""
    if overlap >= chunk_chars:
        raise ValueError("overlap must be smaller than chunk_chars")
    stride = chunk_chars - overlap

    def explode(batch: pa.Table) -> pa.Table:
        ids_out, chunk_ids, texts = [], [], []
        ids = batch[id_col].to_pylist()
        for i, text in zip(ids, batch[text_col].to_pylist()):
            text = text or ""
            starts = range(0, max(len(text) - overlap, 1), stride)
            for ci, s in enumerate(starts):
                ids_out.append(i)
                chunk_ids.append(ci)
                texts.append(text[s:s + chunk_chars])
        chunk_arr = pa.array(texts, type=pa.string())
        return pa.table({
            id_col: pa.array(ids_out, type=batch[id_col].type),
            "chunk_id": pa.array(chunk_ids, type=pa.int64()),
            "chunk_text": chunk_arr,
            "n_chunk_chars": pc.cast(pc.utf8_length(chunk_arr), pa.int64()),
        })

    return ds.map_batches(explode, batch_format="pyarrow")
