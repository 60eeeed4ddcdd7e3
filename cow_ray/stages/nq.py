"""N-Quads / N-Triples serialization at the edge.

The canonical store is partitioned Parquet (``materialize.py``); this
module is the export path corresponding to the reference's serialized
output (``csvw.py:366-368, 421-422``).  Formatting is a vectorizable
``map_batches`` transform (string ops only); the single-file export is
a driver-streamed edge utility, like the reference's transcode step
(``csvw_tool.py:60-78``) — deliberately not a distributed op.
"""

from __future__ import annotations

import gzip as _gzip

import pyarrow as pa

from ..oracle import KIND_IRI

_ESC = {
    "\\": "\\\\",
    '"': '\\"',
    "\n": "\\n",
    "\r": "\\r",
    "\t": "\\t",
}


def escape_literal(s: str) -> str:
    out = []
    for ch in s:
        e = _ESC.get(ch)
        if e is not None:
            out.append(e)
        elif ord(ch) < 0x20:
            out.append("\\u%04X" % ord(ch))
        else:
            out.append(ch)
    return "".join(out)


def format_term(lex: str, kind: str, datatype: str | None, lang: str | None) -> str:
    if kind == KIND_IRI:
        return f"<{lex}>"
    lit = f'"{escape_literal(lex)}"'
    if lang:
        return f"{lit}@{lang}"
    if datatype:
        return f"{lit}^^<{datatype}>"
    return lit


def triples_to_lines(batch: pa.Table, graph: str | None = None) -> pa.Table:
    """Triple batch → one ``line`` column of N-Quads (with graph) or
    N-Triples text."""
    cols = {c: batch[c].to_pylist() for c in
            ("subj", "pred", "obj_lex", "obj_kind", "obj_datatype", "obj_lang")}
    graphs = (
        batch["graph"].to_pylist()
        if "graph" in batch.column_names
        else [graph] * batch.num_rows
    )
    lines = []
    for s, p, ol, ok, dt, lg, g in zip(
        cols["subj"], cols["pred"], cols["obj_lex"], cols["obj_kind"],
        cols["obj_datatype"], cols["obj_lang"], graphs,
    ):
        term = format_term(ol, ok, dt, lg)
        if g:
            lines.append(f"<{s}> <{p}> {term} <{g}> .")
        else:
            lines.append(f"<{s}> <{p}> {term} .")
    return pa.table({"line": pa.array(lines, type=pa.string())})


def export_nquads(ds, path: str, graph: str | None = None,
                  gzipped: bool = False) -> int:
    """Driver-streamed single-file export (small/medium results only;
    the distributed store is the Parquet one)."""
    n = 0
    opener = _gzip.open if gzipped else open
    with opener(path, "wt", encoding="utf-8") as f:
        for batch in ds.map_batches(
            triples_to_lines, batch_format="pyarrow",
            fn_kwargs={"graph": graph} if graph else {},
        ).iter_batches(batch_size=65536, batch_format="pyarrow"):
            for line in batch["line"].to_pylist():
                f.write(line)
                f.write("\n")
                n += 1
    return n
