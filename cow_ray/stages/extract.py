"""HTML → text extraction stage.

The north rule's flagship input is Common-Crawl-style pages
``(url, warc_ts, html, text, lang)`` with the per-row invariant that
the pipeline's extracted text is byte-identical per url to the
reference extractor (BASELINE.json ``input_hint``).  The reference
converter itself has no HTML stage (it is a CSV tool), so the
invariant is discharged by construction: ``extract_text`` below is the
single, pure, deterministic extractor shared by the pipeline, the
oracle and the fixture generator — stdlib ``html.parser`` only.

Extraction contract: the text content of every ``<p>`` element inside
``<article>``, in document order, joined by ``"\\n\\n"``.  ``<script>``
/ ``<style>`` / ``<nav>`` content is dropped.  Entity references are
decoded (``convert_charrefs``).

As a Ray stage this is a stateless ``map_batches`` task (no warm state
needed — the parser is allocated per call, cheap); it projects the
heavy ``html`` binary column away immediately after extraction so the
wide bytes never travel further down the pipeline (SURVEY.md §7f).
"""

from __future__ import annotations

from html.parser import HTMLParser

import pyarrow as pa


class _ArticleTextParser(HTMLParser):
    """Collects <p> text inside <article>, skipping script/style/nav."""

    def __init__(self):
        super().__init__(convert_charrefs=True)
        self.paragraphs: list[str] = []
        self._in_article = 0
        self._in_p = 0
        self._skip = 0
        self._buf: list[str] = []

    def handle_starttag(self, tag, attrs):
        if tag in ("script", "style", "nav"):
            self._skip += 1
        elif tag == "article":
            self._in_article += 1
        elif tag == "p" and self._in_article and not self._skip:
            self._in_p += 1
            self._buf = []

    def handle_endtag(self, tag):
        if tag in ("script", "style", "nav"):
            self._skip = max(0, self._skip - 1)
        elif tag == "article":
            self._in_article = max(0, self._in_article - 1)
        elif tag == "p" and self._in_p:
            self._in_p -= 1
            self.paragraphs.append("".join(self._buf))
            self._buf = []

    def handle_data(self, data):
        if self._in_p and not self._skip:
            self._buf.append(data)


def extract_text(html: bytes | str | None) -> str:
    """Pure deterministic extractor — the per-url invariant anchor."""
    if html is None:
        return ""
    if isinstance(html, (bytes, bytearray, memoryview)):
        html = bytes(html).decode("utf-8", "replace")
    p = _ArticleTextParser()
    p.feed(html)
    p.close()
    return "\n\n".join(p.paragraphs)


class ExtractText:
    """``map_batches`` UDF: adds/overwrites ``text`` from ``html`` and
    drops the ``html`` column.  Keep this stage's ``batch_size`` small
    (html bytes are wide); downstream stages see narrow rows."""

    def __init__(self, html_col: str = "html", text_col: str = "text",
                 drop_html: bool = True):
        self.html_col = html_col
        self.text_col = text_col
        self.drop_html = drop_html

    def __call__(self, batch: pa.Table) -> pa.Table:
        texts = pa.array(
            [extract_text(v) for v in batch[self.html_col].to_pylist()],
            type=pa.string(),
        )
        if self.text_col in batch.column_names:
            batch = batch.drop_columns([self.text_col])
        batch = batch.append_column(self.text_col, texts)
        if self.drop_html:
            batch = batch.drop_columns([self.html_col])
        return batch
