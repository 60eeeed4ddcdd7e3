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


import re as _re
from html import unescape as _unescape

_ARTICLE_RE = _re.compile(r"<article\b[^>]*>(.*?)</article>", _re.S)
_BLOCK_RE = _re.compile(r"<(script|style|nav)\b[^>]*>.*?</\1>", _re.S)
_BLOCK_OPEN_RE = _re.compile(r"<(script|style|nav)\b")
_P_RE = _re.compile(r"<p\b[^>]*>(.*?)</p>", _re.S)
_TAG_RE = _re.compile(r"<[^>]*>")
# global bail-out triggers: a quoted attribute value containing '>' or
# an HTML comment (both can hide tag boundaries from the regexes)
_SUSPICIOUS_RE = _re.compile(r"=\s*\"[^\"<]*>|=\s*'[^'<]*>|<!--")
# within-article bail-outs (checked after script/style/nav stripping):
# a stray '<' that isn't a tag start, or an uppercase tag name (the
# parser lowercases; the fast regexes don't)
_CONTENT_SUSPICIOUS_RE = _re.compile(r"<(?![a-z/!])")


def _extract_fast(html: str) -> str | None:
    """Regex fast path for well-formed pages (the hot-path cost of the
    stdlib HTMLParser is ~2 ms/page — 10× this).  Returns None on any
    structure it can't PROVE it handles identically; the caller falls
    back to the parser, so the observable function stays exact."""
    if _re.search(r"</?[A-Z]", html):
        return None  # uppercase tags — parser lowercases, regexes don't
    if _SUSPICIOUS_RE.search(html):
        return None  # quoted attr containing '>' or comment
    if _re.search(r"<[a-z/][^>]*<", html):
        return None  # unterminated tag ('<' before the tag's '>')
    # an unbalanced CDATA/RCDATA-ish or skip element ANYWHERE poisons
    # the parser's state for the rest of the document → parser decides
    for el in ("script", "style", "title", "nav", "article"):
        if html.count(f"<{el}") != html.count(f"</{el}"):
            return None
    if "<article" not in html:
        return "" if "<p" not in html else None
    paras: list[str] = []
    spans = list(_ARTICLE_RE.finditer(html))
    if len(spans) != html.count("<article"):
        return None
    for m in spans:
        content = m.group(1)
        if "<article" in content:
            return None
        if _BLOCK_OPEN_RE.search(content):
            content = _BLOCK_RE.sub("", content)
            if _BLOCK_OPEN_RE.search(content):
                return None  # unbalanced script/style/nav
        if _CONTENT_SUSPICIOUS_RE.search(content):
            return None  # stray '<' in article text
        n_open = len(_re.findall(r"<p\b", content))
        pms = list(_P_RE.finditer(content))
        if len(pms) != n_open or content.count("</p>") != n_open:
            return None
        for pm in pms:
            inner = pm.group(1)
            if "<p" in inner:
                return None
            paras.append(_unescape(_TAG_RE.sub("", inner)))
    return "\n\n".join(paras)


def extract_text(html: bytes | str | None) -> str:
    """Pure deterministic extractor — the per-url invariant anchor.
    Semantics are defined by ``_ArticleTextParser``; ``_extract_fast``
    is an equivalence-tested shortcut that bails to the parser on
    anything irregular."""
    if html is None:
        return ""
    if isinstance(html, (bytes, bytearray, memoryview)):
        html = bytes(html).decode("utf-8", "replace")
    fast = _extract_fast(html)
    if fast is not None:
        return fast
    p = _ArticleTextParser()
    p.feed(html)
    p.close()
    return "\n\n".join(p.paragraphs)


def extract_text_reference(html: bytes | str | None) -> str:
    """The parser-only path (the semantic definition) — used by tests
    to prove fast-path equivalence."""
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
