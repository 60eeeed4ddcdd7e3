"""URL parsing, normalization and per-domain aggregation — the
web-corpus bookkeeping layer (crawl partitioning, per-site stats,
domain-level filtering all key on the registered domain).

Everything is vectorized RE2 (``pyarrow.compute`` string kernels);
the DuckDB oracle mirrors each step with DuckDB's RE2-backed
``regexp_extract`` / ``regexp_replace``, so results are hash-exact
across engines (shared regex engine semantics: leftmost match,
non-overlapping global replace).

Normalization contract (the common crawl-dedup recipe):

* scheme and host lowercased; path/query case preserved;
* default ports dropped (``:80`` http, ``:443`` https), others kept;
* tracking parameters removed (``utm_*``, ``fbclid``, ``gclid``),
  the ``?`` dropped when the query empties;
* ``domain`` = registered domain — last two host labels, or three
  when the suffix is a known second-level public suffix (a bundled
  shortlist stands in for the full Mozilla Public Suffix List, which
  is an external artifact; same heuristic family as the reference's
  iribaker-style host handling, /root/reference docs).

Rows whose ``url`` does not parse (no ``scheme://host``) get null
parse columns — they are surfaced, never dropped silently.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

# second-level suffixes where the registered domain is 3 labels
_SLD = "co\\.uk|org\\.uk|ac\\.uk|gov\\.uk|com\\.au|co\\.jp"
_DOMAIN_RE = f"(?P<d>[^.]+\\.(?:{_SLD})|[^.]+\\.[^.]+)$"
_TRACKING_RE = "(?:^|&)(?:utm_[a-z0-9_]*|fbclid|gclid)=[^&]*"


def _field(url_arr, pattern: str, name: str, fill: str | None = ""):
    """regexp_extract equivalent: named-group extract; no-match →
    ``fill`` (DuckDB's regexp_extract returns '' on no match)."""
    s = pc.struct_field(pc.extract_regex(url_arr, pattern=pattern),
                        name)
    return pc.fill_null(s, fill) if fill is not None else s


def parse_batch(batch: pa.Table, url_col: str = "url") -> pa.Table:
    """Append ``scheme host domain path norm_url`` to a batch."""
    u = batch[url_col]
    if isinstance(u, pa.ChunkedArray):
        u = u.combine_chunks()
    scheme = pc.utf8_lower(_field(
        u, "^(?P<s>[A-Za-z][A-Za-z0-9+.-]*)://", "s"))
    hostport = _field(
        u, "^[A-Za-z][A-Za-z0-9+.-]*://(?P<hp>[^/?#]*)", "hp")
    host = pc.utf8_lower(_field(hostport, "^(?P<h>[^:]*)", "h"))
    port = _field(hostport, ":(?P<p>[0-9]+)$", "p")
    path = _field(
        u, "^[A-Za-z][A-Za-z0-9+.-]*://[^/?#]*(?P<pa>[^?#]*)", "pa")
    query = _field(u, "\\?(?P<q>[^#]*)", "q")

    clean_q = pc.replace_substring_regex(
        pc.replace_substring_regex(query, pattern=_TRACKING_RE,
                                   replacement=""),
        pattern="^&", replacement="")
    keep_port = pc.if_else(
        pc.or_(
            pc.equal(port, ""),
            pc.or_(
                pc.and_(pc.equal(scheme, "http"), pc.equal(port, "80")),
                pc.and_(pc.equal(scheme, "https"),
                        pc.equal(port, "443")))),
        pa.scalar(""), pc.binary_join_element_wise(":", port, ""))
    q_part = pc.if_else(pc.equal(clean_q, ""), pa.scalar(""),
                        pc.binary_join_element_wise("?", clean_q, ""))
    domain = _field(host, _DOMAIN_RE, "d")
    parsed = pc.not_equal(scheme, "")  # '' = url did not parse
    norm = pc.if_else(
        parsed,
        pc.binary_join_element_wise(
            scheme, "://", host, keep_port, path, q_part, ""),
        pa.scalar(None, type=pa.string()))
    null_if_unparsed = lambda col: pc.if_else(  # noqa: E731
        parsed, col, pa.scalar(None, type=pa.string()))
    out = batch
    for name, col in [("scheme", null_if_unparsed(scheme)),
                      ("host", null_if_unparsed(host)),
                      ("domain", null_if_unparsed(domain)),
                      ("path", null_if_unparsed(path)),
                      ("norm_url", norm)]:
        out = out.append_column(name, col)
    return out


def parse_urls(ds, url_col: str = "url"):
    """Dataset version of :func:`parse_batch` (one streamed scan)."""
    return ds.map_batches(lambda b: parse_batch(b, url_col),
                          batch_format="pyarrow")


def domain_stats(ds, url_col: str = "url", chars_col: str | None = None):
    """Per-registered-domain page count (+ optional char sum):
    map-side per-batch combine → one domain-keyed exchange carrying
    ``domains × blocks`` partial rows (domain cardinality is
    web-scale-large but exchange rows are partials, never pages)."""
    from ray.data.aggregate import Sum

    def partial(batch: pa.Table) -> pa.Table:
        p = parse_batch(batch, url_col)
        cols = {"domain": pc.fill_null(p["domain"], "<unparsed>")}
        if chars_col is not None:
            cols["chars"] = p[chars_col]
        t = pa.table(cols)
        aggs = [("domain", "count")] + (
            [("chars", "sum")] if chars_col is not None else [])
        g = t.group_by(["domain"], use_threads=False).aggregate(
            [(c, f) for c, f in aggs])
        out = {"domain": g["domain"],
               "n_pages": g["domain_count"].cast(pa.int64())}
        if chars_col is not None:
            out["sum_chars"] = g["chars_sum"].cast(pa.int64())
        return pa.table(out)

    g = ds.map_batches(partial, batch_format="pyarrow").groupby("domain")
    aggs = [Sum("n_pages", alias_name="n_pages")] + (
        [Sum("sum_chars", alias_name="sum_chars")]
        if chars_col is not None else [])
    return g.aggregate(*aggs)


DOMAIN_LIST_MAX = 50_000_000


def filter_by_domain(ds, blocked_domains, url_col: str = "url",
                     mode: str = "block", keep_unparsed: bool = False):
    """Domain blocklist/allowlist filter — stage one of every
    published web-curation recipe (C4 drops bad-word domains,
    RefinedWeb applies the UT1 blocklists, Gopher/Dolma both gate on
    domain before any content work).

    ``blocked_domains`` is an iterable of registered domains (as
    produced by :func:`parse_batch`'s ``domain`` column), a
    ``ray.ObjectRef`` to one, or an Arrow array; ``mode="block"``
    drops members, ``mode="allow"`` keeps only members.  Scale shape:
    the list broadcasts ONCE (``ray.put`` upstream or closure here —
    real blocklists are a few million domains, guarded by
    ``DOMAIN_LIST_MAX``); each batch does one vectorized RE2 parse +
    one Arrow ``is_in`` hash probe.  The corpus never shuffles.

    Unparsed rows (null domain) are dropped unless ``keep_unparsed``
    — in allow mode they can never match the list, and in block mode
    an unparseable URL is itself a quality signal."""
    if mode not in ("block", "allow"):
        raise ValueError(f"mode must be block|allow, got {mode!r}")

    def prep(doms) -> pa.Array:
        if isinstance(doms, pa.Array):
            arr = doms
        elif isinstance(doms, pa.ChunkedArray):
            arr = doms.combine_chunks()
        else:
            arr = pa.array(list(doms), type=pa.string())
        if len(arr) > DOMAIN_LIST_MAX:
            raise ValueError(
                f"domain list has {len(arr)} entries > DOMAIN_LIST_MAX="
                f"{DOMAIN_LIST_MAX}; shard the filter or raise the cap")
        return arr

    is_ref = type(blocked_domains).__name__ == "ObjectRef"
    if not is_ref:
        # validate + convert once on the driver; the Arrow array rides
        # the task closure (Ray serializes it once per worker)
        blocked_domains = prep(blocked_domains)
    memo: dict = {}

    def fn(batch: pa.Table) -> pa.Table:
        doms = blocked_domains
        if is_ref:
            if "v" not in memo:
                import ray

                memo["v"] = prep(ray.get(doms))
            doms = memo["v"]
        value_set = doms
        p = parse_batch(batch, url_col)
        dom = p["domain"]
        member = pc.fill_null(pc.is_in(dom, value_set=value_set), False)
        keep = pc.invert(member) if mode == "block" else member
        if keep_unparsed:
            keep = pc.or_(keep, pc.is_null(dom))
        elif mode == "block":
            keep = pc.and_(keep, pc.invert(pc.is_null(dom)))
        return batch.filter(keep)

    return ds.map_batches(fn, batch_format="pyarrow")
