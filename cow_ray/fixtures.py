"""Deterministic synthetic fixtures (FIXTURES.md F1): Common-Crawl-style
``pages`` tables for tests and benchmarks.  Seeded, pure-stdlib
generation — no external data.  The html column is built so that
``cow_ray.stages.extract.extract_text(html) == text`` byte-identically
(the per-url invariant of BASELINE.json ``input_hint``).
"""

from __future__ import annotations

import html as _html
import random

import pyarrow as pa
import pyarrow.parquet as pq

# closed gazetteer: canonical entity → surface-form aliases (FIXTURES.md
# F1 "entities drawn from a closed gazetteer")
GAZETTEER: dict[str, list[str]] = {
    "person/ada_lovelace": ["Ada Lovelace", "Lovelace", "A. Lovelace"],
    "person/alan_turing": ["Alan Turing", "Turing"],
    "person/grace_hopper": ["Grace Hopper", "Hopper", "G. Hopper"],
    "person/edsger_dijkstra": ["Edsger Dijkstra", "Dijkstra"],
    "place/amsterdam": ["Amsterdam"],
    "place/rotterdam": ["Rotterdam"],
    "place/den_haag": ["Den Haag", "The Hague"],
    "place/utrecht": ["Utrecht"],
    "org/acme_corp": ["Acme Corp", "Acme Corporation", "ACME"],
    "org/globex": ["Globex", "Globex International"],
    "org/initech": ["Initech"],
    "org/umbrella": ["Umbrella Group", "Umbrella"],
}

_FILLER = (
    "the report shows steady growth across regions",
    "analysts expect further consolidation this quarter",
    "a new archive was digitised last year",
    "local records mention the event in passing",
    "the committee published its findings yesterday",
    "several sources confirm the account",
)

_HOSTS = [f"site{i}.example.org" for i in range(10)]
_HEAD_HOST = "news.example.org"  # skewed head domain (~20% of rows)

N_DOMAINS = len(_HOSTS) + 1


def make_page_row(i: int, seed: int = 42, empty_every: int = 17) -> dict:
    """Random-access deterministic page row: row ``i`` is generated
    from its own seeded RNG, so generation distributes over Ray blocks
    (``make_pages_rows`` below stays the sequential reference)."""
    rng = random.Random((seed << 32) ^ i)
    aliases = [(ent, a) for ent, al in GAZETTEER.items() for a in al]
    base_ts = 1_600_000_000_000_000
    host = _HEAD_HOST if rng.random() < 0.2 else _HOSTS[rng.randrange(len(_HOSTS))]
    url = f"https://{host}/page/{i}"
    lang = "nl" if rng.random() < 0.15 else "en"
    if empty_every and i % empty_every == 0:
        text = ""
    else:
        n_sent = rng.randrange(1, 5)
        sents = []
        for _ in range(n_sent):
            ent, alias = aliases[rng.randrange(len(aliases))]
            filler = _FILLER[rng.randrange(len(_FILLER))]
            year = 1900 + rng.randrange(126)
            sents.append(f"{alias} visited in {year}; {filler}.")
        text = "\n\n".join(sents)
    return {
        "url": url,
        "warc_ts": base_ts + i * 1_000_000,
        "html": build_html(url, text),
        "text": text,
        "lang": lang,
    }


def make_pages_rows(n: int, seed: int = 42, empty_every: int = 17):
    """Generate ``n`` deterministic page rows as python dicts."""
    rng = random.Random(seed)
    aliases = [(ent, a) for ent, al in GAZETTEER.items() for a in al]
    rows = []
    base_ts = 1_600_000_000_000_000  # fixed epoch, microseconds
    for i in range(n):
        host = _HEAD_HOST if rng.random() < 0.2 else _HOSTS[rng.randrange(len(_HOSTS))]
        url = f"https://{host}/page/{i}"
        lang = "nl" if rng.random() < 0.15 else "en"
        if empty_every and i % empty_every == 0:
            text = ""
        else:
            n_sent = rng.randrange(1, 5)
            sents = []
            for _ in range(n_sent):
                ent, alias = aliases[rng.randrange(len(aliases))]
                filler = _FILLER[rng.randrange(len(_FILLER))]
                year = 1900 + rng.randrange(126)
                sents.append(f"{alias} visited in {year}; {filler}.")
            text = "\n\n".join(sents)
        rows.append(
            {
                "url": url,
                "warc_ts": base_ts + i * 1_000_000,
                "html": build_html(url, text),
                "text": text,
                "lang": lang,
            }
        )
    return rows


def build_html(url: str, text: str) -> bytes:
    """Minimal deterministic page wrapping ``text`` so the extractor
    round-trips it byte-identically."""
    paras = "".join(
        f"<p>{_html.escape(p)}</p>" for p in text.split("\n\n")
    ) if text else ""
    doc = (
        "<html><head><title>"
        + _html.escape(url)
        + "</title><style>body{font:serif}</style></head><body>"
        + "<nav><a href='/'>home</a> | <a href='/about'>about</a></nav>"
        + "<article>"
        + paras
        + "</article>"
        + "<script>var x = 1 < 2;</script>"
        + "</body></html>"
    )
    return doc.encode("utf-8")


PAGES_SCHEMA = pa.schema(
    [
        ("url", pa.string()),
        ("warc_ts", pa.timestamp("us")),
        ("html", pa.binary()),
        ("text", pa.string()),
        ("lang", pa.string()),
    ]
)


def pages_table(n: int, seed: int = 42, empty_every: int = 17) -> pa.Table:
    rows = make_pages_rows(n, seed, empty_every)
    return pa.Table.from_pylist(rows, schema=PAGES_SCHEMA)


def write_pages_parquet(
    path: str, n: int, seed: int = 42, row_group_size: int = 1000,
    empty_every: int = 17,
) -> str:
    """Write a deterministic pages parquet file with several row groups
    (exercises the row-id-deterministic source)."""
    pq.write_table(pages_table(n, seed, empty_every), path,
                   row_group_size=row_group_size)
    return path


# The flagship mapping-rule document for pages → triples (the COW-style
# "program" for the webtext generalization; SURVEY.md §3.4).
def pages_rule_doc(base: str = "https://example.org/kg/") -> dict:
    return {
        "base": base,
        "name": "pages",
        "aboutUrl": "page/{_row}",
        "columns": [
            {
                "name": "url",
                "virtual": True,
                "propertyUrl": "schema:url",
                "datatype": "anyURI",
                "valueUrl": "ignored/{url}",
            },
            {"name": "text", "datatype": "string", "lang": "{lang}",
             "propertyUrl": "schema:text"},
            {"name": "lang", "datatype": "string",
             "propertyUrl": "dc:language"},
            {"name": "warc_ts", "datatype": "dateTime",
             "propertyUrl": "prov:generatedAtTime"},
            {"name": "host", "valueUrl": "host/{host}",
             "propertyUrl": "schema:isPartOf", "schemeUrl": "scheme/hosts"},
        ],
    }
