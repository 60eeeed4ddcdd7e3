"""Mention detection + entity linking as an actor-pool stage.

North-star component (BASELINE.json): "batched mention detection +
entity linking via map_batches over zero-copy Arrow with actor pools
holding warm gazetteer/alias-dictionary and embedding-index state".
The reference has no linking stage (COW's 'linking' is template-minted
IRIs, SURVEY.md §2.4) — this is the new-engine generalization, so its
correctness oracle is the shared pure function :func:`link_text`, not
the reference.

Design for scale:

* the gazetteer (alias → candidate entity ids) is built **once per
  actor** in ``__init__`` — pass a plain dict (captured in the UDF
  closure, serialized once per worker by Ray) or a ``ray.ObjectRef``
  from ``ray.put`` (broadcast: stored once in the object store, fetched
  zero-copy per node, never re-shipped per batch);
* matching uses one compiled regex alternation (longest-alias-first →
  leftmost-longest semantics), compiled once per actor;
* ambiguous aliases are disambiguated with a deterministic
  embedding-index: hash-based unit vectors for every entity built in
  ``__init__`` (the stand-in for a real embedding table; same numpy
  batched-cosine shape a learned index would use), scored against a
  context window around the mention;
* output is a *flat-map*: one row per mention
  ``(_row, url?, surface, entity_id, begin, end)`` — variable
  cardinality inside ``map_batches``, no driver involvement.

Use as::

    mentions = pages.map_batches(
        EntityLinker(gazetteer_ref, text_col="text", carry=["url"]),
        batch_format="pyarrow", batch_size=1024,
        concurrency=8, num_cpus=1)
"""

from __future__ import annotations

import hashlib
import re

import numpy as np
import pyarrow as pa

_WORD = r"[A-Za-z0-9_]"

MENTION_FIELDS = [
    ("surface", pa.string()),
    ("entity_id", pa.string()),
    ("begin", pa.int32()),
    ("end", pa.int32()),
]


def build_alias_index(gazetteer: dict[str, list[str]]) -> dict[str, list[str]]:
    """entity → aliases  ⇒  alias → sorted candidate entity ids
    (deterministic)."""
    idx: dict[str, list[str]] = {}
    for ent in sorted(gazetteer):
        for alias in gazetteer[ent]:
            idx.setdefault(alias, [])
            if ent not in idx[alias]:
                idx[alias].append(ent)
    for alias in idx:
        idx[alias].sort()
    return idx


def compile_alias_regex(aliases) -> re.Pattern:
    """One alternation, longest alias first (python ``re`` picks the
    leftmost alternative that matches → this yields leftmost-longest),
    guarded by word boundaries."""
    ordered = sorted(aliases, key=lambda a: (-len(a), a))
    body = "|".join(re.escape(a) for a in ordered)
    return re.compile(rf"(?<!{_WORD})(?:{body})(?!{_WORD})")


def hash_embedding(key: str, dim: int = 16) -> np.ndarray:
    """Deterministic unit vector from a sha1 stream — the fixture
    embedding index (a real system drops in learned vectors here; the
    batched-cosine machinery is identical)."""
    h = hashlib.sha1(key.encode("utf-8")).digest()
    raw = np.frombuffer((h * ((dim * 4) // len(h) + 1))[: dim * 4], dtype="<i4")
    v = raw.astype(np.float64)
    n = np.linalg.norm(v)
    return v / n if n else v


class LinkerModel:
    """The warm state: alias regex + alias index + entity embedding
    matrix.  Construction cost is paid once per actor."""

    def __init__(self, gazetteer: dict[str, list[str]], context_window: int = 48):
        self.alias_index = build_alias_index(gazetteer)
        self.regex = compile_alias_regex(self.alias_index.keys())
        self.context_window = context_window
        self.entities = sorted(gazetteer)
        self._emb = {e: hash_embedding(e) for e in self.entities}

    def link_text(self, text: str) -> list[tuple[str, str, int, int]]:
        """Pure, deterministic: [(surface, entity_id, begin, end)].
        Ambiguity resolved by cosine(context embedding, entity
        embedding) with lexicographic tie-break."""
        if not text:
            return []
        out = []
        for m in self.regex.finditer(text):
            surface = m.group(0)
            cands = self.alias_index[surface]
            if len(cands) == 1:
                ent = cands[0]
            else:
                lo = max(0, m.start() - self.context_window)
                ctx = text[lo : m.end() + self.context_window]
                cvec = hash_embedding(ctx)
                best = max(
                    cands, key=lambda e: (float(self._emb[e] @ cvec), e)
                )
                ent = best
            out.append((surface, ent, m.start(), m.end()))
        return out


class EntityLinker:
    """``map_batches`` actor UDF: pages batch → mentions batch."""

    def __init__(
        self,
        gazetteer,
        text_col: str = "text",
        carry: list[str] | None = None,
        context_window: int = 48,
    ):
        # accept a broadcast handle (ray.put) or a plain dict
        try:
            import ray

            if isinstance(gazetteer, ray.ObjectRef):
                gazetteer = ray.get(gazetteer)
        except ImportError:  # pure-python tests without ray
            pass
        self.model = LinkerModel(gazetteer, context_window)
        self.text_col = text_col
        self.carry = carry or []

    def __call__(self, batch: pa.Table) -> pa.Table:
        texts = batch[self.text_col].to_pylist()
        carry_cols = {c: batch[c].to_pylist() for c in self.carry}
        if "_row" in batch.column_names:
            carry_cols["_row"] = batch["_row"].to_pylist()

        surfaces: list[str] = []
        entities: list[str] = []
        begins: list[int] = []
        ends: list[int] = []
        carry_out: dict[str, list] = {c: [] for c in carry_cols}
        link = self.model.link_text
        for i, text in enumerate(texts):
            for surface, ent, b, e in link(text or ""):
                surfaces.append(surface)
                entities.append(ent)
                begins.append(b)
                ends.append(e)
                for c, vals in carry_cols.items():
                    carry_out[c].append(vals[i])

        arrays = []
        names = []
        for c, vals in carry_out.items():
            names.append(c)
            # keep the source column's type so empty batches don't
            # destabilize the Dataset schema
            arrays.append(pa.array(vals, type=batch[c].type))
        names += [f for f, _ in MENTION_FIELDS]
        arrays += [
            pa.array(surfaces, type=pa.string()),
            pa.array(entities, type=pa.string()),
            pa.array(begins, type=pa.int32()),
            pa.array(ends, type=pa.int32()),
        ]
        return pa.Table.from_arrays(arrays, names=names)
