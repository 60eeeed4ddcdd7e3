"""Deterministic corpus mixture — weighted multi-source mixing with
fractional-epoch upsampling, the published LLM-training recipe
(GPT-3's per-dataset "epochs elapsed" mixing, Brown et al. 2020
Table 2.2; Dolma's source-weighted composition, Soldaini et al. 2024).

``mixture`` takes named source datasets with float weights:

* weight 2.4 → every document appears twice (epochs 0 and 1) plus a
  content-addressed 40% of documents a third time (epoch 2);
* weight 1.0 → every document once;
* weight 0.25 → a content-addressed 25% downsample.

The fractional selection is the repo's standard md5 contract
(ops/md5np.py vectorized lanes; mirrored in SQL via the
first-two-hex-digit bucket, granularity 1/256): bucket(key#source)
< round(frac·256).  The key is salted with the source name so a
document's mixture membership is independent of its train/val/test
``hash_split`` bucket and of any other source's sampling.

Scale shape: embarrassingly parallel — each source is one streaming
``map_batches`` (row duplication is a vectorized ``take`` with
repeated indices, epochs from the repeat/cumsum scatter pattern), and
the sources are combined with ``union``, which concatenates block
streams WITHOUT an exchange.  Nothing materializes; weights scale to
any corpus size.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from .md5np import md5_first_byte
from .sample import _key_array

BUCKETS = 256


def plan_weights(weights: dict[str, float]) -> dict[str, tuple[int, int]]:
    """Resolve each float weight into the integer contract
    ``(full_epochs, frac_threshold)``: a row appears ``full_epochs``
    times always, plus once more iff its salted md5 bucket (0..255)
    is < ``frac_threshold``.  Computed ONCE here so the Ray op and a
    SQL oracle share identical integers (no float re-derivation)."""
    import math

    out = {}
    for name, w in weights.items():
        if not (w >= 0) or w != w:  # rejects negatives and NaN
            raise ValueError(f"mixture: weight for {name!r} must be "
                             f"a non-negative number, got {w!r}")
        full = int(w)
        # round-half-up as documented (round() would bank to even)
        thresh = int(math.floor((w - full) * BUCKETS + 0.5))
        if thresh == BUCKETS:  # e.g. w=1.999 rounds up to a full epoch
            full, thresh = full + 1, 0
        if w > 0 and full == 0 and thresh == 0:
            raise ValueError(
                f"mixture: weight {w!r} for {name!r} is below the "
                f"1/{2 * BUCKETS} plan granularity and would silently "
                "drop the source — use 0 to drop it explicitly, or a "
                f"weight ≥ 1/{2 * BUCKETS}")
        out[name] = (full, thresh)
    if all(f == 0 and t == 0 for f, t in out.values()):
        raise ValueError("mixture: all weights resolve to zero output")
    return out


def _expand_fn(name: str, full: int, thresh: int, key_col: str,
               source_col: str, epoch_col: str):
    salt = f"#{name}"

    def expand(batch: pa.Table) -> pa.Table:
        n = batch.num_rows
        if n == 0:  # np.repeat broadcast breaks on 0-row input
            return batch.append_column(
                source_col, pa.array([], type=pa.string()),
            ).append_column(epoch_col, pa.array([], type=pa.int64()))
        key = _key_array(batch, key_col, "mixture")
        counts = np.full(n, full, dtype=np.int64)
        if thresh > 0:
            salted = pc.binary_join_element_wise(
                pc.cast(key, pa.string()), salt, "")
            counts += md5_first_byte(salted) < thresh
        total = int(counts.sum())
        idx = np.repeat(np.arange(n, dtype=np.int64), counts)
        out = batch.take(pa.array(idx))
        starts = np.concatenate(([0], np.cumsum(counts)[:-1]))
        epoch = np.arange(total, dtype=np.int64) - np.repeat(starts,
                                                             counts)
        return out.append_column(
            source_col, pa.array(np.repeat(np.array([name]), total),
                                 type=pa.string()),
        ).append_column(epoch_col, pa.array(epoch, type=pa.int64()))

    return expand


def mixture(sources, key_col: str, *, source_col: str = "mix_source",
            epoch_col: str = "epoch"):
    """Mix named source datasets by weight into one stream.

    ``sources``: iterable of ``(name, dataset, weight)``.  All source
    datasets must share a schema (union requirement).  Appends
    ``source_col`` (the source name) and ``epoch_col`` (0-based copy
    index per document).  Null keys raise (the sample.py null-key
    contract)."""
    sources = list(sources)
    names = [name for name, _, _ in sources]
    if len(set(names)) != len(names):
        raise ValueError(f"mixture: duplicate source names in {names}")
    plan = plan_weights({name: w for name, _, w in sources})
    streams = []
    for name, ds, _ in sources:
        full, thresh = plan[name]
        if full == 0 and thresh == 0:
            continue  # weight 0: source contributes nothing
        streams.append(ds.map_batches(
            _expand_fn(name, full, thresh, key_col, source_col,
                       epoch_col),
            batch_format="pyarrow"))
    if len(streams) == 1:
        return streams[0]
    return streams[0].union(*streams[1:])
