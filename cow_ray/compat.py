"""Drop-in library entry point mirroring the reference's ``COW`` class
(``/root/reference/src/csvw_tool.py:20-86``)::

    from cow_ray.compat import COW
    COW(mode='build',   files=['data.csv'], base='https://example.com/id/')
    COW(mode='convert', files=['data.csv'], output_format='nquads')

Semantics preserved: ``build`` writes ``<file>-metadata.json`` (backing
up a prior version with a timestamp suffix, like the reference);
``convert`` reads ``<file>-metadata.json``, converts, and writes
``<file>.nq[.gz]`` (or the chosen serialization) next to the input.
The triple store additionally lands in ``<file>.store/`` (partitioned
parquet — the canonical output this engine adds).

Differences: ``processes`` maps to Ray parallelism (only honored if
this call initializes Ray); ``chunksize`` is accepted and ignored —
batch granularity is block-based (see ConvertConfig).  Each failing
file is skipped with a traceback, like the reference
(``csvw_tool.py:82-84``).
"""

from __future__ import annotations

import datetime
import json
import os
import traceback
from glob import glob


class COW:
    def __init__(self, mode=None, files=None, dataset=None, delimiter=None,
                 encoding=None, quotechar='"', processes=4, chunksize=5000,
                 base="https://example.com/id/", output_format="nquads",
                 gzipped=False):
        del chunksize  # block-based batching; accepted for API parity
        expanded: list[str] = []
        for f in files or []:
            expanded.extend(sorted(glob(f)) or [f])

        for source_file in expanded:
            try:
                if mode == "build":
                    self._build(source_file, dataset, delimiter, encoding,
                                quotechar, base)
                elif mode == "convert":
                    self._convert(source_file, delimiter, encoding, quotechar,
                                  processes, base, output_format, gzipped)
                else:
                    raise ValueError(f"unknown mode {mode!r}")
            except Exception:
                # reference behavior: report and continue with next file
                print(f"Something went wrong converting {source_file}:")
                traceback.print_exc()

    def _build(self, source_file, dataset, delimiter, encoding, quotechar,
               base):
        from .build import build_rules

        target = f"{source_file}-metadata.json"
        if os.path.exists(target):
            ts = datetime.datetime.fromtimestamp(
                os.path.getmtime(target)).isoformat().replace(":", "_")
            backup = f"{target}.{ts}"
            os.rename(target, backup)
            print(f"Backed up prior version of schema to {backup}")
        doc = build_rules(source_file, base=base, dataset_name=dataset,
                          delimiter=delimiter, quotechar=quotechar,
                          encoding=encoding)
        with open(target, "w") as f:
            json.dump(doc, f, indent=1, ensure_ascii=False)
        print(f"Built schema {target}")

    def _convert(self, source_file, delimiter, encoding, quotechar, processes,
                 base, output_format, gzipped):
        import ray

        if not ray.is_initialized():
            ray.init(address="local", num_cpus=processes,
                     include_dashboard=False, ignore_reinit_error=True,
                     logging_level="ERROR")
            from ray.data import DataContext

            DataContext.get_current().enable_progress_bars = False

        meta_file = f"{source_file}-metadata.json"
        if not os.path.exists(meta_file):
            raise FileNotFoundError(
                f"Could not find metadata file {meta_file}; run build first")
        with open(meta_file) as f:
            rules = json.load(f)
        # CLI-style overrides (reference csvw.py:257-271: dialect in the
        # metadata wins over call arguments)
        rules.setdefault("dialect", {})
        if delimiter and "delimiter" not in rules["dialect"]:
            rules["dialect"]["delimiter"] = delimiter
        if encoding and "encoding" not in rules["dialect"]:
            rules["dialect"]["encoding"] = encoding

        store = f"{source_file}.store"
        if source_file.endswith(".csv"):
            from .sources.csv import convert_csv

            _, manifests = convert_csv(source_file, rules, store)
        else:
            from .pipelines.convert import convert_pages

            _, manifests = convert_pages(source_file, rules, store)
        total = sum(m["num_triples"] for m in manifests)
        print(f"Converted {source_file}: {total} triples → {store}")

        # route through the CLI exporter so every format gets its real
        # serializer (the old path wrote N-Quads into a .trig file)
        from .__main__ import _export, _ext

        fmt = output_format if output_format in (
            "nquads", "ntriples", "turtle", "n3", "trig", "xml",
            "pretty-xml", "trix"
        ) else "nquads"
        gz = gzipped and fmt in ("nquads", "ntriples")
        if gzipped and not gz:
            # reference parity: only the N-Quads/N-Triples writers gzip
            print(f"Note: gzipped output is not supported for {fmt}; "
                  "writing uncompressed")
        out = source_file + _ext(fmt, gz)
        _export(store, fmt, out, gzipped=gz)
        print(f"Serialized to {out}")
