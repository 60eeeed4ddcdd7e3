"""CLI — the reference's ``cow_tool_cli`` surface re-expressed
(``/root/reference/src/csvw_tool.py:88-121``)::

    python -m cow_ray build <file.csv|file.parquet> [--base B]
    python -m cow_ray convert <input> --rules rules.json --out store/
        [--format nquads|turtle] [--gzip] [--num-parts N] [--no-dedup]
        [--parallelism N]
    python -m cow_ray export <store-dir> --format nquads|turtle|trig
        [--out file]

``convert`` accepts CSV or Parquet input; with a COW CSVW metadata
JSON next to a CSV (``<file>.csv-metadata.json``) it is picked up
automatically, like the reference.  The CLI owns the Ray session
(``ray job submit``-friendly); the library never calls ``ray.init``.
"""

from __future__ import annotations

import argparse
import glob
import json
import os
import sys


def _init_ray(parallelism: int | None):
    import ray

    if not ray.is_initialized():
        ray.init(
            address="local",
            num_cpus=parallelism,
            include_dashboard=False,
            ignore_reinit_error=True,
            logging_level="ERROR",
        )
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False


def cmd_build(args) -> int:
    from .build import build_rules_file

    for pattern in args.files:
        for f in sorted(glob.glob(pattern)) or [pattern]:
            out = build_rules_file(f, base=args.base)
            print(f"wrote {out}")
    return 0


def _load_rules(input_path: str, rules_path: str | None) -> dict:
    candidates = [rules_path] if rules_path else [
        f"{input_path}-metadata.json",   # reference convention
        f"{input_path}-rules.json",
    ]
    for c in candidates:
        if c and os.path.exists(c):
            with open(c) as f:
                return json.load(f)
    raise SystemExit(
        f"no rule document found for {input_path} (tried {candidates}); "
        "pass --rules"
    )


def cmd_convert(args) -> int:
    _init_ray(args.parallelism)
    import ray

    from .build import is_jsonl
    from .pipelines.convert import ConvertConfig, convert_pages
    from .sources.csv import convert_csv

    inputs = sorted(glob.glob(args.input)) or [args.input]
    single = inputs[0] if len(inputs) == 1 else None
    rules = (_load_rules(single or args.input, args.rules)
             if (args.rules or single) else None)
    cfg = ConvertConfig(num_parts=args.num_parts, dedup=not args.no_dedup,
                        resume=not args.no_resume,
                        append=getattr(args, "append", False))
    gazetteer = None
    mention_rules = None
    if args.gazetteer:
        with open(args.gazetteer) as f:
            gazetteer = json.load(f)
    if args.mention_rules:
        with open(args.mention_rules) as f:
            mention_rules = json.load(f)

    sub_stores: list[str] = []
    if (len(inputs) > 1 and all(f.endswith(".csv") for f in inputs)
            and args.rules):
        # explicit shared --rules: ONE job over the whole CSV glob,
        # unified global _row space, one store
        _, manifests = convert_csv(inputs, rules, args.out, config=cfg)
    elif len(inputs) > 1 and all(f.endswith(".csv") for f in inputs):
        # reference behavior: glob of CSVs converts each file (its own
        # sidecar metadata) into a per-file sub-store
        total_parts = []
        used: dict[str, int] = {}
        for f in inputs:
            # args.rules is always falsy here (the shared-rules case
            # took the single-job branch above)
            frules = _load_rules(f, None)
            name = os.path.basename(f)
            n = used.get(name, 0)
            used[name] = n + 1
            if n:  # same basename from different dirs: keep distinct
                name = f"{name}.{n}"
            sub = os.path.join(args.out, name + ".store")
            sub_stores.append(sub)
            _, m = convert_csv(f, frules, sub, config=cfg)
            total_parts.extend(m)
        manifests = total_parts
    elif all(__import__("cow_ray.sources.warc",
                        fromlist=["is_warc"]).is_warc(f)
             for f in inputs):
        # raw crawl shard(s): stage once to columnar pages, then the
        # full flagship conversion (extract -> link -> triples)
        if rules is None:
            raise SystemExit("WARC input needs --rules")
        from .sources.warc import convert_warc

        _, manifests = convert_warc(
            inputs if len(inputs) > 1 else inputs[0], rules, args.out,
            gazetteer=gazetteer, mention_rules=mention_rules,
            config=cfg,
        )
    elif len(inputs) > 1 and all(is_jsonl(f) for f in inputs):
        # JSONL shard glob: ONE job, unified global _row space
        if rules is None:
            raise SystemExit(
                "a multi-shard JSONL glob needs --rules (one shared "
                "rule document)")
        from .sources.jsonl import convert_jsonl

        _, manifests = convert_jsonl(inputs, rules, args.out, config=cfg)
    elif len(inputs) > 1:
        # multi-file parquet: one job over the file list, shared rules
        if rules is None:
            raise SystemExit(
                "a multi-file parquet glob needs --rules (one shared "
                "rule document)")
        _, manifests = convert_pages(
            inputs, rules, args.out, gazetteer=gazetteer,
            mention_rules=mention_rules, config=cfg,
        )
    elif single.endswith(".csv"):
        _, manifests = convert_csv(single, rules, args.out, config=cfg)
    elif is_jsonl(single):
        from .sources.jsonl import convert_jsonl

        _, manifests = convert_jsonl(single, rules, args.out, config=cfg)
    else:
        _, manifests = convert_pages(
            single, rules, args.out, gazetteer=gazetteer,
            mention_rules=mention_rules, config=cfg,
        )
    total = sum(m["num_triples"] for m in manifests)
    print(f"wrote {total} triples in {len(manifests)} partitions → {args.out}")

    if args.format and args.format != "parquet":
        targets = sub_stores or [args.out]
        for store in targets:
            _export(store, args.format,
                    store.rstrip("/") + _ext(args.format, args.gzip),
                    args.gzip)
    ray.shutdown()
    return 0


def _ext(fmt: str, gzipped: bool = False) -> str:
    e = {"nquads": ".nq", "ntriples": ".nt", "turtle": ".ttl",
         "n3": ".n3", "trig": ".trig", "xml": ".xml",
         "pretty-xml": ".xml", "trix": ".trix"}[fmt]
    return e + (".gz" if gzipped else "")


def _export(store: str, fmt: str, out: str, gzipped: bool = False) -> None:
    from .stages.materialize import read_triple_store
    from .stages.nq import export_nquads
    from .stages.serialize import (
        export_rdfxml,
        export_trig,
        export_trix,
        export_turtle,
    )

    ds = read_triple_store(store)
    if fmt in ("nquads", "ntriples"):
        n = export_nquads(ds, out, gzipped=gzipped)
    elif fmt in ("turtle", "n3"):
        # Turtle output is valid N3 (N3 ⊃ Turtle); the reference's `n3`
        # extension (csvw.py:39-41) likewise emits rdflib's turtle-style
        # serialization for plain triple data
        n = export_turtle(ds, out)
    elif fmt == "xml":
        n = export_rdfxml(ds, out)
    elif fmt == "pretty-xml":
        from .stages.serialize import export_pretty_xml

        n = export_pretty_xml(ds, out)
    elif fmt == "trix":
        n = export_trix(ds, out)
    elif fmt == "trig":
        import pyarrow.parquet as pq

        assertion = None
        job_file = os.path.join(store, "_job.json")
        if os.path.exists(job_file):
            with open(job_file) as f:
                assertion = (json.load(f).get("graphs") or {}).get("assertion")
        rows = []
        for b in ds.iter_batches(batch_size=65536, batch_format="pyarrow"):
            for r in b.to_pylist():
                r["graph"] = assertion
                rows.append(r)
        prov = os.path.join(store, "_provenance", "quads.parquet")
        if os.path.exists(prov):
            rows.extend(pq.read_table(prov).to_pylist())
        n = export_trig(rows, out)
    else:
        raise SystemExit(f"unknown format {fmt}")
    print(f"exported {n} statements → {out}")


def cmd_curate(args) -> int:
    """Corpus curation: filter → exact dedup → optional near-dup
    removal over a documents parquet; writes surviving rows as
    partitioned parquet."""
    _init_ray(args.parallelism)
    import ray
    import ray.data

    from .pipelines.curate import curate_corpus

    inputs = sorted(glob.glob(args.input)) or [args.input]
    if os.path.isfile(args.out) or (
        os.path.isdir(args.out) and os.listdir(args.out)
    ):
        # write_parquet APPENDS uniquely-named files — stale shards
        # from an earlier run would silently mix into the corpus (and
        # a regular file would fail deep inside the write)
        raise SystemExit(
            f"--out {args.out} exists; remove it or choose a fresh "
            "directory"
        )
    ds = ray.data.read_parquet(inputs)
    out = curate_corpus(
        ds,
        langs=(tuple(s.strip() for s in args.langs.split(","))
               if args.langs else None),
        min_chars=args.min_chars,
        max_punct_ppm=args.max_punct_ppm,
        dedup_exact=not args.no_dedup,
        near_dup=args.near_dup,
        near_dup_threshold=args.near_dup_threshold,
        text_col=args.text_col,
        id_col=args.id_col,
    )
    mat = out.materialize()  # one execution for count AND write
    n = mat.count()
    if n:
        mat.write_parquet(args.out)
    else:
        os.makedirs(args.out, exist_ok=True)  # empty result, real dir
    print(f"kept {n} documents → {args.out}")
    ray.shutdown()
    return 0


def cmd_export(args) -> int:
    _init_ray(args.parallelism)
    import ray

    out = args.out or args.store.rstrip("/") + _ext(args.format, args.gzip)
    _export(args.store, args.format, out, args.gzip)
    ray.shutdown()
    return 0


def cmd_query(args) -> int:
    """BGP query over a materialized triple store: each --pattern is
    "s p o" (whitespace-split, object may contain spaces); terms
    starting with ? are variables."""
    _init_ray(args.parallelism)
    import ray
    import ray.data

    from .ops.bgp import bgp_match

    patterns = []
    for raw in args.pattern:
        parts = raw.split(None, 2)
        if len(parts) != 3:
            print(f"bad pattern (need 's p o'): {raw!r}",
                  file=sys.stderr)
            return 2
        patterns.append(tuple(parts))
    from .stages.materialize import read_triple_store

    # read_triple_store filters crashed-run part-*.tmp-* leftovers —
    # a bare glob would double-read such partitions
    ds = read_triple_store(args.store)
    out = bgp_match(ds, patterns)
    rows = out.take(args.limit)
    # var order = first appearance across patterns (Dataset.schema()
    # can be None for an empty lazy result)
    cols = []
    for pat in patterns:
        for t in pat:
            if t.startswith("?") and t[1:] not in cols:
                cols.append(t[1:])
    print("\t".join(cols))
    for r in rows:
        print("\t".join("" if r[c] is None else str(r[c])
                        for c in cols))
    print(f"# {len(rows)} binding(s)"
          + (" (limit reached)" if len(rows) == args.limit else ""),
          file=sys.stderr)
    ray.shutdown()
    return 0


def main(argv=None) -> int:
    p = argparse.ArgumentParser(prog="cow_ray")
    sub = p.add_subparsers(dest="cmd", required=True)

    b = sub.add_parser("build", help="build a skeleton rule document")
    b.add_argument("files", nargs="+")
    b.add_argument("--base", default="https://example.com/id/")
    b.set_defaults(fn=cmd_build)

    c = sub.add_parser("convert", help="convert csv/parquet to a triple store")
    c.add_argument("input")
    c.add_argument("--rules")
    c.add_argument("--out", required=True)
    c.add_argument("--format", default="parquet",
                   choices=["parquet", "nquads", "ntriples", "turtle",
                            "n3", "trig", "xml", "pretty-xml", "trix"])
    c.add_argument("--gzip", action="store_true")
    c.add_argument("--num-parts", type=int, default=16)
    c.add_argument("--no-dedup", action="store_true")
    c.add_argument("--no-resume", action="store_true")
    c.add_argument("--append", action="store_true",
                   help="delta-ingest into an existing COMPLETE store "
                        "(only touched partitions rewrite)")
    c.add_argument("--parallelism", type=int, default=None)
    c.add_argument("--gazetteer", help="entity gazetteer JSON for linking")
    c.add_argument("--mention-rules", help="rule doc applied to mentions")
    c.set_defaults(fn=cmd_convert)

    cu = sub.add_parser(
        "curate",
        help="filter + dedup a documents parquet (training-data prep)")
    cu.add_argument("input")
    cu.add_argument("--out", required=True)
    cu.add_argument("--langs", help="comma-separated lang allowlist")
    cu.add_argument("--min-chars", type=int, default=0)
    cu.add_argument("--max-punct-ppm", type=int, default=None)
    cu.add_argument("--no-dedup", action="store_true")
    cu.add_argument("--near-dup", action="store_true")
    cu.add_argument("--near-dup-threshold", type=float, default=0.8)
    cu.add_argument("--text-col", default="text")
    cu.add_argument("--id-col", default="doc_id")
    cu.add_argument("--parallelism", type=int, default=None)
    cu.set_defaults(fn=cmd_curate)

    q = sub.add_parser(
        "query",
        help="BGP query over a triple store (SPARQL-style patterns)")
    q.add_argument("store")
    q.add_argument("--pattern", action="append", required=True,
                   help='triple pattern "s p o"; ?name = variable; '
                        "repeat for conjunction")
    q.add_argument("--limit", type=int, default=100)
    q.add_argument("--parallelism", type=int, default=4)
    q.set_defaults(fn=cmd_query)

    e = sub.add_parser("export", help="export a triple store to RDF text")
    e.add_argument("store")
    e.add_argument("--format", default="nquads",
                   choices=["nquads", "ntriples", "turtle", "n3",
                            "trig", "xml", "pretty-xml", "trix"])
    e.add_argument("--out")
    e.add_argument("--gzip", action="store_true")
    e.add_argument("--parallelism", type=int, default=None)
    e.set_defaults(fn=cmd_export)

    args = p.parse_args(argv)
    return args.fn(args)


if __name__ == "__main__":
    sys.exit(main())
