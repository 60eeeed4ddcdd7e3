"""Benchmark harness.

Runs the headline flagship pipeline (synthetic Common-Crawl-style
pages → extract → link → triples → dedup → partitioned store) plus the
operator query suite over ``$GRAFT_SF_DIR`` (default
/root/testdata/sf0.1), and prints ONE JSON line::

    {"metric": "flagship_pages_convert", "value": <sec>, "unit": "sec",
     "queries": {...}, "sf": ..., "num_cpus": N, "docs_per_sec": ...}

``--scaling`` re-runs the headline in fresh subprocesses at
``num_cpus`` 4 and 16 (N and 4N) on the same cached input and reports
both throughputs, the scaling efficiency, and two hardware strong-
scaling controls (pure-ALU / pure-memcpy) that bound what this single
box can show — the in-sandbox stand-in for the N-node vs 4N-node
cluster criterion (see BASELINE.md).

Pages input is synthesized deterministically (fixtures.make_page_row,
random-access per row → generation itself runs distributed) and cached
under /tmp keyed by (n, seed); generation is excluded from timings.
"""

from __future__ import annotations

import json
import os
import shutil
import subprocess
import sys
import time

SF_DIR = os.environ.get("GRAFT_SF_DIR", "/root/testdata/sf0.1")
NUM_CPUS = int(os.environ.get("RAY_GRAFT_CPUS", "32"))
PAGES_PER_SF = 1_000_000  # sf0.1 → 100k pages
SEED = 42


def sf_of(sf_dir: str) -> float:
    base = os.path.basename(sf_dir.rstrip("/"))
    try:
        return float(base.replace("sf", ""))
    except ValueError:
        return 0.1


def ensure_pages(n: int, seed: int = SEED) -> str:
    """Distributed deterministic pages synthesis, cached."""
    out = f"/tmp/graft_pages_n{n}_s{seed}"
    marker = os.path.join(out, "_GEN_DONE")
    if os.path.exists(marker):
        return out
    import pyarrow as pa
    import ray.data

    from cow_ray.fixtures import PAGES_SCHEMA, make_page_row

    shutil.rmtree(out, ignore_errors=True)

    def gen(batch) -> pa.Table:
        rows = [make_page_row(int(i), seed) for i in batch["id"].to_pylist()]
        return pa.Table.from_pylist(rows, schema=PAGES_SCHEMA)

    # block count: enough read-task fan-out for 32 cores, but bounded —
    # the stage write produces one file per (block × partition), and
    # phase-2 file-open overhead grows with it
    blocks = max(128, min(512, n // 10_000))
    (
        ray.data.range(n, override_num_blocks=blocks)
        .map_batches(gen, batch_format="pyarrow")
        .write_parquet(out)
    )
    with open(marker, "w") as f:
        f.write(str(n))
    return out


def run_flagship(pages_dir: str, num_parts: int) -> dict:
    from cow_ray.fixtures import GAZETTEER
    from cow_ray.pipelines import ConvertConfig, convert_pages
    from cow_ray.pipelines.convert import derive_host

    page_rules = {
        "base": "https://kg.example.org/", "aboutUrl": "page/{_row}",
        "columns": [
            {"name": "url", "datatype": "anyURI", "propertyUrl": "schema:url"},
            {"name": "text", "datatype": "string", "lang": "{lang}",
             "propertyUrl": "schema:text"},
            {"name": "host", "valueUrl": "host/{host}",
             "propertyUrl": "schema:isPartOf"},
        ],
    }
    mention_rules = {
        "base": "https://kg.example.org/", "aboutUrl": "page/{_row}",
        "columns": [
            {"name": "entity_id", "valueUrl": "entity/{entity_id}",
             "propertyUrl": "schema:mentions"},
            {"name": "surface", "aboutUrl": "entity/{entity_id}",
             "propertyUrl": "rdfs:label"},
        ],
    }
    # store scratch: RAM-backed by default in this sandbox — the
    # two-phase shuffle round-trips ~2× the triple volume through the
    # stage dir, and the single local disk (~250 MB/s) otherwise
    # becomes the shared bottleneck that masks CPU scaling.  On a real
    # cluster this is the shared object storage / NVMe scratch tier,
    # whose bandwidth scales with nodes.
    out_root = os.environ.get("GRAFT_STORE_ROOT", "/dev/shm")
    out_dir = f"{out_root}/graft_store_{os.getpid()}"
    shutil.rmtree(out_dir, ignore_errors=True)
    t0 = time.time()
    _, manifests = convert_pages(
        pages_dir, page_rules, out_dir,
        gazetteer=GAZETTEER, mention_rules=mention_rules,
        config=ConvertConfig(
            num_parts=num_parts,
            derived={"host": derive_host},
        ),
    )
    dt = time.time() - t0
    triples = sum(m["num_triples"] for m in manifests)
    shutil.rmtree(out_dir, ignore_errors=True)
    return {"sec": dt, "triples": triples}


def run_queries(sf_dir: str) -> dict[str, float]:
    from cow_ray.pipelines.queries import EXTRA_QUERIES, QUERIES

    registry = {**QUERIES, **EXTRA_QUERIES}
    # kg_bgp queries a WRITTEN triple store (deployment shape); the
    # one-time store build is excluded from its wall like page
    # generation is from the flagship's
    from cow_ray.pipelines.queries import (
        ensure_doc_store,
        ensure_jsonl_shards,
        ensure_warc_shards,
    )

    ensure_doc_store(sf_dir)
    # likewise: the sink/source round-trip queries read fixture shards
    # built once per sf_dir — the build is excluded from their walls
    ensure_warc_shards(sf_dir)
    ensure_jsonl_shards(sf_dir)
    names = [
        "kg_doc_triples", "kg_source_triples_dedup", "kg_mention_triples",
        "kg_canonical_sources", "kg_cookbook_triples", "kg_bgp",
        "text_token_stats", "text_quality",
        "sample_docs", "split_docs", "mixture_docs",
        "shuffled_head_docs",
        "top_docs_per_lang",
        "token_doc_freq",
        "heavy_tokens", "doc_perplexity", "doc_nll", "nb_quality_docs",
        "bm25_docs",
        "tfidf_topterms",
        "url_normalized", "url_domain_stats", "normalized_docs",
        "mojibake_docs", "doc_len_quantiles",
        "sketch_quantiles_docs",
        "curate_docs", "scrub_docs", "chunk_docs", "decontam_docs",
        "decontam_doc_exact",
        "packed_docs",
        "dedup_exact_docs", "dedup_lines_docs", "dedup_minhash_docs",
        "dedup_simhash_docs",
        "dedup_simhash_pairs", "doc_dup_spans", "despanned_docs",
        "exact_dup_spans_docs",
        "neardup_verified_docs", "containment_docs",
        "doc_fingerprint", "doc_repetition", "doc_c4_quality",
        "doc_bpe_tokens", "ann_topk", "ann_ivf_pq_topk", "emb_near_dup",
        "emb_kmeans", "semdedup_embeddings",
        "near_dup_components", "pagerank_docs",
        "q1_pricing_summary", "top_parts_by_qty", "orders_by_nation",
        "lineitem_qty_bands", "events_sliding",
        "events_hourly", "events_first", "events_asof_orders",
        "events_sessionize",
        "lineitem_orders_join", "fuzzy_supplier_join",
        "fuzzy_soundex_vocab", "customers_no_big_order",
        # round-5 second-session wave
        "warc_pages", "jsonl_roundtrip", "doc_bigram_nll",
        "bpe_pair_stats", "graph_triangles", "dedup_keep_best_docs",
        "dedup_paragraphs_docs", "url_domain_filtered",
        "fold_key_docs", "doc_compress_ratio",
        "kg_bgp_filter", "kg_bgp_optional", "kg_bgp_union",
        "kg_construct", "kg_sameas_merge", "kg_validate",
        "url_latest_docs",
    ]
    out: dict[str, float] = {}
    for name in names:
        t0 = time.time()
        res = registry[name](sf_dir)
        # consume without driver materialization of big data
        try:
            res.count()
        except AttributeError:
            len(res)
        out[name] = round(time.time() - t0, 3)
    return out


def minhash_stage_walls(sf_dir: str) -> dict[str, float]:
    """Per-stage walls for the dedup_minhash pipeline (signature /
    band-emit / bucket-pairs / pair-distinct), each stage materialized
    so a driver-run regression is self-diagnosing (round-2 verdict:
    an unexplained 2.8× on this query; root cause was first-touch
    page-fault contention in the signature kernel's 64 MB temporaries,
    fixed by 4 MB tiled in-place buffers)."""
    import ray.data

    from cow_ray.ops.dedup import BandEmitter, MinHasher, _bucket_pairs

    docs = ray.data.read_parquet(
        os.path.join(sf_dir, "documents.parquet"), override_num_blocks=16
    )
    walls: dict[str, float] = {}
    t0 = time.time()
    sigs = docs.map_batches(
        MinHasher(64, 5, "text"), batch_format="pyarrow"
    ).materialize()
    walls["signature"] = round(time.time() - t0, 3)
    t0 = time.time()
    bands = sigs.map_batches(
        BandEmitter(16, "doc_id", num_parts=16), batch_format="pyarrow"
    ).materialize()
    walls["band_emit"] = round(time.time() - t0, 3)
    t0 = time.time()
    cand = bands.groupby("__part").map_groups(
        lambda g: _bucket_pairs(g, "doc_id", 1000), batch_format="pyarrow"
    ).materialize()
    walls["bucket_pairs"] = round(time.time() - t0, 3)
    t0 = time.time()
    from cow_ray.ops.dedup import pair_distinct

    n = pair_distinct(cand, num_parts=16).count()
    walls["pair_distinct"] = round(time.time() - t0, 3)
    walls["n_pairs"] = n
    return walls


def simhash_stage_walls(sf_dir: str) -> dict[str, float]:
    """Per-stage walls for the simhash family (signature / band-emit /
    partition pair+verify / pair-distinct) — round-3 verdict: the
    0.55→1.04 s dedup_simhash_docs reading needed to be
    self-diagnosing like minhash's."""
    import ray.data

    from cow_ray.ops.dedup import (SimHasher, pair_distinct,
                                   simhash_band_emitter,
                                   simhash_part_pairs)

    docs = ray.data.read_parquet(
        os.path.join(sf_dir, "documents.parquet"), override_num_blocks=16
    )
    walls: dict[str, float] = {}
    t0 = time.time()
    sigs = docs.map_batches(
        SimHasher(), batch_format="pyarrow"
    ).select_columns(["doc_id", "simhash"]).materialize()
    walls["signature"] = round(time.time() - t0, 3)
    t0 = time.time()
    bands = sigs.map_batches(
        simhash_band_emitter(3, 16), batch_format="pyarrow"
    ).materialize()
    walls["band_emit"] = round(time.time() - t0, 3)
    t0 = time.time()
    cand = bands.groupby("__part").map_groups(
        simhash_part_pairs(3, 1000), batch_format="pyarrow"
    ).materialize()
    walls["bucket_pairs"] = round(time.time() - t0, 3)
    t0 = time.time()
    n = pair_distinct(cand.drop_columns(["hamming"]), num_parts=16).count()
    walls["pair_distinct"] = round(time.time() - t0, 3)
    walls["n_pairs"] = n
    return walls


def bench_once(headline_only: bool = False) -> dict:
    import ray

    # ONE polars thread per task, BEFORE workers fork: parallelism
    # comes from Ray's task budget (the cluster-size stand-in).  A
    # 4-thread rayon pool inside every 1-cpu task would let the
    # low-parallelism level silently use 4× its CPU budget (28 idle
    # hardware cores), biasing the measured scaling ratio.
    os.environ.setdefault("POLARS_MAX_THREADS", "1")
    ray.init(address="local", num_cpus=NUM_CPUS, include_dashboard=False,
             logging_level="ERROR")
    from ray.data import DataContext

    ctx = DataContext.get_current()
    ctx.enable_progress_bars = False

    sf = sf_of(SF_DIR)
    n_pages = int(os.environ.get("GRAFT_BENCH_PAGES", "0")) or max(
        2000, int(PAGES_PER_SF * sf)
    )
    pages_dir = ensure_pages(n_pages)

    # warm up: spawn the worker pool + import the library in every
    # worker + page-cache the input (a bare count() is metadata-only
    # and spawns nothing; cold worker spawn measured ~2 s of the small
    # runs).  The timed run then measures compute + shuffle.
    import ray.data

    ray.data.read_parquet(pages_dir).map_batches(
        lambda b: b, batch_format="pyarrow"
    ).count()
    run_flagship(ensure_pages(2000), num_parts=4)

    # repeated runs: single-box walls vary ±15% with ambient writeback
    # and frequency scaling.  The plain bench reports the min (the
    # reproducible compute+shuffle cost).  --scaling runs PAIRED
    # interleaved levels (best-of-2 per level per pair, median of the
    # pair ratios — see scaling()) and pins num_parts so both levels
    # run the identical job.
    reps = int(os.environ.get("GRAFT_BENCH_REPS", "2"))
    stat = os.environ.get("GRAFT_BENCH_STAT", "min")
    num_parts = int(os.environ.get("GRAFT_NUM_PARTS", "0")) or max(
        8, 2 * NUM_CPUS
    )
    runs = sorted(
        (run_flagship(pages_dir, num_parts=num_parts) for _ in range(reps)),
        key=lambda r: r["sec"],
    )
    # lower-median for even rep counts (len//2 would pick the MAX of 2)
    head = runs[(len(runs) - 1) // 2] if stat == "median" else runs[0]
    all_secs = [round(r["sec"], 3) for r in runs]
    queries = {} if headline_only else run_queries(SF_DIR)
    stages = {} if headline_only else {
        "dedup_minhash": minhash_stage_walls(SF_DIR),
        "dedup_simhash": simhash_stage_walls(SF_DIR),
    }

    result = {
        "metric": "flagship_pages_convert",
        "value": round(head["sec"], 3),
        "unit": "sec",
        "queries": queries,
        "stage_walls": stages,
        "sf": sf,
        "num_cpus": NUM_CPUS,
        "n_pages": n_pages,
        "triples": head["triples"],
        "docs_per_sec": round(n_pages / head["sec"], 1),
        "runs_sec": all_secs,
    }
    ray.shutdown()
    return result


def scaling() -> dict:
    # N and 4N parallelism levels.  4→16 rather than 8→32: a pure-CPU
    # strong-scaling control (multiprocessing, zero I/O, fixed work)
    # measures this box at 0.93 efficiency for 4→16 but only 0.74 for
    # 8→32 — beyond ~16 active cores the VM's frequency scaling caps
    # per-core throughput, which would mask pipeline scaling entirely.
    # The control numbers are recorded in BASELINE.md.
    lo, hi = 4, 16
    # a larger fixed input than the plain bench so per-job fixed costs
    # (pipeline launch, shuffle barriers) don't mask compute scaling
    n_pages = os.environ.get("GRAFT_BENCH_PAGES", "2000000")
    pairs = int(os.environ.get("GRAFT_SCALING_PAIRS", "3"))

    def run_level(n: int) -> dict:
        env = dict(os.environ, RAY_GRAFT_CPUS=str(n), BENCH_HEADLINE_ONLY="1",
                   GRAFT_BENCH_PAGES=n_pages, GRAFT_BENCH_REPS="2",
                   GRAFT_NUM_PARTS=str(2 * hi))
        p = subprocess.run([sys.executable, os.path.abspath(__file__)],
                           env=env, capture_output=True, text=True, check=True,
                           cwd=os.path.dirname(os.path.abspath(__file__)))
        return json.loads(p.stdout.strip().splitlines()[-1])

    # PAIRED, INTERLEAVED design: this shared box sees intermittent
    # host-contention windows that can swallow one level's entire
    # measurement block (observed: the 16-cpu level varying 9.0-15.5 s
    # across otherwise-identical runs while concurrent hardware
    # controls degrade in lockstep).  Measuring each ratio from an
    # ADJACENT lo/hi pair cancels ambient drift within the pair; the
    # median pair-ratio is the reported efficiency.  All raw walls are
    # published.
    pairs = max(1, pairs)
    ratios, lo_runs, hi_runs = [], [], []
    lo_reps, hi_reps = [], []
    last = None
    for _ in range(pairs):
        a = run_level(lo)
        b = run_level(hi)
        lo_runs.append(a["value"])
        hi_runs.append(b["value"])
        lo_reps.append(a.get("runs_sec"))
        hi_reps.append(b.get("runs_sec"))
        ratios.append((a["value"] / b["value"]) / (hi / lo))
        last = b

    def lower_median(xs):
        return sorted(xs)[(len(xs) - 1) // 2]  # even counts: NOT max

    return {
        "metric": "scaling_efficiency",
        "value": round(lower_median(ratios), 3),
        "unit": "ratio",
        "cpus_lo": lo,
        "cpus_hi": hi,
        "pair_ratios": [round(r, 3) for r in ratios],
        f"runs_{lo}": lo_runs,
        f"runs_{hi}": hi_runs,
        f"reps_{lo}": lo_reps,   # every raw wall, per pair per rep
        f"reps_{hi}": hi_reps,
        f"sec_{lo}": lower_median(lo_runs),
        f"sec_{hi}": lower_median(hi_runs),
        f"docs_per_sec_{hi}": last["docs_per_sec"],
        "n_pages": last["n_pages"],
    }


def _ctl_burn(n):
    x = 0
    for i in range(n):
        x += i * i
    return x


def _ctl_churn(_):
    import numpy as np

    a = np.zeros(50_000_000, dtype=np.uint8)
    s = 0
    for _ in range(6):
        b = a.copy()
        s += int(b[::4096].sum())
    return s


def hardware_controls() -> dict:
    """Strong-scaling controls that bound what ANY pipeline can show on
    this box between the two parallelism levels: pure-ALU work scales
    at ~0.93, pure memory-copy work at ~0.25 (DRAM saturates at 4
    workers).  A data pipeline is a mix; its ceiling sits between."""
    import multiprocessing as mp

    def run(fn, w, jobs, arg):
        t0 = time.time()
        with mp.Pool(w) as p:
            p.map(fn, [arg] * jobs)
        return time.time() - t0

    alu4 = run(_ctl_burn, 4, 64, 3_000_000)
    alu16 = run(_ctl_burn, 16, 64, 3_000_000)
    mem4 = run(_ctl_churn, 4, 16, 0)
    mem16 = run(_ctl_churn, 16, 16, 0)
    return {
        "alu_eff_4_to_16": round((alu4 / alu16) / 4, 3),
        "memcpy_eff_4_to_16": round((mem4 / mem16) / 4, 3),
    }


if __name__ == "__main__":
    if "--scaling" in sys.argv:
        out = scaling()
        out["hardware_controls"] = hardware_controls()
        print(json.dumps(out))
    else:
        headline_only = os.environ.get("BENCH_HEADLINE_ONLY") == "1"
        print(json.dumps(bench_once(headline_only)))
