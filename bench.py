"""Benchmark harness — build + merge + BM25 query over $GRAFT_SF_DIR.

Prints ONE JSON line:
  {"metric": "...", "value": <headline seconds>, "unit": "sec",
   "queries": {stage: sec, ...}, "sf": ..., "num_cpus": N,
   "docs_per_sec": ..., "query_p50_ms": ..., "query_p99_ms": ...}

``--scaling`` reruns the identical job in two fresh processes at
num_cpus=8 and num_cpus=32 on the same input and reports both throughputs
plus efficiency = (t_8 / t_32) / (32 / 8)  (1.0 = linear). Mirrors the
reference harness's rec/s + elapsedSec report columns
(lucene/benchmark/.../tasks/ReportTask.java:66-67).
"""

from __future__ import annotations

import json
import os
import shutil
import subprocess
import sys
import time

from engine.rayenv import remote_args as _rargs

QUERY_REPS = int(os.environ.get("BENCH_QUERY_REPS", "300"))
BENCH_ROOT = "/tmp/rayfts-bench"

# FIXTURES.md §1.1 Zipf corpus sized by sf (documents rows x 20); realistic
# vocabulary (10k terms + stop band + singleton band) so merge salting and
# WAND/TAAT paths see representative skew
_DOCS_MULTIPLIER = int(os.environ.get("BENCH_DOCS_MULTIPLIER", "40"))

# zipf-vocabulary query mix per FIXTURES.md §2: high/mid/low df terms, stop
# disjunctions, conjunctions, mixed must, exclusion, no-match
BENCH_QUERIES = [
    (0, "t00000", 10),
    (1, "the00", 10),
    (2, "the00 the07 the19", 10),
    (3, "t00001 t00017 t00999", 10),
    (4, "t00000 AND t00004", 10),
    (5, "+t00002 t00050", 10),
    (6, "t00123", 100),
    (7, "t00000 -t00111", 10),
    (8, "zzznomatch", 10),
    (9, "t00010 t00020 t00030 t00040 t00050", 25),
]


def ensure_pages(sf_dir: str, multiplier: int | None = None) -> tuple[str, int]:
    """Deterministic synthetic pages parquet for the bench corpus
    (generation is NOT timed; also warms the page cache as the guide
    recommends)."""
    import pyarrow.parquet as pq

    from engine.fixtures import make_pages, write_pages

    n_docs_target = max(
        10_000,
        pq.read_metadata(os.path.join(sf_dir, "documents.parquet")).num_rows
        * (multiplier or _DOCS_MULTIPLIER),
    )
    tag = os.path.basename(os.path.normpath(sf_dir))
    pages_dir = os.path.join(BENCH_ROOT, f"zipf-{tag}-n{n_docs_target}")
    marker = os.path.join(pages_dir, "_done")
    if not os.path.exists(marker):
        tbl = make_pages(n_docs_target, seed=42)
        write_pages(tbl, pages_dir, n_files=32)
        with open(marker, "w") as f:
            f.write(str(tbl.num_rows))
    n_docs = 0
    for f in sorted(os.listdir(pages_dir)):
        if f.endswith(".parquet"):
            p = os.path.join(pages_dir, f)
            n_docs += pq.read_metadata(p).num_rows
            with open(p, "rb") as fh:  # warm the OS page cache (untimed)
                while fh.read(1 << 24):
                    pass
    return pages_dir, n_docs


def run_bench(sf_dir: str, num_cpus: int) -> dict:
    import numpy as np
    import ray
    import ray.data

    ray.init(
        address="local",
        num_cpus=num_cpus,
        include_dashboard=False,
        ignore_reinit_error=True,
        logging_level="ERROR",
    )
    from ray.data import DataContext

    ctx = DataContext.get_current()
    ctx.enable_progress_bars = False

    from engine.build import build_index
    from engine.merge import merge_by_term
    from engine.search import search_dataset

    pages_dir, n_docs = ensure_pages(sf_dir)
    index_dir = os.path.join(BENCH_ROOT, f"index-{os.path.basename(pages_dir)}-c{num_cpus}")
    shutil.rmtree(index_dir, ignore_errors=True)

    # untimed warm-up: spin up the full worker pool and pay the engine
    # import cost before the clock starts (the reference harness likewise
    # reports warm rounds; the guide's "warm the OS page cache" note)
    def _warm(batch):
        import engine.build  # noqa: F401
        import engine.merge  # noqa: F401
        import engine.search  # noqa: F401

        return batch

    ray.data.range(num_cpus * 4, override_num_blocks=num_cpus * 4).map_batches(
        _warm, batch_size=1, **_rargs()
    ).count()

    part_docs = max(256, n_docs // 128)  # fixed 128 partitions at every cpu level

    os.sync()  # settle page-cache writeback so stage timings are isolated
    t0 = time.perf_counter()
    manifest = build_index(pages_dir, index_dir, partition_docs=part_docs, from_html=True)
    t_build = time.perf_counter() - t0

    os.sync()
    t0 = time.perf_counter()
    mm = merge_by_term(manifest, index_dir, n_salts=16)
    t_merge = time.perf_counter() - t0
    os.sync()

    hot_ref = None  # per-worker caches warm in the untimed round instead
    t_hot = 0.0

    # query workload: reference set x QUERY_REPS through the actor pool
    items = []
    qid = 0
    for rep in range(QUERY_REPS):
        for _, q, k in BENCH_QUERIES:
            items.append({"query_id": qid, "query": q, "k": k})
            qid += 1
    # one block per ~batch so task count tracks cpu count (a single tiny
    # arrow block would serialize the whole stage into one task). Built
    # pre-split: a repartition() here would be an all-to-all whose fixed
    # cost (~2-4s) dwarfs the query work.
    queries_ds = ray.data.from_items(items, override_num_blocks=num_cpus * 4)
    # warm-up round (untimed): every worker opens the index, attaches the
    # shared hot set and decodes the query terms' cold tails once — the
    # reference harness likewise reports steady-state rounds, not round 0
    search_dataset(
        queries_ds, index_dir, batch_size=None, mode="tasks", hot_ref=hot_ref
    ).count()
    t0 = time.perf_counter()
    # task-based search: stateless tasks + per-process searcher cache reuse
    # the warm worker pool (engine/search.py search_dataset mode="tasks")
    res = search_dataset(
        queries_ds, index_dir, batch_size=None, mode="tasks", emit_latency=True,
        hot_ref=hot_ref,
    ).to_pandas()
    t_search = time.perf_counter() - t0
    lat = res.groupby("query_id")["latency_ms"].first().to_numpy()
    n_queries = len(items)

    # relevance quality (MAP / P@10 — the reference harness's quality
    # metric, benchmark/quality/QualityBenchmark.java) over deterministic
    # freq-based judgments for the single-term topics
    from engine.quality import evaluate, freq_qrels
    from engine.search import searcher_for

    s = searcher_for(index_dir)
    topic_terms = ["t00000", "t00010", "t00123", "the00", "the19"]
    quality = evaluate(
        s, [(t, t) for t in topic_terms], freq_qrels(s, topic_terms), k=10, depth=1000
    )

    # secondary LLM-pipeline op throughputs over the sf tables (not part
    # of the headline north-rule number; recorded for the ops inventory)
    ops = {}
    try:
        import ray.data as _rd  # noqa: F401 (kept for parity)

        from engine.dedup import exact_dedup
        from engine.monitor import percolate
        from engine.rayenv import read_parquet_clean
        from engine.pipelines import PERCOLATE_QUERIES

        docs_path = os.path.join(sf_dir, "documents.parquet")
        import pyarrow.parquet as _pq

        n_tbl = _pq.read_metadata(docs_path).num_rows
        t0 = time.perf_counter()
        percolate(
            read_parquet_clean(docs_path, columns=["doc_id", "text"]),
            PERCOLATE_QUERIES,
            concurrency=(1, max(2, num_cpus // 2)),
        ).count()
        ops["percolate_docs_per_sec"] = round(n_tbl / (time.perf_counter() - t0), 1)
        t0 = time.perf_counter()
        exact_dedup(
            read_parquet_clean(docs_path, columns=["doc_id", "text"])
        ).count()
        ops["exact_dedup_docs_per_sec"] = round(n_tbl / (time.perf_counter() - t0), 1)
    except Exception as exc:  # secondary metrics never fail the bench
        ops["error"] = f"{type(exc).__name__}: {exc}"

    out = {
        "metric": "index-build docs/sec + BM25 query p50/p99 (build+merge+search sec)",
        "value": round(t_build + t_merge + t_search, 3),
        "unit": "sec",
        "queries": {
            "build": round(t_build, 3),
            "merge_by_term": round(t_merge, 3),
            "search": round(t_search, 3),
        },
        "merge_stage_sec": mm.get("stage_sec"),
        "sf": os.path.basename(os.path.normpath(sf_dir)),
        "num_cpus": num_cpus,
        "n_docs": n_docs,
        "n_queries": n_queries,
        "docs_per_sec": round(n_docs / (t_build + t_merge), 1),
        "queries_per_sec": round(n_queries / t_search, 1),
        "query_p50_ms": round(float(np.percentile(lat, 50)), 2),
        "query_p99_ms": round(float(np.percentile(lat, 99)), 2),
        "quality_map_at_1000": quality["map"],
        "quality_p_at_10": quality["p_at_10"],
        "n_heavy_terms": mm.get("n_heavy_terms"),
        "ops": ops,
    }
    ray.shutdown()
    return out


def run_scaling(sf_dir: str, lo: int | None = None, hi: int | None = None) -> dict:
    lo = lo or int(os.environ.get("BENCH_SCALE_LO", "2"))
    hi = hi or int(os.environ.get("BENCH_SCALE_HI", "8"))
    # Scaling runs use a compute-dominated workload (3x the default corpus
    # and query reps) unless the caller pins them: on a ~30s job the fixed
    # Ray costs (worker spawn, shuffle setup) don't shrink with cpus and
    # would understate the node-scaling the rule asks about — a real
    # cluster-size comparison benchmarks minutes of work, not seconds.
    mult = int(os.environ.get("BENCH_DOCS_MULTIPLIER", str(_DOCS_MULTIPLIER * 3)))
    reps = int(os.environ.get("BENCH_QUERY_REPS", str(QUERY_REPS * 3)))

    def run(ncpu: int) -> dict:
        env = dict(
            os.environ,
            RAY_GRAFT_CPUS=str(ncpu),
            BENCH_DOCS_MULTIPLIER=str(mult),
            BENCH_QUERY_REPS=str(reps),
        )
        out = subprocess.run(
            [sys.executable, os.path.abspath(__file__)],
            env=env,
            capture_output=True,
            text=True,
            check=True,
            cwd=os.path.dirname(os.path.abspath(__file__)),
        ).stdout
        return json.loads(out.strip().splitlines()[-1])

    ensure_pages(sf_dir, multiplier=mult)  # generate once + warm the page cache
    r_lo = run(lo)
    r_hi = run(hi)
    eff = (r_lo["value"] / r_hi["value"]) / (hi / lo)
    return {
        "metric": "scaling efficiency (N->4N cpus, fresh processes, same input)",
        "value": round(eff, 3),
        "unit": "efficiency",
        "sf": r_lo["sf"],
        f"sec_{lo}": r_lo["value"],
        f"sec_{hi}": r_hi["value"],
        f"docs_per_sec_{lo}": r_lo["docs_per_sec"],
        f"docs_per_sec_{hi}": r_hi["docs_per_sec"],
        f"queries_per_sec_{lo}": r_lo["queries_per_sec"],
        f"queries_per_sec_{hi}": r_hi["queries_per_sec"],
        "stages_lo": r_lo["queries"],
        "stages_hi": r_hi["queries"],
        "merge_stages_lo": r_lo.get("merge_stage_sec"),
        "merge_stages_hi": r_hi.get("merge_stage_sec"),
        "scaling_efficiency": round(eff, 3),
    }


if __name__ == "__main__":
    sf_dir = os.environ.get("GRAFT_SF_DIR", "/root/testdata/sf0.1")
    if "--scaling" in sys.argv:
        print(json.dumps(run_scaling(sf_dir)))
    else:
        num_cpus = int(os.environ.get("RAY_GRAFT_CPUS", "32"))
        print(json.dumps(run_bench(sf_dir, num_cpus)))
