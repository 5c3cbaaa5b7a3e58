"""Index sorting + early-terminating sorted queries — the
IndexWriterConfig.setIndexSort role (core/index/Sorter.java,
core/search/TopFieldCollector.java canEarlyTerminate: when the index
sort matches the query sort, a segment's collection stops after k
competitive hits).

Ray-Data-first translation: Lucene sorts WITHIN each segment and
renumbers docids; this engine's doc ids are stable source keys used by
norms/DV/doc-range routing, so the sort lives at the LAYOUT level
instead — documents are RANGE-PARTITIONED by the sort field into
ordered parts (the "sorted segments"), each part's files carrying the
field range in the layout manifest. A sorted top-k query scans parts in
range order and stops as soon as k hits are collected AND the next
part's bound cannot beat the current k-th — the exact early-termination
contract, at part granularity. Within a part no order is needed (the
final candidate set gets one small exact sort), which is why the build
is a single streamed pass + a bounded boundary sample, not a global
shuffle-sort.

Build: one deterministic hash-sample pass bounds the boundary estimate
(never a full-column driver read), then one map_batches pass writes
``partition_cols=["pid"]`` parquet. Resume: the layout is keyed by
(sf_dir, col, n_parts) and rebuilt only if its manifest is missing.
"""

from __future__ import annotations

import json
import os

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

__all__ = ["build_sorted_layout", "sorted_topk"]

_CACHE_ROOT = "/tmp/rayfts-cache"


def _rargs():
    from .rayenv import remote_args

    return remote_args()


def build_sorted_layout(
    sf_dir: str,
    col: str = "n_chars",
    n_parts: int = 8,
    sample_mod: int = 7,
    cache_root: str = _CACHE_ROOT,
    extra_sources: list[str] | None = None,
) -> dict:
    """Range-partition the documents table by ``col``; returns the layout
    manifest {col, parts: [{pid, lo, hi, n_rows, files}]} with parts
    ordered by ascending range.

    ``extra_sources`` (parquet paths with the same schema) merge into the
    SAME sorted layout — the merge-time index sort role
    (index/Sorter.java DocMap inside SegmentMerger): N unsorted inputs in,
    ONE range-ordered layout out. Because this engine's docIDs are stable
    source keys, no renumbering DocMap is needed; the "sort while
    merging" is the range-partitioned rewrite itself."""
    import ray.data

    tag = os.path.basename(os.path.normpath(sf_dir))
    n_extra = len(extra_sources or [])
    suffix = f"-m{n_extra}" if n_extra else ""
    out_dir = os.path.join(cache_root, f"sorted-{tag}-{col}-{n_parts}{suffix}")
    man_path = os.path.join(out_dir, "layout.json")
    if os.path.exists(man_path):
        with open(man_path) as f:
            return json.load(f)

    src = [os.path.join(sf_dir, "documents.parquet")] + list(extra_sources or [])
    from .rayenv import read_parquet_clean

    ds = read_parquet_clean(src, columns=["doc_id", col])

    # deterministic systematic sample for boundary estimation (bounded
    # driver collect; the sample rate, not the corpus, sets its size —
    # boundaries only shape part sizes, never results)
    def sample(batch: pa.Table) -> pa.Table:
        docs = batch.column("doc_id").to_numpy()
        keep = docs % sample_mod == 0
        return batch.filter(pa.array(keep))

    sampled = (
        ds.map_batches(sample, batch_format="pyarrow", **_rargs())
        .select_columns([col])
        .to_pandas()[col]
        .to_numpy()
    )
    if len(sampled) == 0:
        sampled = np.array([0])
    qs = np.quantile(sampled, np.linspace(0, 1, n_parts + 1)[1:-1])
    bounds = np.unique(qs.astype(np.float64))

    def assign(batch: pa.Table) -> pa.Table:
        vals = batch.column(col).to_numpy().astype(np.float64)
        pid = np.searchsorted(bounds, vals, side="right").astype(np.int64)
        return batch.append_column("pid", pa.array(pid))

    from .rayenv import read_parquet_clean

    full = read_parquet_clean(src)
    full.map_batches(assign, batch_format="pyarrow", **_rargs()).write_parquet(
        out_dir, partition_cols=["pid"]
    )

    parts = []
    for name in sorted(os.listdir(out_dir)):
        if not name.startswith("pid="):
            continue
        pid = int(name.split("=", 1)[1])
        pdir = os.path.join(out_dir, name)
        files = sorted(
            os.path.join(pdir, f)
            for f in os.listdir(pdir)
            if f.endswith(".parquet")
        )
        n = sum(pq.read_metadata(fp).num_rows for fp in files)
        parts.append({"pid": pid, "files": files, "n_rows": n})
    # per-part bounds from parquet footer statistics — no data read
    for p in parts:
        lo = hi = None
        for fp in p["files"]:
            md = pq.read_metadata(fp)
            schema_names = md.schema.to_arrow_schema().names
            ci = schema_names.index(col)
            for rg in range(md.num_row_groups):
                st = md.row_group(rg).column(ci).statistics
                if st is None:
                    continue
                lo = st.min if lo is None else min(lo, st.min)
                hi = st.max if hi is None else max(hi, st.max)
        p["lo"], p["hi"] = (
            float(lo) if lo is not None else None,
            float(hi) if hi is not None else None,
        )
    parts.sort(key=lambda p: (p["lo"] if p["lo"] is not None else np.inf))
    manifest = {"col": col, "src": src, "parts": parts}
    tmp = man_path + ".tmp"
    with open(tmp, "w") as f:
        json.dump(manifest, f)
    os.replace(tmp, man_path)
    return manifest


def sorted_topk(
    layout: dict,
    k: int,
    descending: bool = True,
    filter_docs: np.ndarray | None = None,
    columns: list[str] | None = None,
) -> tuple[pa.Table, int]:
    """Early-terminating sorted top-k over the sorted layout
    (TopFieldCollector.canEarlyTerminate): scan parts in sort order,
    stop when k collected and the next part's bound cannot beat the
    current k-th. Optional ``filter_docs`` (sorted doc_id array — e.g. a
    term's postings) is pushed into each part read. Returns (table with
    doc_id/col[/columns], parts_scanned)."""
    import pyarrow.dataset as pads

    col = layout["col"]
    parts = list(layout["parts"])
    if descending:
        parts.sort(key=lambda p: -(p["hi"] if p["hi"] is not None else -np.inf))
    cols = ["doc_id", col] + [c for c in (columns or []) if c not in ("doc_id", col)]
    got: list[pa.Table] = []
    n_got = 0
    scanned = 0
    for i, p in enumerate(parts):
        flt = None
        if filter_docs is not None:
            flt = pads.field("doc_id").isin(pa.array(filter_docs))
        t = pads.dataset(p["files"]).to_table(columns=cols, filter=flt)
        scanned += 1
        got.append(t)
        n_got += t.num_rows
        if n_got >= k and i + 1 < len(parts):
            vals = np.concatenate([g.column(col).to_numpy() for g in got])
            if descending:
                kth = np.partition(vals, len(vals) - k)[len(vals) - k]
                nxt = parts[i + 1]["hi"]
                if nxt is None or nxt < kth:
                    break
            else:
                kth = np.partition(vals, k - 1)[k - 1]
                nxt = parts[i + 1]["lo"]
                if nxt is None or nxt > kth:
                    break
    cat = pa.concat_tables(got) if got else pa.table({c: [] for c in cols})
    vals = cat.column(col).to_numpy()
    docs = cat.column("doc_id").to_numpy()
    order = np.lexsort((docs, -vals if descending else vals))[:k]
    return cat.take(pa.array(order)), scanned
