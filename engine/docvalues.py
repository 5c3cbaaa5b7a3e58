"""Per-segment doc-values column store (sort/facet without the row store).

Re-expression of Lucene's DocValues (index/DocValuesType.java:28 NUMERIC /
SORTED; codecs/lucene80/Lucene80DocValuesFormat.java .dvd/.dvm role): at
index time each partition segment stores the configured per-document
columns as a sidecar ``docvalues.parquet`` (doc_id + one column per DV
field) inside the segment directory — written under the SAME atomic
segment rename, so a segment either has its full DV sidecar or does not
exist. Sort-by-field and facets then read ONLY these narrow columns,
never the source row store:

- ``DocValuesReader.values_for(docs, col)``: point lookups for a
  candidate doc set (the Sort/TopFieldCollector fetch) — doc-range
  routed, per-range LRU, same shape as the lazy norm store (a worker
  touches only the ranges its candidates hit).
- ``read_doc_values_dataset(manifest, col)``: a Ray Dataset over every
  partition's sidecar for full-column scans (facet counting — the
  SortedSetDocValues facet role), streaming, never driver-collected.
"""

from __future__ import annotations

import os

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

DOC_VALUES_FILE = "docvalues.parquet"


def doc_values_path(seg_dir: str) -> str:
    return os.path.join(seg_dir, DOC_VALUES_FILE)


class DocValuesReader:
    """Doc-range-routed lazy reader over the partitions' DV sidecars.

    ``ranges`` rows need (doc_base, n_docs, seg_dir) — the build manifest's
    partition rows. Each touched (range, col) loads once per reader with a
    pruned single-column read and stays cached (LRU)."""

    _CACHE_MAX = 64

    def __init__(self, partitions: list[dict], updates: dict | None = None):
        rows = sorted(partitions, key=lambda r: int(r["doc_base"]))
        self._lo = np.array([int(r["doc_base"]) for r in rows], dtype=np.int64)
        self._hi = np.array(
            [int(r["doc_base"]) + int(r["n_docs"]) for r in rows], dtype=np.int64
        )
        self._dirs = [r["seg_dir"] for r in rows]
        # col -> (sorted doc_ids, values) overlay from DV-update
        # generations (dv_update_map); applied on top of every lookup
        self._updates = updates or {}
        from collections import OrderedDict

        self._cache: "OrderedDict[tuple[int, str], tuple[np.ndarray, np.ndarray]]" = (
            OrderedDict()
        )

    def columns(self) -> list[str]:
        schema = pq.read_schema(doc_values_path(self._dirs[0]))
        return [n for n in schema.names if n != "doc_id"]

    def _range_vals(self, i: int, col: str) -> tuple[np.ndarray, np.ndarray]:
        key = (i, col)
        hit = self._cache.get(key)
        if hit is not None:
            self._cache.move_to_end(key)
            return hit
        tbl = pq.read_table(doc_values_path(self._dirs[i]), columns=["doc_id", col])
        docs = tbl.column("doc_id").to_numpy()
        vals = tbl.column(col).to_numpy(zero_copy_only=False)
        out = (docs, vals)
        self._cache[key] = out
        if len(self._cache) > self._CACHE_MAX:
            self._cache.popitem(last=False)
        return out

    def values_for(self, doc_ids: np.ndarray, col: str) -> np.ndarray:
        """Column values aligned with an arbitrary doc_id array (docs with
        no stored value get the dtype's zero/None)."""
        docs = np.asarray(doc_ids, dtype=np.int64)
        if len(docs) == 0:
            return np.empty(0)
        idx = np.searchsorted(self._lo, docs, side="right") - 1
        out = None
        for j in np.unique(idx):
            r_docs, r_vals = self._range_vals(int(j), col)
            if out is None:
                out = np.zeros(len(docs), dtype=r_vals.dtype)
            m = idx == j
            pos = np.searchsorted(r_docs, docs[m])
            pos = np.clip(pos, 0, len(r_docs) - 1)
            hit = r_docs[pos] == docs[m]
            sel = np.flatnonzero(m)
            out[sel[hit]] = r_vals[pos[hit]]
        if out is None:
            return np.empty(0)
        upd = self._updates.get(col)
        if upd is not None and len(upd[0]):
            uids, uvals = upd
            uvals = np.asarray(uvals)
            # Lucene numeric DV updates are longs; casting a float base to
            # the update dtype would silently truncate non-updated docs.
            # Fail loudly if a float column ever gets an int-typed update.
            assert np.issubdtype(out.dtype, np.integer) or np.issubdtype(
                uvals.dtype, np.floating
            ), f"DV update dtype {uvals.dtype} would truncate base {out.dtype}"
            pos = np.searchsorted(uids, docs)
            pos = np.clip(pos, 0, len(uids) - 1)
            hit = uids[pos] == docs
            out = out.astype(uvals.dtype, copy=False)
            out[hit] = uvals[pos[hit]]
        return out


def read_doc_values_dataset(manifest: dict, columns: list[str]):
    """Ray Dataset over every partition's DV sidecar (pruned columns) —
    the streaming full-column scan facets/aggregations run on."""
    import ray.data

    from .rayenv import remote_args as _rargs  # noqa: F401 (documented contract)

    files = [
        doc_values_path(r["seg_dir"])
        for r in sorted(manifest["partitions"], key=lambda r: int(r["doc_base"]))
    ]
    return ray.data.read_parquet(
        files,
        columns=["doc_id"] + list(columns),
        override_num_blocks=min(len(files), 32),
    )


def facet_counts(
    manifest: dict, col: str, max_driver_rows: int = 2_000_000
) -> pa.Table:
    """Flat facet over one DV column: (value, count) sorted by count desc,
    value asc — counts computed with a map-side combiner (per-block Arrow
    group-count), the SortedSetDocValues facet role (lucene/facet
    SSDVFacetCounts) without touching the row store. The final sum runs
    on the driver only while the partials fit ``max_driver_rows``; a
    high-cardinality column (blocks x uniques can explode) finishes as a
    distributed Dataset groupby instead."""
    import pyarrow.compute as pc

    from .rayenv import remote_args as _rargs

    ds = read_doc_values_dataset(manifest, [col])

    def _partial(b: pa.Table) -> pa.Table:
        agg = b.group_by(col).aggregate([([], "count_all")])
        return agg.rename_columns([col, "cnt"])

    partials = ds.map_batches(_partial, batch_format="pyarrow", **_rargs()).materialize()
    if partials.count() > max_driver_rows:
        from ray.data.aggregate import Sum

        agg_tbl = pa.Table.from_pylist(
            partials.groupby(col).aggregate(Sum("cnt", alias_name="cnt_sum")).take_all()
        )
    else:
        import ray as _ray

        tbls = [t for t in _ray.get(partials.to_arrow_refs()) if t.num_rows]
        agg_tbl = pa.concat_tables(tbls).group_by(col).aggregate([("cnt", "sum")])
    order = pc.sort_indices(
        agg_tbl,
        sort_keys=[("cnt_sum", "descending"), (col, "ascending")],
    )
    agg_tbl = agg_tbl.take(order)
    return pa.table(
        {
            col: agg_tbl.column(col),
            "cnt": agg_tbl.column("cnt_sum").cast(pa.int64()),
        }
    )


def range_facet_counts(
    manifest: dict, col: str, ranges: list[tuple[str, int, int]]
) -> pa.Table:
    """Numeric range facet over one DV NUMERIC column — the
    LongRangeFacetCounts role (facet/range/LongRangeFacetCounts.java:40-75):
    each doc counts into EVERY range whose half-open [lo, hi) contains its
    value (ranges may overlap, matching LongRange semantics). Per-block
    vectorized mask-counts (a length-n_ranges int vector per block, never
    per-doc rows) summed on the driver — the reduce side is n_ranges
    numbers regardless of corpus size; the row store is never read."""
    import numpy as np

    from .rayenv import remote_args as _rargs

    ds = read_doc_values_dataset(manifest, [col])
    n_r = len(ranges)

    def _partial(b: pa.Table) -> pa.Table:
        v = b.column(col).to_numpy()
        cnts = np.fromiter(
            (int(((v >= lo) & (v < hi)).sum()) for _, lo, hi in ranges),
            dtype=np.int64,
            count=n_r,
        )
        return pa.table(
            {
                "idx": pa.array(np.arange(n_r), type=pa.int64()),
                "cnt": pa.array(cnts, type=pa.int64()),
            }
        )

    total = np.zeros(n_r, dtype=np.int64)
    for row in ds.map_batches(_partial, batch_format="pyarrow", **_rargs()).take_all():
        total[int(row["idx"])] += int(row["cnt"])
    return pa.table(
        {
            "label": pa.array([r[0] for r in ranges], type=pa.string()),
            "lo": pa.array([r[1] for r in ranges], type=pa.int64()),
            "hi": pa.array([r[2] for r in ranges], type=pa.int64()),
            "cnt": pa.array(total, type=pa.int64()),
        }
    )


# ---------------------------------------------------------------------------
# in-place numeric DocValues updates (IndexWriter.updateNumericDocValue,
# core/index/IndexWriter.java:1715: one long value for every doc matching
# a term, applied as a new DV generation without rewriting segments)
# ---------------------------------------------------------------------------


def _merged_manifest_path(index_dir: str) -> str:
    return os.path.join(index_dir, "merged", "manifest.json")


def dv_update_map(index_dir: str) -> dict:
    """Current DV-update overlay: {col: (sorted doc_ids, values)} from the
    manifest's dv_updates generation files (empty if none)."""
    import json

    with open(_merged_manifest_path(index_dir)) as f:
        m = json.load(f)
    out = {}
    for col, path in (m.get("dv_updates") or {}).items():
        if os.path.exists(path):
            t = pq.read_table(path)
            out[col] = (
                t.column("doc_id").to_numpy().astype(np.int64),
                t.column("value").to_numpy(),
            )
    return out


def update_numeric_docvalue(
    index_dir: str, term: str, field: str, value: int, term_field: str = "body"
) -> int:
    """updateNumericDocValue(new Term(term_field, term), field, value):
    set ``field``'s DV to ``value`` for every doc containing ``term``.
    Mirrors the deletes module's generation contract — a content-addressed
    sidecar parquet referenced from the merged manifest replaces the old
    generation atomically; segments are never rewritten and later updates
    win per doc. Like deletions, updates target a REPLICA or post-build
    index, never the shared build cache. Returns the total number of
    docs with an updated value after the operation."""
    import hashlib
    import json

    from .checkpoint import load_merge_manifest
    from .search import IndexSearcher

    mpath = _merged_manifest_path(index_dir)
    with open(mpath) as f:
        manifest = json.load(f)
    searcher = IndexSearcher(load_merge_manifest(index_dir))
    segs = (
        searcher.segments if term_field == "body" else searcher.fields[term_field][0]
    )
    hit = [seg.postings(term)[0] for seg in segs]
    new_ids = np.concatenate(hit) if hit else np.empty(0, dtype=np.int64)
    old = dv_update_map(index_dir).get(field)
    if old is not None and len(old[0]):
        # latest wins per doc: drop old rows overwritten by this update
        keep = ~np.isin(old[0], new_ids)
        ids = np.concatenate([old[0][keep], new_ids])
        vals = np.concatenate(
            [old[1][keep], np.full(len(new_ids), value, dtype=np.int64)]
        )
    else:
        ids = new_ids
        vals = np.full(len(new_ids), value, dtype=np.int64)
    order = np.argsort(ids, kind="stable")
    ids, vals = ids[order].astype(np.int64), vals[order]
    gen = hashlib.md5(ids.tobytes() + vals.tobytes() + field.encode()).hexdigest()[:12]
    gen_path = os.path.join(index_dir, "merged", f"dvup-{field}-{gen}.parquet")
    tmp = gen_path + ".tmp"
    pq.write_table(
        pa.table(
            {
                "doc_id": pa.array(ids, type=pa.int64()),
                "value": pa.array(vals, type=pa.int64()),
            }
        ),
        tmp,
    )
    os.replace(tmp, gen_path)
    manifest.setdefault("dv_updates", {})[field] = gen_path
    mtmp = mpath + ".tmp"
    with open(mtmp, "w") as f:
        json.dump(manifest, f)
    os.replace(mtmp, mpath)
    return int(len(ids))
