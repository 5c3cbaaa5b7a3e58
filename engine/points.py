"""Per-segment numeric points index — the 1-D BKD-tree role.

Re-expression of Lucene's point values (`index/PointValues.java:61-96`
visit contract; BKD leaf blocks `util/bkd/BKDWriter.java:82-90` with
512-1024 points per leaf; on-disk `.kdd`/`.kdi`/`.kdm` split
`codecs/lucene86/Lucene86PointsFormat.java:30-58`; query semantics
`document/LongPoint.java:120-143` `newRangeQuery` — INCLUSIVE bounds):

- **Build**: for each build partition segment, the field's (value,
  doc_id) pairs are sorted by value and written as one parquet file
  whose row groups (default 1024 rows) play the BKD *leaf block* role.
  The parquet footer's per-row-group min/max statistics are the inner
  tree nodes; the points manifest carries per-file global min/max (the
  .kdm field-level bounds) for file-level pruning. Written write-once
  (tmp + atomic rename), resume-idempotent, one distributed Ray task
  per partition reading ONLY the narrow DV sidecar columns.

- **Query** (`range_docs`): files whose [min,max] misses the range are
  never opened (CELL_OUTSIDE_QUERY); within a file only overlapping row
  groups are read (footer-stat prune); fully-inside groups take all
  doc_ids without comparing (the CELL_INSIDE_QUERY fast path — Lucene
  visits such cells with `visitDocIDs`, no per-value test), and only
  the two boundary groups get the vectorized value mask. Bounds are
  inclusive like LongPoint.newRangeQuery.

The scan is a streamed Ray Dataset over the overlapping files (one task
per file); nothing whole-corpus materializes on the driver beyond the
matching doc ids the caller asked for.
"""

from __future__ import annotations

import json
import os

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

from .rayenv import remote_args as _rargs

POINTS_LEAF_ROWS = 1024  # BKDWriter leaf size band (512-1024)


def _points_dir(index_dir: str, field: str) -> str:
    return os.path.join(index_dir, f"points_{field}")


def build_points(
    build_manifest: dict,
    index_dir: str,
    field: str,
    rows_per_leaf: int = POINTS_LEAF_ROWS,
) -> dict:
    """Build (or reuse) the per-partition points files for one numeric DV
    column. Returns the points manifest {field, files:[{path, min, max,
    n_rows}]}. Distributed: one Ray task per partition; each task reads
    only (doc_id, field) from its segment's DV sidecar."""
    import ray
    import ray.data

    from .docvalues import doc_values_path

    out_dir = _points_dir(index_dir, field)
    man_path = os.path.join(out_dir, "points_manifest.json")
    if os.path.exists(man_path):
        with open(man_path) as f:
            return json.load(f)
    os.makedirs(out_dir, exist_ok=True)

    parts = sorted(build_manifest["partitions"], key=lambda r: int(r["doc_base"]))
    specs = [
        {
            "dv_path": doc_values_path(r["seg_dir"]),
            "out_path": os.path.join(out_dir, f"points-{i:05d}.parquet"),
        }
        for i, r in enumerate(parts)
    ]

    def _build_one(batch: pa.Table) -> pa.Table:
        rows = []
        for spec in batch.to_pylist():
            out_path = spec["out_path"]
            if not os.path.exists(out_path):  # write-once resume
                tbl = pq.read_table(spec["dv_path"], columns=["doc_id", field])
                vals = tbl.column(field).to_numpy(zero_copy_only=False).astype(np.int64)
                docs = tbl.column("doc_id").to_numpy()
                order = np.argsort(vals, kind="stable")  # value-sorted leaf layout
                sorted_tbl = pa.table(
                    {
                        "value": pa.array(vals[order], type=pa.int64()),
                        "doc_id": pa.array(docs[order], type=pa.int64()),
                    }
                )
                tmp = out_path + ".tmp"
                pq.write_table(sorted_tbl, tmp, row_group_size=rows_per_leaf)
                os.replace(tmp, out_path)
            md = pq.read_metadata(out_path)
            first = md.row_group(0).column(0).statistics
            last = md.row_group(md.num_row_groups - 1).column(0).statistics
            rows.append(
                {
                    "path": out_path,
                    "min": int(first.min),
                    "max": int(last.max),
                    "n_rows": int(md.num_rows),
                }
            )
        return pa.Table.from_pylist(rows)

    files = (
        ray.data.from_items(specs)
        .map_batches(_build_one, batch_size=1, batch_format="pyarrow", **_rargs())
        .take_all()
    )
    manifest = {
        "field": field,
        "rows_per_leaf": rows_per_leaf,
        "files": sorted(files, key=lambda r: r["path"]),
    }
    tmp = man_path + ".tmp"
    with open(tmp, "w") as f:
        json.dump(manifest, f)
    os.replace(tmp, man_path)
    return manifest


def range_docs_file(
    path: str, lo: int, hi: int
) -> tuple[np.ndarray, int, int]:
    """Matching doc_ids from ONE points file for the inclusive range
    [lo, hi]. Returns (doc_ids, n_groups_read, n_groups_total) — the
    read count is asserted by tests to prove the leaf prune works.

    Row groups fully inside the range contribute all their doc_ids with
    no per-value comparison (CELL_INSIDE_QUERY); only boundary groups
    are masked (CELL_CROSSES_QUERY)."""
    pf = pq.ParquetFile(path)
    md = pf.metadata
    touch: list[int] = []
    inside: list[bool] = []
    for g in range(md.num_row_groups):
        st = md.row_group(g).column(0).statistics  # column 0 = value
        g_min, g_max = int(st.min), int(st.max)
        if g_max < lo or g_min > hi:
            continue
        touch.append(g)
        inside.append(lo <= g_min and g_max <= hi)
    if not touch:
        return np.empty(0, dtype=np.int64), 0, md.num_row_groups
    out: list[np.ndarray] = []
    for g, full in zip(touch, inside):
        tbl = pf.read_row_group(g, columns=["value", "doc_id"])
        docs = tbl.column("doc_id").to_numpy()
        if full:
            out.append(docs)
        else:
            v = tbl.column("value").to_numpy()
            out.append(docs[(v >= lo) & (v <= hi)])
    return np.concatenate(out), len(touch), md.num_row_groups


def range_docs(points_manifest: dict, lo: int, hi: int) -> pa.Table:
    """All doc_ids whose field value is in the INCLUSIVE [lo, hi]
    (LongPoint.newRangeQuery semantics), sorted by doc_id. File-level
    prune from the manifest bounds, then a streamed one-task-per-file
    Dataset scan with row-group pruning inside each task."""
    import ray.data

    hit_files = [
        f["path"]
        for f in points_manifest["files"]
        if not (f["max"] < lo or f["min"] > hi)
    ]
    if not hit_files:
        return pa.table({"doc_id": pa.array([], type=pa.int64())})

    def _scan(batch: pa.Table) -> pa.Table:
        parts = [range_docs_file(p, lo, hi)[0] for p in batch.column("path").to_pylist()]
        docs = np.concatenate(parts) if parts else np.empty(0, dtype=np.int64)
        return pa.table({"doc_id": pa.array(docs, type=pa.int64())})

    rows = (
        ray.data.from_items([{"path": p} for p in hit_files])
        .map_batches(_scan, batch_size=1, batch_format="pyarrow", **_rargs())
        .take_all()
    )
    docs = np.sort(
        np.fromiter((r["doc_id"] for r in rows), dtype=np.int64, count=len(rows))
    )
    return pa.table({"doc_id": pa.array(docs, type=pa.int64())})
