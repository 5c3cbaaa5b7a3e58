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


def range_estimate(points_manifest: dict, lo: int, hi: int) -> int:
    """Upper-bound match count for [lo, hi] from FOOTER STATS ONLY (no
    row reads) — the BKD inner-node cost estimate behind
    IndexOrDocValuesQuery's lead-cost comparison
    (search/IndexOrDocValuesQuery.java:48-76 ScorerSupplier.cost():
    the points side reports its tree-pruned cost before any scorer is
    built). Sums row counts of row groups overlapping the range."""
    total = 0
    for f in points_manifest["files"]:
        if f["max"] < lo or f["min"] > hi:
            continue
        md = pq.ParquetFile(f["path"]).metadata
        for g in range(md.num_row_groups):
            st = md.row_group(g).column(0).statistics  # column 0 = value
            if int(st.max) < lo or int(st.min) > hi:
                continue
            total += md.row_group(g).num_rows
    return total


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


# ---------------------------------------------------------------------------
# 2-D points — the k-d BKD role (util/bkd/BKDWriter.java alternating median
# splits; document/IntPoint.java newRangeQuery 2-D box, INCLUSIVE bounds).
# ---------------------------------------------------------------------------


def _kd_leaf_order(x: np.ndarray, y: np.ndarray, rows_per_leaf: int) -> np.ndarray:
    """Permutation laying points out in BKD leaf order: recursive splits
    alternating dims, each split on a LEAF-COUNT boundary (BKDWriter.build
    splits at multiples of maxPointsInLeafNode so every leaf except the
    last is exactly full) — leaves then align 1:1 with fixed-size parquet
    row groups."""
    vals = (x, y)
    out: list[np.ndarray] = []

    def rec(sel: np.ndarray, dim: int) -> None:
        n = len(sel)
        if n <= rows_per_leaf:
            out.append(sel)
            return
        n_leaves = -(-n // rows_per_leaf)
        mid = ((n_leaves + 1) // 2) * rows_per_leaf
        ord_ = np.argsort(vals[dim][sel], kind="stable")
        rec(sel[ord_[:mid]], 1 - dim)
        rec(sel[ord_[mid:]], 1 - dim)

    rec(np.arange(len(x), dtype=np.int64), 0)
    return np.concatenate(out) if out else np.empty(0, dtype=np.int64)


def build_points_2d(
    src_path: str,
    out_dir: str,
    fields: tuple[str, str],
    id_col: str = "doc_id",
    rows_per_leaf: int = POINTS_LEAF_ROWS,
    rows_per_file: int = 1 << 20,
) -> dict:
    """Build (or reuse) a 2-D points index over two int64 columns of a
    parquet table (timestamp columns are taken as epoch micros). One Ray
    task per row-group span of the source (deterministic specs => resume
    skips finished files); within a task the span's points are laid out
    by `_kd_leaf_order` and written write-once with one row group per kd
    leaf. The manifest carries per-file min/max on BOTH dims (the .kdm
    field bounds); the parquet footer stats per row group are the inner
    tree nodes."""
    import ray
    import ray.data

    fx, fy = fields
    man_path = os.path.join(out_dir, "points2d_manifest.json")
    if os.path.exists(man_path):
        with open(man_path) as f:
            return json.load(f)
    os.makedirs(out_dir, exist_ok=True)

    md = pq.read_metadata(src_path)
    # group consecutive row groups into ~rows_per_file spans
    specs = []
    g0, acc = 0, 0
    for g in range(md.num_row_groups):
        acc += md.row_group(g).num_rows
        if acc >= rows_per_file or g == md.num_row_groups - 1:
            specs.append(
                {
                    "src": src_path,
                    "rg_start": g0,
                    "rg_end": g + 1,
                    "out_path": os.path.join(
                        out_dir, f"points2d-{len(specs):05d}.parquet"
                    ),
                }
            )
            g0, acc = g + 1, 0

    def _as_i64(col: pa.ChunkedArray) -> np.ndarray:
        arr = col.to_numpy(zero_copy_only=False)
        if np.issubdtype(arr.dtype, np.datetime64):
            return arr.astype("datetime64[us]").astype(np.int64)
        return arr.astype(np.int64)

    def _build_one(batch: pa.Table) -> pa.Table:
        rows = []
        for spec in batch.to_pylist():
            out_path = spec["out_path"]
            if not os.path.exists(out_path):  # write-once resume
                pf = pq.ParquetFile(spec["src"])
                tbl = pf.read_row_groups(
                    list(range(spec["rg_start"], spec["rg_end"])),
                    columns=[id_col, fx, fy],
                )
                xv = _as_i64(tbl.column(fx))
                yv = _as_i64(tbl.column(fy))
                ids = tbl.column(id_col).to_numpy().astype(np.int64)
                order = _kd_leaf_order(xv, yv, rows_per_leaf)
                sorted_tbl = pa.table(
                    {
                        "x": pa.array(xv[order], type=pa.int64()),
                        "y": pa.array(yv[order], type=pa.int64()),
                        "doc_id": pa.array(ids[order], type=pa.int64()),
                    }
                )
                tmp = out_path + ".tmp"
                pq.write_table(sorted_tbl, tmp, row_group_size=rows_per_leaf)
                os.replace(tmp, out_path)
            fmd = pq.read_metadata(out_path)
            xs = [fmd.row_group(g).column(0).statistics for g in range(fmd.num_row_groups)]
            ys = [fmd.row_group(g).column(1).statistics for g in range(fmd.num_row_groups)]
            rows.append(
                {
                    "path": out_path,
                    "min_x": min(int(s.min) for s in xs),
                    "max_x": max(int(s.max) for s in xs),
                    "min_y": min(int(s.min) for s in ys),
                    "max_y": max(int(s.max) for s in ys),
                    "n_rows": int(fmd.num_rows),
                }
            )
        return pa.Table.from_pylist(rows)

    files = (
        ray.data.from_items(specs)
        .map_batches(_build_one, batch_size=1, batch_format="pyarrow", **_rargs())
        .take_all()
    )
    manifest = {
        "fields": [fx, fy],
        "id_col": id_col,
        "rows_per_leaf": rows_per_leaf,
        "files": sorted(files, key=lambda r: r["path"]),
    }
    tmp = man_path + ".tmp"
    with open(tmp, "w") as f:
        json.dump(manifest, f)
    os.replace(tmp, man_path)
    return manifest


def box_docs_2d_file(
    path: str, x_lo: int, x_hi: int, y_lo: int, y_hi: int
) -> tuple[np.ndarray, int, int]:
    """Matching ids from ONE 2-D points file for the inclusive box.
    Returns (ids, n_groups_read, n_groups_total). Leaf groups whose 2-D
    stats box misses the query are skipped (CELL_OUTSIDE_QUERY); groups
    fully inside take all ids with no per-value test (CELL_INSIDE_QUERY);
    boundary groups get the vectorized 2-D mask (CELL_CROSSES_QUERY)."""
    pf = pq.ParquetFile(path)
    md = pf.metadata
    out: list[np.ndarray] = []
    n_read = 0
    for g in range(md.num_row_groups):
        sx = md.row_group(g).column(0).statistics
        sy = md.row_group(g).column(1).statistics
        if int(sx.max) < x_lo or int(sx.min) > x_hi:
            continue
        if int(sy.max) < y_lo or int(sy.min) > y_hi:
            continue
        n_read += 1
        inside = (
            x_lo <= int(sx.min)
            and int(sx.max) <= x_hi
            and y_lo <= int(sy.min)
            and int(sy.max) <= y_hi
        )
        if inside:
            out.append(
                pf.read_row_group(g, columns=["doc_id"]).column("doc_id").to_numpy()
            )
            continue
        tbl = pf.read_row_group(g)
        xv = tbl.column("x").to_numpy()
        yv = tbl.column("y").to_numpy()
        m = (xv >= x_lo) & (xv <= x_hi) & (yv >= y_lo) & (yv <= y_hi)
        out.append(tbl.column("doc_id").to_numpy()[m])
    docs = np.concatenate(out) if out else np.empty(0, dtype=np.int64)
    return docs, n_read, md.num_row_groups


def box_docs_2d(points_manifest: dict, x_lo: int, x_hi: int, y_lo: int, y_hi: int):
    """IntPoint.newRangeQuery 2-D (inclusive box): file-level prune on
    both dims' manifest bounds, then a streamed one-task-per-file Dataset
    scan. Returns a ray.data.Dataset of (doc_id) — the match set never
    collects on the driver."""
    import ray.data

    hit = [
        f["path"]
        for f in points_manifest["files"]
        if not (
            f["max_x"] < x_lo
            or f["min_x"] > x_hi
            or f["max_y"] < y_lo
            or f["min_y"] > y_hi
        )
    ]
    if not hit:
        return ray.data.from_arrow(pa.table({"doc_id": pa.array([], type=pa.int64())}))

    def _scan(batch: pa.Table) -> pa.Table:
        parts = [
            box_docs_2d_file(p, x_lo, x_hi, y_lo, y_hi)[0]
            for p in batch.column("path").to_pylist()
        ]
        docs = np.concatenate(parts) if parts else np.empty(0, dtype=np.int64)
        return pa.table({"doc_id": pa.array(docs, type=pa.int64())})

    return ray.data.from_items([{"path": p} for p in hit]).map_batches(
        _scan, batch_size=1, batch_format="pyarrow", **_rargs()
    )


# ---------------------------------------------------------------------------
# Range fields (document/LongRange.java + RangeFieldQuery.java QueryType
# INTERSECTS/WITHIN/CONTAINS/CROSSES): every doc carries an [lo, hi]
# interval, indexed as lo-sorted leaves with per-file [min(lo), max(hi)]
# stats (the 2*dims-packed BKD role for 1-D ranges). The fixture interval
# is doc_id-derived pure-integer so the SQL oracle replays it verbatim:
#     lo = (doc_id * 7919) % 10000,  hi = lo + 50 + (doc_id % 400)
# ---------------------------------------------------------------------------


def synth_ranges(doc_ids: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    ids = np.asarray(doc_ids, dtype=np.int64)
    lo = (ids * 7919) % 10000
    return lo, lo + 50 + (ids % 400)


def build_range_field(build_manifest: dict, index_dir: str, rows_per_leaf: int = POINTS_LEAF_ROWS) -> dict:
    """Per-partition range-field files, write-once + resume-idempotent."""
    import json

    import ray
    import ray.data

    from .rayenv import remote_args as _rargs

    out_dir = os.path.join(index_dir, "range_field")
    man_path = os.path.join(out_dir, "range_manifest.json")
    if os.path.exists(man_path):
        with open(man_path) as f:
            return json.load(f)
    os.makedirs(out_dir, exist_ok=True)
    parts = sorted(build_manifest["partitions"], key=lambda r: int(r["doc_base"]))
    specs = [
        {
            "doc_base": int(r["doc_base"]),
            "n_docs": int(r["n_docs"]),
            "out_path": os.path.join(out_dir, f"ranges-{i:05d}.parquet"),
        }
        for i, r in enumerate(parts)
    ]

    def _build_one(batch: pa.Table) -> pa.Table:
        rows = []
        for spec in batch.to_pylist():
            out_path = spec["out_path"]
            if not os.path.exists(out_path):
                ids = np.arange(
                    spec["doc_base"], spec["doc_base"] + spec["n_docs"], dtype=np.int64
                )
                lo, hi = synth_ranges(ids)
                order = np.argsort(lo, kind="stable")
                tbl = pa.table(
                    {
                        "lo": pa.array(lo[order], type=pa.int64()),
                        "hi": pa.array(hi[order], type=pa.int64()),
                        "doc_id": pa.array(ids[order], type=pa.int64()),
                    }
                )
                tmp = out_path + ".tmp"
                pq.write_table(tbl, tmp, row_group_size=rows_per_leaf)
                os.replace(tmp, out_path)
            md = pq.read_metadata(out_path)
            ls = [md.row_group(g).column(0).statistics for g in range(md.num_row_groups)]
            hs = [md.row_group(g).column(1).statistics for g in range(md.num_row_groups)]
            rows.append(
                {
                    "path": out_path,
                    "min_lo": min(int(s.min) for s in ls),
                    "max_hi": max(int(s.max) for s in hs),
                    "n_rows": int(md.num_rows),
                }
            )
        return pa.Table.from_pylist(rows)

    files = (
        ray.data.from_items(specs)
        .map_batches(_build_one, batch_size=1, batch_format="pyarrow", **_rargs())
        .take_all()
    )
    manifest = {"rows_per_leaf": rows_per_leaf, "files": sorted(files, key=lambda r: r["path"])}
    tmp = man_path + ".tmp"
    with open(tmp, "w") as f:
        json.dump(manifest, f)
    os.replace(tmp, man_path)
    return manifest


def range_field_docs(range_manifest: dict, q_lo: int, q_hi: int):
    """RangeFieldQuery over the indexed intervals: streamed Dataset of
    (doc_id, relation) for every doc range intersecting [q_lo, q_hi],
    classified WITHIN (doc range inside the query), CONTAINS (doc range
    covers the query), or CROSSES (partial overlap) — RangeFieldQuery
    .QueryType.{INTERSECTS,WITHIN,CONTAINS,CROSSES} semantics; the
    INTERSECTS set is all emitted rows. File prune on [min_lo, max_hi]."""
    import ray.data

    from .rayenv import remote_args as _rargs

    hit = [
        f["path"]
        for f in range_manifest["files"]
        if not (f["max_hi"] < q_lo or f["min_lo"] > q_hi)
    ]
    empty = pa.table(
        {
            "doc_id": pa.array([], type=pa.int64()),
            "relation": pa.array([], type=pa.string()),
        }
    )
    if not hit:
        return ray.data.from_arrow(empty)

    def _scan(batch: pa.Table) -> pa.Table:
        outs = [empty]
        for p in batch.column("path").to_pylist():
            pf = pq.ParquetFile(p)
            md = pf.metadata
            for g in range(md.num_row_groups):
                sl = md.row_group(g).column(0).statistics
                sh = md.row_group(g).column(1).statistics
                if int(sh.max) < q_lo or int(sl.min) > q_hi:
                    continue
                tbl = pf.read_row_group(g)
                lo = tbl.column("lo").to_numpy()
                hi = tbl.column("hi").to_numpy()
                inter = (hi >= q_lo) & (lo <= q_hi)
                within = (lo >= q_lo) & (hi <= q_hi)
                contains = (lo <= q_lo) & (hi >= q_hi)
                # a doc range equal to the query is both within and
                # contains — classified WITHIN (within tested first)
                rel = np.where(
                    within, "WITHIN", np.where(contains, "CONTAINS", "CROSSES")
                )
                outs.append(
                    pa.table(
                        {
                            "doc_id": pa.array(tbl.column("doc_id").to_numpy()[inter]),
                            "relation": pa.array(rel[inter], type=pa.string()),
                        }
                    )
                )
        return pa.concat_tables(outs)

    return ray.data.from_items([{"path": p} for p in hit]).map_batches(
        _scan, batch_size=1, batch_format="pyarrow", **_rargs()
    )
