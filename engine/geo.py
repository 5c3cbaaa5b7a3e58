"""Geo point index — the LatLonPoint role (2-D BKD) over the corpus.

Re-expression of Lucene's geo queries (`document/LatLonPoint.java:60-118`
`newBoxQuery` / `newDistanceQuery`; quantized integer encoding
`geo/GeoEncodingUtils.java:39-74` — Lucene stores lat/lon as scaled
int32, so box comparisons are integer-exact; distance math
`util/SloppyMath.java:70-92` haversin on the mean earth radius
`geo/GeoUtils.java:36` 6371008.7714 m; the distance query's bounding-box
prefilter `geo/Rectangle.java:91-130` `fromPointDistance`):

- Coordinates are integer MILLI-degrees (the encoding role): the test
  tables carry no geo columns, so each doc's (lat, lon) is a documented
  deterministic fixture derived from doc_id with pure integer
  arithmetic — reproducible bit-exactly in SQL for the oracle.
- **Layout**: per build partition, (lat_mdeg, lon_mdeg, doc_id) sorted
  by lat (the leading BKD split dim); parquet row groups are the leaf
  blocks, footer min/max on BOTH dims are the inner-node ranges. A box
  query prunes row groups on lat stats and lon stats, then masks the
  boundary leaves; distance queries prefilter with the circle's
  bounding rectangle before the exact haversine mask.
- Box bounds are INCLUSIVE; a box with min_lon > max_lon crosses the
  dateline (LatLonPoint semantics) and matches lon >= min OR lon <= max.
"""

from __future__ import annotations

import json
import os

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

from .rayenv import remote_args as _rargs

EARTH_MEAN_RADIUS_M = 6371008.7714  # GeoUtils.EARTH_MEAN_RADIUS_METERS
GEO_LEAF_ROWS = 1024


def synth_latlon(doc_ids: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """Deterministic per-doc coordinates in integer milli-degrees (the
    fixture: testdata has no geo columns). Pure integer arithmetic so
    the SQL oracle reproduces it exactly:
        lat = (doc_id * 2654435761) % 180000 - 90000
        lon = (doc_id * 40503 + 12345) % 360000 - 180000
    """
    ids = np.asarray(doc_ids, dtype=np.int64)
    lat = (ids * 2654435761) % 180000 - 90000
    lon = (ids * 40503 + 12345) % 360000 - 180000
    return lat, lon


def _geo_dir(index_dir: str) -> str:
    return os.path.join(index_dir, "geo_points")


def build_geo(
    build_manifest: dict, index_dir: str, rows_per_leaf: int = GEO_LEAF_ROWS
) -> dict:
    """Build (or reuse) the per-partition geo points files. One Ray task
    per partition; write-once (tmp + atomic rename), resume-idempotent.
    Manifest rows carry per-file lat/lon bounds for file-level pruning."""
    import ray
    import ray.data

    out_dir = _geo_dir(index_dir)
    man_path = os.path.join(out_dir, "geo_manifest.json")
    if os.path.exists(man_path):
        with open(man_path) as f:
            return json.load(f)
    os.makedirs(out_dir, exist_ok=True)

    parts = sorted(build_manifest["partitions"], key=lambda r: int(r["doc_base"]))
    specs = [
        {
            "doc_base": int(r["doc_base"]),
            "n_docs": int(r["n_docs"]),
            "out_path": os.path.join(out_dir, f"geo-{i:05d}.parquet"),
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
                lat, lon = synth_latlon(ids)
                order = np.argsort(lat, kind="stable")  # leading split dim
                tbl = pa.table(
                    {
                        "lat": pa.array(lat[order], type=pa.int64()),
                        "lon": pa.array(lon[order], type=pa.int64()),
                        "doc_id": pa.array(ids[order], type=pa.int64()),
                    }
                )
                tmp = out_path + ".tmp"
                pq.write_table(tbl, tmp, row_group_size=rows_per_leaf)
                os.replace(tmp, out_path)
            md = pq.read_metadata(out_path)
            la = [md.row_group(g).column(0).statistics for g in range(md.num_row_groups)]
            lo = [md.row_group(g).column(1).statistics for g in range(md.num_row_groups)]
            rows.append(
                {
                    "path": out_path,
                    "min_lat": min(int(s.min) for s in la),
                    "max_lat": max(int(s.max) for s in la),
                    "min_lon": min(int(s.min) for s in lo),
                    "max_lon": max(int(s.max) for s in lo),
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
        "rows_per_leaf": rows_per_leaf,
        "files": sorted(files, key=lambda r: r["path"]),
    }
    tmp = man_path + ".tmp"
    with open(tmp, "w") as f:
        json.dump(manifest, f)
    os.replace(tmp, man_path)
    return manifest


def _lon_mask(lon: np.ndarray, min_lon: int, max_lon: int) -> np.ndarray:
    if min_lon <= max_lon:
        return (lon >= min_lon) & (lon <= max_lon)
    # dateline crossing: LatLonPoint.newBoxQuery splits into two boxes
    return (lon >= min_lon) | (lon <= max_lon)


def box_docs_file(
    path: str, min_lat: int, max_lat: int, min_lon: int, max_lon: int
) -> tuple[np.ndarray, int, int]:
    """Matching doc_ids from ONE geo file for an inclusive box. Returns
    (doc_ids, n_groups_read, n_groups_total). Row groups are pruned on
    the lat stats (the sort dim) AND, for non-dateline boxes, the lon
    stats."""
    pf = pq.ParquetFile(path)
    md = pf.metadata
    out: list[np.ndarray] = []
    n_read = 0
    for g in range(md.num_row_groups):
        sla = md.row_group(g).column(0).statistics
        if int(sla.max) < min_lat or int(sla.min) > max_lat:
            continue
        if min_lon <= max_lon:  # lon prune only valid for a plain interval
            slo = md.row_group(g).column(1).statistics
            if int(slo.max) < min_lon or int(slo.min) > max_lon:
                continue
        n_read += 1
        tbl = pf.read_row_group(g)
        lat = tbl.column("lat").to_numpy()
        lon = tbl.column("lon").to_numpy()
        m = (lat >= min_lat) & (lat <= max_lat) & _lon_mask(lon, min_lon, max_lon)
        out.append(tbl.column("doc_id").to_numpy()[m])
    docs = np.concatenate(out) if out else np.empty(0, dtype=np.int64)
    return docs, n_read, md.num_row_groups


def box_docs(
    geo_manifest: dict, min_lat: int, max_lat: int, min_lon: int, max_lon: int
):
    """LatLonPoint.newBoxQuery (inclusive, milli-degrees): streamed
    one-task-per-file scan over files whose bounds overlap the box.
    Returns a ray.data.Dataset of (doc_id) — a box over a web-scale corpus
    can match billions of rows, so the match set never lands on the
    driver; callers reduce (count/write/join) or take_all only when the
    result is known-bounded (the sf-scale driver entries)."""
    import ray.data

    def _overlap(f: dict) -> bool:
        if f["max_lat"] < min_lat or f["min_lat"] > max_lat:
            return False
        if min_lon <= max_lon and (f["max_lon"] < min_lon or f["min_lon"] > max_lon):
            return False
        return True

    hit = [f["path"] for f in geo_manifest["files"] if _overlap(f)]
    if not hit:
        return ray.data.from_arrow(pa.table({"doc_id": pa.array([], type=pa.int64())}))

    def _scan(batch: pa.Table) -> pa.Table:
        parts = [
            box_docs_file(p, min_lat, max_lat, min_lon, max_lon)[0]
            for p in batch.column("path").to_pylist()
        ]
        docs = np.concatenate(parts) if parts else np.empty(0, dtype=np.int64)
        return pa.table({"doc_id": pa.array(docs, type=pa.int64())})

    return ray.data.from_items([{"path": p} for p in hit]).map_batches(
        _scan, batch_size=1, batch_format="pyarrow", **_rargs()
    )


def haversin_meters(
    lat1_deg: np.ndarray, lon1_deg: np.ndarray, lat2_deg: float, lon2_deg: float
) -> np.ndarray:
    """SloppyMath.haversinMeters role (exact libm, not the sloppy table):
    2R·asin(√(sin²(Δφ/2) + cosφ1·cosφ2·sin²(Δλ/2)))."""
    p1 = np.radians(np.asarray(lat1_deg, dtype=np.float64))
    l1 = np.radians(np.asarray(lon1_deg, dtype=np.float64))
    p2 = np.radians(float(lat2_deg))
    l2 = np.radians(float(lon2_deg))
    h = (
        np.sin((p2 - p1) / 2.0) ** 2
        + np.cos(p1) * np.cos(p2) * np.sin((l2 - l1) / 2.0) ** 2
    )
    return 2.0 * EARTH_MEAN_RADIUS_M * np.arcsin(np.minimum(1.0, np.sqrt(h)))


def _distance_box(lat_deg: float, lon_deg: float, radius_m: float):
    """Rectangle.fromPointDistance role: the circle's bounding box in
    milli-degrees (conservative — expanded outward), handling pole and
    dateline overflow by clamping / wrapping to the full lon span."""
    dlat = np.degrees(radius_m / EARTH_MEAN_RADIUS_M)
    min_lat = max(-90.0, lat_deg - dlat)
    max_lat = min(90.0, lat_deg + dlat)
    cos_min = min(
        np.cos(np.radians(min_lat)), np.cos(np.radians(max_lat))
    )
    if cos_min <= 1e-9 or dlat >= 90.0:
        min_lon, max_lon = -180.0, 180.0  # circle spans a pole
    else:
        dlon = np.degrees(radius_m / EARTH_MEAN_RADIUS_M) / cos_min
        if dlon >= 180.0:
            min_lon, max_lon = -180.0, 180.0
        else:
            min_lon = lon_deg - dlon
            max_lon = lon_deg + dlon
            if min_lon < -180.0:
                min_lon += 360.0  # dateline wrap => min > max box
            if max_lon > 180.0:
                max_lon -= 360.0
    return (
        int(np.floor(min_lat * 1000.0)),
        int(np.ceil(max_lat * 1000.0)),
        int(np.floor(min_lon * 1000.0)),
        int(np.ceil(max_lon * 1000.0)),
    )


def distance_docs(
    geo_manifest: dict, lat_deg: float, lon_deg: float, radius_m: float
) -> pa.Table:
    """LatLonPoint.newDistanceQuery: docs within radius_m meters of the
    point (haversine, mean earth radius). Bounding-box prefilter over the
    leaf stats, exact vectorized haversine on the candidates only.
    Returns a ray.data.Dataset of (doc_id) — see box_docs on why the
    match set streams instead of collecting on the driver."""
    import ray.data

    b = _distance_box(lat_deg, lon_deg, radius_m)

    def _overlap(f: dict) -> bool:
        if f["max_lat"] < b[0] or f["min_lat"] > b[1]:
            return False
        if b[2] <= b[3] and (f["max_lon"] < b[2] or f["min_lon"] > b[3]):
            return False
        return True

    hit = [f["path"] for f in geo_manifest["files"] if _overlap(f)]
    if not hit:
        return ray.data.from_arrow(pa.table({"doc_id": pa.array([], type=pa.int64())}))

    def _scan(batch: pa.Table) -> pa.Table:
        out = []
        for p in batch.column("path").to_pylist():
            pf = pq.ParquetFile(p)
            md = pf.metadata
            for g in range(md.num_row_groups):
                sla = md.row_group(g).column(0).statistics
                if int(sla.max) < b[0] or int(sla.min) > b[1]:
                    continue
                tbl = pf.read_row_group(g)
                lat = tbl.column("lat").to_numpy()
                lon = tbl.column("lon").to_numpy()
                m = (lat >= b[0]) & (lat <= b[1]) & _lon_mask(lon, b[2], b[3])
                if not m.any():
                    continue
                d = haversin_meters(lat[m] / 1000.0, lon[m] / 1000.0, lat_deg, lon_deg)
                out.append(tbl.column("doc_id").to_numpy()[m][d <= radius_m])
        docs = np.concatenate(out) if out else np.empty(0, dtype=np.int64)
        return pa.table({"doc_id": pa.array(docs, type=pa.int64())})

    return ray.data.from_items([{"path": p} for p in hit]).map_batches(
        _scan, batch_size=1, batch_format="pyarrow", **_rargs()
    )


def point_in_polygon_mask(
    lat: np.ndarray, lon: np.ndarray, poly: list[tuple[int, int]]
) -> np.ndarray:
    """Even-odd (ray-casting) point-in-polygon over INTEGER milli-degree
    coordinates — the LatLonPointInPolygonQuery role
    (document/LatLonPointInPolygonQuery.java; the reference tessellates,
    this engine keeps the classic crossing parity — documented deviation,
    same interior for simple polygons). All arithmetic is int64
    cross-multiplication (products < 2^63 at milli-degree scale), so the
    SQL oracle replays the decision bit-exactly. Half-open edge rule
    ((y1 > p) != (y2 > p)) keeps boundary handling deterministic."""
    inside = np.zeros(len(lat), dtype=bool)
    n = len(poly)
    for i in range(n):
        y1, x1 = poly[i]  # (lat, lon)
        y2, x2 = poly[(i + 1) % n]
        spans = (y1 > lat) != (y2 > lat)
        if not spans.any():
            continue
        t = (lon - x1) * (y2 - y1) - (x2 - x1) * (lat - y1)
        cross = spans & ((t < 0) if y2 > y1 else (t > 0))
        inside ^= cross
    return inside


def polygon_docs(geo_manifest: dict, poly: list[tuple[int, int]]):
    """LatLonPoint.newPolygonQuery: docs inside the polygon (vertices as
    (lat, lon) integer milli-degrees, even-odd interior). Bounding-box
    prune over file/leaf stats, exact integer parity test on candidates;
    streamed Dataset result."""
    import ray.data

    min_lat = min(p[0] for p in poly)
    max_lat = max(p[0] for p in poly)
    min_lon = min(p[1] for p in poly)
    max_lon = max(p[1] for p in poly)

    hit = [
        f["path"]
        for f in geo_manifest["files"]
        if not (
            f["max_lat"] < min_lat
            or f["min_lat"] > max_lat
            or f["max_lon"] < min_lon
            or f["min_lon"] > max_lon
        )
    ]
    if not hit:
        return ray.data.from_arrow(pa.table({"doc_id": pa.array([], type=pa.int64())}))

    def _scan(batch: pa.Table) -> pa.Table:
        out = []
        for p in batch.column("path").to_pylist():
            pf = pq.ParquetFile(p)
            md = pf.metadata
            for g in range(md.num_row_groups):
                sla = md.row_group(g).column(0).statistics
                if int(sla.max) < min_lat or int(sla.min) > max_lat:
                    continue
                slo = md.row_group(g).column(1).statistics
                if int(slo.max) < min_lon or int(slo.min) > max_lon:
                    continue
                tbl = pf.read_row_group(g)
                lat = tbl.column("lat").to_numpy()
                lon = tbl.column("lon").to_numpy()
                m = point_in_polygon_mask(lat, lon, poly)
                if m.any():
                    out.append(tbl.column("doc_id").to_numpy()[m])
        docs = np.concatenate(out) if out else np.empty(0, dtype=np.int64)
        return pa.table({"doc_id": pa.array(docs, type=pa.int64())})

    return ray.data.from_items([{"path": p} for p in hit]).map_batches(
        _scan, batch_size=1, batch_format="pyarrow", **_rargs()
    )


def nearest_k(
    geo_manifest: dict, lat_deg: float, lon_deg: float, k: int
) -> pa.Table:
    """LatLonDocValuesField.newDistanceSort role (+ LatLonPoint
    nearest-neighbor `document/LatLonPointPrototypeQueries.java:52`):
    the k docs closest to the point, (distance asc, doc_id asc)
    tie-break. Per-file partial top-k inside each task (a k-row
    combiner), tiny merge on the driver.

    Exactness: the in-task selection ranks by the VECTORIZED distance
    (the milli-degree grid's minimum inter-point distance ~0.1 m dwarfs
    the ~1-ulp SIMD-vs-libm trig drift, so ranks can't flip; exact
    same-point ties keep every candidate at the k-th boundary and break
    on doc_id), while the EMITTED distances for the <= k*n_files
    finalists recompute with scalar libm in the oracle's exact op order
    — bit-identical to DuckDB's asin/sqrt/sin/cos chain (probed
    0-mismatch on 2,858 grid points)."""
    import ray.data

    def _scan(batch: pa.Table) -> pa.Table:
        out = []
        for p in batch.column("path").to_pylist():
            tbl = pq.read_table(p)
            lat = tbl.column("lat").to_numpy()
            lon = tbl.column("lon").to_numpy()
            d = haversin_meters(lat / 1000.0, lon / 1000.0, lat_deg, lon_deg)
            docs = tbl.column("doc_id").to_numpy()
            if len(d) > k:
                # keep ALL boundary ties, then (dist, doc_id) order — an
                # argpartition cut could drop the smaller doc_id of an
                # exact same-point tie straddling the k-th slot
                kth = np.partition(d, k - 1)[k - 1]
                keep = np.flatnonzero(d <= kth)
                order = np.lexsort((docs[keep], d[keep]))[:k]
                sel = keep[order]
                d, docs, lat, lon = d[sel], docs[sel], lat[sel], lon[sel]
            out.append(
                pa.table(
                    {
                        "doc_id": pa.array(docs, type=pa.int64()),
                        "la": pa.array(lat / 1000.0, type=pa.float64()),
                        "lo": pa.array(lon / 1000.0, type=pa.float64()),
                    }
                )
            )
        return pa.concat_tables(out)

    rows = (
        ray.data.from_items([{"path": f["path"]} for f in geo_manifest["files"]])
        .map_batches(_scan, batch_size=1, batch_format="pyarrow", **_rargs())
        .take_all()
    )
    import math

    docs = np.fromiter((r["doc_id"] for r in rows), dtype=np.int64, count=len(rows))
    dist = np.empty(len(rows), dtype=np.float64)
    for i, r in enumerate(rows):
        # scalar libm, the SQL op order: 2R*asin(least(1, sqrt(
        #   sin(rad(lat2-la)/2)^2 + cos(rad(la))*cos(rad(lat2))*sin(rad(lon2-lo)/2)^2)))
        t1 = math.sin(math.radians(lat_deg - r["la"]) / 2.0)
        t2 = math.sin(math.radians(lon_deg - r["lo"]) / 2.0)
        h = t1 * t1 + math.cos(math.radians(r["la"])) * math.cos(
            math.radians(lat_deg)
        ) * (t2 * t2)
        dist[i] = 2.0 * EARTH_MEAN_RADIUS_M * math.asin(min(1.0, math.sqrt(h)))
    order = np.lexsort((docs, dist))[:k]
    return pa.table(
        {
            "rank": pa.array(np.arange(len(order)), type=pa.int64()),
            "doc_id": pa.array(docs[order], type=pa.int64()),
            "dist_m": pa.array(dist[order], type=pa.float64()),
        }
    )


# ---------------------------------------------------------------------------
# LatLonShape role (document/LatLonShape.java + LatLonShapeBoundingBoxQuery):
# per-doc SHAPES indexed with bbox-expanded leaf stats, queried by box with
# spatial relations. The fixture shape is an L1 diamond (|dlat| + |dlon| <=
# arm) centered on the point fixture — convex, so the reference's
# tessellated-triangle tree walk reduces to a closed-form exact test the
# SQL oracle replays in pure integers: the box's clamped L1 distance to the
# center <= arm (INTERSECTS), all four tips inside (WITHIN). Dateline
# wrap-around is out of scope for shapes (the box query above keeps it for
# points); the fixture's arithmetic is plain integer space either side.
# ---------------------------------------------------------------------------


def synth_shape_arm(doc_ids: np.ndarray) -> np.ndarray:
    """Deterministic per-doc diamond arm (milli-deg): 300 + (doc_id % 7) * 100."""
    ids = np.asarray(doc_ids, dtype=np.int64)
    return 300 + (ids % 7) * 100


def _shapes_dir(index_dir: str) -> str:
    return os.path.join(index_dir, "geo_shapes")


def build_shapes(build_manifest: dict, index_dir: str, rows_per_leaf: int = GEO_LEAF_ROWS) -> dict:
    """Per-partition shape files (center + arm), lat-sorted leaves, per-file
    ARM-EXPANDED bbox bounds (a shape overlaps the query iff its bbox does —
    the stats must cover the full extent, not just centers). Write-once."""
    import ray
    import ray.data

    out_dir = _shapes_dir(index_dir)
    man_path = os.path.join(out_dir, "shapes_manifest.json")
    if os.path.exists(man_path):
        with open(man_path) as f:
            return json.load(f)
    os.makedirs(out_dir, exist_ok=True)

    parts = sorted(build_manifest["partitions"], key=lambda r: int(r["doc_base"]))
    specs = [
        {
            "doc_base": int(r["doc_base"]),
            "n_docs": int(r["n_docs"]),
            "out_path": os.path.join(out_dir, f"shapes-{i:05d}.parquet"),
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
                lat, lon = synth_latlon(ids)
                arm = synth_shape_arm(ids)
                order = np.argsort(lat, kind="stable")
                tbl = pa.table(
                    {
                        "lat": pa.array(lat[order], type=pa.int64()),
                        "lon": pa.array(lon[order], type=pa.int64()),
                        "arm": pa.array(arm[order], type=pa.int64()),
                        "doc_id": pa.array(ids[order], type=pa.int64()),
                    }
                )
                tmp = out_path + ".tmp"
                pq.write_table(tbl, tmp, row_group_size=rows_per_leaf)
                os.replace(tmp, out_path)
            md = pq.read_metadata(out_path)
            la = [md.row_group(g).column(0).statistics for g in range(md.num_row_groups)]
            lo = [md.row_group(g).column(1).statistics for g in range(md.num_row_groups)]
            am = [md.row_group(g).column(2).statistics for g in range(md.num_row_groups)]
            max_arm = max(int(s.max) for s in am)
            rows.append(
                {
                    "path": out_path,
                    "min_lat": min(int(s.min) for s in la) - max_arm,
                    "max_lat": max(int(s.max) for s in la) + max_arm,
                    "min_lon": min(int(s.min) for s in lo) - max_arm,
                    "max_lon": max(int(s.max) for s in lo) + max_arm,
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
        "rows_per_leaf": rows_per_leaf,
        "files": sorted(files, key=lambda r: r["path"]),
    }
    tmp = man_path + ".tmp"
    with open(tmp, "w") as f:
        json.dump(manifest, f)
    os.replace(tmp, man_path)
    return manifest


def shape_box_docs(
    shapes_manifest: dict, min_lat: int, max_lat: int, min_lon: int, max_lon: int
):
    """LatLonShapeBoundingBoxQuery over the indexed diamonds: streamed
    one-task-per-file Dataset of (doc_id, relation) with relation WITHIN
    (shape fully inside the box) or INTERSECTS (crosses the boundary).
    Exact integer test: clamped L1 distance ax + ay <= arm, where
    ax = max(0, min_lon - lon, lon - max_lon) and ay likewise for lat;
    WITHIN iff all four diamond tips lie inside the box."""
    import ray.data

    def _overlap(f: dict) -> bool:
        return not (
            f["max_lat"] < min_lat
            or f["min_lat"] > max_lat
            or f["max_lon"] < min_lon
            or f["min_lon"] > max_lon
        )

    hit = [f["path"] for f in shapes_manifest["files"] if _overlap(f)]
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
                sla = md.row_group(g).column(0).statistics
                sam = md.row_group(g).column(2).statistics
                pad = int(sam.max)
                if int(sla.max) + pad < min_lat or int(sla.min) - pad > max_lat:
                    continue
                tbl = pf.read_row_group(g)
                lat = tbl.column("lat").to_numpy()
                lon = tbl.column("lon").to_numpy()
                arm = tbl.column("arm").to_numpy()
                ax = np.maximum(
                    0, np.maximum(min_lon - lon, lon - max_lon)
                )
                ay = np.maximum(
                    0, np.maximum(min_lat - lat, lat - max_lat)
                )
                inter = (ax + ay) <= arm
                within = (
                    (lat - arm >= min_lat)
                    & (lat + arm <= max_lat)
                    & (lon - arm >= min_lon)
                    & (lon + arm <= max_lon)
                )
                rel = np.where(within, "WITHIN", "INTERSECTS")
                outs.append(
                    pa.table(
                        {
                            "doc_id": pa.array(
                                tbl.column("doc_id").to_numpy()[inter]
                            ),
                            "relation": pa.array(rel[inter], type=pa.string()),
                        }
                    )
                )
        return pa.concat_tables(outs)

    return ray.data.from_items([{"path": p} for p in hit]).map_batches(
        _scan, batch_size=1, batch_format="pyarrow", **_rargs()
    )


def heatmap_facet(
    geo_manifest: dict,
    min_lat: int,
    max_lat: int,
    min_lon: int,
    max_lon: int,
    grid: int = 8,
) -> pa.Table:
    """Solr heatmap faceting (solr/handler/component/SpatialHeatmapFacets
    .java over the prefix-tree grid role): counts of points per cell of a
    ``grid`` x ``grid`` lattice covering the (inclusive) box, cells
    addressed row-major from the south-west corner. Cell assignment is
    pure integer arithmetic — cell = ((v - min) * grid) // span with
    span = max - min + 1 — so the SQL oracle replays it verbatim.
    Shape: per-file vectorized partial count vectors (grid^2 ints)
    summed on the driver — the reduce is grid^2 numbers regardless of
    corpus size; files outside the box are never opened."""
    import ray

    from .rayenv import remote_args as _rargs

    lat_span = max_lat - min_lat + 1
    lon_span = max_lon - min_lon + 1

    def _partial(path: str) -> np.ndarray:
        docs, _r, _t = box_docs_file(path, min_lat, max_lat, min_lon, max_lon)
        counts = np.zeros(grid * grid, dtype=np.int64)
        if len(docs):
            lat, lon = synth_latlon(docs)
            row = ((lat - min_lat) * grid) // lat_span
            col = ((lon - min_lon) * grid) // lon_span
            np.add.at(counts, row * grid + col, 1)
        return counts

    hit = [
        f["path"]
        for f in geo_manifest["files"]
        if not (f["max_lat"] < min_lat or f["min_lat"] > max_lat
                or f["max_lon"] < min_lon or f["min_lon"] > max_lon)
    ]
    counts = np.zeros(grid * grid, dtype=np.int64)
    if hit:
        part = ray.remote(**_rargs())(_partial)
        for c in ray.get([part.remote(p) for p in hit]):
            counts += c
    cells = np.flatnonzero(counts)
    return pa.table(
        {
            "cell_row": pa.array((cells // grid).astype(np.int64)),
            "cell_col": pa.array((cells % grid).astype(np.int64)),
            "cnt": pa.array(counts[cells]),
        }
    )
