"""Merge operators: k-way segment merge tree + salted groupby-term shuffle.

Two merge paths, mirroring SURVEY §2.6:

**Path A — merge tree** (`merge_tree`): the TieredMergePolicy /
SegmentMerger shape (index/TieredMergePolicy.java:96-103,
index/SegmentMerger.java:96-191): deterministic plan groups fan_in
doc-adjacent segments per level until <= target_segments remain; each group
merges via a k-way sorted-term stream (heapq over per-segment term rows —
the MultiTermsEnum analogue). Because global docIDs were assigned at
ingest, postings concatenate with no docBase remap (MergeState.buildDocMaps
is the identity here). Each merge node is an idempotent atomic segment
write keyed by (level, doc_base) => resume mid-merge reuses any completed
node.

**Path B — groupby-term shuffle** (`merge_by_term`, the north-rule path):
explode every partition's term table into (term, salt, postings-row) rows,
`groupby(term, salt).map_groups(merge)` re-encodes each term's merged
postings. Skew handling is explicit: a pre-pass computes global df with a
pruned-column read + groupby-sum, terms above ``salt_threshold`` (stop
words) are salted by contiguous partition rank ranges into ``n_salts``
sub-groups that merge in parallel; light terms are final after the single
shuffle, and the salted runs go through a second, tiny groupby(term) —
n_heavy x n_salts rows — whose groups concatenate in parallel (order
restored by doc sort — a no-op concat when salts are contiguous rank
ranges). Output is a term-range-sharded merged index (one
logical segment over the full doc range) whose norms reference the
partition norm files (no rewrite).
"""

from __future__ import annotations

import heapq
import json
import os
import time

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

from .codec import encode_term_postings
from .segment import TERMS_SCHEMA, Segment, write_segment

# ---------------------------------------------------------------------------
# Path A: k-way segment merge tree
# ---------------------------------------------------------------------------


def merge_segments(seg_dirs: list[str], out_dir: str) -> dict:
    """K-way merge N doc-disjoint segments into one (SegmentMerger.merge
    order: norms first, then postings term-by-term)."""
    t0 = time.perf_counter()
    segs = sorted((Segment(d) for d in seg_dirs), key=lambda s: s.doc_base)
    norm_ids = np.concatenate(
        [np.arange(s.doc_base, s.doc_base + len(s._norms), dtype=np.int64) for s in segs]
    )
    norms = np.concatenate([s._norms for s in segs])

    def _stream(si: int, seg: Segment):
        for row in seg.iter_term_rows():
            yield (row["term"], si, row)

    streams = [_stream(si, seg) for si, seg in enumerate(segs)]
    cols: dict[str, list] = {f.name: [] for f in TERMS_SCHEMA}
    for term, group in _group_sorted(heapq.merge(*streams)):
        decoded = [_decode_row(segs[si], row) for _, si, row in group]
        docs, freqs, nrm = _concat_decoded(decoded)
        _emit_from_arrays(cols, term, docs, freqs, nrm)
    meta = {
        "kind": "merged",
        "field": "body",
        "doc_base": int(segs[0].doc_base),
        "n_docs": int(sum(s.n_docs for s in segs)),
        "sum_ttf": int(sum(s.sum_ttf for s in segs)),
        "n_terms": len(cols["term"]),
        "lineage": {"inputs": [s.dir for s in segs]},
        "wall_ms": round((time.perf_counter() - t0) * 1000, 3),
    }
    return write_segment(out_dir, pa.table(cols, schema=TERMS_SCHEMA), norm_ids, norms, meta)


def _group_sorted(it):
    """Group a (term, si, row) sorted stream by term."""
    cur = None
    buf: list = []
    for item in it:
        if cur is None or item[0] != cur:
            if buf:
                yield cur, buf
            cur, buf = item[0], [item]
        else:
            buf.append(item)
    if buf:
        yield cur, buf


def _decode_row(seg, row: dict):
    """(docs, freqs, norms) for one per-segment term row."""
    from .codec import decode_term_postings

    if row["df"] == 1:
        docs = np.array([row["singleton_doc"]], dtype=np.int64)
        freqs = np.array([row["ttf"]], dtype=np.int64)
        norms = np.array([row["imp_norm"][0]], dtype=np.uint8)
    else:
        docs, freqs = decode_term_postings(row["blob"], row["df"])
        norms = seg.norm_of(docs)
    return docs, freqs, norms


def _concat_decoded(decoded):
    """Concatenate doc-disjoint (docs, freqs, norms) runs; restore doc order
    (a no-op concat when runs are contiguous doc ranges)."""
    decoded = sorted(decoded, key=lambda t: int(t[0][0]))
    docs = np.concatenate([d for d, _, _ in decoded])
    freqs = np.concatenate([f for _, f, _ in decoded])
    norms = np.concatenate([n for _, _, n in decoded])
    if len(docs) > 1 and not bool((np.diff(docs) > 0).all()):
        order = np.argsort(docs, kind="stable")
        docs, freqs, norms = docs[order], freqs[order], norms[order]
    return docs, freqs, norms


def _emit_from_arrays(cols: dict[str, list], term: str, docs, freqs, norms) -> None:
    """Append one TERMS_SCHEMA row built from raw postings arrays."""
    df = len(docs)
    cols["term"].append(term)
    cols["df"].append(df)
    cols["ttf"].append(int(freqs.sum()))
    if df == 1:
        cols["singleton_doc"].append(int(docs[0]))
        cols["blob"].append(b"")
        cols["last_docs"].append([int(docs[0])])
        cols["offsets"].append([])
        cols["imp_freq"].append([int(freqs[0])])
        cols["imp_norm"].append([int(norms[0])])
        cols["imp_start"].append([0, 1])
    else:
        tp = encode_term_postings(docs, freqs, norms)
        cols["singleton_doc"].append(-1)
        cols["blob"].append(tp.blob)
        cols["last_docs"].append(tp.block_last_doc.tolist())
        cols["offsets"].append(tp.block_offset.tolist())
        cols["imp_freq"].append(tp.imp_freq.tolist())
        cols["imp_norm"].append(tp.imp_norm.tolist())
        cols["imp_start"].append(tp.imp_start.tolist())


def plan_merge_tree(rows: list[dict], fan_in: int = 8, target_segments: int = 1):
    """Deterministic merge plan: group doc-adjacent segments, fan_in per
    node, repeat per level until <= target_segments (TieredMergePolicy
    role; deterministic => resumable)."""
    rows = sorted(rows, key=lambda r: r["doc_base"])
    levels = []
    cur = rows
    while len(cur) > target_segments:
        groups = [cur[i : i + fan_in] for i in range(0, len(cur), fan_in)]
        levels.append(groups)
        cur = [
            {
                "seg_dir": None,  # filled at execution
                "doc_base": g[0]["doc_base"],
                "n_docs": sum(r["n_docs"] for r in g),
                "sum_ttf": sum(r["sum_ttf"] for r in g),
            }
            for g in groups
        ]
    return levels


def merge_tree(manifest: dict, index_dir: str, fan_in: int = 8, target_segments: int = 1) -> dict:
    """Execute the merge tree with Ray Data (one task per merge node).
    Idempotent: completed nodes are skipped via the atomic segment-dir
    check. Returns + commits the merge manifest."""
    import ray.data

    from .checkpoint import commit_merge_manifest, load_merge_manifest

    existing = load_merge_manifest(index_dir)
    if existing is not None and existing.get("fan_in") == fan_in:
        return existing

    rows = [dict(r) for r in manifest["partitions"]]
    level = 0
    while len(rows) > target_segments:
        groups = [rows[i : i + fan_in] for i in range(0, len(rows), fan_in)]
        level += 1
        specs = [
            {
                "out_dir": os.path.join(
                    index_dir, "merged", f"L{level}", f"m{g[0]['doc_base']:012d}"
                ),
                "inputs": json.dumps([r["seg_dir"] for r in g]),
            }
            for g in groups
        ]

        def _run(batch: pa.Table) -> pa.Table:
            out = []
            for spec in batch.to_pylist():
                meta = merge_segments(json.loads(spec["inputs"]), spec["out_dir"])
                out.append(
                    {
                        "seg_dir": spec["out_dir"],
                        "doc_base": meta["doc_base"],
                        "n_docs": meta["n_docs"],
                        "sum_ttf": meta["sum_ttf"],
                        "n_terms": meta["n_terms"],
                        "wall_ms": meta["wall_ms"],
                    }
                )
            return pa.Table.from_pylist(out)

        rows = (
            ray.data.from_items(specs)
            .map_batches(_run, batch_size=1, batch_format="pyarrow")
            .take_all()
        )
        rows = sorted(rows, key=lambda r: r["doc_base"])
    out = {
        "version": 1,
        "kind": "merge-tree",
        "fan_in": fan_in,
        "segments": rows,
        "doc_count": manifest["doc_count"],
        "sum_ttf": manifest["sum_ttf"],
    }
    return commit_merge_manifest(index_dir, out)


# ---------------------------------------------------------------------------
# Path B: salted groupby-term shuffle (north-rule merge)
# ---------------------------------------------------------------------------

_EXPLODE_SCHEMA = pa.schema(
    [
        ("term", pa.string()),
        ("salt", pa.int32()),
        ("doc_base", pa.int64()),
        ("df", pa.int64()),
        ("ttf", pa.int64()),
        ("singleton_doc", pa.int64()),
        ("blob", pa.binary()),
        ("norm_bytes", pa.binary()),  # one uint8 per posting
    ]
)

# stage-2 output: final TERMS_SCHEMA columns + salted-run bookkeeping
_STAGE2_SCHEMA = pa.schema(
    list(TERMS_SCHEMA)
    + [("salt", pa.int32()), ("norm_bytes", pa.binary()), ("is_final", pa.bool_())]
)

_RESULT_SCHEMA = pa.schema(
    [
        ("kind", pa.string()),
        ("path", pa.string()),
        ("term_min", pa.string()),
        ("term_max", pa.string()),
        ("n_terms", pa.int64()),
    ]
)


def compute_heavy_terms(seg_dirs: list[str], salt_threshold: int) -> dict[str, int]:
    """Pre-pass: global df per term via a pruned-column read (only the
    term/df columns leave storage) + groupby-sum — the pre-aggregate
    pattern; returns {term: global_df} above the salting threshold (a
    stop-word-sized set by construction)."""
    import ray.data
    from ray.data.aggregate import Sum

    term_files = [os.path.join(d, "terms.parquet") for d in seg_dirs]
    ds = ray.data.read_parquet(term_files, columns=["term", "df"])
    agg = ds.groupby("term").aggregate(Sum("df", alias_name="df_global"))
    heavy = agg.filter(lambda row: row["df_global"] >= salt_threshold).take_all()
    return {r["term"]: int(r["df_global"]) for r in heavy}


def _make_exploder(heavy_ref, rank_of_base: dict[int, int], n_salts: int):
    """Explode one partition's term table into shuffle rows. Heavy terms
    get salt = contiguous-partition-rank-range id (runs stay doc-ordered);
    light terms always salt 0. The heavy set is broadcast via ray.put and
    fetched from the local object store per task (never reshipped)."""
    import ray

    chunk = max(1, (len(rank_of_base) + n_salts - 1) // n_salts)

    def _explode(batch: pa.Table) -> pa.Table:
        heavy = ray.get(heavy_ref)
        out: list[dict] = []
        for spec in batch.to_pylist():
            seg = Segment(spec["seg_dir"])
            salt_if_heavy = rank_of_base[seg.doc_base] // chunk
            for row in seg.iter_term_rows():
                _docs, _f, norms = _decode_row(seg, row)
                out.append(
                    {
                        "term": row["term"],
                        "salt": salt_if_heavy if row["term"] in heavy else 0,
                        "doc_base": seg.doc_base,
                        "df": row["df"],
                        "ttf": row["ttf"],
                        "singleton_doc": row["singleton_doc"],
                        "blob": row["blob"] or b"",
                        "norm_bytes": norms.tobytes(),
                    }
                )
        return pa.Table.from_pylist(out, schema=_EXPLODE_SCHEMA)

    return _explode


def _concat_group_arrays(rows: list[dict]):
    """Decode + concatenate doc-disjoint shuffle rows of one term/group."""
    from .codec import decode_term_postings

    decoded = []
    for r in rows:
        if r["df"] == 1:
            d = np.array([r["singleton_doc"]], dtype=np.int64)
            f = np.array([r["ttf"]], dtype=np.int64)
        else:
            d, f = decode_term_postings(r["blob"], r["df"])
        decoded.append((d, f, np.frombuffer(r["norm_bytes"] or b"", dtype=np.uint8)))
    return _concat_decoded(decoded)


def merge_by_term(
    manifest: dict,
    index_dir: str,
    salt_threshold: int | None = None,
    n_salts: int = 8,
) -> dict:
    """North-rule merge: groupby-term shuffle with explicit salting.

    explode partitions -> groupby(term, salt).map_groups(merge+encode) ->
    light terms are final after one shuffle; heavy (salted) terms produce
    one encoded run per salt, parked on disk and concatenated by the driver
    (the heavy set is stop-word-sized: dozens of terms x n_salts runs).
    Output: term-range-sharded merged index under <index_dir>/merged/;
    norms are referenced from the partition norm files (no rewrite).
    Salt threshold defaults to 2% of doc_count (stop-word band, SURVEY §4)."""
    import ray
    import ray.data

    from .checkpoint import commit_merge_manifest, load_merge_manifest

    existing = load_merge_manifest(index_dir)
    if existing is not None and existing.get("kind") == "merge-by-term":
        return existing

    t0 = time.perf_counter()
    doc_count = int(manifest["doc_count"])
    if salt_threshold is None:
        salt_threshold = max(1000, doc_count // 50)
    parts = sorted(manifest["partitions"], key=lambda r: r["doc_base"])
    seg_dirs = [r["seg_dir"] for r in parts]
    rank_of_base = {int(r["doc_base"]): i for i, r in enumerate(parts)}

    heavy = compute_heavy_terms(seg_dirs, salt_threshold)
    heavy_ref = ray.put(heavy)  # broadcast once

    exploded = ray.data.from_items([{"seg_dir": d} for d in seg_dirs]).map_batches(
        _make_exploder(heavy_ref, rank_of_base, n_salts),
        batch_size=1,
        batch_format="pyarrow",
    )

    def _merge_group(batch: pa.Table) -> pa.Table:
        rows = batch.to_pylist()
        term = rows[0]["term"]
        docs, freqs, norms = _concat_group_arrays(rows)
        cols: dict[str, list] = {f.name: [] for f in TERMS_SCHEMA}
        _emit_from_arrays(cols, term, docs, freqs, norms)
        is_final = term not in ray.get(heavy_ref)
        cols["salt"] = [rows[0]["salt"]]
        cols["norm_bytes"] = [b"" if is_final else norms.tobytes()]
        cols["is_final"] = [is_final]
        return pa.table(cols, schema=_STAGE2_SCHEMA)

    stage2 = exploded.groupby(["term", "salt"]).map_groups(
        _merge_group, batch_format="pyarrow"
    )

    shard_dir = os.path.join(index_dir, "merged", "terms")
    heavy_dir = os.path.join(index_dir, "merged", "heavy_runs")
    os.makedirs(shard_dir, exist_ok=True)
    os.makedirs(heavy_dir, exist_ok=True)

    def _write_shard(batch: pa.Table) -> pa.Table:
        import uuid as _uuid

        mask = batch.column("is_final").combine_chunks()
        final = batch.filter(mask)
        heavy_part = batch.filter(pa.compute.invert(mask))
        out_rows: list[dict] = []
        if heavy_part.num_rows:
            hpath = os.path.join(heavy_dir, f"run-{_uuid.uuid4().hex[:12]}.parquet")
            pq.write_table(heavy_part, hpath + ".tmp")
            os.replace(hpath + ".tmp", hpath)
            out_rows.append(
                {
                    "kind": "heavy_runs",
                    "path": hpath,
                    "term_min": None,
                    "term_max": None,
                    "n_terms": heavy_part.num_rows,
                }
            )
        if final.num_rows:
            final = final.select([f.name for f in TERMS_SCHEMA])
            idx = pa.compute.sort_indices(final.column("term"))
            final = final.take(idx)
            path = os.path.join(shard_dir, f"shard-{_uuid.uuid4().hex[:12]}.parquet")
            pq.write_table(final, path + ".tmp")
            os.replace(path + ".tmp", path)
            out_rows.append(
                {
                    "kind": "shard",
                    "path": path,
                    "term_min": final.column("term")[0].as_py(),
                    "term_max": final.column("term")[-1].as_py(),
                    "n_terms": final.num_rows,
                }
            )
        return pa.Table.from_pylist(out_rows, schema=_RESULT_SCHEMA)

    results = stage2.map_batches(
        _write_shard, batch_size=8192, batch_format="pyarrow"
    ).take_all()

    shards = [
        {k: r[k] for k in ("path", "term_min", "term_max", "n_terms")}
        for r in results
        if r.get("kind") == "shard"
    ]
    heavy_run_files = [r["path"] for r in results if r.get("kind") == "heavy_runs"]

    if heavy_run_files:
        # final pass over the salted runs only: a second (tiny) groupby —
        # n_heavy_terms x n_salts rows — concatenates each heavy term's
        # doc-ordered runs in parallel and writes heavy shards
        runs = ray.data.read_parquet(heavy_run_files)

        def _final_heavy(batch: pa.Table) -> pa.Table:
            rows = batch.to_pylist()
            docs, freqs, norms = _concat_group_arrays(rows)
            cols: dict[str, list] = {f.name: [] for f in TERMS_SCHEMA}
            _emit_from_arrays(cols, rows[0]["term"], docs, freqs, norms)
            return pa.table(cols, schema=TERMS_SCHEMA)

        def _write_heavy_shard(batch: pa.Table) -> pa.Table:
            import uuid as _uuid

            idx = pa.compute.sort_indices(batch.column("term"))
            batch = batch.take(idx)
            path = os.path.join(shard_dir, f"shard-heavy-{_uuid.uuid4().hex[:12]}.parquet")
            pq.write_table(batch, path + ".tmp")
            os.replace(path + ".tmp", path)
            return pa.Table.from_pylist(
                [
                    {
                        "kind": "shard",
                        "path": path,
                        "term_min": batch.column("term")[0].as_py(),
                        "term_max": batch.column("term")[-1].as_py(),
                        "n_terms": batch.num_rows,
                    }
                ],
                schema=_RESULT_SCHEMA,
            )

        heavy_shards = (
            runs.groupby("term")
            .map_groups(_final_heavy, batch_format="pyarrow")
            .map_batches(_write_heavy_shard, batch_size=4096, batch_format="pyarrow")
            .take_all()
        )
        shards.extend(
            {k: r[k] for k in ("path", "term_min", "term_max", "n_terms")}
            for r in heavy_shards
        )

    out = {
        "version": 1,
        "kind": "merge-by-term",
        "salt_threshold": salt_threshold,
        "n_salts": n_salts,
        "n_heavy_terms": len(heavy),
        "heavy_terms": sorted(heavy),
        "shards": sorted(shards, key=lambda s: s["term_min"]),
        "norm_files": [os.path.join(d, "norms.parquet") for d in seg_dirs],
        "doc_count": manifest["doc_count"],
        "sum_ttf": manifest["sum_ttf"],
        "wall_ms": round((time.perf_counter() - t0) * 1000, 3),
    }
    return commit_merge_manifest(index_dir, out)


class MergedIndex:
    """Segment-compatible reader over a merge-by-term output: term-range
    shards + partition norm files = one logical segment spanning all docs."""

    def __init__(self, index_dir: str | None, manifest: dict | None = None):
        from .checkpoint import load_merge_manifest

        m = manifest or load_merge_manifest(index_dir)
        if m is None or m.get("kind") != "merge-by-term":
            raise FileNotFoundError(f"no merge-by-term manifest under {index_dir}")
        self.manifest = m
        self.dir = os.path.join(index_dir, "merged") if index_dir else "<merged>"
        self._shards = [pq.read_table(s["path"]) for s in m["shards"]]
        self._shard_terms = [sh.column("term").to_pylist() for sh in self._shards]
        norm_tbl = pa.concat_tables(pq.read_table(p) for p in m["norm_files"])
        doc_ids = norm_tbl.column("doc_id").to_numpy()
        self.doc_base = int(doc_ids.min()) if len(doc_ids) else 0
        self.max_doc = int(doc_ids.max()) + 1 if len(doc_ids) else 0
        self._norms = np.zeros(self.max_doc - self.doc_base, dtype=np.uint8)
        self._norms[doc_ids - self.doc_base] = norm_tbl.column("norm").to_numpy()
        self.n_docs = int(m["doc_count"])

    @property
    def sum_ttf(self) -> int:
        return int(self.manifest["sum_ttf"])

    def norm_of(self, doc_ids: np.ndarray) -> np.ndarray:
        return self._norms[np.asarray(doc_ids, dtype=np.int64) - self.doc_base]

    def _find(self, term: str):
        from bisect import bisect_left

        for si, terms in enumerate(self._shard_terms):
            if not terms or term < terms[0] or term > terms[-1]:
                continue
            i = bisect_left(terms, term)
            if i < len(terms) and terms[i] == term:
                return si, i
        return -1, -1

    def term_stats(self, term: str):
        si, i = self._find(term)
        if si < 0:
            return 0, 0
        sh = self._shards[si]
        return int(sh.column("df")[i].as_py()), int(sh.column("ttf")[i].as_py())

    def term_info(self, term: str):
        from .segment import TermInfo

        si, i = self._find(term)
        if si < 0:
            return None
        row = self._shards[si].slice(i, 1).to_pylist()[0]
        return TermInfo(
            term=row["term"],
            df=row["df"],
            ttf=row["ttf"],
            singleton_doc=row["singleton_doc"],
            blob=row["blob"] or b"",
            last_docs=np.array(row["last_docs"], dtype=np.int64),
            offsets=np.array(row["offsets"], dtype=np.int64),
            imp_freq=np.array(row["imp_freq"], dtype=np.int64),
            imp_norm=np.array(row["imp_norm"], dtype=np.int64),
            imp_start=np.array(row["imp_start"], dtype=np.int64),
        )

    def postings(self, term: str):
        from .codec import decode_term_postings

        ti = self.term_info(term)
        if ti is None:
            return np.empty(0, dtype=np.int64), np.empty(0, dtype=np.int64)
        if ti.df == 1:
            return (
                np.array([ti.singleton_doc], dtype=np.int64),
                np.array([ti.ttf], dtype=np.int64),
            )
        return decode_term_postings(ti.blob, ti.df)

    def iter_term_rows(self):
        order = sorted(
            range(len(self._shards)),
            key=lambda si: self._shard_terms[si][0] if self._shard_terms[si] else "",
        )
        for si in order:
            yield from self._shards[si].to_pylist()
