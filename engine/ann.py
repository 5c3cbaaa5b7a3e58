"""Similarity search over embedding columns.

- ``brute_force_topk_ds``: exact cosine top-k — the query matrix is
  broadcast once with ray.put, each map_batches task does one numpy matmul
  per batch against it (vectorized, zero-copy from the Arrow list column),
  emits per-batch partial top-k rows, and a tiny groupby(query) reduce
  keeps the global top-k (the partial-topk-then-merge pattern: only
  k rows per (query, batch) ever shuffle).
- ``ivf_topk_ds``: the scale path — k-means-lite coarse quantizer built on
  a sample (driver-side, deterministic), vectors bucketed by nearest
  centroid via map_batches, queries probe the ``n_probe`` nearest buckets
  only. Exactness is traded for touching ~n_probe/n_clusters of the data.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from .rayenv import remote_args as _rargs


def _batch_matrix(batch: pa.Table, col: str = "embedding") -> np.ndarray:
    arr = batch.column(col)
    if isinstance(arr, pa.ChunkedArray):
        arr = arr.combine_chunks()
    flat = arr.flatten().to_numpy(zero_copy_only=False).astype(np.float64)
    n = len(arr)
    return flat.reshape(n, -1)


def _normalize(m: np.ndarray) -> np.ndarray:
    norms = np.linalg.norm(m, axis=1, keepdims=True)
    norms[norms == 0] = 1.0
    return m / norms


def brute_force_topk_ds(ds, queries: np.ndarray, query_ids: np.ndarray, k: int = 10):
    """Dataset (vec_id, embedding) × query matrix → (query_id, rank,
    neighbor_id, cosine) exact top-k by cosine, ties broken on vec_id asc."""
    import pandas as pd
    import ray

    qn = _normalize(np.asarray(queries, dtype=np.float64))
    q_ref = ray.put(qn)
    qid_list = [int(q) for q in query_ids]

    def partial(batch: pa.Table) -> pa.Table:
        q = ray.get(q_ref)
        m = _normalize(_batch_matrix(batch))
        ids = batch.column("vec_id").to_numpy()
        sims = q @ m.T  # (n_queries, n_batch)
        kk = min(k, sims.shape[1])
        rows = {"query_id": [], "neighbor_id": [], "cosine": []}
        for qi in range(sims.shape[0]):
            s = sims[qi]
            top = np.lexsort((ids, -s))[:kk]
            rows["query_id"].extend([qid_list[qi]] * kk)
            rows["neighbor_id"].extend(ids[top].tolist())
            rows["cosine"].extend(s[top].tolist())
        return pa.table(
            {
                "query_id": pa.array(rows["query_id"], type=pa.int64()),
                "neighbor_id": pa.array(rows["neighbor_id"], type=pa.int64()),
                "cosine": pa.array(rows["cosine"], type=pa.float64()),
            }
        )

    def reduce_topk(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["cosine", "neighbor_id"], ascending=[False, True]).head(k)
        g = g.reset_index(drop=True)
        g["rank"] = np.arange(len(g), dtype=np.int64)
        return g[["query_id", "rank", "neighbor_id", "cosine"]]

    return (
        ds.map_batches(partial, batch_format="pyarrow", **_rargs())
        .groupby("query_id")
        .map_groups(reduce_topk, batch_format="pandas", **_rargs())
    )


def kmeans_lite(sample: np.ndarray, n_clusters: int, iters: int = 8, seed: int = 13) -> np.ndarray:
    """Deterministic small k-means on normalized vectors (cosine ≈ dot)."""
    rng = np.random.default_rng(seed)
    s = _normalize(np.asarray(sample, dtype=np.float64))
    cent = s[rng.choice(len(s), size=min(n_clusters, len(s)), replace=False)]
    for _ in range(iters):
        assign = np.argmax(s @ cent.T, axis=1)
        for c in range(len(cent)):
            members = s[assign == c]
            if len(members):
                cent[c] = members.mean(axis=0)
        cent = _normalize(cent)
    return cent


def _sample_vectors(ds, sample_limit: int, seed: int = 13) -> np.ndarray:
    """Seeded RANDOM sample for centroid training (a first-N limit() is
    biased when the table is ordered/clustered). Only ~sample_limit rows
    ever reach the driver."""
    n = ds.count()
    frac = min(1.0, (sample_limit * 1.25) / max(1, n))
    tbl = ds.random_sample(frac, seed=seed).limit(sample_limit).to_pandas()
    if len(tbl) == 0:  # tiny dataset: fall back to everything
        tbl = ds.to_pandas()
    return np.stack(tbl["embedding"].to_numpy())


def build_ivf_index(
    ds,
    out_dir: str,
    n_clusters: int = 16,
    sample_limit: int = 2048,
) -> dict:
    """Persist an IVF index artifact (the vector-segment analogue of the
    text index): <out_dir>/centroids.npy + <out_dir>/buckets/bucket=N/
    parquet shards, written by Ray tasks partitioned by coarse centroid.
    Queries then touch only their probed buckets' files; rebuilds are a
    no-op when the artifact exists (manifest check)."""
    import json
    import os

    import ray

    man_path = os.path.join(out_dir, "ivf_manifest.json")
    if os.path.exists(man_path):
        with open(man_path) as f:
            return json.load(f)
    os.makedirs(out_dir, exist_ok=True)
    cent = kmeans_lite(_sample_vectors(ds, sample_limit), n_clusters)
    np.save(os.path.join(out_dir, "centroids.npy"), cent)
    cent_ref = ray.put(cent)
    bucket_root = os.path.join(out_dir, "buckets")

    def bucketize(batch: pa.Table) -> pa.Table:
        c = ray.get(cent_ref)
        m = _normalize(_batch_matrix(batch))
        assign = np.argmax(m @ c.T, axis=1).astype(np.int32)
        return batch.append_column("bucket", pa.array(assign))

    os.makedirs(bucket_root, exist_ok=True)

    def write_bucket(g) -> pa.Table:
        import uuid

        import pyarrow.parquet as pq

        b = int(g.column("bucket")[0].as_py())
        path = os.path.join(bucket_root, f"b{b:05d}-{uuid.uuid4().hex[:8]}.parquet")
        pq.write_table(g, path + ".tmp")
        os.replace(path + ".tmp", path)
        return pa.table(
            {
                "bucket": pa.array([b], type=pa.int32()),
                "path": pa.array([path], type=pa.string()),
                "n": pa.array([g.num_rows], type=pa.int64()),
            }
        )

    rows = (
        ds.map_batches(bucketize, batch_format="pyarrow", **_rargs())
        .groupby("bucket")
        .map_groups(write_bucket, batch_format="pyarrow", **_rargs())
        .take_all()
    )  # metadata only: one row per bucket file
    manifest = {
        "kind": "ivf",
        "n_clusters": int(len(cent)),
        "dim": int(cent.shape[1]),
        "centroids": os.path.join(out_dir, "centroids.npy"),
        "bucket_root": bucket_root,
        "bucket_files": {str(r["bucket"]): r["path"] for r in rows},
    }
    from .checkpoint import atomic_write_json

    atomic_write_json(man_path, manifest)
    return manifest


def ivf_topk_from_index(
    ivf_manifest: dict,
    queries: np.ndarray,
    query_ids: np.ndarray,
    k: int = 10,
    n_probe: int = 4,
):
    """ANN over the PERSISTED IVF artifact: load the (tiny) centroids,
    pick each query's n_probe buckets, and scan ONLY those buckets'
    parquet partitions with Ray tasks. Returns (query_id, rank,
    neighbor_id, cosine) ties on neighbor_id asc."""
    import pandas as pd
    import ray
    import ray.data

    cent = np.load(ivf_manifest["centroids"])
    qn = _normalize(np.asarray(queries, dtype=np.float64))
    probes = np.argsort(-(qn @ cent.T), axis=1)[:, :n_probe]
    needed = sorted({int(b) for row in probes for b in row})
    probe_of_query = {int(q): set(map(int, probes[i])) for i, q in enumerate(query_ids)}
    q_ref = ray.put((qn, [int(q) for q in query_ids], probe_of_query))

    def scan(batch: pa.Table) -> pa.Table:
        qn_, qids_, probe_of = ray.get(q_ref)
        # each parquet file is one bucket partition; the partition value
        # rides along as the 'bucket' column
        bucket = int(batch.column("bucket")[0].as_py())
        m = _normalize(_batch_matrix(batch))
        ids = batch.column("vec_id").to_numpy()
        sims = qn_ @ m.T
        kk = min(k, sims.shape[1])
        rows = {"query_id": [], "neighbor_id": [], "cosine": []}
        for qi, qid in enumerate(qids_):
            if bucket not in probe_of[qid]:
                continue
            s = sims[qi]
            top = np.lexsort((ids, -s))[:kk]
            rows["query_id"].extend([qid] * kk)
            rows["neighbor_id"].extend(ids[top].tolist())
            rows["cosine"].extend(s[top].tolist())
        return pa.table(
            {
                "query_id": pa.array(rows["query_id"], type=pa.int64()),
                "neighbor_id": pa.array(rows["neighbor_id"], type=pa.int64()),
                "cosine": pa.array(rows["cosine"], type=pa.float64()),
            }
        )

    def reduce_topk(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["cosine", "neighbor_id"], ascending=[False, True]).head(k)
        g = g.reset_index(drop=True)
        g["rank"] = np.arange(len(g), dtype=np.int64)
        return g[["query_id", "rank", "neighbor_id", "cosine"]]

    # only the probed buckets' files are read (the manifest routes them)
    files = [
        ivf_manifest["bucket_files"][str(b)]
        for b in needed
        if str(b) in ivf_manifest["bucket_files"]
    ]
    return (
        ray.data.read_parquet(files)
        .map_batches(scan, batch_format="pyarrow", **_rargs())
        .groupby("query_id")
        .map_groups(reduce_topk, batch_format="pandas", **_rargs())
    )


def ivf_topk_ds(
    ds,
    queries: np.ndarray,
    query_ids: np.ndarray,
    k: int = 10,
    n_clusters: int = 16,
    n_probe: int = 4,
    sample_limit: int = 2048,
):
    """IVF-style ANN: coarse centroids from a seeded random sample, vectors
    bucketed by nearest centroid, queries scan only n_probe buckets."""
    import pandas as pd
    import ray

    cent = kmeans_lite(_sample_vectors(ds, sample_limit), n_clusters)
    cent_ref = ray.put(cent)
    qn = _normalize(np.asarray(queries, dtype=np.float64))
    probes = np.argsort(-(qn @ cent.T), axis=1)[:, :n_probe]  # (nq, n_probe)
    probe_of_query = {int(q): set(map(int, probes[i])) for i, q in enumerate(query_ids)}
    q_ref = ray.put((qn, [int(q) for q in query_ids], probe_of_query))

    def bucketize(batch: pa.Table) -> pa.Table:
        c = ray.get(cent_ref)
        m = _normalize(_batch_matrix(batch))
        assign = np.argmax(m @ c.T, axis=1).astype(np.int32)
        return batch.append_column("bucket", pa.array(assign))

    bucketed = ds.map_batches(bucketize, batch_format="pyarrow", **_rargs())

    def scan_bucket(g: pd.DataFrame) -> pd.DataFrame:
        qn_, qids_, probe_of = ray.get(q_ref)
        bucket = int(g["bucket"].iloc[0])
        m = _normalize(np.stack(g["embedding"].to_numpy()))
        ids = g["vec_id"].to_numpy()
        out = {"query_id": [], "neighbor_id": [], "cosine": []}
        for qi, qid in enumerate(qids_):
            if bucket not in probe_of[qid]:
                continue
            s = m @ qn_[qi]
            kk = min(k, len(s))
            top = np.lexsort((ids, -s))[:kk]
            out["query_id"].extend([qid] * kk)
            out["neighbor_id"].extend(ids[top].tolist())
            out["cosine"].extend(s[top].tolist())
        return pd.DataFrame(out)

    def reduce_topk(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["cosine", "neighbor_id"], ascending=[False, True]).head(k)
        g = g.reset_index(drop=True)
        g["rank"] = np.arange(len(g), dtype=np.int64)
        return g[["query_id", "rank", "neighbor_id", "cosine"]]

    return (
        bucketed.groupby("bucket")
        .map_groups(scan_bucket, batch_format="pandas", **_rargs())
        .groupby("query_id")
        .map_groups(reduce_topk, batch_format="pandas", **_rargs())
    )


def kmeans_clusters(
    ds,
    k: int = 8,
    iters: int = 2,
    passthrough: tuple = (),
    centroids_sink: list | None = None,
):
    """Deterministic Lloyd's k-means over the embedding column (the Solr
    clustering-contrib document-clustering role, beyond-reference for the
    training-data pipeline: topic bucketing / diversity sampling), with
    every float op pinned so the WHOLE algorithm replays bit-for-bit in
    SQL:

    - init: centroids = embeddings of the k smallest vec_ids (f32→f64
      casts are exact);
    - distance: LEFT-ASSOC fold over dims of (x_d - c_d)^2 — vectorized
      across rows, sequential across dims, matching SQL's left-assoc `+`
      chain;
    - assignment: argmin with ties → lowest cluster id (np.argmin
      first-min == ROW_NUMBER() ORDER BY dist, cid);
    - update: per-cluster per-dim sum via np.cumsum over vec_id-ordered
      rows — numpy ACCUMULATE is a genuine sequential left fold (unlike
      reduce/reduceat, which associate pairwise; CLAUDE.md lore) ==
      DuckDB list_reduce(list_prepend(0.0, list(e_d ORDER BY vec_id)),
      +), then an exact f64 division by the count. Empty clusters keep
      their previous centroid.

    Distributed shape: assignment is stateless map_batches with the
    centroid matrix in the task closure (k×dims — stop-word-sized);
    the update is one groupby(cluster).map_groups whose per-group work
    is a cumsum. The oracle-exact fold REQUIRES a vec_id-ordered
    sequential sum, so the update shuffles by cluster; at web scale
    you'd run per-batch f64 partial sums (tree association) instead and
    accept rows-only verification — the documented exactness/scale
    trade, same as graph.py's PageRank folds. Returns the final
    assignment (vec_id, cluster) after ``iters`` update rounds.

    The source materializes ONCE up front: the iterative loop would
    otherwise re-execute the lazy read per init + iteration + final
    assignment (the CLAUDE.md iterative-lineage lore)."""
    ds = ds.materialize()

    def _init_centroids() -> np.ndarray:
        def part_min(batch: pa.Table) -> pa.Table:
            ids = batch.column("vec_id").to_numpy()
            if not len(ids):
                return batch
            sel = np.argsort(ids, kind="stable")[:k]
            return batch.take(pa.array(sel))

        cands = ds.map_batches(
            part_min, batch_format="pyarrow", **_rargs()
        ).take_all()  # <= k rows per input block: bounded
        rows = sorted(cands, key=lambda r: r["vec_id"])[:k]
        return np.array([r["embedding"] for r in rows], dtype=np.float64)

    def _assign(cents: np.ndarray, carry: tuple = ("embedding",)):
        def assign(batch: pa.Table) -> pa.Table:
            m = _batch_matrix(batch)  # f32 -> f64 exact
            n = m.shape[0]
            dists = np.empty((n, len(cents)), dtype=np.float64)
            for ci, c in enumerate(cents):
                acc = np.zeros(n, dtype=np.float64)
                for d in range(m.shape[1]):  # left-assoc over dims
                    diff = m[:, d] - c[d]
                    acc += diff * diff
                dists[:, ci] = acc
            cid = np.argmin(dists, axis=1)  # first min == lowest cid
            cols = {"vec_id": batch.column("vec_id")}
            for name in carry:
                cols[name] = batch.column(name)
            cols["cluster"] = pa.array(cid.astype(np.int64), type=pa.int64())
            return pa.table(cols)

        return ds.map_batches(assign, batch_format="pyarrow", **_rargs())

    def _update_fold(g: pa.Table) -> pa.Table:
        order = np.argsort(g.column("vec_id").to_numpy(), kind="stable")
        m = _batch_matrix(g.take(pa.array(order)))
        # cumsum = sequential left fold per dim; exact vs the SQL fold
        sums = np.cumsum(m, axis=0)[-1]
        return pa.table(
            {
                "cluster": pa.array(
                    [int(g.column("cluster")[0].as_py())], type=pa.int64()
                ),
                "centroid": pa.array(
                    [(sums / np.float64(m.shape[0])).tolist()],
                    type=pa.list_(pa.float64()),
                ),
            }
        )

    cents = _init_centroids()
    for _ in range(iters):
        upd = (
            _assign(cents)
            .groupby("cluster")
            .map_groups(_update_fold, batch_format="pyarrow", **_rargs())
            .take_all()
        )  # k rows
        nxt = cents.copy()  # empty clusters keep their previous centroid
        for r in upd:
            nxt[int(r["cluster"])] = np.asarray(r["centroid"], dtype=np.float64)
        cents = nxt
    if centroids_sink is not None:
        # hand the final k x dims codebook to callers that need it
        # (PQ ADC distance tables) without changing the return type
        centroids_sink.append(cents.copy())
    # final assignment carries requested source columns (e.g. label)
    return _assign(cents, carry=tuple(passthrough))


def cluster_balanced_sample(ds, k: int = 8, iters: int = 2, per_cluster: int = 16):
    """Cluster-balanced diversity sampling (beyond-reference: the
    topic-balanced subset selection a training-data pipeline runs after
    clustering — equal-sized draws per k-means cluster instead of a
    corpus-frequency-weighted draw). Deterministic: within each cluster
    keep the ``per_cluster`` smallest vec_ids. Composes kmeans_clusters
    (exact) with a per-group selection, so the whole pipeline replays in
    SQL. The selection is a groupby(cluster) over (vec_id, cluster) int
    pairs only — the embedding column never re-shuffles."""
    import pandas as pd

    assigned = kmeans_clusters(ds, k=k, iters=iters)

    def head(g: pd.DataFrame) -> pd.DataFrame:
        return g.nsmallest(per_cluster, "vec_id")

    return assigned.groupby("cluster").map_groups(
        head, batch_format="pandas", **_rargs()
    )


def cluster_purity(ds, k: int = 8, iters: int = 2, label_col: str = "label"):
    """Clustering evaluation (the purity metric): per k-means cluster,
    its size and dominant ground-truth label (ties → smallest label).
    Composes the exact kmeans assignment (label passed through the final
    assignment, no join) with ONE groupby((cluster, label)).count() —
    the shuffle moves k×|labels| count rows, not vectors — and a tiny
    per-cluster selection. All-integer output, exact in SQL."""
    import pandas as pd

    assigned = kmeans_clusters(ds, k=k, iters=iters, passthrough=(label_col,))
    counts = assigned.groupby(["cluster", label_col]).count()

    def top(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["count()", label_col], ascending=[False, True])
        return pd.DataFrame(
            {
                "cluster": [int(g["cluster"].iloc[0])],
                "size": [int(g["count()"].sum())],
                "top_label": [int(g[label_col].iloc[0])],
                "top_count": [int(g["count()"].iloc[0])],
            }
        )

    return counts.groupby("cluster").map_groups(
        top, batch_format="pandas", **_rargs()
    )


def semdedup(ds, k: int = 8, iters: int = 2, tau: float = 0.95):
    """SemDeDup (Abbas et al. 2023, arXiv:2303.09540): semantic
    deduplication WITHIN k-means clusters — a vector is dropped iff some
    lower-vec_id vector in its cluster has cosine similarity >= tau.
    The cluster pass bounds the candidate set (all-pairs only within a
    cluster, never corpus-wide), which is the paper's scalability
    argument verbatim.

    Exact-replayable float chain (same discipline as kmeans_clusters):
    f32->f64 casts, dots and squared norms as LEFT-ASSOC folds over dims
    (vectorized across pairs, sequential across dims == SQL's + chain),
    sqrt correctly rounded in both engines, one division and one >=
    per pair. Keep rule is non-recursive (any earlier near-dup drops
    you, kept or not), so the oracle is a NOT EXISTS self-join within
    cluster. Returns the KEPT (vec_id, cluster) rows."""
    import pandas as pd

    assigned = kmeans_clusters(ds, k=k, iters=iters, passthrough=("embedding",))

    def dedup_cluster(g: pa.Table) -> pa.Table:
        order = np.argsort(g.column("vec_id").to_numpy(), kind="stable")
        g = g.take(pa.array(order))
        ids = g.column("vec_id").to_numpy()
        m = _batch_matrix(g)  # f32 -> f64 exact, vec_id-ascending
        n = m.shape[0]
        # left-assoc folds: squared norms per vector, dots per (i, j) pair
        sq = np.zeros(n, dtype=np.float64)
        for d in range(m.shape[1]):
            sq += m[:, d] * m[:, d]
        rt = np.sqrt(sq)  # correctly rounded, matches SQL sqrt
        iu, ju = np.triu_indices(n, k=1)  # i < j
        dots = np.zeros(len(iu), dtype=np.float64)
        for d in range(m.shape[1]):
            dots += m[iu, d] * m[ju, d]
        cos = dots / (rt[iu] * rt[ju])
        dropped = np.zeros(n, dtype=bool)
        hit = cos >= np.float64(tau)
        dropped[np.unique(ju[hit])] = True
        keep = ~dropped
        return pa.table(
            {
                "vec_id": pa.array(ids[keep], type=pa.int64()),
                "cluster": pa.array(
                    np.full(int(keep.sum()), int(g.column("cluster")[0].as_py())),
                    type=pa.int64(),
                ),
            }
        )

    return assigned.groupby("cluster").map_groups(
        dedup_cluster, batch_format="pyarrow", **_rargs()
    )


def embedding_near_dups(
    ds,
    threshold: float = 0.95,
    n_clusters: int = 16,
    sample_limit: int = 2048,
    max_bucket: int = 4096,
):
    """Embedding-cosine near-duplicate pairs (doc_a < doc_b, cosine >=
    threshold) through IVF buckets — never materializes the embedding
    matrix on the driver and never does all-pairs over the corpus:

    1. coarse centroids from a seeded random sample;
    2. every vector is assigned to its TOP-2 nearest centroids (multi-probe
       indexing), so a near-dup pair split across a centroid boundary
       still shares a bucket with high probability;
    3. per bucket, one vectorized gram matrix (capped at max_bucket rows —
       a hot bucket beyond the cap compares members to the cap set only);
    4. pair dedupe by (doc_a, doc_b).

    Approximate by construction (like every LSH/IVF near-dup pass): a pair
    whose two vectors share no top-2 bucket is missed; n_clusters scales
    ~sqrt(N) to keep buckets bounded."""
    import pandas as pd
    import ray

    cent = kmeans_lite(_sample_vectors(ds, sample_limit), n_clusters)
    cent_ref = ray.put(cent)

    def bucketize2(batch: pa.Table) -> pa.Table:
        c = ray.get(cent_ref)
        m = _normalize(_batch_matrix(batch))
        top2 = np.argsort(-(m @ c.T), axis=1)[:, :2].astype(np.int32)
        n = batch.num_rows
        out = pa.table(
            {
                "vec_id": pa.concat_arrays(
                    [batch.column("vec_id").combine_chunks()] * 2
                ),
                "embedding": pa.concat_arrays(
                    [batch.column("embedding").combine_chunks()] * 2
                ),
                "bucket": pa.array(
                    np.concatenate([top2[:, 0], top2[:, 1]]), type=pa.int32()
                ),
            }
        )
        return out

    bucketed = ds.map_batches(bucketize2, batch_format="pyarrow", **_rargs())

    def _empty_pairs() -> pd.DataFrame:
        return pd.DataFrame(
            {
                "doc_a": pd.Series([], dtype="int64"),
                "doc_b": pd.Series([], dtype="int64"),
                "cosine": pd.Series([], dtype="float64"),
            }
        )

    def bucket_pairs(g: pd.DataFrame) -> pd.DataFrame:
        g = g.drop_duplicates("vec_id").sort_values("vec_id")
        if len(g) < 2:
            return _empty_pairs()
        if len(g) > max_bucket:
            # no-silent-caps: a truncated bucket means beyond-cap members
            # only compare against the cap set — say so in the worker log
            import logging

            logging.getLogger(__name__).warning(
                "embedding_near_dups: bucket %s holds %d members, capping "
                "gram matrix at %d (%d members compare to the cap set only)",
                int(g["bucket"].iloc[0]) if "bucket" in g else -1,
                len(g),
                max_bucket,
                len(g) - max_bucket,
            )
            g = g.head(max_bucket)
        ids = g["vec_id"].to_numpy()
        m = _normalize(np.stack(g["embedding"].to_numpy()))
        sims = m @ m.T
        ai, bi = np.triu_indices(len(ids), k=1)
        keep = sims[ai, bi] >= threshold
        return pd.DataFrame(
            {
                "doc_a": ids[ai[keep]],
                "doc_b": ids[bi[keep]],
                "cosine": sims[ai[keep], bi[keep]],
            }
        )

    pairs = bucketed.groupby("bucket").map_groups(
        bucket_pairs, batch_format="pandas", **_rargs()
    )

    def dedupe(g: pd.DataFrame) -> pd.DataFrame:
        return g.head(1)

    return pairs.groupby(["doc_a", "doc_b"]).map_groups(dedupe, batch_format="pandas", **_rargs())


def mmr_rerank(
    ds,
    query: np.ndarray,
    n_candidates: int = 25,
    k: int = 10,
    lam: float = 0.75,
):
    """Maximal Marginal Relevance re-ranking (Carbonell & Goldstein,
    SIGIR'98) over the embedding Dataset — the diversity-aware retrieval
    pass modern stacks bolt onto dense top-k (beyond-reference; the role
    slots beside QueryRescorer and the diversified-grouping collector,
    lucene/grouping DistinctValuesCollector kinship).

    Two phases:
    1. candidates = distributed cosine top-``n_candidates`` (the proven
       ``brute_force_topk_ds`` partial-top-k rank chain);
    2. greedy selection of ``k``: next = argmax over remaining of
       lam*rel(d) - (1-lam)*max_{s in SELECTED} sim(d, s), score ties ->
       smallest vec_id.

    Exactness discipline (kmeans/semdedup): rel and pair sims are
    recomputed from the f32 embeddings with LEFT-ASSOC f64 dim folds
    (vectorized across pairs via per-dim outer-product accumulation,
    sequential across dims == SQL's `+` chain), sqrt correctly rounded,
    one division per cosine; the MMR objective is two single f64
    multiplies and one subtract, and max over the selected set is an
    order-free selection — so every emitted score replays bit-for-bit
    in DuckDB. ``lam`` should be exactly representable (0.75 -> 1-lam
    = 0.25 exact) to keep the two engines' coefficients identical.

    Scale posture: phase 1 is the distributed partial top-k (k rows per
    batch shuffle); phase 2 touches only the n_candidates survivors —
    bounded by parameters, never corpus size."""
    import pyarrow.compute as pc

    q = np.asarray(query, dtype=np.float64)
    cand = brute_force_topk_ds(
        ds, q[None, :], np.asarray([0]), k=n_candidates
    ).to_pandas()  # bounded: exactly n_candidates rows
    ids_sorted = sorted(int(i) for i in cand["neighbor_id"])
    idset = pa.array(ids_sorted, type=pa.int64())

    def filt(batch: pa.Table) -> pa.Table:
        return batch.filter(pc.is_in(batch.column("vec_id"), value_set=idset))

    sub = (
        ds.map_batches(filt, batch_format="pyarrow", **_rargs())
        .to_pandas()
        .sort_values("vec_id")
        .reset_index(drop=True)
    )  # bounded: n_candidates rows
    ids = sub["vec_id"].to_numpy()
    m = np.stack([np.asarray(e, dtype=np.float64) for e in sub["embedding"]])
    n, dims = m.shape

    # left-assoc dim folds (pinned, replayable)
    sq = np.zeros(n, dtype=np.float64)
    rd = np.zeros(n, dtype=np.float64)
    dots = np.zeros((n, n), dtype=np.float64)
    sqq = np.float64(0.0)
    for d in range(dims):
        col = m[:, d]
        sq += col * col
        rd += q[d] * col
        dots += np.outer(col, col)
        sqq = sqq + q[d] * q[d]
    rt = np.sqrt(sq)
    rtq = np.sqrt(sqq)
    rel = rd / (rtq * rt)
    sims = dots / np.outer(rt, rt)

    om = 1.0 - lam  # exact for representable lam (0.75 -> 0.25)
    selected: list[int] = []
    ranks: list[int] = []
    out_ids: list[int] = []
    out_mmr: list[float] = []
    remaining = list(range(n))  # vec_id-ascending (sub is sorted)
    for step in range(min(k, n)):
        best_i = -1
        best_s = None
        for i in remaining:
            maxsim = max((sims[i, j] for j in selected), default=0.0)
            score = lam * rel[i] - om * maxsim
            if best_s is None or score > best_s:  # strict: ties keep lowest id
                best_s = score
                best_i = i
        selected.append(best_i)
        remaining.remove(best_i)
        ranks.append(step)
        out_ids.append(int(ids[best_i]))
        out_mmr.append(float(best_s))
    return pa.table(
        {
            "rank": pa.array(ranks, type=pa.int64()),
            "vec_id": pa.array(out_ids, type=pa.int64()),
            "mmr": pa.array(out_mmr, type=pa.float64()),
        }
    )


def sq8_quantize_stats(ds, levels: int = 255):
    """Scalar 8-bit embedding quantization (the SQ8 codec of
    faiss/Lucene-HNSW-style vector stores: per-DIMENSION min/max over
    the corpus, code = floor((x - mn) * levels / (mx - mn)) clamped to
    [0, levels]) — the storage-compression pass a 100-TB embedding
    pipeline runs before ANN serving. Returns per-vector code stats
    (vec_id, code_sum, code_min, code_max) — all integers.

    Exactness: every float op is a SINGLE f64 op on exactly-widened f32
    operands ((x - mn), (* levels), (/ range), floor — numpy elementwise
    +,-,*,/ are IEEE-correctly-rounded, floor exact), and the clamp is a
    selection, so DuckDB replays the chain bit-for-bit; constant
    dimensions (mx == mn) code to 0.

    Shape: pass 1 = per-block vectorized per-dim min/max partials, one
    groupby(dim)-free bounded reduce (2 x n_dims doubles per block —
    the driver fold is dimension-bounded, never corpus-bounded); pass 2
    streams codes + per-vector stats in one map_batches with the
    (mn, mx) table in the task closure."""

    def _mm_partial(batch: pa.Table) -> pa.Table:
        m = _batch_matrix(batch).astype(np.float64)
        return pa.table(
            {
                "dim": pa.array(np.arange(m.shape[1], dtype=np.int64)),
                "mn": pa.array(m.min(axis=0), type=pa.float64()),
                "mx": pa.array(m.max(axis=0), type=pa.float64()),
            }
        )

    from ray.data.aggregate import Max, Min

    mm = (
        ds.map_batches(_mm_partial, batch_format="pyarrow", **_rargs())
        .groupby("dim")
        .aggregate(Min("mn", alias_name="mn"), Max("mx", alias_name="mx"))
        .to_pandas()
        .sort_values("dim")
    )
    mn = mm["mn"].to_numpy()
    mx = mm["mx"].to_numpy()
    lv = float(levels)

    def _codes(batch: pa.Table) -> pa.Table:
        m = _batch_matrix(batch).astype(np.float64)
        rng = mx - mn  # one op per dim, same both passes
        with np.errstate(divide="ignore", invalid="ignore"):
            c = np.floor(((m - mn) * lv) / rng)
        c = np.where(rng == 0.0, 0.0, c)
        c = np.minimum(np.maximum(c, 0.0), lv).astype(np.int64)
        return pa.table(
            {
                "vec_id": batch.column("vec_id").cast(pa.int64()),
                "code_sum": pa.array(c.sum(axis=1), type=pa.int64()),
                "code_min": pa.array(c.min(axis=1), type=pa.int64()),
                "code_max": pa.array(c.max(axis=1), type=pa.int64()),
            }
        )

    return ds.map_batches(_codes, batch_format="pyarrow", **_rargs())


def pq_codes(ds, n_sub: int = 2, k: int = 4, iters: int = 2):
    """Product quantization (Jégou, Douze & Schmid 2011, TPAMI 33(1),
    "Product Quantization for Nearest Neighbor Search"): the embedding
    is split into ``n_sub`` contiguous subvectors, an independent
    codebook is learned per subspace with the DETERMINISTIC exact
    k-means (kmeans_clusters — every float op order-pinned), and each
    vector is encoded as its per-subspace nearest-centroid ids. The
    compressed code is what a 100-TB ANN store ships instead of raw
    floats. Returns (vec_id, code_0, ..., code_{n_sub-1}) — all ints.

    Shape: per subspace, ONE streamed list_slice pass (f32 value slices
    — exact) feeds the kmeans machinery (stateless assignment with the
    k×sub centroid matrix in the closure, cluster-grouped ordered-fold
    updates); the final pivot is a groupby(vec_id) over n_sub bounded
    rows per vector. The oracle unrolls the same chain per subspace."""
    import pyarrow.compute as pc

    ds = ds.materialize()
    dims = len(ds.take(1)[0]["embedding"])
    sub = dims // n_sub
    assert sub * n_sub == dims, "dims must divide evenly into subspaces"

    tagged = []
    for s in range(n_sub):
        lo = s * sub

        def _slice(batch: pa.Table, _lo=lo, _hi=lo + sub) -> pa.Table:
            return pa.table(
                {
                    "vec_id": batch.column("vec_id").cast(pa.int64()),
                    "embedding": pc.list_slice(
                        batch.column("embedding"), _lo, _hi
                    ),
                }
            )

        sliced = ds.map_batches(_slice, batch_format="pyarrow", **_rargs())
        asg = kmeans_clusters(sliced, k=k, iters=iters)

        def _tag(batch: pa.Table, _s=s) -> pa.Table:
            return pa.table(
                {
                    "vec_id": batch.column("vec_id").cast(pa.int64()),
                    "sub": pa.array(
                        np.full(batch.num_rows, _s, dtype=np.int64)
                    ),
                    "code": batch.column("cluster").cast(pa.int64()),
                }
            )

        tagged.append(
            asg.map_batches(_tag, batch_format="pyarrow", **_rargs())
        )

    u = tagged[0]
    for t in tagged[1:]:
        u = u.union(t)

    def _pivot(g: pa.Table) -> pa.Table:
        subs = g.column("sub").to_numpy()
        codes = g.column("code").to_numpy()
        order = np.argsort(subs, kind="stable")
        cols = {
            "vec_id": pa.array(
                [int(g.column("vec_id")[0].as_py())], type=pa.int64()
            )
        }
        for i, j in enumerate(order.tolist()):
            cols[f"code_{int(subs[j])}"] = pa.array(
                [int(codes[j])], type=pa.int64()
            )
        return pa.table(cols)

    return u.groupby("vec_id").map_groups(
        _pivot, batch_format="pyarrow", **_rargs()
    )


def pq_adc_topk(
    ds,
    n_sub: int = 2,
    k: int = 4,
    iters: int = 2,
    query_vec_id: int = 0,
    topk: int = 10,
):
    """PQ asymmetric distance computation search (Jégou et al. 2011 §IV
    ADC: the query stays a raw vector, each database vector is its PQ
    code; distance = sum over subspaces of a k-entry lookup table
    dist(q_sub, centroid[code])). This is the serving-side pair of
    pq_codes — the scan touches only the code columns, never the raw
    embeddings. Returns (rank, vec_id, adc) — ascending approximate
    distance, ties to smallest vec_id.

    Exactness: lookup tables use the SAME left-assoc (q_d - c_d)^2 dim
    fold as the codebook training, the ADC sum is a left-assoc chain of
    n_sub single f64 adds, and the top-k selection is over identically
    computed doubles — the oracle replays codes, tables and sum
    bit-for-bit. The per-block partial top-k + bounded driver reduce is
    the standard selection shape."""
    import pyarrow.compute as pc

    ds = ds.materialize()
    dims = len(ds.take(1)[0]["embedding"])
    sub = dims // n_sub
    assert sub * n_sub == dims

    # bounded: one row fetched by id for the query vector
    qrow = ds.filter(lambda r: r["vec_id"] == query_vec_id).take(1)
    qv = np.asarray(qrow[0]["embedding"], dtype=np.float64)

    tagged = []
    tables = []  # per subspace: np.ndarray of k distances
    for s in range(n_sub):
        lo = s * sub

        def _slice(batch: pa.Table, _lo=lo, _hi=lo + sub) -> pa.Table:
            return pa.table(
                {
                    "vec_id": batch.column("vec_id").cast(pa.int64()),
                    "embedding": pc.list_slice(
                        batch.column("embedding"), _lo, _hi
                    ),
                }
            )

        sink: list = []
        asg = kmeans_clusters(
            ds.map_batches(_slice, batch_format="pyarrow", **_rargs()),
            k=k,
            iters=iters,
            centroids_sink=sink,
        )
        cents = sink[0]  # k x sub
        qs = qv[lo : lo + sub]
        tab = np.empty(k, dtype=np.float64)
        for ci in range(k):
            acc = 0.0
            for d in range(sub):  # scalar left-assoc fold == SQL chain
                diff = float(qs[d]) - float(cents[ci][d])
                acc += diff * diff
            tab[ci] = acc
        tables.append(tab)

        def _tag(batch: pa.Table, _s=s) -> pa.Table:
            return pa.table(
                {
                    "vec_id": batch.column("vec_id").cast(pa.int64()),
                    "sub": pa.array(
                        np.full(batch.num_rows, _s, dtype=np.int64)
                    ),
                    "code": batch.column("cluster").cast(pa.int64()),
                }
            )

        tagged.append(asg.map_batches(_tag, batch_format="pyarrow", **_rargs()))

    u = tagged[0]
    for t in tagged[1:]:
        u = u.union(t)

    tabs = tables  # closed over: n_sub x k doubles — stop-word-sized

    def _adc(g: pa.Table) -> pa.Table:
        subs = g.column("sub").to_numpy()
        codes = g.column("code").to_numpy()
        order = np.argsort(subs, kind="stable")
        acc = 0.0
        for j in order.tolist():  # left-assoc over subspaces
            acc = acc + float(tabs[int(subs[j])][int(codes[j])])
        return pa.table(
            {
                "vec_id": pa.array(
                    [int(g.column("vec_id")[0].as_py())], type=pa.int64()
                ),
                "adc": pa.array([acc], type=pa.float64()),
            }
        )

    scored = u.groupby("vec_id").map_groups(
        _adc, batch_format="pyarrow", **_rargs()
    )

    def _part_topk(batch: pa.Table) -> pa.Table:
        v = batch.column("vec_id").to_numpy()
        a = batch.column("adc").to_numpy()
        order = np.lexsort((v, a))[:topk]
        return pa.table(
            {
                "vec_id": pa.array(v[order], type=pa.int64()),
                "adc": pa.array(a[order], type=pa.float64()),
            }
        )

    cand = scored.map_batches(
        _part_topk, batch_format="pyarrow", **_rargs()
    ).take_all()  # <= topk rows per block: bounded
    cand.sort(key=lambda r: (r["adc"], r["vec_id"]))
    cand = cand[:topk]
    return pa.table(
        {
            "rank": pa.array(np.arange(len(cand)), type=pa.int64()),
            "vec_id": pa.array([r["vec_id"] for r in cand], type=pa.int64()),
            "adc": pa.array([r["adc"] for r in cand], type=pa.float64()),
        }
    )


def embedding_dim_stats(ds):
    """Per-dimension embedding distribution statistics — the
    StandardScaler / feature-normalization prep (mean, variance, std
    per dim) every whitening / normalization stage computes before
    training or indexing. Returns (dim, mean, variance, std).

    Exactness: both reductions are vec_id-ORDERED sequential folds
    (np.cumsum == ordered list_reduce, the kmeans discipline), mean =
    one exact division, each deviation term is two single f64 ops
    ((v − mean), square), std = correctly-rounded sqrt — the oracle
    replays the whole chain. Two passes (means broadcast into the
    second); at web scale you'd run per-batch partial moments (tree
    association) and accept rows-only verification — the documented
    exactness/scale trade, same as kmeans."""
    from ray.data.aggregate import AggregateFn  # noqa: F401  (doc pointer)

    def _explode(batch: pa.Table) -> pa.Table:
        m = _batch_matrix(batch)
        n, d = m.shape
        vid = batch.column("vec_id").to_numpy().astype(np.int64)
        return pa.table(
            {
                "dim": pa.array(np.tile(np.arange(d, dtype=np.int64), n)),
                "vec_id": pa.array(np.repeat(vid, d), type=pa.int64()),
                "v": pa.array(m.ravel(), type=pa.float64()),
            }
        )

    exploded = ds.map_batches(
        _explode, batch_format="pyarrow", **_rargs()
    ).materialize()  # consumed by both passes

    def _mean(g: pa.Table) -> pa.Table:
        order = np.argsort(g.column("vec_id").to_numpy(), kind="stable")
        v = g.column("v").to_numpy()[order]
        return pa.table(
            {
                "dim": pa.array(
                    [int(g.column("dim")[0].as_py())], type=pa.int64()
                ),
                "mean": pa.array(
                    [float(np.cumsum(v)[-1]) / float(len(v))],
                    type=pa.float64(),
                ),
            }
        )

    means = {
        int(r["dim"]): float(r["mean"])
        for r in exploded.groupby("dim")
        .map_groups(_mean, batch_format="pyarrow", **_rargs())
        .take_all()  # dimension-bounded
    }

    def _var(g: pa.Table) -> pa.Table:
        dim = int(g.column("dim")[0].as_py())
        order = np.argsort(g.column("vec_id").to_numpy(), kind="stable")
        v = g.column("v").to_numpy()[order]
        dmu = v - means[dim]  # one op each
        var = float(np.cumsum(dmu * dmu)[-1]) / float(len(v))
        return pa.table(
            {
                "dim": pa.array([dim], type=pa.int64()),
                "mean": pa.array([means[dim]], type=pa.float64()),
                "variance": pa.array([var], type=pa.float64()),
                "std": pa.array([float(np.sqrt(var))], type=pa.float64()),
            }
        )

    return exploded.groupby("dim").map_groups(
        _var, batch_format="pyarrow", **_rargs()
    )
