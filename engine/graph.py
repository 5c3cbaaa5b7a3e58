"""Distributed web-graph operators (beyond-reference: the link-analysis
pass of a crawl/training pipeline — PageRank power iteration).

The fixture link graph derives from doc_id arithmetic (testdata has no
link columns), so the SQL oracle replays it verbatim: each doc i emits
up to 3 out-edges to (i*31 + 7) % N, (i*97 + 13) % N, (i*131 + 29) % N,
self-loops dropped, duplicate targets KEPT (parallel edges contribute
twice — a deterministic rule both sides implement).

PageRank is the canonical "iterative algorithm" the driver contract
calls out as usually SQL-ineligible; it is exact here because every
float64 reduction is ORDER-PINNED: a target's incoming contributions
fold in source-ascending order (one vectorized += pass per in-group
rank over the (target, source)-lexsorted contribution array — a
genuinely sequential left-assoc sum; np.add.reduceat is NOT usable
here, its 8+-element slices associate pairwise; the oracle replays
the fold with a per-target ordered list_reduce), and the damping update r' = 0.15/N + 0.85 * s is two
exact-rounded ops. Dangling mass (outdeg 0 — impossible for this
fixture's 3-formula fan-out unless all three hit the source) is
dropped, the deterministic "lost mass" variant.

Ray shape per iteration: ranks Dataset (doc_id, rank) -> map_batches
emits (bucket, target, source, contrib) -> groupby(bucket) (COARSE
buckets, not per-target groups — the perf-lore ~90us/group shape is
avoided) -> vectorized per-bucket ordered fold -> next ranks
Dataset. Nothing whole-corpus lands on the driver; 5 iterations = 5
bounded shuffles of one row per edge.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from .rayenv import remote_args as _rargs

EDGE_MULS = ((31, 7), (97, 13), (131, 29))
DAMPING = 0.85
N_BUCKETS = 64


def synth_out_edges(doc_ids: np.ndarray, n_docs: int) -> tuple[np.ndarray, np.ndarray]:
    """(sources, targets) of the fixture graph for the given docs —
    self-loops dropped, parallel edges kept."""
    ids = np.asarray(doc_ids, dtype=np.int64)
    srcs: list[np.ndarray] = []
    tgts: list[np.ndarray] = []
    for a, b in EDGE_MULS:
        t = (ids * a + b) % n_docs
        keep = t != ids
        srcs.append(ids[keep])
        tgts.append(t[keep])
    return np.concatenate(srcs), np.concatenate(tgts)


def out_degree(doc_ids: np.ndarray, n_docs: int) -> np.ndarray:
    """Out-degree of each doc under the fixture rule (0..3)."""
    ids = np.asarray(doc_ids, dtype=np.int64)
    deg = np.zeros(len(ids), dtype=np.int64)
    for a, b in EDGE_MULS:
        deg += ((ids * a + b) % n_docs) != ids
    return deg


def pagerank(ds, n_docs: int, n_iters: int = 5):
    """Power-iteration PageRank over the fixture graph. ``ds`` supplies
    the doc_id universe (one row per doc; any extra columns ignored).
    Returns a Dataset (doc_id, rank) after ``n_iters`` damped updates
    from the uniform start 1/N."""
    import ray.data

    def _init(batch: pa.Table) -> pa.Table:
        docs = batch.column("doc_id")
        return pa.table(
            {
                "doc_id": docs,
                "rank": pa.array(
                    np.full(len(docs), 1.0 / n_docs, dtype=np.float64)
                ),
            }
        )

    ranks = ds.select_columns(["doc_id"]).map_batches(
        _init, batch_format="pyarrow", **_rargs()
    )

    def _contribs(batch: pa.Table) -> pa.Table:
        docs = batch.column("doc_id").to_numpy()
        r = batch.column("rank").to_numpy()
        deg = out_degree(docs, n_docs)
        share = np.where(deg > 0, r / np.maximum(deg, 1), 0.0)
        # a zero-contribution (source -1) anchor row per doc keeps
        # in-link-less targets in the fold (they resolve to the base
        # mass) WITHOUT a second union+max shuffle; sorted first per
        # target, it adds exactly 0.0 to the 0.0-seeded fold
        s_out: list[np.ndarray] = [np.full(len(docs), -1, dtype=np.int64)]
        t_out: list[np.ndarray] = [docs]
        c_out: list[np.ndarray] = [np.zeros(len(docs), dtype=np.float64)]
        for a, b in EDGE_MULS:
            t = (docs * a + b) % n_docs
            keep = t != docs
            s_out.append(docs[keep])
            t_out.append(t[keep])
            c_out.append(share[keep])
        tgt = np.concatenate(t_out)
        return pa.table(
            {
                "bucket": pa.array((tgt % N_BUCKETS).astype(np.int64)),
                "target": pa.array(tgt),
                "source": pa.array(np.concatenate(s_out)),
                "contrib": pa.array(np.concatenate(c_out), type=pa.float64()),
            }
        )

    def _fold(g: pa.Table) -> pa.Table:
        t = g.column("target").to_numpy()
        s = g.column("source").to_numpy()
        c = g.column("contrib").to_numpy()
        order = np.lexsort((s, t))  # per-target source-ascending order
        t, c = t[order], c[order]
        starts = np.flatnonzero(np.concatenate(([True], t[1:] != t[:-1])))
        n_groups = len(starts)
        sizes = np.diff(np.concatenate((starts, [len(t)])))
        # GENUINELY sequential left-assoc per-group sum: one vectorized
        # += pass per in-group rank (np.add.reduceat is NOT sequential —
        # it switches to unrolled/pairwise association for slices of 8+
        # elements, which would diverge from the oracle's list_reduce
        # the moment a target's in-degree reaches 8)
        gid = np.repeat(np.arange(n_groups), sizes)
        rank_in_group = np.arange(len(t)) - starts[gid]
        sums = np.zeros(n_groups, dtype=np.float64)
        for k in range(int(sizes.max()) if n_groups else 0):
            sel = rank_in_group == k
            sums[gid[sel]] += c[sel]
        return pa.table(
            {
                "doc_id": pa.array(t[starts], type=pa.int64()),
                "rank": pa.array((0.15 / n_docs) + DAMPING * sums, type=pa.float64()),
            }
        )

    for i in range(n_iters):
        ranks = (
            ranks.map_batches(_contribs, batch_format="pyarrow", **_rargs())
            .groupby("bucket")
            .map_groups(_fold, batch_format="pyarrow", **_rargs())
        )
        # iterative barrier: each iteration's output IS the next input —
        # materialize so the lazy lineage doesn't re-execute iteration k
        # once per downstream iteration (5 chained shuffles re-run
        # quadratically otherwise; measured 54 s -> ~5 s at sf0.01)
        if i < n_iters - 1:
            ranks = ranks.materialize()
    return ranks


def anchor_stats(ds, n_docs: int):
    """Anchor-text aggregation (the web-graph pass that builds per-target
    anchor evidence for retrieval/training — cf. anchor-text fields in
    web search): every fixture edge carries the SOURCE doc's first two
    tokens as its anchor; per target emit (doc_id, n_inlinks,
    n_anchor_terms) where n_anchor_terms counts DISTINCT anchor tokens
    over all in-edges. Shape: map_batches explodes (target, token) +
    (target, inlink-marker) rows, two native groupby aggregates — no
    joins, no driver state."""
    from ray.data.aggregate import Count

    from .analyze import TOKEN_RE

    def _explode(batch: pa.Table) -> pa.Table:
        docs = batch.column("doc_id").to_numpy()
        texts = batch.column("text").to_pylist()
        anchors: list[list[str]] = [
            TOKEN_RE.findall((t or "").lower())[:2] for t in texts
        ]
        t_out: list[int] = []
        k_out: list[str] = []
        for i, d in enumerate(docs.tolist()):
            for a, b in EDGE_MULS:
                tgt = (d * a + b) % n_docs
                if tgt == d:
                    continue
                t_out.append(tgt)
                k_out.append("\x01")  # in-link marker row
                for w in anchors[i]:
                    t_out.append(tgt)
                    k_out.append(w)
        return pa.table(
            {
                "doc_id": pa.array(t_out, type=pa.int64()),
                "tok": pa.array(k_out, type=pa.string()),
            }
        )

    exploded = ds.map_batches(_explode, batch_format="pyarrow", **_rargs())
    # one distinct-pair groupby; markers count in-links, tokens count
    # distinct anchor vocabulary per target
    agg = exploded.groupby(["doc_id", "tok"]).aggregate(Count(alias_name="c"))

    def _finish(batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        is_marker = pc.equal(batch.column("tok"), "\x01")
        docs = batch.column("doc_id").to_numpy()
        c = batch.column("c").to_numpy()
        m = is_marker.to_numpy(zero_copy_only=False)
        return pa.table(
            {
                "doc_id": pa.array(docs, type=pa.int64()),
                "n_inlinks": pa.array(np.where(m, c, 0), type=pa.int64()),
                "n_anchor_terms": pa.array((~m).astype(np.int64), type=pa.int64()),
            }
        )

    from ray.data.aggregate import Sum

    return (
        agg.map_batches(_finish, batch_format="pyarrow", **_rargs())
        .groupby("doc_id")
        .aggregate(
            Sum("n_inlinks", alias_name="n_inlinks"),
            Sum("n_anchor_terms", alias_name="n_anchor_terms"),
        )
    )


def bib_coupling_pairs(ds, n_docs: int):
    """Bibliographic coupling over the fixture web graph (Kessler 1963:
    two pages are coupled iff they LINK TO a common target; the
    transpose of co-citation, Small 1973) — the "related pages"
    primitive of link analysis. Returns (doc_a, doc_b, n_common) for
    doc_a < doc_b with n_common = number of shared DISTINCT out-targets.

    Distributed shape: the edge stream (synth arms, self-loops dropped,
    parallel edges deduped per (s,t)) shuffles ONCE by target; each
    target's in-source group emits its C(indeg, 2) source pairs
    (vectorized triu over the sorted unique sources — indeg is bounded
    by the arm count's fan-in, not the corpus); one groupby((a,b)) Sum
    accumulates shared-target counts. All integers — the oracle is a
    plain distinct-edge self-join."""
    from ray.data.aggregate import Sum

    def _edges(batch: pa.Table) -> pa.Table:
        ids = batch.column("doc_id").to_numpy()
        s, t = synth_out_edges(ids, n_docs)
        key = s * np.int64(n_docs) + t  # batch-local dedupe only
        _, idx = np.unique(key, return_index=True)
        return pa.table(
            {
                "s": pa.array(s[idx], type=pa.int64()),
                "t": pa.array(t[idx], type=pa.int64()),
            }
        )

    def _pairs(g: pa.Table) -> pa.Table:
        src = np.unique(g.column("s").to_numpy())  # cross-batch dedupe
        if len(src) < 2:
            return pa.table(
                {
                    "doc_a": pa.array([], type=pa.int64()),
                    "doc_b": pa.array([], type=pa.int64()),
                    "n": pa.array([], type=pa.int64()),
                }
            )
        iu, ju = np.triu_indices(len(src), k=1)
        return pa.table(
            {
                "doc_a": pa.array(src[iu], type=pa.int64()),
                "doc_b": pa.array(src[ju], type=pa.int64()),
                "n": pa.array(np.ones(len(iu), dtype=np.int64)),
            }
        )

    agg = (
        ds.map_batches(_edges, batch_format="pyarrow", **_rargs())
        .groupby("t")
        .map_groups(_pairs, batch_format="pyarrow", **_rargs())
        .groupby(["doc_a", "doc_b"])
        .aggregate(Sum("n", alias_name="n_common"))
    )
    return agg.map_batches(
        lambda b: b.set_column(
            b.schema.get_field_index("n_common"),
            "n_common",
            b.column("n_common").cast(pa.int64()),
        ),
        batch_format="pyarrow",
        **_rargs(),
    )
