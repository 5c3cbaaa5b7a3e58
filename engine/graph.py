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


def co_citation_pairs(ds, n_docs: int):
    """Co-citation pairs over the fixture web graph (Small 1973: two
    pages are related iff a common source LINKS TO both — the transpose
    of bibliographic coupling). Returns (doc_a, doc_b, n_common) for
    doc_a < doc_b with n_common = number of distinct sources citing
    both.

    Distributed shape: ZERO pre-shuffle — a source's distinct targets
    (<= 3 under the arm rule) are known in-batch, so each map task emits
    its C(outdeg, 2) target pairs directly; ONE groupby((a, b)) Sum
    accumulates citing-source counts. All integers; oracle = distinct-
    edge self-join on the source side."""
    from ray.data.aggregate import Sum

    def _pairs(batch: pa.Table) -> pa.Table:
        ids = batch.column("doc_id").to_numpy()
        s, t = synth_out_edges(ids, n_docs)
        # distinct targets per source (parallel arms can collide)
        key = s * np.int64(n_docs) + t
        _, idx = np.unique(key, return_index=True)
        s, t = s[idx], t[idx]
        a_out: list[np.ndarray] = []
        b_out: list[np.ndarray] = []
        # arm-combination pair emission over the DEDUPED (s, t) stream:
        # sort by source, emit intra-source combinations vectorized via
        # the (0,1)/(0,2)/(1,2) rank combos of each source's run
        order = np.argsort(s, kind="stable")
        s, t = s[order], t[order]
        starts = np.flatnonzero(np.concatenate(([True], s[1:] != s[:-1])))
        sizes = np.diff(np.concatenate((starts, [len(s)])))
        rank = np.arange(len(s)) - starts[np.repeat(np.arange(len(starts)), sizes)]
        sz = np.repeat(sizes, sizes)
        for i, j in ((0, 1), (0, 2), (1, 2)):
            sel = np.flatnonzero((rank == i) & (sz > j))
            if len(sel) == 0:
                continue
            ta, tb = t[sel], t[sel + (j - i)]
            lo, hi = np.minimum(ta, tb), np.maximum(ta, tb)
            a_out.append(lo)
            b_out.append(hi)
        if not a_out:
            return pa.table(
                {
                    "doc_a": pa.array([], type=pa.int64()),
                    "doc_b": pa.array([], type=pa.int64()),
                    "n": pa.array([], type=pa.int64()),
                }
            )
        return pa.table(
            {
                "doc_a": pa.array(np.concatenate(a_out), type=pa.int64()),
                "doc_b": pa.array(np.concatenate(b_out), type=pa.int64()),
                "n": pa.array(
                    np.ones(sum(len(x) for x in a_out), dtype=np.int64)
                ),
            }
        )

    agg = (
        ds.map_batches(_pairs, batch_format="pyarrow", **_rargs())
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


def hits_scores(ds, n_docs: int, n_iters: int = 2):
    """HITS hubs & authorities (Kleinberg 1999, JACM 46(5)) over the
    fixture multigraph (parallel edges contribute twice, matching the
    pagerank convention). UNNORMALIZED integer formulation: per-
    iteration normalization is a uniform positive scale, so the RANKING
    is identical to normalized HITS while every value stays an exact
    int64 path count (h0 = 1; a <- E^T h; h <- E a) — order-free
    distributed sums, partition-invariant, and the oracle replays them
    as plain integer joins.

    Ray shape per iteration (nothing whole-corpus on the driver):
      1. state (doc_id, h) -> edge contribution rows (key=target, hc=h)
         + zero anchors -> groupby(key) Sum = new authority table A.
      2. A -> identity row (key=doc, src=-1, aval=a) + out-edge request
         rows (key=target, src=source, aval=0) -> groupby(key)
         map_groups disperses a_t back to each citing source ->
         groupby(doc_id) Sum(h), Sum(a) = next state. The cogroup
         replaces a distributed join; group size is bounded by fan-in.
    Returns a Dataset (doc_id, hub, auth) after ``n_iters`` rounds."""
    import ray.data
    from ray.data.aggregate import Sum

    def _init(batch: pa.Table) -> pa.Table:
        docs = batch.column("doc_id")
        return pa.table(
            {
                "doc_id": docs,
                "h": pa.array(np.ones(len(docs), dtype=np.int64)),
            }
        )

    state = ds.select_columns(["doc_id"]).map_batches(
        _init, batch_format="pyarrow", **_rargs()
    )

    def _auth_contribs(batch: pa.Table) -> pa.Table:
        docs = batch.column("doc_id").to_numpy()
        h = batch.column("h").to_numpy()
        k_out = [docs]  # zero anchors keep in-link-less docs present
        c_out = [np.zeros(len(docs), dtype=np.int64)]
        for a, b in EDGE_MULS:
            t = (docs * a + b) % n_docs
            keep = t != docs
            k_out.append(t[keep])
            c_out.append(h[keep])
        return pa.table(
            {
                "key": pa.array(np.concatenate(k_out), type=pa.int64()),
                "hc": pa.array(np.concatenate(c_out), type=pa.int64()),
            }
        )

    def _disperse_prep(batch: pa.Table) -> pa.Table:
        docs = batch.column("key").to_numpy()
        a_val = batch.column("hc").to_numpy()
        k_out = [docs]
        s_out = [np.full(len(docs), -1, dtype=np.int64)]
        v_out = [a_val]
        for a, b in EDGE_MULS:
            t = (docs * a + b) % n_docs
            keep = t != docs
            k_out.append(t[keep])
            s_out.append(docs[keep])
            v_out.append(np.zeros(int(keep.sum()), dtype=np.int64))
        return pa.table(
            {
                "key": pa.array(np.concatenate(k_out), type=pa.int64()),
                "src": pa.array(np.concatenate(s_out), type=pa.int64()),
                "aval": pa.array(np.concatenate(v_out), type=pa.int64()),
            }
        )

    def _disperse(g: pa.Table) -> pa.Table:
        src = g.column("src").to_numpy()
        aval = g.column("aval").to_numpy()
        key = int(g.column("key")[0].as_py())
        ident = src == -1
        a_t = int(aval[ident].sum())  # exactly one identity row
        senders = src[~ident]
        return pa.table(
            {
                "doc_id": pa.array(
                    np.concatenate((senders, [key])), type=pa.int64()
                ),
                "hp": pa.array(
                    np.concatenate(
                        (np.full(len(senders), a_t, dtype=np.int64), [0])
                    )
                ),
                "ap": pa.array(
                    np.concatenate(
                        (np.zeros(len(senders), dtype=np.int64), [a_t])
                    )
                ),
            }
        )

    for i in range(n_iters):
        auth = (
            state.map_batches(_auth_contribs, batch_format="pyarrow", **_rargs())
            .groupby("key")
            .aggregate(Sum("hc", alias_name="hc"))
        )
        state = (
            auth.map_batches(_disperse_prep, batch_format="pyarrow", **_rargs())
            .groupby("key")
            .map_groups(_disperse, batch_format="pyarrow", **_rargs())
            .groupby("doc_id")
            .aggregate(Sum("hp", alias_name="h"), Sum("ap", alias_name="a"))
        )
        # iterative barrier (pagerank lore: lazy lineage re-executes
        # iteration k once per downstream iteration otherwise)
        if i < n_iters - 1:
            state = state.materialize()

    def _finish(batch: pa.Table) -> pa.Table:
        return pa.table(
            {
                "doc_id": batch.column("doc_id").cast(pa.int64()),
                "hub": batch.column("h").cast(pa.int64()),
                "auth": batch.column("a").cast(pa.int64()),
            }
        )

    return state.map_batches(_finish, batch_format="pyarrow", **_rargs())


def bfs_hops(ds, n_docs: int, source: int = 0, max_depth: int = 4):
    """Single-source BFS hop distances over the fixture graph — the
    Solr graph streaming-expression role (shortestPath / gatherNodes,
    solr/.../graph/ShortestPathStream.java semantics at the hop level:
    breadth-first frontier expansion to ``max_depth``). Returns
    (doc_id, dist) for every node reachable within max_depth, dist =
    minimum hop count.

    Ray shape: the visited set IS a Dataset (doc_id, dist); iteration k
    expands only the dist==k frontier through the arm rule, unions with
    the visited set and resolves with groupby(doc_id) Min(dist) —
    level-synchronous BFS, one bounded shuffle per level, nothing on
    the driver. ``ds`` is accepted for signature uniformity (the edge
    universe derives from n_docs)."""
    import ray.data
    from ray.data.aggregate import Min

    visited = ray.data.from_arrow(
        pa.table(
            {
                "doc_id": pa.array([source], type=pa.int64()),
                "dist": pa.array([0], type=pa.int64()),
            }
        )
    )

    for k in range(max_depth):
        def _expand(batch: pa.Table, _k=k) -> pa.Table:
            docs = batch.column("doc_id").to_numpy()
            dist = batch.column("dist").to_numpy()
            frontier = docs[dist == _k]
            s, t = synth_out_edges(frontier, n_docs)
            return pa.table(
                {
                    "doc_id": pa.array(
                        np.concatenate((docs, t)), type=pa.int64()
                    ),
                    "dist": pa.array(
                        np.concatenate(
                            (dist, np.full(len(t), _k + 1, dtype=np.int64))
                        )
                    ),
                }
            )

        visited = (
            visited.map_batches(_expand, batch_format="pyarrow", **_rargs())
            .groupby("doc_id")
            .aggregate(Min("dist", alias_name="dist"))
        )
        if k < max_depth - 1:
            visited = visited.materialize()

    return visited.map_batches(
        lambda b: pa.table(
            {
                "doc_id": b.column("doc_id").cast(pa.int64()),
                "dist": b.column("dist").cast(pa.int64()),
            }
        ),
        batch_format="pyarrow",
        **_rargs(),
    )


def adamic_adar_pairs(ds, n_docs: int):
    """Adamic–Adar link prediction (Adamic & Adar 2003, "Friends and
    neighbors on the Web": candidate pair score = sum over shared
    neighbors z of 1/ln(deg(z)) — rare shared neighbors weigh more).
    Here over the fixture graph's DISTINCT out-edges: pairs of sources
    sharing out-targets (the bib-coupling candidate set), z's degree =
    its in-degree. A shared target has in-degree >= 2 by construction,
    so ln never hits 0. Returns (doc_a, doc_b, n_common, aa_score).

    Exactness: per pair the score folds in TARGET-ASCENDING order —
    1.0/ln(d) is two single f64 ops (scalar libm ln == DuckDB ln, exact
    division) and the fold is an np.cumsum sequential scan == the
    oracle's ordered list_reduce. Shape: one shuffle by target
    (vectorized triu pair emission, bounded by fan-in), one shuffle by
    pair (per-group ordered fold — bounded by shared-target counts)."""
    import math

    def _edges(batch: pa.Table) -> pa.Table:
        ids = batch.column("doc_id").to_numpy()
        s, t = synth_out_edges(ids, n_docs)
        key = s * np.int64(n_docs) + t
        _, idx = np.unique(key, return_index=True)
        return pa.table(
            {
                "s": pa.array(s[idx], type=pa.int64()),
                "t": pa.array(t[idx], type=pa.int64()),
            }
        )

    def _pairs(g: pa.Table) -> pa.Table:
        src = np.unique(g.column("s").to_numpy())
        if len(src) < 2:
            return pa.table(
                {
                    "doc_a": pa.array([], type=pa.int64()),
                    "doc_b": pa.array([], type=pa.int64()),
                    "t": pa.array([], type=pa.int64()),
                    "w": pa.array([], type=pa.float64()),
                }
            )
        t = int(g.column("t")[0].as_py())
        w = 1.0 / math.log(float(len(src)))  # ln + division: single ops
        iu, ju = np.triu_indices(len(src), k=1)
        return pa.table(
            {
                "doc_a": pa.array(src[iu], type=pa.int64()),
                "doc_b": pa.array(src[ju], type=pa.int64()),
                "t": pa.array(np.full(len(iu), t, dtype=np.int64)),
                "w": pa.array(np.full(len(iu), w, dtype=np.float64)),
            }
        )

    def _fold(g: pa.Table) -> pa.Table:
        order = np.argsort(g.column("t").to_numpy(), kind="stable")
        w = g.column("w").to_numpy()[order]
        # cumsum = genuine sequential left fold (CLAUDE.md lore)
        total = float(np.cumsum(w)[-1])
        return pa.table(
            {
                "doc_a": pa.array(
                    [int(g.column("doc_a")[0].as_py())], type=pa.int64()
                ),
                "doc_b": pa.array(
                    [int(g.column("doc_b")[0].as_py())], type=pa.int64()
                ),
                "n_common": pa.array([len(w)], type=pa.int64()),
                "aa_score": pa.array([total], type=pa.float64()),
            }
        )

    return (
        ds.map_batches(_edges, batch_format="pyarrow", **_rargs())
        .groupby("t")
        .map_groups(_pairs, batch_format="pyarrow", **_rargs())
        .groupby(["doc_a", "doc_b"])
        .map_groups(_fold, batch_format="pyarrow", **_rargs())
    )


def degree_histogram(ds, n_docs: int):
    """Degree-distribution histogram over the fixture multigraph — the
    standard web-graph diagnostic (power-law / hub inspection) a crawl
    pipeline reports per snapshot. Parallel edges count (multigraph,
    the pagerank convention); zero-degree nodes are included via anchor
    rows. Returns (kind, degree, n_nodes) with kind in ('in', 'out').

    Shape: one map_batches emits per-node out-degrees (known in-batch)
    and (target, 1) in-contributions with zero anchors; groupby(node)
    Sum resolves in-degrees, then a degree-bounded groupby((kind,
    degree)) count — the second shuffle carries one row per node."""
    from ray.data.aggregate import Count, Sum

    def _contrib(batch: pa.Table) -> pa.Table:
        docs = batch.column("doc_id").to_numpy()
        deg = out_degree(docs, n_docs)
        k_out = [docs]
        c_out = [np.zeros(len(docs), dtype=np.int64)]  # in-deg anchors
        for a, b in EDGE_MULS:
            t = (docs * a + b) % n_docs
            keep = t != docs
            k_out.append(t[keep])
            c_out.append(np.ones(int(keep.sum()), dtype=np.int64))
        n = len(docs)
        return pa.table(
            {
                "node": pa.array(
                    np.concatenate([docs] + k_out), type=pa.int64()
                ),
                "ind": pa.array(
                    np.concatenate([np.zeros(n, dtype=np.int64)] + c_out)
                ),
                "outd": pa.array(
                    np.concatenate(
                        [deg] + [np.zeros(len(x), dtype=np.int64) for x in k_out]
                    )
                ),
            }
        )

    per_node = (
        ds.select_columns(["doc_id"])
        .map_batches(_contrib, batch_format="pyarrow", **_rargs())
        .groupby("node")
        .aggregate(Sum("ind", alias_name="ind"), Sum("outd", alias_name="outd"))
    )

    def _explode_kinds(batch: pa.Table) -> pa.Table:
        ind = batch.column("ind").to_numpy().astype(np.int64)
        outd = batch.column("outd").to_numpy().astype(np.int64)
        n = len(ind)
        return pa.table(
            {
                "kind": pa.array(["in"] * n + ["out"] * n, type=pa.string()),
                "degree": pa.array(np.concatenate((ind, outd)), type=pa.int64()),
            }
        )

    return (
        per_node.map_batches(_explode_kinds, batch_format="pyarrow", **_rargs())
        .groupby(["kind", "degree"])
        .aggregate(Count(alias_name="n_nodes"))
        .map_batches(
            lambda b: b.set_column(
                b.schema.get_field_index("n_nodes"),
                "n_nodes",
                b.column("n_nodes").cast(pa.int64()),
            ),
            batch_format="pyarrow",
            **_rargs(),
        )
    )


def personalized_pagerank(ds, n_docs: int, seed: int = 0, n_iters: int = 5):
    """Personalized PageRank (the related-pages-from-a-seed variant:
    restart mass returns to the SEED instead of spreading uniformly —
    r' = 0.15·e_seed + 0.85·(in-contributions)). Same order-pinned fold
    discipline as pagerank (source-ascending per-target sequential
    sums, two exact-rounded update ops), so the unrolled-CTE replay is
    bit-exact; start vector = e_seed. Returns (doc_id, rank) — nodes
    whose rank is exactly 0.0 after n_iters are still emitted (they
    ride the anchor rows)."""

    def _init(batch: pa.Table) -> pa.Table:
        docs = batch.column("doc_id")
        d = docs.to_numpy()
        return pa.table(
            {
                "doc_id": docs,
                "rank": pa.array(
                    np.where(d == seed, 1.0, 0.0).astype(np.float64)
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
        order = np.lexsort((s, t))
        t, c = t[order], c[order]
        starts = np.flatnonzero(np.concatenate(([True], t[1:] != t[:-1])))
        n_groups = len(starts)
        sizes = np.diff(np.concatenate((starts, [len(t)])))
        gid = np.repeat(np.arange(n_groups), sizes)
        rank_in_group = np.arange(len(t)) - starts[gid]
        sums = np.zeros(n_groups, dtype=np.float64)
        for k in range(int(sizes.max()) if n_groups else 0):
            sel = rank_in_group == k
            sums[gid[sel]] += c[sel]
        nodes = t[starts]
        base = np.where(nodes == seed, 0.15, 0.0)
        return pa.table(
            {
                "doc_id": pa.array(nodes, type=pa.int64()),
                "rank": pa.array(base + DAMPING * sums, type=pa.float64()),
            }
        )

    for i in range(n_iters):
        ranks = (
            ranks.map_batches(_contribs, batch_format="pyarrow", **_rargs())
            .groupby("bucket")
            .map_groups(_fold, batch_format="pyarrow", **_rargs())
        )
        if i < n_iters - 1:
            ranks = ranks.materialize()
    return ranks
