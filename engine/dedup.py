"""Deduplication operators: exact, MinHash+LSH, SimHash, n-gram Jaccard,
embedding-cosine near-dup.

Ray-Data shapes (the guide's sketch patterns):
- exact: content-hash column in map_batches → groupby(hash) → keep min id
  (the hash-partition + per-group-first pattern; the reference's analogue
  is updateDocument(term, doc) delete-then-add dedup, IndexWriter.java:1771)
- MinHash+LSH: shingle → minhash signature per doc (vectorized) → explode
  to (band_id, band_hash, doc_id) rows → groupby bands → candidate pairs →
  verify exact n-gram Jaccard on the pair (only candidates are verified)
- SimHash: 64-bit hyperplane-free signature from token hashes; near-dup =
  hamming distance ≤ k via banding on 4 × 16-bit chunks
- embedding-cosine: delegated to engine/ann.py (same top-k kernel)

All hashes are deterministic FNV/md5 derivatives (never builtin hash() —
per-process salted).
"""

from __future__ import annotations

import hashlib

import numpy as np
import pyarrow as pa

from .rayenv import remote_args as _rargs

from .analyze import TOKEN_RE
from .textops import fnv1a

# ---------------------------------------------------------------------------
# exact dedup
# ---------------------------------------------------------------------------


def content_hash_batch(batch: pa.Table, text_col: str = "text") -> pa.Table:
    texts = batch.column(text_col).to_pylist()
    hashes = [hashlib.md5((t or "").encode()).hexdigest() for t in texts]
    return batch.append_column("content_hash", pa.array(hashes, type=pa.string()))


def exact_dedup(ds, text_col: str = "text"):
    """Dataset (doc_id, text, ...) → (kept_doc_id, dup_count) per distinct
    content. groupby on the hash with NATIVE aggregates (Min + Count) —
    no per-key Python function, no per-group pandas frame: at 10^10
    distinct keys the per-group work is an Arrow min/count, not a
    DataFrame construction."""
    hashed = ds.map_batches(
        lambda b: content_hash_batch(b, text_col), batch_format="pyarrow", **_rargs()
    )
    from ray.data.aggregate import Count, Min

    agg = hashed.groupby("content_hash").aggregate(
        Min("doc_id", alias_name="kept_doc_id"),
        Count(alias_name="dup_count"),
    )

    def finish(b: pa.Table) -> pa.Table:
        return pa.table(
            {
                "kept_doc_id": b.column("kept_doc_id").cast(pa.int64()),
                "dup_count": b.column("dup_count").cast(pa.int64()),
            }
        )

    return agg.map_batches(finish, batch_format="pyarrow", **_rargs())


# ---------------------------------------------------------------------------
# shingles / minhash / LSH
# ---------------------------------------------------------------------------

N_HASHES = 64
N_BANDS = 16  # 16 bands x 4 rows: catches jaccard >~ 0.5
ROWS_PER_BAND = N_HASHES // N_BANDS
_MERSENNE = (1 << 61) - 1


def _shingle_hashes(text: str, k: int = 3) -> np.ndarray:
    toks = TOKEN_RE.findall((text or "").lower())
    if len(toks) < k:
        shingles = {" ".join(toks)} if toks else set()
    else:
        shingles = {" ".join(toks[i : i + k]) for i in range(len(toks) - k + 1)}
    return np.fromiter((fnv1a(s) for s in shingles), dtype=np.uint64, count=len(shingles))


_A = None
_B = None


def _coeffs() -> tuple[np.ndarray, np.ndarray]:
    global _A, _B
    if _A is None:
        rng = np.random.default_rng(424242)  # fixed: signatures must agree everywhere
        _A = rng.integers(1, _MERSENNE, size=N_HASHES, dtype=np.int64).astype(np.uint64)
        _B = rng.integers(0, _MERSENNE, size=N_HASHES, dtype=np.int64).astype(np.uint64)
    return _A, _B


def minhash_signature(text: str, k: int = 3) -> np.ndarray:
    """64-permutation MinHash over k-token shingles, vectorized:
    sig[j] = min over shingles of (a_j * h + b_j mod 2^61-1)."""
    h = _shingle_hashes(text, k)
    if len(h) == 0:
        return np.full(N_HASHES, np.uint64(_MERSENNE), dtype=np.uint64)
    a, b = _coeffs()
    # (n_shingles, n_hashes) in uint64 with wraparound is fine for min-comparing
    vals = (h[:, None] * a[None, :] + b[None, :]) % np.uint64(_MERSENNE)
    return vals.min(axis=0)


def minhash_bands_batch(batch: pa.Table, k: int = 3) -> pa.Table:
    """Explode each doc into N_BANDS (band_id, band_hash, doc_id) rows."""
    texts = batch.column("text").to_pylist()
    doc_ids = batch.column("doc_id").to_numpy()
    n = len(texts)
    band_ids = np.tile(np.arange(N_BANDS, dtype=np.int32), n)
    out_docs = np.repeat(doc_ids, N_BANDS)
    band_hashes = np.empty(n * N_BANDS, dtype=np.int64)
    for i, t in enumerate(texts):
        sig = minhash_signature(t, k)
        bands = sig.reshape(N_BANDS, ROWS_PER_BAND)
        for bi in range(N_BANDS):
            d = hashlib.md5(bands[bi].tobytes()).digest()[:8]
            band_hashes[i * N_BANDS + bi] = int.from_bytes(d, "little") >> 1
    return pa.table(
        {
            "band_id": pa.array(band_ids),
            "band_hash": pa.array(band_hashes),
            "doc_id": pa.array(out_docs, type=pa.int64()),
        }
    )


def ngram_jaccard(text_a: str, text_b: str, k: int = 3) -> float:
    """Exact k-token-shingle Jaccard (the verify step after LSH)."""
    sa = set(_shingle_hashes(text_a, k).tolist())
    sb = set(_shingle_hashes(text_b, k).tolist())
    if not sa and not sb:
        return 1.0
    inter = len(sa & sb)
    return inter / (len(sa) + len(sb) - inter)


# all-pairs cap per LSH band group: a degenerate band (e.g. near-empty
# docs all hashing together) would otherwise explode O(n^2); beyond the
# cap each member pairs with the group's smallest doc_id only (star
# linking — transitive near-dup clusters still connect through the
# representative)
MAX_BAND_GROUP = 256


def _group_pairs(ids: list[int]) -> list[tuple[int, int]]:
    import itertools

    ids = sorted(set(ids))
    if len(ids) < 2:
        return []
    if len(ids) <= MAX_BAND_GROUP:
        return list(itertools.combinations(ids, 2))
    rep = ids[0]
    return [(rep, b) for b in ids[1:]]


def minhash_lsh_dedup(ds, threshold: float = 0.7, k: int = 3, source_path: str | None = None):
    """Dataset (doc_id, text) → verified near-dup pairs
    (doc_a, doc_b, jaccard) with doc_a < doc_b.

    shingle→minhash→band (map_batches) → groupby(band) → candidate pairs
    (size-capped per band group) → exact-Jaccard verify. The verify stage
    RE-READS only the candidate docs' texts from ``source_path`` with a
    doc_id pushdown filter per batch — nothing whole-corpus is ever
    collected or broadcast (the scale path). When the dataset has no
    backing file (``source_path=None``), the texts are broadcast via
    ray.put as a small-corpus fallback."""
    import pandas as pd
    import ray

    text_ref = None
    if source_path is None:
        # small-corpus fallback ONLY: collecting the text column to the
        # driver is a whole-corpus materialization — refuse beyond a hard
        # bound instead of silently broadcasting gigabytes (the scale path
        # is source_path + per-batch doc_id pushdown reads)
        n_rows = ds.count()
        if n_rows > 1_000_000:
            raise ValueError(
                f"minhash_lsh_dedup: {n_rows} rows with source_path=None "
                "would broadcast the whole text column; pass source_path "
                "so the verify stage re-reads candidates by doc_id pushdown"
            )
        texts_tbl = ds.select_columns(["doc_id", "text"]).to_pandas()
        text_ref = ray.put(dict(zip(texts_tbl["doc_id"], texts_tbl["text"])))

    bands = ds.map_batches(
        lambda b: minhash_bands_batch(b, k), batch_format="pyarrow", **_rargs()
    )

    def candidates(g: pd.DataFrame) -> pd.DataFrame:
        pairs = _group_pairs(g["doc_id"].tolist())
        return pd.DataFrame(
            {"doc_a": [p[0] for p in pairs], "doc_b": [p[1] for p in pairs]}
        )

    cand = bands.groupby(["band_id", "band_hash"]).map_groups(
        candidates, batch_format="pandas", **_rargs()
    )

    # distinct the (doc_a, doc_b) candidates BEFORE the text fetch so a
    # pair surfaced by several bands is verified once — native Count
    # aggregate (no per-pair pandas frame), count column then dropped
    from ray.data.aggregate import Count as _Count

    cand = (
        cand.groupby(["doc_a", "doc_b"])
        .aggregate(_Count(alias_name="_nbands"))
        .select_columns(["doc_a", "doc_b"])
    )

    def verify(batch: pa.Table) -> pa.Table:
        a_ids = batch.column("doc_a").to_pylist()
        b_ids = batch.column("doc_b").to_pylist()
        if source_path is not None:
            import pyarrow.dataset as pads

            need = sorted({*a_ids, *b_ids})
            tbl = pads.dataset(source_path).to_table(
                columns=["doc_id", "text"],
                filter=pads.field("doc_id").isin(need),
            )
            texts = dict(
                zip(tbl.column("doc_id").to_pylist(), tbl.column("text").to_pylist())
            )
        else:
            texts = ray.get(text_ref)
        rows = {"doc_a": [], "doc_b": [], "jaccard": []}
        for a, b in zip(a_ids, b_ids):
            j = ngram_jaccard(texts[a], texts[b], k)
            if j >= threshold:
                rows["doc_a"].append(int(a))
                rows["doc_b"].append(int(b))
                rows["jaccard"].append(float(j))
        return pa.table(
            {
                "doc_a": pa.array(rows["doc_a"], type=pa.int64()),
                "doc_b": pa.array(rows["doc_b"], type=pa.int64()),
                "jaccard": pa.array(rows["jaccard"], type=pa.float64()),
            }
        )

    return cand.map_batches(verify, batch_format="pyarrow", batch_size=1024, **_rargs())


# ---------------------------------------------------------------------------
# simhash
# ---------------------------------------------------------------------------


def simhash64(text: str) -> int:
    """64-bit SimHash over token hashes weighted by term frequency."""
    toks = TOKEN_RE.findall((text or "").lower())
    if not toks:
        return 0
    from collections import Counter

    acc = np.zeros(64, dtype=np.int64)
    for w, c in Counter(toks).items():
        h = fnv1a(w)
        bits = (h >> np.arange(64, dtype=np.uint64)) & np.uint64(1)
        acc += np.where(bits.astype(bool), c, -c)
    out = 0
    for i in range(64):
        if acc[i] > 0:
            out |= 1 << i
    return out & 0x7FFFFFFFFFFFFFFF  # fits int64


def simhash_batch(batch: pa.Table) -> pa.Table:
    texts = batch.column("text").to_pylist()
    return pa.table(
        {
            "doc_id": batch.column("doc_id"),
            "simhash": pa.array([simhash64(t) for t in texts], type=pa.int64()),
        }
    )


# 64-bit SimHash banding for hamming <= 3: split into 6 chunks
# (11,11,11,11,10,10 bits); a pair within distance 3 has at most 3 dirty
# chunks, hence >= 3 intact — so it collides on at least one of the
# C(6,3)=20 chunk-TRIPLE keys. Triple keys are ~32 bits, so bucket
# populations stay tiny even at 10^10 docs (the round-1 4x16-bit scheme
# put ~N/65k docs in every bucket — quadratic blowup at scale).
_SH_CHUNK_BITS = (11, 11, 11, 11, 10, 10)
_SH_CHUNK_OFF = tuple(int(x) for x in np.concatenate(([0], np.cumsum(_SH_CHUNK_BITS)[:-1])))
from itertools import combinations as _combos

_SH_TRIPLES = tuple(_combos(range(6), 3))


def simhash_near_dups(ds, max_hamming: int = 3):
    """SimHash near-dup pairs (doc_a, doc_b, hamming), hamming <= 3,
    via chunk-triple banding with per-bucket pair caps; candidates verify
    exactly on the shipped 64-bit signatures (no text access)."""
    import pandas as pd

    sh = ds.map_batches(simhash_batch, batch_format="pyarrow", **_rargs())

    def explode(batch: pa.Table) -> pa.Table:
        doc = batch.column("doc_id").to_numpy()
        h = batch.column("simhash").to_numpy().astype(np.uint64)
        n = len(doc)
        chunks = [
            (h >> np.uint64(off)) & np.uint64((1 << bits) - 1)
            for off, bits in zip(_SH_CHUNK_OFF, _SH_CHUNK_BITS)
        ]
        keys = []
        for ti, (a, b, c) in enumerate(_SH_TRIPLES):
            v = chunks[a] | (chunks[b] << np.uint64(11)) | (chunks[c] << np.uint64(22))
            keys.append((v | (np.uint64(ti) << np.uint64(33))).astype(np.int64))
        return pa.table(
            {
                "band_key": pa.array(np.concatenate(keys)),
                "doc_id": pa.array(np.tile(doc, len(_SH_TRIPLES)), type=pa.int64()),
                "simhash": pa.array(
                    np.tile(h.astype(np.int64), len(_SH_TRIPLES)), type=pa.int64()
                ),
            }
        )

    def pairs(g: pd.DataFrame) -> pd.DataFrame:
        out = {"doc_a": [], "doc_b": [], "hamming": []}
        sig_of = dict(zip(g["doc_id"].astype(int), g["simhash"].astype(int)))
        for a, b in _group_pairs(list(sig_of)):
            d = int(bin(sig_of[a] ^ sig_of[b]).count("1"))
            if d <= max_hamming:
                out["doc_a"].append(a)
                out["doc_b"].append(b)
                out["hamming"].append(d)
        return pd.DataFrame(out)

    cand = (
        sh.map_batches(explode, batch_format="pyarrow", **_rargs())
        .groupby("band_key")
        .map_groups(pairs, batch_format="pandas", **_rargs())
    )

    # a pair surfaces once per colliding band with the SAME hamming —
    # native Min aggregate dedups without a per-pair pandas frame
    from ray.data.aggregate import Min as _Min

    return cand.groupby(["doc_a", "doc_b"]).aggregate(
        _Min("hamming", alias_name="hamming")
    )


# ---------------------------------------------------------------------------
# dedup-by-url (keep latest) — the updateDocument(term, doc) analogue
# ---------------------------------------------------------------------------


class _ArgLatest:
    """Vectorized keep-latest accumulator for dedup_pages_by_url: per
    group slice, pick (max warc_ts, tie min doc_id) with one lexsort —
    accumulator is a 2-int tuple, never a pandas frame. Built lazily as an
    AggregateFnV2 subclass (ray.data.aggregate) so the groupby runs native
    per-group Arrow kernels instead of a per-key Python map_groups."""

    _ZERO = (-(1 << 62), (1 << 62))

    @staticmethod
    def make(out_col: str):
        from ray.data.aggregate import AggregateFnV2
        from ray.data.block import BlockAccessor

        zero = _ArgLatest._ZERO

        class _Agg(AggregateFnV2):
            def __init__(self):
                super().__init__(
                    out_col, zero_factory=lambda: zero, on=None, ignore_nulls=True
                )

            def aggregate_block(self, block):
                tbl = BlockAccessor.for_block(block).to_arrow()
                ts = (
                    tbl.column("warc_ts")
                    .to_numpy(zero_copy_only=False)
                    .astype("datetime64[ms]")
                    .astype(np.int64)
                )
                did = tbl.column("doc_id").to_numpy()
                if len(did) == 0:
                    return zero
                i = int(np.lexsort((did, -ts))[0])
                return (int(ts[i]), int(did[i]))

            def combine(self, cur, new):
                a = zero if cur is None else cur
                b = zero if new is None else new
                return min(a, b, key=lambda t: (-t[0], t[1]))

            def finalize(self, acc):
                acc = zero if acc is None else acc
                return int(acc[0]) if out_col == "_latest_ts_ms" else int(acc[1])

        return _Agg()


def dedup_pages_by_url(ds):
    """Exact dedup by url keeping the newest warc_ts (the reference's
    updateDocument(term, doc) delete-then-add semantics,
    index/IndexWriter.java:1771): groupby(url) → keep max warc_ts, tie →
    smallest doc_id. One hash shuffle on url (SURVEY §7.4); the per-group
    reduce is the vectorized _ArgLatest aggregate (no per-key pandas).
    Returns (doc_id, url, warc_ts) with warc_ts as timestamp[ms]."""
    agg = ds.groupby("url").aggregate(
        _ArgLatest.make("_latest_ts_ms"), _ArgLatest.make("doc_id")
    )

    def finish(b: pa.Table) -> pa.Table:
        return pa.table(
            {
                "doc_id": b.column("doc_id").cast(pa.int64()),
                "url": b.column("url"),
                "warc_ts": b.column("_latest_ts_ms").cast(pa.int64()).cast(
                    pa.timestamp("ms")
                ),
            }
        )

    return agg.map_batches(finish, batch_format="pyarrow", **_rargs())
