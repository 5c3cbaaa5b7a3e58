"""Block-max WAND / block-max conjunction top-k evaluation.

Own implementation of the WAND (Broder et al.) + block-max (Ding & Suel)
algorithm family with the *soundness devices of the reference* so pruning
provably never changes the top-k:

- integer-scaled score bounds: max scores are scaled to longs with ceil,
  min-competitive scores with floor (WANDScorer.java:47-105 scalingFactor /
  scaleMaxScore / scaleMinScore) — so float rounding can never prune a
  competitive doc;
- the collector only starts pruning after ``total_hits_threshold`` hits
  (IndexSearcher.java:102 default 1000) and uses nextUp(bottom) as the min
  competitive score (TopScoreDocCollector.java:320-339); docs scoring
  exactly the bottom are rejected because collection is in docID order and
  HitQueue favors lower docIDs (TopScoreDocCollector collect() comment);
- per-block max scores come from the competitive impact frontiers stored in
  the term table (ImpactsDISI/MaxScoreCache role: ImpactsDISI.java:95-132,
  MaxScoreCache.java:61-124).

Structure differs from the reference deliberately (no DisiPriorityQueue
3-set machinery): a sorted-by-doc iterator list with pivot selection on
global scaled maxes and block-max refinement at the pivot. Any sound bound
yields rank-identical results because scores themselves are computed with
identical float32 arithmetic; tests assert pruned == exhaustive
(CheckHits.java pruned-vs-exhaustive model).
"""

from __future__ import annotations

import math

import numpy as np

from .bm25 import TermScorerParams
from .codec import decode_block
from .segment import Segment, TermInfo

NO_MORE_DOCS = 1 << 62
TOTAL_HITS_THRESHOLD = 1000  # IndexSearcher.java:102
_FLT_MIN_SUB = np.float32(1.4e-45)  # Float.MIN_VALUE (smallest subnormal)
_FLT_MAX = np.float32(3.4028235e38)


def scaling_factor(f: float) -> int:
    """15 - getExponent(nextDown((double) f)) — WANDScorer.java:50-68."""
    f = float(f)
    if f < 0:
        raise ValueError("Scores must be positive or null")
    if f == 0:
        return scaling_factor(float(_FLT_MIN_SUB)) - 1
    if math.isinf(f):
        return scaling_factor(float(_FLT_MAX)) + 1
    d = np.nextafter(np.float64(f), -np.inf)
    # Math.getExponent(double) == frexp exponent - 1
    _, e = math.frexp(float(d))
    return 15 - (e - 1)


def scale_max_score(max_score: float, sf: int) -> int:
    """ceil(scalb(maxScore, sf)), saturating at 2^32-1 — WANDScorer.java:75-94."""
    scaled = math.ldexp(float(max_score), sf)
    if scaled > (1 << 16):
        return (1 << 32) - 1
    return int(math.ceil(scaled))


def scale_min_score(min_score: float, sf: int) -> int:
    """floor(scalb(minScore, sf)) — WANDScorer.java:100-105."""
    return int(math.floor(math.ldexp(float(min_score), sf)))


class TermIterator:
    """Postings iterator over one term in one segment with lazy block decode
    and per-block max-score bounds (TermScorer + ImpactsDISI analogue)."""

    __slots__ = (
        "params",
        "df",
        "blob",
        "last_docs",
        "offsets",
        "block_max_f32",
        "scaled_global_max",
        "scaled_block_max",
        "seg",
        "_block",
        "_docs",
        "_freqs",
        "_pos",
        "doc",
    )

    def __init__(self, seg: Segment, ti: TermInfo, params: TermScorerParams):
        self.params = params
        self.df = ti.df
        self.seg = seg
        if ti.df == 1:
            self.blob = b""
            self.last_docs = np.array([ti.singleton_doc], dtype=np.int64)
            self.offsets = np.array([0], dtype=np.int64)
            self._docs = np.array([ti.singleton_doc], dtype=np.int64)
            self._freqs = np.array([ti.ttf], dtype=np.int64)
        else:
            self.blob = ti.blob
            self.last_docs = ti.last_docs
            self.offsets = ti.offsets
            self._docs = None
            self._freqs = None
        # vectorized per-block float32 max from impact frontiers
        scores = params.score(ti.imp_freq, ti.imp_norm.astype(np.uint8))
        n_blocks = len(self.last_docs)
        bm = np.empty(n_blocks, dtype=np.float32)
        for b in range(n_blocks):
            s, e = ti.imp_start[b], ti.imp_start[b + 1]
            bm[b] = scores[s:e].max() if e > s else np.float32(0)
        self.block_max_f32 = bm
        self.scaled_global_max = 0  # set by set_scaling
        self.scaled_block_max = None
        self._block = -1
        self._pos = -1
        self.doc = -1

    @property
    def global_max_f32(self) -> np.float32:
        return np.float32(self.block_max_f32.max()) if len(self.block_max_f32) else np.float32(0)

    def set_scaling(self, sf: int) -> None:
        scaled = np.ldexp(self.block_max_f32.astype(np.float64), sf)
        self.scaled_block_max = np.where(
            scaled > (1 << 16), (1 << 32) - 1, np.ceil(scaled)
        ).astype(np.int64)
        self.scaled_global_max = int(self.scaled_block_max.max()) if len(scaled) else 0

    # -- iteration ---------------------------------------------------------

    def _load_block(self, b: int) -> None:
        if b >= len(self.last_docs):
            self.doc = NO_MORE_DOCS
            return
        if self.df > 1:
            prev = int(self.last_docs[b - 1]) if b > 0 else -1
            self._docs, self._freqs = decode_block(self.blob, self.offsets, b, self.df, prev)
        self._block = b
        self._pos = 0
        self.doc = int(self._docs[0])

    def start(self) -> int:
        self._load_block(0)
        return self.doc

    def next(self) -> int:
        if self.doc == NO_MORE_DOCS:
            return self.doc
        self._pos += 1
        if self._pos < len(self._docs):
            self.doc = int(self._docs[self._pos])
        else:
            self._load_block(self._block + 1)
        return self.doc

    def advance(self, target: int) -> int:
        if self.doc >= target:
            return self.doc
        b = int(np.searchsorted(self.last_docs, target))
        if b >= len(self.last_docs):
            self.doc = NO_MORE_DOCS
            return self.doc
        if b != self._block or self._docs is None:
            self._load_block(b)
        p = int(np.searchsorted(self._docs, target))
        if p >= len(self._docs):  # can't happen: last_docs[b] >= target
            self._load_block(b + 1)
            return self.doc
        self._pos = p
        self.doc = int(self._docs[p])
        return self.doc

    def block_index_of(self, target: int) -> int:
        """advanceShallow: block containing the first doc >= target."""
        return int(np.searchsorted(self.last_docs, target))

    def scaled_block_max_at(self, target: int) -> int:
        b = self.block_index_of(target)
        if b >= len(self.last_docs):
            return 0
        return int(self.scaled_block_max[b])

    def block_upto(self, target: int) -> int:
        """Last doc of the block containing target (bound validity horizon)."""
        b = self.block_index_of(target)
        if b >= len(self.last_docs):
            return NO_MORE_DOCS
        return int(self.last_docs[b])

    def freq(self) -> int:
        return int(self._freqs[self._pos])

    def score_current(self) -> np.float32:
        f = np.array([self._freqs[self._pos]], dtype=np.int64)
        n = self.seg.norm_of(np.array([self.doc], dtype=np.int64))
        return self.params.score(f, n)[0]


class TopKCollector:
    """TopScoreDocCollector analogue: k-heap, (score desc, docID asc) via
    in-doc-order insertion `score > bottom`, nextUp(bottom) min-competitive
    after the total-hits threshold."""

    def __init__(self, k: int, threshold: int = TOTAL_HITS_THRESHOLD):
        import heapq

        self._heapq = heapq
        self.k = k
        self.threshold = threshold
        self.heap: list[tuple[float, int]] = []  # (score, -doc): min = bottom
        self.total_hits = 0

    def collect(self, doc: int, score: np.float32) -> None:
        self.total_hits += 1
        h = self.heap
        if len(h) < self.k:
            self._heapq.heappush(h, (float(score), -doc))
        elif float(score) > h[0][0]:
            self._heapq.heapreplace(h, (float(score), -doc))

    def min_competitive_f32(self) -> np.float32:
        """nextUp(bottom) once the heap is full and threshold reached, else 0."""
        if len(self.heap) >= self.k and self.total_hits >= self.threshold and self.k > 0:
            bottom = np.float32(self.heap[0][0])
            return np.nextafter(bottom, np.float32(np.inf), dtype=np.float32)
        return np.float32(0.0)

    def results(self) -> tuple[np.ndarray, np.ndarray]:
        items = sorted(self.heap, key=lambda t: (-t[0], -t[1]))
        docs = np.array([-d for _, d in items], dtype=np.int64)
        scores = np.array([s for s, _ in items], dtype=np.float32)
        return docs, scores


def _combined_score(iters_at_doc: list[TermIterator]) -> np.float32:
    """Sum per-term float32 scores in float64, cast to float32
    (WANDScorer.score / DisjunctionSumScorer double accumulation)."""
    acc = 0.0
    for it in iters_at_doc:
        acc += float(it.score_current())
    return np.float32(acc)


def setup_scaling(iters: list[TermIterator]) -> int:
    """Shared scaling factor: min over scorers of scalingFactor(globalMax),
    ignoring 0/inf (WANDScorer.java:141-156)."""
    sf = None
    for it in iters:
        m = float(it.global_max_f32)
        if m != 0 and math.isfinite(m):
            s = scaling_factor(m)
            sf = s if sf is None else min(sf, s)
    sf = 0 if sf is None else sf
    for it in iters:
        it.set_scaling(sf)
    return sf


def _single_term_block_topk(it: TermIterator, collector: TopKCollector, sf: int) -> None:
    """Single-iterator fast path: score whole blocks vectorized, skip blocks
    whose scaled max is below the min competitive score (TermScorer +
    ImpactsDISI with batch scoring — same results, ~100x less Python)."""
    n_blocks = len(it.last_docs)
    b = 0
    while b < n_blocks:
        min_c_f32 = collector.min_competitive_f32()
        if min_c_f32 > 0:
            min_c = scale_min_score(min_c_f32, sf)
            while b < n_blocks and it.scaled_block_max[b] < min_c:
                b += 1  # advanceShallow past non-competitive blocks
            if b >= n_blocks:
                return
        docs, freqs = (
            (it._docs, it._freqs)
            if it.df == 1
            else decode_block(it.blob, it.offsets, b, it.df, int(it.last_docs[b - 1]) if b else -1)
        )
        scores = it.params.score(freqs, it.seg.norm_of(docs))
        h = collector.heap
        if len(h) >= collector.k:
            bottom = h[0][0]
            cand = np.flatnonzero(scores > np.float32(bottom))
            collector.total_hits += len(docs)
            for i in cand.tolist():
                s = float(scores[i])
                if s > h[0][0]:
                    collector._heapq.heapreplace(h, (s, -int(docs[i])))
        else:
            for i in range(len(docs)):
                collector.collect(int(docs[i]), scores[i])
        b += 1


def wand_or_topk(
    iters: list[TermIterator],
    k: int,
    threshold: int = TOTAL_HITS_THRESHOLD,
    collector: TopKCollector | None = None,
) -> TopKCollector:
    """Pure-disjunction block-max WAND top-k over one segment."""
    collector = collector or TopKCollector(k, threshold)
    if not iters or k == 0:
        return collector
    sf = setup_scaling(iters)
    if len(iters) == 1:
        it = iters[0]
        it.start()
        if it.doc != NO_MORE_DOCS:
            _single_term_block_topk(it, collector, sf)
        return collector
    for it in iters:
        it.start()
    active = [it for it in iters if it.doc != NO_MORE_DOCS]
    while active:
        active.sort(key=lambda it: it.doc)
        min_c_f32 = collector.min_competitive_f32()
        min_c = scale_min_score(min_c_f32, sf) if min_c_f32 > 0 else 0
        # pivot selection on global scaled maxes
        acc = 0
        pivot = -1
        for i, it in enumerate(active):
            acc += it.scaled_global_max
            if acc >= min_c:
                pivot = i
                break
        if pivot == -1:
            break  # no combination can compete anymore
        pivot_doc = active[pivot].doc
        if active[0].doc == pivot_doc:
            # all iterators at pivot_doc are contiguous from index 0
            matching = [it for it in active if it.doc == pivot_doc]
            if min_c > 0:
                bm = sum(it.scaled_block_max_at(pivot_doc) for it in matching)
            else:
                bm = 1
            if min_c == 0 or bm >= min_c:
                score = _combined_score(matching)
                collector.collect(pivot_doc, score)
                for it in matching:
                    it.next()
            else:
                # block-max says not competitive: skip to the first doc where
                # bounds can change (end of the tightest block, or the next
                # doc of a non-matching iterator)
                up = min(it.block_upto(pivot_doc) for it in matching)
                nxt = min(
                    (it.doc for it in active if it.doc > pivot_doc),
                    default=NO_MORE_DOCS,
                )
                target = min(up + 1, nxt)
                for it in matching:
                    it.advance(target)
        else:
            for it in active:
                if it.doc < pivot_doc:
                    it.advance(pivot_doc)
                else:
                    break
        active = [it for it in active if it.doc != NO_MORE_DOCS]
    return collector


def conjunction_topk(
    musts: list[TermIterator],
    shoulds: list[TermIterator],
    k: int,
    threshold: int = TOTAL_HITS_THRESHOLD,
    excludes: list[TermIterator] | None = None,
    collector: TopKCollector | None = None,
) -> TopKCollector:
    """Block-max conjunction (+ optional should clauses, + must_not
    exclusions): BlockMaxConjunctionScorer / BooleanWeight shape."""
    collector = collector or TopKCollector(k, threshold)
    if not musts or k == 0:
        return collector
    all_iters = musts + shoulds
    sf = setup_scaling(all_iters)
    for it in all_iters:
        it.start()
    excludes = excludes or []
    for it in excludes:
        it.start()
    if any(it.doc == NO_MORE_DOCS for it in musts):
        return collector
    lead = min(musts, key=lambda it: it.df)  # rarest drives (scorers by cost)
    doc = lead.doc
    while doc != NO_MORE_DOCS:
        # align all musts on doc (galloping intersect)
        aligned = True
        for it in musts:
            d = it.advance(doc)
            if d != doc:
                doc = d
                aligned = False
                break
        if not aligned:
            if doc == NO_MORE_DOCS:
                break
            continue
        excluded = False
        for it in excludes:
            if it.doc < doc:
                it.advance(doc)
            if it.doc == doc:
                excluded = True
                break
        if not excluded:
            min_c_f32 = collector.min_competitive_f32()
            min_c = scale_min_score(min_c_f32, sf) if min_c_f32 > 0 else 0
            competitive = True
            if min_c > 0:
                bm = sum(it.scaled_block_max_at(doc) for it in musts)
                bm += sum(
                    it.scaled_block_max_at(doc)
                    for it in shoulds
                    if it.doc != NO_MORE_DOCS
                )
                competitive = bm >= min_c
            if competitive:
                at_doc = list(musts)
                for it in shoulds:
                    if it.doc < doc:
                        it.advance(doc)
                    if it.doc == doc:
                        at_doc.append(it)
                collector.collect(doc, _combined_score(at_doc))
        doc = lead.advance(doc + 1)
    return collector
