"""Interval queries — the lucene/queries/intervals module (the 8.x
minimal-interval algebra of Clarke/Cormack as implemented by
IntervalQuery / Intervals.ordered / Intervals.unordered /
Intervals.maxgaps / Intervals.maxwidth).

Semantics implemented (reference files cited):

- An ordered interval of clauses t1..tk is a window [s, e] formed by one
  occurrence per clause in strictly increasing, non-overlapping order;
  the iterator emits only MINIMAL windows — windows that do not contain
  another candidate window (OrderedIntervalsSource.java:133-166; the
  minimizing loop re-advances the head until the next candidate is no
  longer contained). For unit-width term clauses this reduces to: for
  each head position a, the greedy chain end e(a); keep (a, e(a)) iff
  the next head position's chain ends strictly later (the last head
  achieving each distinct end).
- An unordered interval is a window containing one occurrence of every
  clause in any order, again minimal (UnorderedIntervalsSource via
  ConjunctionIntervalsSource minimization). For two unit terms this is
  exactly the set of ADJACENT hetero-type pairs in the merged position
  sequence — the DuckDB oracle's formulation.
- gaps = (e - s + 1) - sum(child widths) (OrderedIntervalsSource:156-159);
  Intervals.maxgaps / Intervals.maxwidth filter the emitted intervals
  without re-minimizing (FilteredIntervalsSource.java).

Evaluation is per doc over the prox stream's position arrays (the same
per-segment shape as engine/spans.py); pipelines fan it across the
index's segment readers.
"""

from __future__ import annotations

import numpy as np

__all__ = [
    "ordered_intervals",
    "unordered_intervals",
    "filter_intervals",
    "doc_interval_counts",
]


def ordered_intervals(pos_lists: list[np.ndarray]) -> np.ndarray:
    """Minimal ordered intervals (start, end, gaps) for unit-width term
    clauses; pos_lists[i] = sorted positions of clause i in one doc."""
    k = len(pos_lists)
    if any(len(p) == 0 for p in pos_lists):
        return np.empty((0, 3), dtype=np.int64)
    heads = pos_lists[0]
    ptr = [0] * k
    chains: list[tuple[int, int]] = []
    for a in heads.tolist():
        prev = a
        dead = False
        for i in range(1, k):
            arr = pos_lists[i]
            j = ptr[i]
            n = len(arr)
            while j < n and arr[j] <= prev:
                j += 1
            ptr[i] = j
            if j >= n:
                dead = True
                break
            prev = int(arr[j])
        if dead:
            break
        chains.append((a, prev))
    if not chains:
        return np.empty((0, 3), dtype=np.int64)
    # keep the LAST head achieving each distinct end (minimality)
    out = []
    for idx, (s, e) in enumerate(chains):
        if idx + 1 < len(chains) and chains[idx + 1][1] == e:
            continue
        out.append((s, e, (e - s + 1) - k))
    return np.array(out, dtype=np.int64).reshape(-1, 3)


def unordered_intervals(pos_lists: list[np.ndarray]) -> np.ndarray:
    """Minimal unordered intervals (start, end, gaps) for unit-width term
    clauses — the sliding one-pointer-per-clause window, emitting
    candidates whose successor is not contained in them."""
    k = len(pos_lists)
    if any(len(p) == 0 for p in pos_lists):
        return np.empty((0, 3), dtype=np.int64)
    ptr = [0] * k
    cur = [int(pos_lists[i][0]) for i in range(k)]
    cands: list[tuple[int, int]] = []
    while True:
        s, e = min(cur), max(cur)
        cands.append((s, e))
        i = int(np.argmin(cur))
        ptr[i] += 1
        if ptr[i] >= len(pos_lists[i]):
            break
        cur[i] = int(pos_lists[i][ptr[i]])
    out = []
    for idx, (s, e) in enumerate(cands):
        if idx + 1 < len(cands) and cands[idx + 1][1] <= e:
            continue  # successor contained -> this window is not minimal
        out.append((s, e, (e - s + 1) - k))
    return np.array(out, dtype=np.int64).reshape(-1, 3)


def filter_intervals(
    iv: np.ndarray,
    max_gaps: int | None = None,
    max_width: int | None = None,
) -> np.ndarray:
    """Intervals.maxgaps / Intervals.maxwidth (FilteredIntervalsSource):
    drop emitted intervals, never re-minimize."""
    if len(iv) == 0:
        return iv
    keep = np.ones(len(iv), dtype=bool)
    if max_gaps is not None:
        keep &= iv[:, 2] <= max_gaps
    if max_width is not None:
        keep &= (iv[:, 1] - iv[:, 0] + 1) <= max_width
    return iv[keep]


def doc_interval_counts(
    seg,
    terms: tuple[str, ...],
    ordered: bool = True,
    max_gaps: int | None = None,
    max_width: int | None = None,
) -> tuple[np.ndarray, np.ndarray]:
    """(docs, interval counts) over one segment for an ordered/unordered
    interval query of term clauses with optional filters."""
    term_docs, term_pos = [], []
    for t in terms:
        ti = seg.term_info(t)
        if ti is None:
            return np.empty(0, dtype=np.int64), np.empty(0, dtype=np.int64)
        if not ti.pos_blob:
            raise ValueError(f"interval query needs positions for {t!r}")
        docs, _ = seg.postings(t)
        term_docs.append(docs)
        term_pos.append(seg.positions(t))
    cand = term_docs[0]
    for d in term_docs[1:]:
        cand = np.intersect1d(cand, d, assume_unique=True)
    if len(cand) == 0:
        return np.empty(0, dtype=np.int64), np.empty(0, dtype=np.int64)
    idx = [np.searchsorted(term_docs[i], cand) for i in range(len(terms))]
    fn = ordered_intervals if ordered else unordered_intervals
    out_docs, out_counts = [], []
    for ci, doc in enumerate(cand.tolist()):
        iv = fn([term_pos[i][idx[i][ci]] for i in range(len(terms))])
        iv = filter_intervals(iv, max_gaps, max_width)
        if len(iv):
            out_docs.append(doc)
            out_counts.append(len(iv))
    return (
        np.array(out_docs, dtype=np.int64),
        np.array(out_counts, dtype=np.int64),
    )
