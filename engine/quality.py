"""Relevance-quality evaluation — MAP / P@n over topics + judgments.

The reference's quality harness shape (benchmark/quality/QualityBenchmark.java:41,
TrecJudge.java:32, QualityStats.java): run each topic through the searcher,
compare the ranked docIDs against a judgment set, report precision@n and
mean average precision. Judgments here are deterministic fixtures (e.g.
freq-based relevance over the synthetic corpus), mirroring how the
reference consumes TREC qrels — golden *relevance*, not golden scores.
"""

from __future__ import annotations

import numpy as np


def precision_at_k(ranked: np.ndarray, relevant: set[int], k: int) -> float:
    top = ranked[:k]
    if len(top) == 0:
        return 0.0
    return sum(1 for d in top.tolist() if d in relevant) / k


def average_precision(ranked: np.ndarray, relevant: set[int]) -> float:
    """AP over the returned ranking (QualityStats recall-point average)."""
    if not relevant:
        return 0.0
    hits = 0
    acc = 0.0
    for i, d in enumerate(ranked.tolist()):
        if d in relevant:
            hits += 1
            acc += hits / (i + 1)
    return acc / len(relevant)


def freq_qrels(searcher, terms: list[str], min_freq: int = 2) -> dict[str, set[int]]:
    """Deterministic judgment sets from the index itself: for a single-term
    topic, 'relevant' = docs where the term occurs >= min_freq times (a
    reproducible stand-in for TREC qrels)."""
    out: dict[str, set[int]] = {}
    for t in terms:
        rel: set[int] = set()
        for seg in searcher.segments:
            docs, freqs = seg.postings(t)
            rel.update(docs[freqs >= min_freq].tolist())
        out[t] = rel
    return out


def evaluate(
    searcher,
    topics: list[tuple[str, str]],
    qrels: dict[str, set[int]],
    k: int = 10,
    depth: int = 1000,
) -> dict:
    """Run topics, judge, aggregate (the QualityBenchmark.execute loop).

    ``topics``: (topic_id, query string); ``qrels``: topic_id → relevant
    docIDs; ``depth`` = retrieval depth for AP (trec_eval-style MAP@depth —
    recall-limited when judgment sets exceed it). Returns
    {"map", "p_at_k", "per_topic"}."""
    per_topic = []
    ap_sum = 0.0
    p_sum = 0.0
    for tid, query in topics:
        docs, _scores = searcher.search(query, max(k, depth))
        rel = qrels.get(tid, set())
        ap = average_precision(docs, rel)
        p = precision_at_k(docs, rel, k)
        ap_sum += ap
        p_sum += p
        per_topic.append({"topic": tid, "ap": round(ap, 4), f"p_at_{k}": round(p, 4)})
    n = max(len(topics), 1)
    return {
        "map": round(ap_sum / n, 4),
        f"p_at_{k}": round(p_sum / n, 4),
        "per_topic": per_topic,
    }
