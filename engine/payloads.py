"""PayloadScoreQuery over the payload stream (queries/payloads module).

Subset of the reference surface (queries/payloads/PayloadScoreQuery.java):
the wrapped span query is a SpanTermQuery (one term's occurrences), the
payload function is one of Min/Max/Sum/Avg
(queries/payloads/{Min,Max,Sum,Avg}PayloadFunction.java) and
``includeSpanScore=False`` — the document's score IS the payload
function's result (PayloadScoreQuery.java:210-223 NonScoringSpanScorer
path). Occurrences without a payload are skipped and do NOT count toward
Avg's divisor (PayloadFunction.payloadsSeen semantics).

Payload values decode through the engine's 4-byte subset
(codec.payload_as_int / payload_as_float — the IntegerEncoder /
PayloadHelper.encodeFloat roles)."""

from __future__ import annotations

import numpy as np

FUNCS = ("min", "max", "sum", "avg")


def payload_term_scores(
    seg, term: str, func: str = "sum", decoder: str = "int"
) -> tuple[np.ndarray, np.ndarray]:
    """(docs, values) for one segment: per matching doc the payload
    aggregate over the term's occurrences. Docs where NO occurrence
    carries a payload score 0.0 (the reference's payloadScore default
    with payloadsSeen == 0). Vectorized: one flat VInt read + masked
    reduceat over posting boundaries."""
    from .codec import payload_as_float, payload_as_int, read_vints

    if func not in FUNCS:
        raise ValueError(f"unknown payload function {func!r}")
    ti = seg.term_info(term)
    if ti is None:
        return np.empty(0, dtype=np.int64), np.empty(0, dtype=np.float32)
    if not ti.pay_blob:
        raise ValueError(
            f"payload query needs the payload stream but term {term!r} has "
            "none (index built without payload_delimiter)"
        )
    if ti.df == 1:
        docs = np.array([ti.singleton_doc], dtype=np.int64)
        freqs = np.array([ti.ttf], dtype=np.int64)
    else:
        docs, freqs = seg.postings(term)
    total = int(freqs.sum())
    words, _ = read_vints(ti.pay_blob, total)
    if decoder == "int":
        vals, present = payload_as_int(words)
        vals = vals.astype(np.float64)
    elif decoder == "float":
        f32, present = payload_as_float(words)
        vals = f32.astype(np.float64)
    else:
        raise ValueError(f"unknown payload decoder {decoder!r}")
    starts = np.cumsum(freqs) - freqs
    seen = np.add.reduceat(present.astype(np.int64), starts)
    if func == "sum" or func == "avg":
        agg = np.add.reduceat(np.where(present, vals, 0.0), starts)
        if func == "avg":
            agg = np.where(seen > 0, agg / np.maximum(seen, 1), 0.0)
    elif func == "max":
        agg = np.maximum.reduceat(np.where(present, vals, -np.inf), starts)
    else:  # min
        agg = np.minimum.reduceat(np.where(present, vals, np.inf), starts)
    agg = np.where(seen > 0, agg, 0.0)
    return docs, agg.astype(np.float32)


def payload_term_table(
    segments: list, term: str, decoder: str = "int"
):
    """All four payload functions for one term across segments —
    (doc_id, pay_min, pay_max, pay_sum, pay_cnt) in doc order. ``pay_cnt``
    is the payloadsSeen count. Integer-decoded payloads emit exact BIGINT
    min/max/sum (small ints are exact in the float32 accumulation up to
    2^24 — asserted by the caller's oracle)."""
    import pyarrow as pa

    from .codec import payload_as_int, read_vints

    out = {"doc_id": [], "pay_min": [], "pay_max": [], "pay_sum": [], "pay_cnt": []}
    for seg in segments:
        ti = seg.term_info(term)
        if ti is None or not ti.pay_blob:
            continue
        if ti.df == 1:
            docs = np.array([ti.singleton_doc], dtype=np.int64)
            freqs = np.array([ti.ttf], dtype=np.int64)
        else:
            docs, freqs = seg.postings(term)
        words, _ = read_vints(ti.pay_blob, int(freqs.sum()))
        vals, present = payload_as_int(words)
        starts = np.cumsum(freqs) - freqs
        seen = np.add.reduceat(present.astype(np.int64), starts)
        sums = np.add.reduceat(np.where(present, vals, 0), starts)
        mins = np.minimum.reduceat(
            np.where(present, vals, np.iinfo(np.int64).max), starts
        )
        maxs = np.maximum.reduceat(
            np.where(present, vals, np.iinfo(np.int64).min), starts
        )
        keep = seen > 0
        out["doc_id"].extend(docs[keep].tolist())
        out["pay_min"].extend(mins[keep].tolist())
        out["pay_max"].extend(maxs[keep].tolist())
        out["pay_sum"].extend(sums[keep].tolist())
        out["pay_cnt"].extend(seen[keep].tolist())
    order = np.argsort(np.array(out["doc_id"], dtype=np.int64), kind="stable")
    return pa.table(
        {
            k: pa.array(np.array(v, dtype=np.int64)[order], type=pa.int64())
            for k, v in out.items()
        }
    )
