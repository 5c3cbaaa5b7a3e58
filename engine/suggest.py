"""Spell-correction suggester — the DirectSpellChecker role
(lucene/suggest/src/java/org/apache/lucene/search/spell/
DirectSpellChecker.java:49-120: enumerate dictionary terms within
maxEdits of the query word, rank by distance then docFreq).

Ray-Data shape: the dictionary lives in the merged index's shard term
files, so candidates are computed WHERE the dictionary lives — a
Dataset over the shard files pruned to (term, df), one map_batches
computing banded Levenshtein against the broadcast word list with a
per-batch partial top-n, then a driver merge over the tiny
(n_blocks × n_words × top_n) partials (the brute-force-ANN reduce
pattern). Nothing reads postings, norms, or more than two columns.

Distance = classic unit-cost Levenshtein (Wagner-Fischer with a
±max_edits band and row-min early abandon) — NOT the reference's
transposition-aware LuceneLevenshteinDistance (spell/
LuceneLevenshteinDistance.java:33), a documented deviation chosen so
the driver oracle (DuckDB ``levenshtein``) checks the operator
bit-for-bit. The enumeration contract (0 < dist <= max_edits, the
word itself excluded, rank by dist asc / df desc / term asc) matches
DirectSpellChecker.suggestSimilar ordering semantics.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from .rayenv import remote_args as _rargs


def levenshtein_banded(a: str, b: str, max_d: int) -> int:
    """Unit-cost edit distance, computed only inside the |i-j| <= max_d
    band; returns max_d + 1 as soon as the true distance must exceed
    max_d. Identical to full Wagner-Fischer whenever the result
    <= max_d (band theorem: cells outside the band are >= |i-j| > max_d
    and can never re-enter a <=max_d path)."""
    la, lb = len(a), len(b)
    if abs(la - lb) > max_d:
        return max_d + 1
    if la == 0:
        return lb
    if lb == 0:
        return la
    big = max_d + 1
    prev = [min(j, big) for j in range(lb + 1)]
    for i in range(1, la + 1):
        cur = [big] * (lb + 1)
        cur[0] = i if i <= max_d else big
        lo = max(1, i - max_d)
        hi = min(lb, i + max_d)
        ca = a[i - 1]
        row_min = cur[0]
        for j in range(lo, hi + 1):
            cost = 0 if ca == b[j - 1] else 1
            v = prev[j - 1] + cost
            if prev[j] + 1 < v:
                v = prev[j] + 1
            if cur[j - 1] + 1 < v:
                v = cur[j - 1] + 1
            if v > big:
                v = big
            cur[j] = v
            if v < row_min:
                row_min = v
        if row_min > max_d:
            return big
        prev = cur
    return prev[lb] if prev[lb] <= max_d else big


def spell_suggest(
    merge_manifest: dict,
    words: list[str],
    max_edits: int = 2,
    top_n: int = 5,
):
    """(word, rank, suggestion, dist, df) for each query word: the top_n
    dictionary terms with 0 < levenshtein <= max_edits, ranked by
    (dist asc, df desc, term asc). Returns a pyarrow Table (output is
    <= len(words) * top_n rows — always driver-small)."""
    import ray
    import ray.data

    shard_paths = [s["path"] for s in merge_manifest["shards"]]
    words_l = [w.lower() for w in words]
    words_ref = ray.put(words_l)

    def _cand(batch: pa.Table) -> pa.Table:
        wl = ray.get(words_ref)
        terms = batch.column("term").to_pylist()
        dfs = batch.column("df").to_numpy()
        tlens = np.fromiter((len(t) for t in terms), dtype=np.int64, count=len(terms))
        out = {"word": [], "suggestion": [], "dist": [], "df": []}
        for w in wl:
            # length prefilter: |len(t) - len(w)| <= max_edits is a lower
            # bound on the distance (vectorized, skips most of the batch)
            cand_idx = np.flatnonzero(np.abs(tlens - len(w)) <= max_edits)
            scored = []
            for i in cand_idx:
                t = terms[i]
                if t == w:
                    continue
                d = levenshtein_banded(w, t, max_edits)
                if d <= max_edits:
                    scored.append((d, -int(dfs[i]), t))
            scored.sort()
            for d, ndf, t in scored[:top_n]:  # per-batch partial top-n
                out["word"].append(w)
                out["suggestion"].append(t)
                out["dist"].append(d)
                out["df"].append(-ndf)
        return pa.table(
            {
                "word": pa.array(out["word"], type=pa.string()),
                "suggestion": pa.array(out["suggestion"], type=pa.string()),
                "dist": pa.array(out["dist"], type=pa.int64()),
                "df": pa.array(out["df"], type=pa.int64()),
            }
        )

    partials = (
        ray.data.read_parquet(shard_paths, columns=["term", "df"])
        .map_batches(_cand, batch_format="pyarrow", **_rargs())
        .take_all()
    )  # <= n_blocks * n_words * top_n rows — the small reduce side

    by_word: dict[str, list] = {w: [] for w in words_l}
    for r in partials:
        by_word[r["word"]].append((int(r["dist"]), -int(r["df"]), r["suggestion"]))
    out = {"word": [], "rank": [], "suggestion": [], "dist": [], "df": []}
    for w in words_l:
        scored = sorted(by_word[w])[:top_n]
        for rank, (d, ndf, t) in enumerate(scored):
            out["word"].append(w)
            out["rank"].append(rank)
            out["suggestion"].append(t)
            out["dist"].append(d)
            out["df"].append(-ndf)
    return pa.table(
        {
            "word": pa.array(out["word"], type=pa.string()),
            "rank": pa.array(out["rank"], type=pa.int64()),
            "suggestion": pa.array(out["suggestion"], type=pa.string()),
            "dist": pa.array(out["dist"], type=pa.int64()),
            "df": pa.array(out["df"], type=pa.int64()),
        }
    )


def complete_prefix(merge_manifest: dict, prefix: str, top_n: int = 10) -> pa.Table:
    """Prefix completion ranked by weight — the FSTCompletion /
    AnalyzingInfixSuggester role (suggest/fst/FSTCompletion.java:34-60,
    weight-bucketed completions; suggest/analyzing/AnalyzingInfixSuggester
    lookup-by-prefix): dictionary terms starting with ``prefix`` ranked
    by (df desc, term asc), top n. Served by a pruned (term, df) read
    with a term-range filter pushdown — parquet row-group term stats play
    the FST-arc role, so only shards whose term range overlaps the prefix
    are touched."""
    import pyarrow.dataset as pads

    prefix = prefix.lower()
    shard_paths = [s["path"] for s in merge_manifest["shards"]]
    tbl = pads.dataset(shard_paths).to_table(
        columns=["term", "df"],
        filter=(pads.field("term") >= prefix)
        & (pads.field("term") <= prefix + "\U0010ffff"),
    )
    terms = tbl.column("term").to_pylist()
    dfs = tbl.column("df").to_pylist()
    scored = sorted(
        ((-int(df), t) for t, df in zip(terms, dfs) if t.startswith(prefix))
    )[:top_n]
    return pa.table(
        {
            "rank": pa.array(range(len(scored)), type=pa.int64()),
            "suggestion": pa.array([t for _, t in scored], type=pa.string()),
            "df": pa.array([-ndf for ndf, _ in scored], type=pa.int64()),
        }
    )


def word_breaks(
    merge_manifest: dict, words: list[str], top_n: int = 5
) -> pa.Table:
    """Compound-word break suggestions — the WordBreakSpellChecker role
    (suggest/spell/WordBreakSpellChecker.java:90-121 suggestWordBreaks,
    single break = maxChanges 1): every split position whose left AND
    right halves are dictionary terms, ranked per word by the default
    NUM_CHANGES_THEN_MAX_FREQUENCY comparator (:100, :450 — all
    candidates here have one change, so max(df_left, df_right) desc;
    tie-break = split position asc, documented). df for the candidate
    substrings comes from ONE term-pushdown pruned dictionary read (the
    needed term set is tiny: sum of word lengths), nothing scans."""
    import pyarrow.dataset as pads

    words_l = [w.lower() for w in words]
    need = sorted(
        {w[:i] for w in words_l for i in range(1, len(w))}
        | {w[i:] for w in words_l for i in range(1, len(w))}
    )
    if not need:
        need = [""]
    shard_paths = [s["path"] for s in merge_manifest["shards"]]
    tbl = pads.dataset(shard_paths).to_table(
        columns=["term", "df"], filter=pads.field("term").isin(need)
    )
    df_of = dict(
        zip(tbl.column("term").to_pylist(), (int(x) for x in tbl.column("df").to_pylist()))
    )
    out = {"word": [], "rank": [], "left_part": [], "right_part": [],
           "df_left": [], "df_right": []}
    for w in words_l:
        cands = []
        for i in range(1, len(w)):
            dl, dr = df_of.get(w[:i]), df_of.get(w[i:])
            if dl and dr:
                cands.append((-max(dl, dr), i, w[:i], w[i:], dl, dr))
        cands.sort()
        for rank, (_, i, lp, rp, dl, dr) in enumerate(cands[:top_n]):
            out["word"].append(w)
            out["rank"].append(rank)
            out["left_part"].append(lp)
            out["right_part"].append(rp)
            out["df_left"].append(dl)
            out["df_right"].append(dr)
    return pa.table(
        {
            "word": pa.array(out["word"], type=pa.string()),
            "rank": pa.array(out["rank"], type=pa.int64()),
            "left_part": pa.array(out["left_part"], type=pa.string()),
            "right_part": pa.array(out["right_part"], type=pa.string()),
            "df_left": pa.array(out["df_left"], type=pa.int64()),
            "df_right": pa.array(out["df_right"], type=pa.int64()),
        }
    )
