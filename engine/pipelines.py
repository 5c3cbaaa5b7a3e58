"""End-to-end pipelines + per-sf_dir index cache for the driver contract.

``get_index(sf_dir)`` materializes the full flagship chain once per corpus:

    documents.parquet → pages fixture (html rendered, shared extractor)
    → write pages parquet (4 files = 4+ input partitions)
    → build_index: read_parquet(doc_id, html) → extract → SPIMI invert
    → merge_by_term: salted groupby-term shuffle → merged index

and caches the result under /tmp keyed by the corpus row count, so every
driver query entry (term stats, norms, BM25 search, ...) reuses one build.
The index-derived queries are thereby *oracle-checked end-to-end*: DuckDB
recomputes df/ttf/token counts from raw documents.text while the engine
answers from its merged inverted index.
"""

from __future__ import annotations

import os

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

CACHE_ROOT = "/tmp/rayfts-cache"

# fixed reference query set over the documents vocabulary (mix per
# FIXTURES.md §2: single terms high/mid df, OR disjunctions, AND
# conjunction, +must mixed, no-match)
REFERENCE_QUERIES: list[tuple[int, str, int]] = [
    (0, "data", 10),
    (1, "the", 10),
    (2, "join merge", 10),
    (3, "spark stream window", 10),
    (4, "query AND filter", 10),
    (5, "+sort batch", 10),
    (6, "customer", 100),
    (7, "data -join", 10),
    (8, "zzznomatch", 10),
    (9, "table scan hash group row", 25),
    (10, "quer* filt*", 10),  # PrefixQuery expansion
    (11, "* -data", 5),  # MatchAll with exclusion
]


def _cache_dir(sf_dir: str, n_rows: int, variant: str = "") -> str:
    tag = os.path.basename(os.path.normpath(sf_dir)) or "sf"
    # -mf5: -mf4 (multi-field + off_blob + docvalues sidecar + pages
    # n_chars) + the pay_blob terms column (payload stream support)
    return os.path.join(CACHE_ROOT, f"{tag}-{n_rows}-mf5{variant}")


def get_index(
    sf_dir: str, partition_docs: int = 2048, index_offsets: bool = False
) -> dict:
    """Build (or reuse) the full index for a corpus dir. Returns
    {"index_dir", "build_manifest", "merge_manifest"}. ``index_offsets``
    builds a separate variant with the offsets stream in the postings
    (IndexOptions ..._AND_OFFSETS) for the offsets highlighter."""
    from .build import build_index
    from .checkpoint import load_manifest, load_merge_manifest
    from .fixtures import pages_from_documents, write_pages
    from .merge import merge_by_term

    n_rows = pq.read_metadata(os.path.join(sf_dir, "documents.parquet")).num_rows
    root = _cache_dir(sf_dir, n_rows, "-off" if index_offsets else "")
    pages_dir = os.path.join(
        _cache_dir(sf_dir, n_rows), "pages"
    )  # pages are layout-independent: share across variants
    index_dir = os.path.join(root, "index")
    os.makedirs(root, exist_ok=True)

    build_manifest = load_manifest(index_dir)
    if build_manifest is None:
        if not os.path.exists(os.path.join(pages_dir, "pages-00000.parquet")):
            write_pages(pages_from_documents(sf_dir), pages_dir, n_files=4)
        build_manifest = build_index(
            pages_dir,
            index_dir,
            partition_docs=partition_docs,
            from_html=True,
            fields=("body", "title"),  # DocMaker.java:197-198 title+body
            index_offsets=index_offsets,
            # DocValues sidecar: numeric n_chars (sort-by-field) + sorted
            # lang (facets) — index/DocValuesType.java NUMERIC/SORTED
            dv_columns=("n_chars", "lang"),
        )
    merge_manifest = load_merge_manifest(index_dir)
    if merge_manifest is None:
        merge_manifest = merge_by_term(build_manifest, index_dir)
    return {
        "index_dir": index_dir,
        "build_manifest": build_manifest,
        "merge_manifest": merge_manifest,
    }


# ---------------------------------------------------------------------------
# index-derived query entries (oracle-checked against raw documents.text)
# ---------------------------------------------------------------------------


def term_df_ttf(sf_dir: str) -> pa.Table:
    """(term, df, ttf) straight from the merged term dictionary — the
    end-to-end check of extract → tokenize → invert → salted merge."""
    idx = get_index(sf_dir)
    tables = [
        pq.read_table(s["path"], columns=["term", "df", "ttf"])
        for s in idx["merge_manifest"]["shards"]
    ]
    return pa.concat_tables(tables)


def title_term_df(sf_dir: str) -> pa.Table:
    """(term, df, ttf) from the TITLE field's merged dictionary — the
    end-to-end check of the multi-field build (title extracted from
    <title>, analyzed and inverted separately from body). Oracle: the
    fixture titles are 'doc {doc_id} rep 0', so DuckDB recomputes the same
    stats from doc_id alone."""
    idx = get_index(sf_dir)
    tm = idx["merge_manifest"]["fields"]["title"]
    tables = [
        pq.read_table(s["path"], columns=["term", "df", "ttf"])
        for s in tm["shards"]
    ]
    return pa.concat_tables(tables)


def bm25_title_topk(sf_dir: str) -> pa.Table:
    """Field-qualified BM25 search (title: clauses routed to the title
    field's postings/norms/stats; mixed clauses intersect on global
    docIDs): (query_id, rank, doc_id, score)."""
    from .checkpoint import load_merge_manifest
    from .search import IndexSearcher

    idx = get_index(sf_dir)
    searcher = IndexSearcher(load_merge_manifest(idx["index_dir"]))
    title_queries = [
        (0, "title:doc", 10),        # every title
        (1, "title:7", 10),          # one title's number token
        (2, "+data title:5", 10),    # body MUST + title SHOULD
        (3, "+title:rep +data", 10), # cross-field conjunction
        (4, "data -title:3", 10),    # title exclusion
        # field-qualified multi-term grammar (classic field productions)
        (5, "title:re*", 10),          # field prefix
        (6, "title:re?", 10),          # field wildcard
        (7, "title:rep~1", 10),        # field fuzzy
        (8, "title:doc^2.5 data", 10), # field boost mixed with body term
        (9, 'title:"doc 7"', 10),      # field phrase
        (10, "title:[6 TO 8]", 10),    # field term range
        (11, "title:/d.c/", 10),       # field regexp
    ]
    out = {"query_id": [], "rank": [], "doc_id": [], "score": []}
    for qid, qs, k in title_queries:
        docs, scores = searcher.search(qs, k)
        out["query_id"].extend([qid] * len(docs))
        out["rank"].extend(range(len(docs)))
        out["doc_id"].extend(docs.tolist())
        out["score"].extend(scores.tolist())
    return pa.table(
        {
            "query_id": pa.array(out["query_id"], type=pa.int64()),
            "rank": pa.array(out["rank"], type=pa.int32()),
            "doc_id": pa.array(out["doc_id"], type=pa.int64()),
            "score": pa.array(out["score"], type=pa.float32()),
        }
    )


def top100_terms(sf_dir: str) -> pa.Table:
    """Top 100 terms by df (tie: term asc) — sort/limit over the index."""
    t = term_df_ttf(sf_dir).to_pandas()
    t = t.sort_values(["df", "term"], ascending=[False, True]).head(100)
    return pa.Table.from_pandas(t[["term", "df"]], preserve_index=False)


def token_counts(sf_dir: str) -> pa.Table:
    """(doc_id, n_tokens) computed through the full html-extraction path —
    checks byte-level token preservation of render+extract vs raw text."""
    import ray.data

    from .extract import extract_batch
    from .textops import token_count_batch

    idx = get_index(sf_dir)
    pages_dir = os.path.dirname(idx["index_dir"]) + "/pages"
    ds = ray.data.read_parquet(pages_dir, columns=["doc_id", "html"])
    from .rayenv import remote_args as _rargs

    return ds.map_batches(
        lambda b: token_count_batch(extract_batch(b)), batch_format="pyarrow", **_rargs()
    )


def doc_norms(sf_dir: str) -> pa.Table:
    """(doc_id, norm) — SmallFloat-quantized lengths from the index
    (no SQL oracle: the byte4 quantization isn't SQL-expressible)."""
    idx = get_index(sf_dir)
    tables = [pq.read_table(p) for p in idx["merge_manifest"]["norm_files"]]
    t = pa.concat_tables(tables)
    return pa.table(
        {
            "doc_id": t.column("doc_id"),
            "norm": pa.compute.cast(t.column("norm"), pa.int64()),
        }
    )


def bm25_search_results(sf_dir: str, algorithm: str = "auto") -> pa.Table:
    """Reference query set through the actor-pool searcher over the merged
    index: (query_id, rank, doc_id, score)."""
    import ray.data

    from .search import search_dataset

    idx = get_index(sf_dir)
    queries = ray.data.from_items(
        [{"query_id": q, "query": s, "k": k} for q, s, k in REFERENCE_QUERIES]
    )
    res = search_dataset(queries, idx["index_dir"], concurrency=2, batch_size=4)
    return res


def collection_stats(sf_dir: str) -> pa.Table:
    """Global collection statistics (docCount, sumTotalTermFreq, distinct
    terms) from the build+merge manifests."""
    idx = get_index(sf_dir)
    mm = idx["merge_manifest"]
    return pa.table(
        {
            "doc_count": pa.array([mm["doc_count"]], type=pa.int64()),
            "sum_ttf": pa.array([mm["sum_ttf"]], type=pa.int64()),
            "n_terms": pa.array(
                [int(sum(s["n_terms"] for s in mm["shards"]))], type=pa.int64()
            ),
        }
    )


def phrase_match_docs(sf_dir: str, phrase: str = "data join") -> pa.Table:
    """(doc_id) of documents containing the exact phrase — positional
    (slop-0) matching over the merged index's prox streams (PhraseQuery /
    ExactPhraseMatcher role); oracle: a LIKE scan over the normalized token
    string in DuckDB."""
    from .checkpoint import load_merge_manifest
    from .search import IndexSearcher, _phrase_postings

    idx = get_index(sf_dir)
    searcher = IndexSearcher(load_merge_manifest(idx["index_dir"]))
    terms = tuple(phrase.split())
    docs_all = []
    for seg in searcher.segments:
        docs, _freqs = _phrase_postings(seg, terms)
        docs_all.append(docs)
    out = np.sort(np.concatenate(docs_all)) if docs_all else np.empty(0, dtype=np.int64)
    return pa.table({"doc_id": pa.array(out, type=pa.int64())})


def leading_wildcard_docs(sf_dir: str, pattern: str = "*er") -> pa.Table:
    """(doc_id) of documents matching a LEADING-wildcard WildcardQuery —
    the Solr ReversedWildcardFilterFactory role (solr/analysis/
    ReversedWildcardFilter.java): the rewrite seeks reverse(suffix) as a
    prefix window over the lazily-derived reversed dictionary
    (Segment/MergedIndex.expand_suffix) instead of scanning + fnmatching
    the whole term dict, then unions the expanded terms' postings through
    the normal search path."""
    from .checkpoint import load_merge_manifest
    from .search import IndexSearcher

    idx = get_index(sf_dir)
    searcher = IndexSearcher(load_merge_manifest(idx["index_dir"]))
    docs, _scores = searcher.search(pattern, k=searcher.doc_count)
    return pa.table({"doc_id": pa.array(np.sort(docs), type=pa.int64())})


def phrase_slop_match_docs(
    sf_dir: str, phrase: str = "data join", slop: int = 2
) -> pa.Table:
    """(doc_id) of documents matching the phrase within ``slop`` position
    moves — SloppyPhraseMatcher semantics (search/PhraseQuery.java:92,147):
    a doc matches iff some occurrence pair has offset-adjusted span
    <= slop. Oracle: a positions self-join in DuckDB."""
    from .checkpoint import load_merge_manifest
    from .search import IndexSearcher, _phrase_postings

    idx = get_index(sf_dir)
    searcher = IndexSearcher(load_merge_manifest(idx["index_dir"]))
    terms = tuple(phrase.split())
    docs_all = []
    for seg in searcher.segments:
        docs, _freqs = _phrase_postings(seg, terms, slop)
        docs_all.append(docs)
    out = np.sort(np.concatenate(docs_all)) if docs_all else np.empty(0, dtype=np.int64)
    return pa.table({"doc_id": pa.array(out, type=pa.int64())})


def multi_phrase_match_docs(
    sf_dir: str, query: str = '"data|hash jo*"'
) -> pa.Table:
    """(doc_id) of documents matching a MultiPhraseQuery — per-slot
    alternative sets with union postings (search/MultiPhraseQuery.java,
    UnionPostingsEnum role) and dictionary-expanded wildcard slots
    (queryparser/complexPhrase/ComplexPhraseQueryParser.java rewrite).
    Oracle: adjacent-position join with IN-list / LIKE slot predicates."""
    from .checkpoint import load_merge_manifest
    from .queryparse import parse_query
    from .search import IndexSearcher, _multi_phrase_postings, _phrase_postings

    idx = get_index(sf_dir)
    searcher = IndexSearcher(load_merge_manifest(idx["index_dir"]))
    q = searcher.rewrite(parse_query(query))
    docs_all = []
    for seg in searcher.segments:
        for slots, slop in q.multi_phrases:
            bare = tuple(tuple(t.split(":", 1)[-1] for t in a) for a in slots)
            d, _f = _multi_phrase_postings(seg, bare, slop)
            docs_all.append(d)
        # all-singleton slot lists degrade to a plain phrase in rewrite
        for ph in q.phrases:
            d, _f = _phrase_postings(seg, ph)
            docs_all.append(d)
    out = (
        np.unique(np.concatenate(docs_all))
        if docs_all
        else np.empty(0, dtype=np.int64)
    )
    return pa.table({"doc_id": pa.array(out, type=pa.int64())})


def _span_searcher(sf_dir: str):
    from .checkpoint import load_merge_manifest
    from .search import IndexSearcher

    idx = get_index(sf_dir)
    return IndexSearcher(load_merge_manifest(idx["index_dir"]))


def _span_match_table(searcher, q) -> pa.Table:
    """(doc_id, matches) across segments for one span tree — numMatches
    per doc (SpanScorer.java:104 numMatches++)."""
    from .spans import eval_spans

    docs_all, n_all = [], []
    for seg in searcher.segments:
        m = eval_spans(seg, q)
        docs_all.extend(sorted(m))
        n_all.extend(len(m[d]) for d in sorted(m))
    order = np.argsort(np.array(docs_all, dtype=np.int64), kind="stable")
    return pa.table(
        {
            "doc_id": pa.array(np.array(docs_all, dtype=np.int64)[order]),
            "matches": pa.array(np.array(n_all, dtype=np.int64)[order]),
        }
    )


def span_near_match_docs(
    sf_dir: str, t1: str = "data", t2: str = "join", slop: int = 3
) -> pa.Table:
    """(doc_id, matches) for an ORDERED SpanNearQuery of two terms —
    NearSpansOrdered.java:60-121: one candidate per position of the first
    clause, stretched to the first t2 start >= its end, matching iff the
    gap <= slop. Oracle: a positions self-join (a match for p1 iff some
    p2 in (p1, p1+1+slop] exists — the greedy minimum qualifies iff any
    does). Evaluation is per segment (the LeafReader shape); the driver
    loop here is over the merged index's handful of shard readers."""
    from .spans import SpanNear, SpanTerm

    q = SpanNear((SpanTerm(t1), SpanTerm(t2)), slop=slop, in_order=True)
    return _span_match_table(_span_searcher(sf_dir), q)


def span_near_wildcard_docs(
    sf_dir: str, t1: str = "the", pattern: str = "s*", slop: int = 1
) -> pa.Table:
    """(doc_id, matches) for SpanNear(t1, SpanMultiTermQueryWrapper(
    WildcardQuery(pattern)), slop, ordered) —
    spans/SpanMultiTermQueryWrapper.java:60-95: the multi-term pattern
    rewrites against the dictionary into a SpanOrQuery of the matching
    terms, then participates in the positional near like any span.
    Oracle: positions self-join with the pattern as a LIKE prefix."""
    from .checkpoint import load_merge_manifest
    from .search import IndexSearcher
    from .spans import SpanNear, SpanOr, SpanTerm

    idx = get_index(sf_dir)
    searcher = IndexSearcher(load_merge_manifest(idx["index_dir"]))
    assert pattern.endswith("*") and "*" not in pattern[:-1]
    expanded = searcher.expand_prefix(pattern[:-1])
    if not expanded:
        return pa.table(
            {
                "doc_id": pa.array([], type=pa.int64()),
                "matches": pa.array([], type=pa.int64()),
            }
        )
    q = SpanNear(
        (SpanTerm(t1), SpanOr(tuple(SpanTerm(t) for t in expanded))),
        slop=slop,
        in_order=True,
    )
    return _span_match_table(_span_searcher(sf_dir), q)


def span_unordered_match_docs(
    sf_dir: str, t1: str = "hash", t2: str = "merge", slop: int = 2
) -> pa.Table:
    """(doc_id) matching an UNORDERED SpanNearQuery of two terms —
    NearSpansUnordered.java:94 window predicate; for two unit-width term
    spans the doc-level condition is exists (a, b) with |a - b| - 1 <=
    slop, which is the DuckDB oracle."""
    from .spans import SpanNear, SpanTerm

    q = SpanNear((SpanTerm(t1), SpanTerm(t2)), slop=slop, in_order=False)
    t = _span_match_table(_span_searcher(sf_dir), q)
    return t.select(["doc_id"])


def span_containing_match_docs(
    sf_dir: str,
    t1: str = "data",
    t2: str = "join",
    slop: int = 4,
    little: str = "the",
) -> pa.Table:
    """(doc_id, matches) for SpanContainingQuery(near(t1, t2, slop),
    little) — SpanContainingQuery.java:78-116: big spans (ordered near)
    that contain a little span, via the greedy monotone little pointer.
    With unit littles and start-ordered bigs the greedy walk equals
    exists-containment per big span, so the match count replays in SQL:
    count of qualifying (p1, first-t2-after) windows that enclose a
    ``little`` position."""
    from .spans import SpanContaining, SpanNear, SpanTerm

    q = SpanContaining(
        SpanNear((SpanTerm(t1), SpanTerm(t2)), slop=slop, in_order=True),
        SpanTerm(little),
    )
    return _span_match_table(_span_searcher(sf_dir), q)


def span_within_match_docs(
    sf_dir: str,
    t1: str = "data",
    t2: str = "join",
    slop: int = 6,
    little: str = "merge",
) -> pa.Table:
    """(doc_id, matches) for SpanWithinQuery(big=near(t1, t2, slop),
    little) — SpanWithinQuery.java:79-118: little spans enclosed in a
    big span, greedy monotone big pointer. The ordered-near big spans
    have non-decreasing (start, end) in emission order, so the greedy
    walk equals exists-enclosure per little span — the count replays in
    SQL as ``little`` positions inside any qualifying near window."""
    from .spans import SpanNear, SpanTerm, SpanWithin

    q = SpanWithin(
        SpanNear((SpanTerm(t1), SpanTerm(t2)), slop=slop, in_order=True),
        SpanTerm(little),
    )
    return _span_match_table(_span_searcher(sf_dir), q)


def span_or_near_match_docs(
    sf_dir: str,
    alts: tuple[str, str] = ("data", "merge"),
    t2: str = "join",
    slop: int = 2,
) -> pa.Table:
    """(doc_id, matches) for an ordered SpanNearQuery whose FIRST clause
    is a SpanOrQuery (SpanOrQuery.java position-merged union feeding
    NearSpansOrdered): one candidate per union position p, stretched to
    the first t2 start >= p+1, matching iff the gap <= slop."""
    from .spans import SpanNear, SpanOr, SpanTerm

    q = SpanNear(
        (SpanOr(tuple(SpanTerm(a) for a in alts)), SpanTerm(t2)),
        slop=slop,
        in_order=True,
    )
    return _span_match_table(_span_searcher(sf_dir), q)


def span_first_match_docs(
    sf_dir: str, term: str = "data", end: int = 5
) -> pa.Table:
    """(doc_id, matches) for SpanFirstQuery(term, end) —
    SpanFirstQuery.java:38-46: occurrences with span end <= ``end`` (for
    a unit term span, position <= end - 1)."""
    from .spans import SpanTerm, span_first

    q = span_first(SpanTerm(term), end)
    return _span_match_table(_span_searcher(sf_dir), q)


def span_not_match_docs(
    sf_dir: str,
    t1: str = "data",
    t2: str = "join",
    slop: int = 2,
    exclude: str = "dup",
) -> pa.Table:
    """(doc_id) where an ordered near(t1, t2, slop) span survives
    SpanNotQuery exclusion by ``exclude`` (pre=post=0) —
    SpanNotQuery.java:149-190: an include span dies iff an exclude
    position falls inside [start, end). Oracle: the greedy include span
    for p1 is (p1, min p2 > p1), kept iff no exclude position lies in
    [p1, p2]."""
    from .spans import SpanNear, SpanNot, SpanTerm

    q = SpanNot(
        SpanNear((SpanTerm(t1), SpanTerm(t2)), slop=slop, in_order=True),
        SpanTerm(exclude),
    )
    t = _span_match_table(_span_searcher(sf_dir), q)
    return t.select(["doc_id"])


def span_near_topk(
    sf_dir: str, t1: str = "data", t2: str = "join", slop: int = 2, k: int = 10
) -> pa.Table:
    """BM25-scored ordered SpanNear top-k — SpanWeight.buildSimWeight
    (one summed-idf weight over every term in the tree, the
    make_phrase_scorer shape) with SpanScorer's float32 sloppy freq
    (sum of 1/(1+width), SpanScorer.java:109)."""
    from .bm25 import make_phrase_scorer, topk_sort
    from .spans import SpanNear, SpanTerm, span_freqs, span_terms

    searcher = _span_searcher(sf_dir)
    q = SpanNear((SpanTerm(t1), SpanTerm(t2)), slop=slop, in_order=True)
    params = make_phrase_scorer(
        [searcher.global_term_stats(t)[0] for t in span_terms(q)],
        searcher.doc_count,
        searcher.sum_ttf,
    )
    docs_all, scores_all = [], []
    for seg in searcher.segments:
        docs, freqs, _ = span_freqs(seg, q)
        if len(docs):
            docs_all.append(docs)
            scores_all.append(params.score(freqs, seg.norm_of(docs)))
    if docs_all:
        docs = np.concatenate(docs_all)
        scores = np.concatenate(scores_all)
    else:
        docs = np.empty(0, dtype=np.int64)
        scores = np.empty(0, dtype=np.float32)
    docs, scores = topk_sort(docs, scores, k)
    return pa.table(
        {
            "rank": pa.array(np.arange(len(docs)), type=pa.int64()),
            "doc_id": pa.array(docs, type=pa.int64()),
            "score": pa.array(scores, type=pa.float32()),
        }
    )


PERCOLATE_QUERIES = [
    ("q_conj", "+data +join"),
    ("q_data", "data"),
    ("q_disj", "hash merge"),
    ("q_nested", "+(data join) +(hash merge)"),
    ("q_not", "+hash -dup"),
    ("q_phrase", '"data join"'),
    ("q_prefix", "jo*"),
    ("q_sloppy", '"data join"~2'),
]


def percolate_matches(sf_dir: str):
    """Monitor/percolator driver pipeline (lucene/monitor Monitor.match):
    the registered query set PERCOLATE_QUERIES streams against the
    documents table; emits (doc_id, query_id) match pairs. The q_prefix
    query is deliberately unanchorable and exercises the __ANYTOKEN__
    bucket. Oracle: a UNION ALL of per-query containment SQL."""
    import os

    from .monitor import percolate
    from .rayenv import read_parquet_clean

    ds = read_parquet_clean(
        os.path.join(sf_dir, "documents.parquet"), columns=["doc_id", "text"]
    )
    return percolate(ds, PERCOLATE_QUERIES)


def nb_train_stats(sf_dir: str) -> pa.Table:
    """NB training sufficient statistics — per (class, term) the number
    of docs of that class containing the term (the getWordFreqForClass
    corpus quantity, SimpleNaiveBayesClassifier.java:250-264), computed
    as a streamed per-batch distinct-term partial + groupby sum. Exact
    SQL oracle (a DISTINCT unnest + GROUP BY)."""
    from ray.data.aggregate import Sum

    import ray.data

    from .analyze import DEFAULT_ANALYZER
    from .classify import _hits_partial
    from .rayenv import remote_args as _rargs

    from .rayenv import read_parquet_clean

    ds = read_parquet_clean(
        os.path.join(sf_dir, "documents.parquet"), columns=["text", "lang"]
    )
    out = (
        ds.map_batches(
            _hits_partial("lang", DEFAULT_ANALYZER),
            batch_format="pyarrow",
            **_rargs(),
        )
        .groupby(["class", "term"])
        .aggregate(Sum("hits", alias_name="hits"))
    )
    return out


def nb_classify(sf_dir: str):
    """SimpleNaiveBayesClassifier self-classification of the documents
    table (train + actor-pool batch inference); (doc_id,
    assigned_class). Exact oracle: the SQL replays the integer model
    stats and folds the per-occurrence ln-sum in doc order from the
    prior (list_reduce), matching the reference op chain bit-for-bit
    on this host's libm."""
    from .classify import nb_classify_dataset

    return nb_classify_dataset(sf_dir)


def knn_classify(sf_dir: str, n_examples: int = 10, k: int = 10) -> pa.Table:
    """KNearestNeighborClassifier: MLT neighbor search + normalized
    class vote for the first ``n_examples`` docs."""
    from .classify import knn_classify_docs

    idx = get_index(sf_dir)
    return knn_classify_docs(
        sf_dir, list(range(n_examples)), idx["index_dir"], k=k
    )


def function_score_topk(
    sf_dir: str, query: str = "data join", k: int = 10
) -> pa.Table:
    """FunctionScoreQuery.boostByValue (queries/function/
    FunctionScoreQuery.java:86-88, :224-236): every match's BM25 score is
    multiplied by a per-doc DoubleValuesSource — here the stored
    ``n_chars`` DocValues column — with the reference's exact op order
    ``(float)(double(field) * double(inner_f32_score))``; negative or
    missing factors score 0. The factor rides the DV sidecar
    (doc-range-routed pruned reads), never the row store. Residual noted
    for 100x: multiplying belongs inside the per-segment collector;
    here the full match set is rescored then top-k'd (one extra
    partition-topk pass, no extra I/O)."""
    from .bm25 import topk_sort
    from .checkpoint import load_merge_manifest
    from .docvalues import DocValuesReader
    from .search import IndexSearcher

    idx = get_index(sf_dir)
    searcher = IndexSearcher(load_merge_manifest(idx["index_dir"]))
    docs, scores = searcher.search(query, k=searcher.doc_count)
    dv = DocValuesReader(idx["build_manifest"]["partitions"])
    vals = dv.values_for(docs, "n_chars").astype(np.float64)
    boosted = (vals * scores.astype(np.float64)).astype(np.float32)
    boosted[vals < 0] = np.float32(0.0)
    docs, boosted = topk_sort(docs, boosted, k)
    return pa.table(
        {
            "rank": pa.array(np.arange(len(docs)), type=pa.int64()),
            "doc_id": pa.array(docs, type=pa.int64()),
            "score": pa.array(boosted, type=pa.float32()),
        }
    )


def feature_field_topk(
    sf_dir: str, query: str = "data join", k: int = 10
) -> pa.Table:
    """FeatureField static-factor boosting (document/FeatureField.java,
    FeatureQuery.java): the 'pagerank' feature — float32(1 + n_chars) per
    doc — is encoded to pseudo term freqs (floatToIntBits >>> 15) in a
    write-once sidecar with persisted df/ttf, then fused with the BM25
    query as a SHOULD clause: final = (float)(f64(bm25) + f64(satu)),
    the BooleanQuery double-accumulate order. ``score`` ranks by the
    newSaturationQuery shape with the auto pivot (= decode of the
    float-cast avg freq, FeatureField.java:511-523); ``score_log`` /
    ``score_sigm`` report newLogQuery(w=1.5, a=1) and
    newSigmoidQuery(w=2, pivot=auto, a=0.6) for the same hits."""
    from .bm25 import topk_sort
    from .checkpoint import load_merge_manifest
    from .feature import (
        FeatureReader,
        build_feature_sidecar,
        compute_pivot,
        load_feature_manifest,
        log_scores,
        saturation_scores,
        sigmoid_scores,
    )
    from .search import IndexSearcher

    idx = get_index(sf_dir)
    feat_dir = os.path.join(
        os.path.dirname(idx["index_dir"]), "features", "pagerank"
    )
    manifest = load_feature_manifest(feat_dir)
    if manifest is None:
        manifest = build_feature_sidecar(
            os.path.join(sf_dir, "documents.parquet"), feat_dir
        )
    searcher = IndexSearcher(load_merge_manifest(idx["index_dir"]))
    docs, scores = searcher.search(query, k=searcher.doc_count)
    rdr = FeatureReader(feat_dir, manifest)
    freq = rdr.freq_for(docs)
    pivot = compute_pivot(manifest["df"], manifest["ttf"])
    satu = saturation_scores(freq, 1.0, pivot)
    combined = (
        scores.astype(np.float64) + satu.astype(np.float64)
    ).astype(np.float32)
    docs, combined = topk_sort(docs, combined, k)
    freq_k = rdr.freq_for(docs)
    return pa.table(
        {
            "rank": pa.array(np.arange(len(docs)), type=pa.int64()),
            "doc_id": pa.array(docs, type=pa.int64()),
            "score": pa.array(combined, type=pa.float32()),
            "score_log": pa.array(log_scores(freq_k, 1.5, 1.0), type=pa.float32()),
            "score_sigm": pa.array(
                sigmoid_scores(freq_k, 2.0, pivot, 0.6), type=pa.float32()
            ),
        }
    )


def lmdirichlet_topk(
    sf_dir: str, query: str = "data join", k: int = 10
) -> pa.Table:
    """Top-k under LMDirichletSimilarity (search/similarities/
    LMDirichletSimilarity.java, mu=2000) — the Similarity extension point
    exercised end-to-end: per-term (float) max(0, ln(1 + f/(mu*p)) +
    ln(mu/(dl+mu))) with p=(ttf+1)/(sttf+1), summed per doc in double then
    cast (the BooleanQuery order). Exact oracle: the whole chain replays
    in DuckDB doubles (libm ln matches bit-for-bit on this host)."""
    from .checkpoint import load_merge_manifest
    from .search import IndexSearcher

    idx = get_index(sf_dir)
    searcher = IndexSearcher(
        load_merge_manifest(idx["index_dir"]), similarity="lmdirichlet"
    )
    docs, scores = searcher.search(query, k=k)
    return pa.table(
        {
            "rank": pa.array(np.arange(len(docs)), type=pa.int64()),
            "doc_id": pa.array(docs, type=pa.int64()),
            "score": pa.array(scores, type=pa.float32()),
        }
    )


def lmjelinek_topk(sf_dir: str, query: str = "data join", k: int = 10) -> pa.Table:
    """Top-k under LMJelinekMercerSimilarity (lambda=0.1) — see
    bm25.make_lmjelinekmercer_scorer; per-doc double clause sum cast f32."""
    from .checkpoint import load_merge_manifest
    from .search import IndexSearcher

    idx = get_index(sf_dir)
    searcher = IndexSearcher(
        load_merge_manifest(idx["index_dir"]), similarity="lmjelinekmercer"
    )
    docs, scores = searcher.search(query, k=k)
    return pa.table(
        {
            "rank": pa.array(np.arange(len(docs)), type=pa.int64()),
            "doc_id": pa.array(docs, type=pa.int64()),
            "score": pa.array(scores, type=pa.float32()),
        }
    )


def dfi_topk(sf_dir: str, query: str = "data join", k: int = 10) -> pa.Table:
    """Top-k under DFISimilarity (DFISimilarity.java:44-68, ChiSquared
    independence): per-term (float) boost * log2((f-e)^2/e + 1) when the
    observed freq exceeds the expected ((ttf+1)*dl)/(sttf+1), else 0;
    per-doc double clause sum cast f32. Exact oracle: the chain replays
    in DuckDB doubles (libm ln, ln(m+1)/ln(2) division)."""
    from .checkpoint import load_merge_manifest
    from .search import IndexSearcher

    idx = get_index(sf_dir)
    searcher = IndexSearcher(load_merge_manifest(idx["index_dir"]), similarity="dfi")
    docs, scores = searcher.search(query, k=k)
    return pa.table(
        {
            "rank": pa.array(np.arange(len(docs)), type=pa.int64()),
            "doc_id": pa.array(docs, type=pa.int64()),
            "score": pa.array(scores, type=pa.float32()),
        }
    )


def axiomatic_topk(sf_dir: str, query: str = "data join", k: int = 10) -> pa.Table:
    """Top-k under AxiomaticF2EXP (AxiomaticF2EXP.java:61-94, s=0.25
    k=0.35): per-term (float)((f/((f+s) + (s*dl)/avgdl)) * ((N+1)/df)^k);
    per-doc double clause sum cast f32. Exact oracle: the chain replays
    in DuckDB doubles (libm pow matches numpy on this host)."""
    from .checkpoint import load_merge_manifest
    from .search import IndexSearcher

    idx = get_index(sf_dir)
    searcher = IndexSearcher(load_merge_manifest(idx["index_dir"]), similarity="axiomatic")
    docs, scores = searcher.search(query, k=k)
    return pa.table(
        {
            "rank": pa.array(np.arange(len(docs)), type=pa.int64()),
            "doc_id": pa.array(docs, type=pa.int64()),
            "score": pa.array(scores, type=pa.float32()),
        }
    )


def ib_topk(sf_dir: str, query: str = "data join", k: int = 10) -> pa.Table:
    """Top-k under IBSimilarity(LL, DF, H2 c=1): per-term
    (float)(-ln(lam/(f*log2(1+avgdl/dl) + lam))) with the float lambda
    (df+1)/(N+1); per-doc double clause sum cast f32. Exact oracle:
    libm ln and the ln/ln(2) division replay in DuckDB doubles."""
    from .checkpoint import load_merge_manifest
    from .search import IndexSearcher

    idx = get_index(sf_dir)
    searcher = IndexSearcher(load_merge_manifest(idx["index_dir"]), similarity="ib")
    docs, scores = searcher.search(query, k=k)
    return pa.table(
        {
            "rank": pa.array(np.arange(len(docs)), type=pa.int64()),
            "doc_id": pa.array(docs, type=pa.int64()),
            "score": pa.array(scores, type=pa.float32()),
        }
    )


def dfr_topk(sf_dir: str, query: str = "data join", k: int = 10) -> pa.Table:
    """Top-k under DFRSimilarity I(F)L2 (BasicModelIF + AfterEffectL +
    NormalizationH2 c=1): per-term (float)(A * (1 - 1/(1+tfn))) with
    A = log2(1 + (N+1)/(F+0.5)); per-doc double clause sum cast f32.
    Exact oracle: libm ln and the ln/ln(2) divisions replay in DuckDB."""
    from .checkpoint import load_merge_manifest
    from .search import IndexSearcher

    idx = get_index(sf_dir)
    searcher = IndexSearcher(load_merge_manifest(idx["index_dir"]), similarity="dfr")
    docs, scores = searcher.search(query, k=k)
    return pa.table(
        {
            "rank": pa.array(np.arange(len(docs)), type=pa.int64()),
            "doc_id": pa.array(docs, type=pa.int64()),
            "score": pa.array(scores, type=pa.float32()),
        }
    )


def multi_sim_topk(sf_dir: str, term: str = "data", k: int = 10) -> pa.Table:
    """Top-k under MultiSimilarity(bm25, classic)
    (MultiSimilarity.java:44-72): a hit's score is the FLOAT-accumulated
    sum of the sub-similarity scores in construction order. Exact oracle:
    both sub-chains replay f32-op-exact in SQL and the float adds replay
    as CAST(double-add AS FLOAT)."""
    from .checkpoint import load_merge_manifest
    from .search import IndexSearcher

    idx = get_index(sf_dir)
    searcher = IndexSearcher(load_merge_manifest(idx["index_dir"]), similarity="multi")
    docs, scores = searcher.search(term, k=k)
    return pa.table(
        {
            "rank": pa.array(np.arange(len(docs)), type=pa.int64()),
            "doc_id": pa.array(docs, type=pa.int64()),
            "score": pa.array(scores, type=pa.float32()),
        }
    )


def perfield_sim_topk(sf_dir: str, query: str = "title:doc data", k: int = 10) -> pa.Table:
    """Top-k with a per-field Similarity map (PerFieldSimilarityWrapper
    .java:46-48): title clauses score under ClassicSimilarity, body
    clauses under BM25 — one query mixing both fields. Exact oracle:
    each field's clause chain replays with that field's collection
    stats; the doc score is the f64 clause sum cast f32."""
    from .checkpoint import load_merge_manifest
    from .search import IndexSearcher

    idx = get_index(sf_dir)
    searcher = IndexSearcher(
        load_merge_manifest(idx["index_dir"]),
        similarity={"title": "classic", "": "bm25"},
    )
    docs, scores = searcher.search(query, k=k)
    return pa.table(
        {
            "rank": pa.array(np.arange(len(docs)), type=pa.int64()),
            "doc_id": pa.array(docs, type=pa.int64()),
            "score": pa.array(scores, type=pa.float32()),
        }
    )


def explain_scores(sf_dir: str, query: str = "data join", k: int = 3) -> pa.Table:
    """IndexSearcher.explain over the query's top-k docs
    (search/IndexSearcher.java:714-730; BM25Similarity.explainScore
    component shape): one row per (doc, matching clause) with the raw
    freq, SmallFloat-decoded docLen, f32 clause score, and the doc's
    total (= the f64 clause-sum cast f32 search() produced — the
    explain/score identity Lucene's CheckHits asserts). Exact oracle:
    every component replays in SQL via the f32 BM25 chain."""
    from .checkpoint import load_merge_manifest
    from .search import IndexSearcher

    idx = get_index(sf_dir)
    searcher = IndexSearcher(load_merge_manifest(idx["index_dir"]))
    docs, scores = searcher.search(query, k=k)
    d_out: list[int] = []
    t_out: list[str] = []
    f_out: list[int] = []
    l_out: list[int] = []
    c_out: list[np.float32] = []
    tot_out: list[np.float32] = []
    for doc, total in zip(docs.tolist(), scores.tolist()):
        ex = searcher.explain(query, doc)
        assert ex["value"] == np.float32(total)  # CheckHits explain identity
        for det in ex["details"]:
            d_out.append(doc)
            t_out.append(det["term"])
            f_out.append(det["freq"])
            l_out.append(det["doc_len"])
            c_out.append(det["value"])
            tot_out.append(ex["value"])
    return pa.table(
        {
            "doc_id": pa.array(d_out, type=pa.int64()),
            "term": pa.array(t_out, type=pa.string()),
            "freq": pa.array(f_out, type=pa.int64()),
            "doc_len": pa.array(l_out, type=pa.int64()),
            "clause_score": pa.array(c_out, type=pa.float32()),
            "total": pa.array(tot_out, type=pa.float32()),
        }
    )


def edismax_topk(
    sf_dir: str,
    user_query: str = "data 0",
    k: int = 10,
    tie: float = 0.1,
    title_boost: float = 2.0,
) -> pa.Table:
    """Solr edismax qf shape (handler/component + ExtendedDismaxQParser:
    each user term expands across the qf fields with per-field boosts —
    body^1 title^{title_boost} here — and the per-term field clauses
    combine under DisjunctionMaxQuery with the configured tie breaker).
    Exact oracle: every field clause's f32 BM25 chain + the dismax
    combine replay in SQL (boost = f32(boost * idf) weight order)."""
    from .checkpoint import load_merge_manifest
    from .search import IndexSearcher

    idx = get_index(sf_dir)
    searcher = IndexSearcher(load_merge_manifest(idx["index_dir"]))
    clauses: list[str] = []
    boosts: dict[str, float] = {}
    for w in user_query.split():
        clauses.append(w)
        tq = f"title:{w}"
        clauses.append(tq)
        boosts[tq] = title_boost
    docs, scores = searcher.search_dismax(
        " ".join(clauses), k=k, tie_breaker=tie, boosts=boosts
    )
    return pa.table(
        {
            "rank": pa.array(np.arange(len(docs)), type=pa.int64()),
            "doc_id": pa.array(docs, type=pa.int64()),
            "score": pa.array(scores, type=pa.float32()),
        }
    )


def blended_term_topk(
    sf_dir: str, terms: tuple[str, ...] = ("data", "join"), k: int = 10
) -> pa.Table:
    """BlendedTermQuery (search/BlendedTermQuery.java:48-233): every term
    scores with ARTIFICIAL blended stats — df = max of the terms' doc
    freqs, ttf = their sum (rewrite():higher-line 'Compute aggregated
    doc freq...'; adjustFrequencies/accumulateStatistics) — then the
    sub TermQueries combine under the default DisjunctionMaxRewrite
    with tieBreaker 0.01f (:183). The engine injects the blended stats
    through the same stats_override plug the sharded fan-out uses, so
    TermStates.build sees the artificial frequencies exactly as the
    reference's adjusted contexts do. Exact oracle: the shared blended
    weight + the dismax combine's f32 op chain replay in SQL."""
    from .checkpoint import load_merge_manifest
    from .search import IndexSearcher

    idx = get_index(sf_dir)
    searcher = IndexSearcher(load_merge_manifest(idx["index_dir"]))
    stats = [searcher.global_term_stats(t) for t in terms]
    df_b = max(d for d, _ in stats)
    ttf_b = sum(t for _, t in stats)
    searcher.stats_override = {t: (df_b, ttf_b) for t in terms}
    docs, scores = searcher.search_dismax(" ".join(terms), k=k, tie_breaker=0.01)
    return pa.table(
        {
            "rank": pa.array(np.arange(len(docs)), type=pa.int64()),
            "doc_id": pa.array(docs, type=pa.int64()),
            "score": pa.array(scores, type=pa.float32()),
        }
    )


def boolean_sim_topk(sf_dir: str, query: str = "data join merge", k: int = 10) -> pa.Table:
    """Top-k under BooleanSimilarity (BooleanSimilarity.java:47-61):
    each matching clause scores its boost (1f), so a disjunction's score
    is the matching-clause count — doc-asc tie-break carries the ranking."""
    from .checkpoint import load_merge_manifest
    from .search import IndexSearcher

    idx = get_index(sf_dir)
    searcher = IndexSearcher(
        load_merge_manifest(idx["index_dir"]), similarity="boolean"
    )
    docs, scores = searcher.search(query, k=k)
    return pa.table(
        {
            "rank": pa.array(np.arange(len(docs)), type=pa.int64()),
            "doc_id": pa.array(docs, type=pa.int64()),
            "score": pa.array(scores, type=pa.float32()),
        }
    )


def distance_feature_topk(
    sf_dir: str,
    query: str = "data join",
    origin: int = 1000,
    pivot_distance: int = 500,
    k: int = 10,
) -> pa.Table:
    """FeatureField.newDistanceFeatureQuery over a numeric doc value
    (document/LongDistanceFeatureQuery.java:110-116 — the recency-boost
    shape): dist = |n_chars - origin| saturating long arithmetic,
    boost-clause score = (float)(pivot / (pivot + (double) dist)), fused
    with the BM25 MUST query by the BooleanQuery double-sum. The factor
    rides the DV sidecar (doc-range-routed pruned reads)."""
    from .bm25 import topk_sort
    from .checkpoint import load_merge_manifest
    from .docvalues import DocValuesReader
    from .feature import distance_feature_scores
    from .search import IndexSearcher

    idx = get_index(sf_dir)
    searcher = IndexSearcher(load_merge_manifest(idx["index_dir"]))
    docs, scores = searcher.search(query, k=searcher.doc_count)
    dv = DocValuesReader(idx["build_manifest"]["partitions"])
    vals = dv.values_for(docs, "n_chars")
    dist = distance_feature_scores(vals, origin, pivot_distance)
    combined = (
        scores.astype(np.float64) + dist.astype(np.float64)
    ).astype(np.float32)
    docs, combined = topk_sort(docs, combined, k)
    return pa.table(
        {
            "rank": pa.array(np.arange(len(docs)), type=pa.int64()),
            "doc_id": pa.array(docs, type=pa.int64()),
            "score": pa.array(combined, type=pa.float32()),
        }
    )


def covering_query_topk(
    sf_dir: str,
    clauses: tuple[str, ...] = ("data", "join", "merge", "query"),
    k: int = 10,
) -> pa.Table:
    """CoveringQuery (sandbox/search/CoveringQuery.java + CoveringScorer):
    a doc matches iff at least minimumNumberMatch(doc) of the clauses
    match, where minMatch comes from a per-doc LongValuesSource — here
    ``1 + n_chars % 3`` over the DV sidecar (CoveringScorer clamps the
    value to >= 1). Score = the sum of the MATCHING clauses' f32 scores,
    accumulated in double in clause order then cast to float (the
    DisjunctionSumScorer shape), so the SQL fold replays it bit-exactly.
    Per-clause hit streams come from the exhaustive plan's collector
    hook; the union/count/accumulate is one vectorized pass."""
    from .bm25 import topk_sort
    from .checkpoint import load_merge_manifest
    from .docvalues import DocValuesReader
    from .search import IndexSearcher

    idx = get_index(sf_dir)
    searcher = IndexSearcher(load_merge_manifest(idx["index_dir"]))
    cl_data: list[tuple[np.ndarray, np.ndarray]] = []
    for t in clauses:
        parts: list[tuple[np.ndarray, np.ndarray]] = []
        searcher.search(t, k=1, collector=lambda d, s, P=parts: P.append((d, s)))
        if parts:
            d = np.concatenate([p[0] for p in parts])
            s = np.concatenate([p[1] for p in parts])
            d, s = searcher._live(d, s)
        else:
            d = np.empty(0, dtype=np.int64)
            s = np.empty(0, dtype=np.float32)
        cl_data.append((d, s))
    all_docs = [d for d, _ in cl_data if len(d)]
    if not all_docs:
        return pa.table(
            {
                "rank": pa.array([], type=pa.int64()),
                "doc_id": pa.array([], type=pa.int64()),
                "score": pa.array([], type=pa.float32()),
            }
        )
    union = np.unique(np.concatenate(all_docs))
    acc = np.zeros(len(union), dtype=np.float64)
    cnt = np.zeros(len(union), dtype=np.int64)
    for d, s in cl_data:  # clause order = accumulation order
        if len(d):
            idx_u = np.searchsorted(union, d)
            acc[idx_u] += s.astype(np.float64)
            cnt[idx_u] += 1
    dv = DocValuesReader(idx["build_manifest"]["partitions"])
    min_match = np.maximum(1, 1 + dv.values_for(union, "n_chars") % 3)
    sel = cnt >= min_match
    docs, scores = topk_sort(union[sel], acc[sel].astype(np.float32), k)
    return pa.table(
        {
            "rank": pa.array(np.arange(len(docs)), type=pa.int64()),
            "doc_id": pa.array(docs, type=pa.int64()),
            "score": pa.array(scores, type=pa.float32()),
        }
    )


class LMScorer:
    """Actor-pool doc scorer under the trained stupid-backoff bigram LM
    (the KenLM-style perplexity filter of pretraining pipelines, using
    the engine's FreeTextSuggester model — suggest/analyzing/
    FreeTextSuggester.java stupid backoff, ALPHA = 0.4): per doc,
    logprob = sum over adjacent transitions (a, b) of
    ln(big(a,b) / uni(a)) when the bigram was seen, else
    ln(0.4 * uni(b) / total). The model ships once per actor via
    fn_constructor_args (vocab-bounded broadcast, never per batch);
    accumulation is left-associative float64 in token order so the SQL
    fold replays it bit-exactly."""

    def __init__(self, model_opaque):
        m = model_opaque.obj
        self.uni = m["uni"]
        self.big = m["big"]
        self.tot = float(m["tot"])

    def __call__(self, batch: pa.Table) -> pa.Table:
        import math

        from .analyze import DEFAULT_ANALYZER, tokenize

        ids, n_trans, lps = [], [], []
        for doc_id, text in zip(
            batch.column("doc_id").to_pylist(), batch.column("text").to_pylist()
        ):
            toks = tokenize(text or "", DEFAULT_ANALYZER)
            if len(toks) < 2:
                continue  # no transitions: the doc has no LM evidence
            lp = 0.0
            for a, b in zip(toks, toks[1:]):
                c = self.big.get((a, b))
                if c is not None:
                    p = c / self.uni[a]
                else:
                    p = 0.4 * self.uni[b] / self.tot
                lp += math.log(p)
            ids.append(doc_id)
            n_trans.append(len(toks) - 1)
            lps.append(lp)
        return pa.table(
            {
                "doc_id": pa.array(ids, type=pa.int64()),
                "n_trans": pa.array(n_trans, type=pa.int64()),
                "logprob": pa.array(lps, type=pa.float64()),
            }
        )


def lm_doc_logprob(sf_dir: str) -> "object":
    """(doc_id, n_trans, logprob) for every doc with >= 2 tokens — the
    LM quality-filter scoring pass (filtering = a quantile cut over
    logprob / n_trans, derivable downstream). Model trained distributed
    (freetext_train's one-pass partial counts), then broadcast to the
    scorer actor pool."""
    from .rayenv import Opaque, read_parquet_clean
    from .suggest import freetext_train

    model = freetext_train(sf_dir)
    ds = read_parquet_clean(
        os.path.join(sf_dir, "documents.parquet"), columns=["doc_id", "text"]
    )
    from .rayenv import remote_args as _ra

    return ds.map_batches(
        LMScorer,
        fn_constructor_args=(Opaque(model),),
        batch_format="pyarrow",
        concurrency=(1, 4),
        **_ra(),
    )


def ccnet_buckets(
    sf_dir: str, t_head: float = -3.39, t_mid: float = -3.42
) -> "object":
    """CCNet-style perplexity bucketing (Wenzek et al. 2020 §4.3: docs
    split head/middle/tail by reference-LM perplexity against FIXED
    cutoffs learned on a reference corpus — the cutoffs are broadcast
    constants, not computed on the stream, so the op stays a pure map):
    (doc_id, n_trans, avg_logprob, bucket) with bucket from the
    per-transition mean log-probability (higher = less perplexed =
    head). Exact oracle: the logprob chain is the bit-exact
    lm_doc_logprob replay; avg = one exact f64 division; the CASE
    compares identical doubles."""
    from .rayenv import remote_args as _ra

    ds = lm_doc_logprob(sf_dir)

    def _bucket(batch: pa.Table) -> pa.Table:
        lp = batch.column("logprob").to_numpy()
        nt = batch.column("n_trans").to_numpy()
        avg = lp / nt
        bucket = np.where(avg > t_head, "head", np.where(avg > t_mid, "middle", "tail"))
        return pa.table(
            {
                "doc_id": batch.column("doc_id"),
                "n_trans": batch.column("n_trans"),
                "avg_logprob": pa.array(avg, type=pa.float64()),
                "bucket": pa.array(bucket, type=pa.string()),
            }
        )

    return ds.map_batches(_bucket, batch_format="pyarrow", **_ra())


def elevate_topk(
    sf_dir: str,
    query: str = "data join",
    elevated: tuple[int, ...] = (5, 2),
    excluded: tuple[int, ...] = (0,),
    k: int = 10,
) -> pa.Table:
    """Solr QueryElevationComponent (handler/component/
    QueryElevationComponent.java, elevate.xml editorial config): for a
    configured query, the listed docs pin to the TOP in config order
    (forceElevation — pinned even when they don't match the query),
    excluded docs drop from the results, and the organic ranking follows
    below the pins. Emits (rank, doc_id, elevated); organic hits keep
    the BM25 collector order."""
    from .checkpoint import load_merge_manifest
    from .search import IndexSearcher

    idx = get_index(sf_dir)
    searcher = IndexSearcher(load_merge_manifest(idx["index_dir"]))
    drop = set(elevated) | set(excluded)
    d, _s = searcher.search(query, k=k + len(drop))
    organic = [int(x) for x in d.tolist() if int(x) not in drop]
    out = list(elevated) + organic
    out = out[:k]
    n_elev = min(len(elevated), k)
    return pa.table(
        {
            "rank": pa.array(np.arange(len(out)), type=pa.int64()),
            "doc_id": pa.array(out, type=pa.int64()),
            "elevated": pa.array(
                [i < n_elev for i in range(len(out))], type=pa.bool_()
            ),
        }
    )


def get_payload_index(sf_dir: str) -> dict:
    """Build (or reuse) the PAYLOAD index variant: each document's token
    stream re-rendered as ``tok|position`` words (the
    DelimitedPayloadTokenFilter input shape, IntegerEncoder role), then
    the normal build with ``payload_delimiter="|"`` — positions become the
    per-occurrence payloads, making every payload aggregate SQL-derivable
    from a positions self-join. Cached like the main index."""
    from .analyze import DEFAULT_ANALYZER, tokenize
    from .build import build_index
    from .checkpoint import load_manifest

    n_rows = pq.read_metadata(os.path.join(sf_dir, "documents.parquet")).num_rows
    root = _cache_dir(sf_dir, n_rows, "-pay")
    corpus_dir = os.path.join(root, "corpus")
    index_dir = os.path.join(root, "index")
    os.makedirs(root, exist_ok=True)
    if not os.path.exists(os.path.join(corpus_dir, "pages-00000.parquet")):
        from .fixtures import write_pages

        t = pq.read_table(
            os.path.join(sf_dir, "documents.parquet"), columns=["doc_id", "text"]
        )
        texts = t.column("text").to_pylist()
        annotated = [
            " ".join(
                f"{tok}|{pos}"
                for pos, tok in enumerate(tokenize(txt or "", DEFAULT_ANALYZER))
            )
            for txt in texts
        ]
        write_pages(
            pa.table({"doc_id": t.column("doc_id"), "text": annotated}),
            corpus_dir,
            n_files=4,
        )
    manifest = load_manifest(index_dir)
    if manifest is None:
        manifest = build_index(
            corpus_dir,
            index_dir,
            partition_docs=2048,
            from_html=False,
            fields=("body",),
            payload_delimiter="|",
        )
    return {"index_dir": index_dir, "build_manifest": manifest}


def payload_term_stats(sf_dir: str, term: str = "data") -> pa.Table:
    """(doc_id, pay_min, pay_max, pay_sum, pay_cnt) for one term's
    payload stream — the PayloadScoreQuery function family
    (queries/payloads/{Min,Max,Sum,Avg}PayloadFunction.java) with exact
    integer outputs. The indexed payload of every occurrence is its token
    position, so the oracle recomputes all four aggregates from a DuckDB
    positions self-join."""
    from .segment import Segment

    idx = get_payload_index(sf_dir)
    segs = [
        Segment(r["seg_dir"])
        for r in sorted(
            idx["build_manifest"]["partitions"], key=lambda r: int(r["doc_base"])
        )
    ]
    from .payloads import payload_term_table

    return payload_term_table(segs, term)


def join_util_docs(
    sf_dir: str, from_query: str = "dup", join_field: str = "n_chars"
) -> pa.Table:
    """Query-time join, ScoreMode.NONE (lucene/join JoinUtil.createJoinQuery,
    JoinUtil.java:86): phase 1 runs ``from_query`` and collects the DISTINCT
    ``join_field`` doc-values of the matching docs (the TermsCollector
    role); phase 2 matches every doc whose ``join_field`` equals one of the
    collected values (the TermsQuery rewrite). Phase 2 is a streamed Ray
    Dataset scan over the DV sidecars with the value set broadcast in the
    closure — the row store is never read. Oracle: a semi-join IN-subquery
    over documents."""
    import pyarrow.compute as pc

    from .checkpoint import load_merge_manifest
    from .docvalues import DocValuesReader, read_doc_values_dataset
    from .rayenv import remote_args as _rargs
    from .search import IndexSearcher

    idx = get_index(sf_dir)
    searcher = IndexSearcher(load_merge_manifest(idx["index_dir"]))
    from_docs, _ = searcher.search(from_query, k=searcher.doc_count)
    dv = DocValuesReader(idx["build_manifest"]["partitions"])
    values = sorted(set(dv.values_for(from_docs, join_field).tolist()))
    if not values:
        return pa.table({"doc_id": pa.array([], type=pa.int64())})
    ds = read_doc_values_dataset(idx["build_manifest"], [join_field])

    def _filter(b: pa.Table) -> pa.Table:
        mask = pc.is_in(b.column(join_field), value_set=pa.array(values))
        return b.filter(mask).select(["doc_id"])

    out = ds.map_batches(_filter, batch_format="pyarrow", **_rargs())
    ids = np.sort(
        np.concatenate(
            [b.column("doc_id").to_numpy() for b in out.iter_batches(batch_format="pyarrow")]
            or [np.empty(0, dtype=np.int64)]
        )
    )
    return pa.table({"doc_id": pa.array(ids, type=pa.int64())})


def join_util_topk(
    sf_dir: str,
    from_query: str = "dup",
    join_field: str = "n_chars",
    score_mode: str = "max",
    k: int = 10,
) -> pa.Table:
    """Query-time join with scores (JoinUtil ScoreMode.Max/Total/Avg —
    TermsIncludingScoreQuery role): from-side BM25 scores aggregate per
    join value (float32 accumulation like the reference's float arrays,
    TermsIncludingScoreQuery.java svs/scores), then every to-side doc
    scores its value's aggregate; top-k with the (score desc, doc_id asc)
    collector tie-break. To-side = per-block partial top-k over the
    streamed DV scan, then one small final merge."""
    import pyarrow.compute as pc

    from .bm25 import topk_sort
    from .checkpoint import load_merge_manifest
    from .docvalues import DocValuesReader, read_doc_values_dataset
    from .rayenv import remote_args as _rargs
    from .search import IndexSearcher

    idx = get_index(sf_dir)
    searcher = IndexSearcher(load_merge_manifest(idx["index_dir"]))
    from_docs, from_scores = searcher.search(from_query, k=searcher.doc_count)
    dv = DocValuesReader(idx["build_manifest"]["partitions"])
    vals = dv.values_for(from_docs, join_field)
    agg: dict = {}
    if len(from_docs):
        import pandas as pd

        s = pd.Series(from_scores.astype(np.float32), index=vals)
        if score_mode == "max":
            agg = s.groupby(level=0).max().to_dict()
        elif score_mode == "total":
            agg = s.groupby(level=0).sum().to_dict()
        elif score_mode == "avg":
            agg = s.groupby(level=0).mean().to_dict()
        else:
            raise ValueError(f"unknown score_mode {score_mode!r}")
    if not agg:
        return pa.table(
            {
                "rank": pa.array([], type=pa.int64()),
                "doc_id": pa.array([], type=pa.int64()),
                "score": pa.array([], type=pa.float32()),
            }
        )
    ds = read_doc_values_dataset(idx["build_manifest"], [join_field])
    keyvals = sorted(agg)
    keys = pa.array(keyvals)
    key_scores = np.array([agg[v] for v in keyvals], dtype=np.float32)

    def _partial(b: pa.Table) -> pa.Table:
        mask = pc.is_in(b.column(join_field), value_set=keys)
        hit = b.filter(mask)
        docs = hit.column("doc_id").to_numpy()
        ix = pc.index_in(hit.column(join_field), value_set=keys).to_numpy(
            zero_copy_only=False
        )
        sc = key_scores[ix.astype(np.int64)]
        d, s = topk_sort(docs, sc, k)
        return pa.table({"doc_id": pa.array(d, type=pa.int64()), "score": pa.array(s, type=pa.float32())})

    parts = ds.map_batches(_partial, batch_format="pyarrow", **_rargs()).take_all()
    if parts:
        docs = np.array([r["doc_id"] for r in parts], dtype=np.int64)
        scores = np.array([r["score"] for r in parts], dtype=np.float32)
    else:
        docs = np.empty(0, dtype=np.int64)
        scores = np.empty(0, dtype=np.float32)
    docs, scores = topk_sort(docs, scores, k)
    return pa.table(
        {
            "rank": pa.array(np.arange(len(docs)), type=pa.int64()),
            "doc_id": pa.array(docs, type=pa.int64()),
            "score": pa.array(scores, type=pa.float32()),
        }
    )


def bool_nested_match_docs(
    sf_dir: str, query: str = "+(data join) +(hash merge) -dup"
) -> pa.Table:
    """(doc_id) of documents matching a NESTED boolean query — parenthesized
    sub-queries from the classic parser's grouping grammar
    (classic/QueryParser.java:81) executed as a clause tree
    (search/BooleanQuery.java nested clause semantics). The default query is
    (data OR join) AND (hash OR merge) AND NOT dup; oracle: the same set
    algebra over token containment in DuckDB."""
    from .checkpoint import load_merge_manifest
    from .search import IndexSearcher

    idx = get_index(sf_dir)
    searcher = IndexSearcher(load_merge_manifest(idx["index_dir"]))
    docs, _scores = searcher.search(query, k=searcher.doc_count)
    return pa.table({"doc_id": pa.array(np.sort(docs), type=pa.int64())})


def phrase_topk(sf_dir: str, phrase: str = "data join", k: int = 10) -> pa.Table:
    """BM25-scored phrase top-k (summed-idf weight x phrase frequency)."""
    from .checkpoint import load_merge_manifest
    from .search import IndexSearcher

    idx = get_index(sf_dir)
    searcher = IndexSearcher(load_merge_manifest(idx["index_dir"]))
    docs, scores = searcher.search(f'"{phrase}"', k)
    return pa.table(
        {
            "rank": pa.array(np.arange(len(docs)), type=pa.int64()),
            "doc_id": pa.array(docs, type=pa.int64()),
            "score": pa.array(scores, type=pa.float32()),
        }
    )


def bm25_snippets(sf_dir: str, query: str = "data join", k: int = 10) -> pa.Table:
    """Two-phase search + highlight (the QueryComponent ids-then-fields
    shape + highlighter module): BM25 top-k over the merged index, then a
    doc_id-pushdown fetch of the source rows and best-window snippets."""
    import ray.data

    from .checkpoint import load_merge_manifest
    from .search import IndexSearcher
    from .textops import snippets_for_hits

    idx = get_index(sf_dir)
    searcher = IndexSearcher(load_merge_manifest(idx["index_dir"]))
    docs, scores = searcher.search(query, k)
    hits = ray.data.from_items(
        [
            {"doc_id": int(d), "rank": i, "score": float(s)}
            for i, (d, s) in enumerate(zip(docs.tolist(), scores.tolist()))
        ]
    )
    pages_dir = os.path.dirname(idx["index_dir"]) + "/pages"
    terms = [t for t in query.lower().split() if t.isalnum()]
    out = snippets_for_hits(hits, pages_dir, terms).to_pandas()
    out = out.sort_values("rank").reset_index(drop=True)
    return pa.Table.from_pandas(out, preserve_index=False)


def bm25_snippets_passages(
    sf_dir: str, query: str = "data join", k: int = 10
) -> pa.Table:
    """Two-phase search + PASSAGE-SCORED highlight (UnifiedHighlighter
    PassageScorer.java:84-142 formula set over fixed token windows —
    engine/textops.make_snippet_passages): BM25 top-k, doc_id-pushdown
    fetch, per-doc best passage by norm(start) * sum(tf * weight).
    (doc_id, rank, passage_start, passage_score, snippet); float64
    passage math replays bit-exactly in the DuckDB oracle."""
    import pyarrow.dataset as pads

    from .checkpoint import load_merge_manifest
    from .search import IndexSearcher
    from .textops import make_snippet_passages

    idx = get_index(sf_dir)
    searcher = IndexSearcher(load_merge_manifest(idx["index_dir"]))
    docs, _scores = searcher.search(query, k)
    terms = [t for t in query.lower().split() if t.isalnum()]
    pages_dir = os.path.dirname(idx["index_dir"]) + "/pages"
    hit_ids = sorted(int(d) for d in docs)
    tbl = pads.dataset(pages_dir).to_table(
        columns=["doc_id", "text"], filter=pads.field("doc_id").isin(hit_ids)
    )
    text_of = dict(
        zip(tbl.column("doc_id").to_pylist(), tbl.column("text").to_pylist())
    )
    rows = []
    for rank, d in enumerate(docs.tolist()):
        start, pscore, snip = make_snippet_passages(text_of.get(int(d), ""), terms)
        rows.append(
            {
                "doc_id": int(d),
                "rank": rank,
                "passage_start": start,
                "passage_score": pscore,
                "snippet": snip,
            }
        )
    return pa.table(
        {
            "doc_id": pa.array([r["doc_id"] for r in rows], type=pa.int64()),
            "rank": pa.array([r["rank"] for r in rows], type=pa.int64()),
            "passage_start": pa.array(
                [r["passage_start"] for r in rows], type=pa.int64()
            ),
            "passage_score": pa.array(
                [r["passage_score"] for r in rows], type=pa.float64()
            ),
            "snippet": pa.array([r["snippet"] for r in rows], type=pa.string()),
        }
    )


def bm25_snippets_offsets(
    sf_dir: str, query: str = "data join", k: int = 10
) -> pa.Table:
    """Two-phase search + highlight where match spans come from the INDEX'S
    offset stream (IndexOptions ..._AND_OFFSETS; Lucene84 .pay offsets +
    the UnifiedHighlighter offsets strategy) instead of re-tokenizing the
    fetched text: top-k over an offsets-enabled index, doc_id-pushdown
    fetch of the source text, fragments rendered around the stored
    (start, end) spans."""
    import pyarrow.dataset as pads

    from .checkpoint import load_merge_manifest
    from .search import IndexSearcher
    from .textops import make_snippet_offsets, offset_spans_for_doc

    idx = get_index(sf_dir, index_offsets=True)
    searcher = IndexSearcher(load_merge_manifest(idx["index_dir"]))
    docs, scores = searcher.search(query, k)
    terms = [t for t in query.lower().split() if t.isalnum()]
    n_rows = pq.read_metadata(os.path.join(sf_dir, "documents.parquet")).num_rows
    pages_dir = os.path.join(_cache_dir(sf_dir, n_rows), "pages")
    hit_ids = sorted(int(d) for d in docs)
    tbl = pads.dataset(pages_dir).to_table(
        columns=["doc_id", "text"], filter=pads.field("doc_id").isin(hit_ids)
    )
    text_of = dict(
        zip(tbl.column("doc_id").to_pylist(), tbl.column("text").to_pylist())
    )
    seg = searcher.segments[0]  # merged index: one logical segment
    snips = []
    for rank, (d, s) in enumerate(zip(docs.tolist(), scores.tolist())):
        spans = offset_spans_for_doc(seg, terms, int(d))
        snips.append(
            {
                "rank": rank,
                "doc_id": int(d),
                "score": float(s),
                "snippet": make_snippet_offsets(text_of.get(int(d), ""), spans),
            }
        )
    return pa.table(
        {
            "rank": pa.array([r["rank"] for r in snips], type=pa.int64()),
            "doc_id": pa.array([r["doc_id"] for r in snips], type=pa.int64()),
            "score": pa.array([r["score"] for r in snips], type=pa.float32()),
            "snippet": pa.array([r["snippet"] for r in snips], type=pa.string()),
        }
    )


def term_filter_sort_by_field(
    sf_dir: str, term: str = "data", k: int = 20
) -> pa.Table:
    """Sort-by-field search (Sort/TopFieldCollector role): docs matching
    ``term`` ordered by the n_chars doc-value column desc (tie: doc_id
    asc), top k. Two-phase: docIDs from the inverted index, field values
    fetched from the source table with a row-filter pushdown (the
    QueryComponent ids-then-fields shape)."""
    import pyarrow.dataset as pads

    from .checkpoint import load_merge_manifest
    from .search import IndexSearcher

    idx = get_index(sf_dir)
    searcher = IndexSearcher(load_merge_manifest(idx["index_dir"]))
    docs = np.concatenate([seg.postings(term)[0] for seg in searcher.segments])
    if len(docs) == 0:
        return pa.table(
            {
                "rank": pa.array([], type=pa.int64()),
                "doc_id": pa.array([], type=pa.int64()),
                "n_chars": pa.array([], type=pa.int64()),
            }
        )
    # doc-values fetch: candidate doc_ids -> n_chars straight from the
    # per-segment DV sidecars (index/DocValuesType.java NUMERIC; the
    # Sort/TopFieldCollector field fetch) — repeated sorts cost O(touched
    # DV ranges), the source row store is never read
    from .docvalues import DocValuesReader

    dv = DocValuesReader(idx["build_manifest"]["partitions"])
    docs = np.sort(docs)
    n_chars = dv.values_for(docs, "n_chars").astype(np.int64)
    order = np.lexsort((docs, -n_chars))[:k]
    return pa.table(
        {
            "rank": pa.array(np.arange(len(order)), type=pa.int64()),
            "doc_id": pa.array(docs[order], type=pa.int64()),
            "n_chars": pa.array(n_chars[order], type=pa.int64()),
        }
    )


def lang_facet_dv(sf_dir: str) -> pa.Table:
    """Flat facet over the INDEX'S lang doc-values column (the
    SortedSetDocValues facet role, lucene/facet SSDVFacetCounts): per-block
    Arrow group-count combiner over the DV sidecars, one tiny final sum —
    the source row store is never read. Same oracle as the relational
    facet (counts must agree with documents.lang exactly)."""
    from .docvalues import facet_counts

    idx = get_index(sf_dir)
    t = facet_counts(idx["build_manifest"], "lang")
    return pa.table({"lang": t.column("lang"), "n_docs": t.column("cnt")})


def range_facet_nchars(sf_dir: str) -> pa.Table:
    """Numeric range facet over the index's n_chars doc-values column
    (LongRangeFacetCounts role; ranges overlap on purpose — a doc counts
    into every containing range, LongRange semantics). Oracle: the same
    filtered counts over documents.n_chars."""
    from .docvalues import range_facet_counts

    idx = get_index(sf_dir)
    ranges = [
        ("0-150", 0, 150),
        ("150-300", 150, 300),
        ("300-450", 300, 450),
        ("450+", 450, 1 << 40),
        ("mid-100-400", 100, 400),  # overlapping: LongRange allows it
    ]
    return range_facet_counts(idx["build_manifest"], "n_chars", ranges)


def spell_suggest_body(sf_dir: str) -> pa.Table:
    """DirectSpellChecker suggestions against the merged BODY dictionary:
    for each misspelled word the top-5 terms within 2 edits, ranked by
    (distance asc, df desc, term asc). Oracle recomputes the dictionary
    + DuckDB levenshtein over documents.text."""
    from .suggest import spell_suggest

    idx = get_index(sf_dir)
    words = ["dta", "jion", "hsh", "qurey", "streem", "windo", "tabel", "kei"]
    return spell_suggest(idx["merge_manifest"], words, max_edits=2, top_n=5)


def spell_collation(
    sf_dir: str,
    query: tuple = ("dta", "jion"),
    tries_per_term: int = 2,
    max_out: int = 5,
) -> pa.Table:
    """Solr SpellCheckCollator role (solr/core spelling/SpellCheckCollator
    collate(): correct each query term, re-run candidate combinations as
    real queries, report the ones that actually hit): per misspelled term
    take the top ``tries_per_term`` DirectSpellChecker suggestions
    (dist asc, df desc, term asc — the spell_suggest ranking), form every
    combination as a MUST conjunction, count hits via the exact
    IndexSearcher.count API, keep collations with hits > 0 ranked by
    (hits desc, collation asc). Deviation documented: Solr iterates
    combinations by aggregate suggestion rank with a tries cap; with
    tries_per_term=2 the combination space here is the same set.

    All-integer output (hits) over two driver-green chains (the
    levenshtein suggestion ranking and the conjunction count), so the
    oracle replays exactly. Scale posture: suggestion scan is the
    distributed per-shard pass; the collation loop touches
    tries_per_term^n_terms combinations — bounded by parameters."""
    from itertools import product

    from .checkpoint import load_merge_manifest
    from .search import IndexSearcher
    from .suggest import spell_suggest

    idx = get_index(sf_dir)
    sugg = spell_suggest(
        idx["merge_manifest"], list(query), max_edits=2, top_n=tries_per_term
    ).to_pandas()
    per_term: dict[str, list] = {w: [] for w in query}
    for w, s in zip(sugg["word"], sugg["suggestion"]):
        per_term[w].append(s)  # already rank-ordered

    searcher = IndexSearcher(load_merge_manifest(idx["index_dir"]))
    out: list[tuple[str, int]] = []
    for combo in product(*[per_term[w] for w in query]):
        hits = searcher.count(" ".join(f"+{t}" for t in combo))
        if hits > 0:
            out.append((" ".join(combo), hits))
    out.sort(key=lambda t: (-t[1], t[0]))
    out = out[:max_out]
    return pa.table(
        {
            "rank": pa.array(np.arange(len(out)), type=pa.int64()),
            "collation": pa.array([c for c, _ in out], type=pa.string()),
            "hits": pa.array([h for _, h in out], type=pa.int64()),
        }
    )


def prefix_complete_body(sf_dir: str, prefix: str = "s") -> pa.Table:
    """Prefix completion over the merged body dictionary ranked by df
    (FSTCompletion / AnalyzingInfixSuggester role); exact oracle from the
    recomputed term dictionary."""
    from .suggest import complete_prefix

    idx = get_index(sf_dir)
    return complete_prefix(idx["merge_manifest"], prefix, top_n=10)


def word_breaks_body(sf_dir: str) -> pa.Table:
    """WordBreakSpellChecker single-break suggestions over the merged
    body dictionary; exact oracle via substr splits + the recomputed
    term dictionary."""
    from .suggest import word_breaks

    idx = get_index(sf_dir)
    words = ["datajoin", "hashmerge", "sortkey", "fastrow", "nosplit"]
    return word_breaks(idx["merge_manifest"], words, top_n=5)


def free_text_suggest_body(sf_dir: str) -> pa.Table:
    """FreeTextSuggester (suggest/analyzing/FreeTextSuggester.java):
    stupid-backoff bigram LM built distributed over the documents table;
    three key shapes — completed context ('data '), bare prefix ('so'),
    context+prefix with backoff + seen-skip ('data jo')."""
    from .suggest import free_text_suggest

    return free_text_suggest(sf_dir, ["data ", "so", "data jo"], num=10)


def replica_bm25_topk(sf_dir: str, query: str = "data join", k: int = 10) -> pa.Table:
    """Replicate the index (lucene/replicator revision-sync role) into a
    replica directory, then serve BM25 top-k FROM THE REPLICA — results
    are bit-identical to the primary's (tested)."""
    from .checkpoint import load_merge_manifest
    from .replicate import replicate_index
    from .search import IndexSearcher

    idx = get_index(sf_dir)
    replica = idx["index_dir"].rstrip("/") + "-replica"
    replicate_index(idx["index_dir"], replica)
    searcher = IndexSearcher(load_merge_manifest(replica))
    docs, scores = searcher.search(query, k)
    return pa.table(
        {
            "rank": pa.array(np.arange(len(docs)), type=pa.int64()),
            "doc_id": pa.array(docs, type=pa.int64()),
            "score": pa.array(scores, type=pa.float32()),
        }
    )


def sorted_index_topk(
    sf_dir: str, term: str = "data", k: int = 20, descending: bool = True
) -> pa.Table:
    """Index-sorted top-k (IndexWriterConfig.setIndexSort +
    TopFieldCollector early termination): documents range-partitioned by
    n_chars (the sorted layout), a term filter's postings pushed into
    the part reads, scan stops when the next part's bound cannot beat
    the k-th hit. (rank, doc_id, n_chars)."""
    from .checkpoint import load_merge_manifest
    from .search import IndexSearcher
    from .sortindex import build_sorted_layout, sorted_topk

    idx = get_index(sf_dir)
    layout = build_sorted_layout(sf_dir, col="n_chars", n_parts=8)
    searcher = IndexSearcher(load_merge_manifest(idx["index_dir"]))
    docs_all = [seg.postings(term)[0] for seg in searcher.segments]
    filt = np.sort(np.concatenate(docs_all)) if docs_all else np.empty(0, np.int64)
    out, _scanned = sorted_topk(layout, k, descending=descending, filter_docs=filt)
    return pa.table(
        {
            "rank": pa.array(np.arange(out.num_rows), type=pa.int64()),
            "doc_id": pa.array(
                out.column("doc_id").to_numpy(), type=pa.int64()
            ),
            "n_chars": pa.array(
                out.column("n_chars").to_numpy(), type=pa.int64()
            ),
        }
    )


def _interval_match_table(
    sf_dir: str, terms: tuple[str, ...], ordered: bool, **kw
) -> pa.Table:
    from .intervals import doc_interval_counts

    searcher = _span_searcher(sf_dir)
    docs_all, n_all = [], []
    for seg in searcher.segments:
        docs, counts = doc_interval_counts(seg, terms, ordered=ordered, **kw)
        docs_all.append(docs)
        n_all.append(counts)
    docs = np.concatenate(docs_all) if docs_all else np.empty(0, np.int64)
    counts = np.concatenate(n_all) if n_all else np.empty(0, np.int64)
    order = np.argsort(docs, kind="stable")
    return pa.table(
        {
            "doc_id": pa.array(docs[order], type=pa.int64()),
            "matches": pa.array(counts[order], type=pa.int64()),
        }
    )


def intervals_ordered_docs(
    sf_dir: str, t1: str = "data", t2: str = "join", max_gaps: int = 2
) -> pa.Table:
    """Intervals.maxgaps(Intervals.ordered(t1, t2)) match counts —
    minimal ordered intervals (OrderedIntervalsSource.java:133-166: the
    last head before each distinct chain end) filtered by gaps. Oracle:
    the (a, b) pairs with b = first t2 after a and a = last t1 before b
    and b - a - 1 <= max_gaps."""
    return _interval_match_table(
        sf_dir, (t1, t2), ordered=True, max_gaps=max_gaps
    )


def intervals_unordered_docs(
    sf_dir: str, t1: str = "hash", t2: str = "merge", max_width: int = 4
) -> pa.Table:
    """Intervals.maxwidth(Intervals.unordered(t1, t2)) match counts —
    minimal unordered windows; for two unit terms these are exactly the
    adjacent hetero-type pairs of the merged position sequence (the
    DuckDB lead() oracle)."""
    return _interval_match_table(
        sf_dir, (t1, t2), ordered=False, max_width=max_width
    )


COMMON_TERMS = ("dup", "data", "join")  # 'dup' is the only low-freq term


def common_terms_query_ir(searcher, terms, max_term_frequency: float = 0.25):
    """CommonTermsQuery.buildQuery (queries/CommonTermsQuery.java:158-219):
    split terms at docFreq > ceil(f * maxDoc) (f = 0.25 is binary-exact,
    so float32 and float64 agree); low-freq group = nested MUST bool,
    high-freq group = nested SHOULD bool; all-high degrades to a
    conjunction (the slow-query guard)."""
    import math

    from .queryparse import BoolQuery

    cutoff = int(math.ceil(max_term_frequency * searcher.doc_count))
    low = tuple(
        t for t in terms if searcher.global_term_stats(t)[0] <= cutoff
    )
    high = tuple(t for t in terms if t not in low)
    if not low:
        return BoolQuery(must=high)
    sub_should = (BoolQuery(should=high),) if high else ()
    return BoolQuery(sub_must=(BoolQuery(must=low),), sub_should=sub_should)


def common_terms_match_docs(sf_dir: str) -> pa.Table:
    """(doc_id) matching the CommonTermsQuery over COMMON_TERMS — with a
    non-empty low-freq group the hit set is exactly the docs containing
    ALL low-freq terms (the MUST sub-bool); high-freq terms only score.
    Oracle recomputes the df split in SQL."""
    searcher = _span_searcher(sf_dir)
    ir = common_terms_query_ir(searcher, COMMON_TERMS)
    docs, _scores = searcher.search(ir, k=searcher.doc_count)
    return pa.table({"doc_id": pa.array(np.sort(docs), type=pa.int64())})


def common_terms_topk(sf_dir: str, k: int = 10) -> pa.Table:
    """BM25-scored CommonTermsQuery top-k (rows; ranking exercised by the
    nested-bool scorer equivalence tests)."""
    searcher = _span_searcher(sf_dir)
    ir = common_terms_query_ir(searcher, COMMON_TERMS)
    docs, scores = searcher.search(ir, k)
    return pa.table(
        {
            "rank": pa.array(np.arange(len(docs)), type=pa.int64()),
            "doc_id": pa.array(docs, type=pa.int64()),
            "score": pa.array(scores, type=pa.float32()),
        }
    )


def index_stats(sf_dir: str) -> pa.Table:
    """Luke-role index diagnostics (the reference's Luke overview panel /
    HighFreqTerms tooling): per indexed field — doc count, distinct term
    count (merged dict shards are term-disjoint, so their n_terms sum),
    total token count. Exact oracle recomputes all three from source."""
    from .checkpoint import load_merge_manifest

    idx = get_index(sf_dir)
    mm = load_merge_manifest(idx["index_dir"])
    n_terms = sum(int(s["n_terms"]) for s in mm["shards"])
    return pa.table(
        {
            "field": pa.array(["body"], type=pa.string()),
            "doc_count": pa.array([int(mm["doc_count"])], type=pa.int64()),
            "n_terms": pa.array([n_terms], type=pa.int64()),
            "sum_ttf": pa.array([int(mm["sum_ttf"])], type=pa.int64()),
        }
    )


def live_term_match_docs(sf_dir: str) -> pa.Table:
    """deleteDocuments + liveDocs search masking: replicate the index,
    delete every doc containing 'dup' (deleteDocuments(Term)), then the
    match set of 'data' on the replica excludes them — while stats keep
    pre-merge counts (Lucene's exact contract). Oracle: data docs
    without dup."""
    from .checkpoint import load_merge_manifest
    from .deletes import delete_by_term
    from .replicate import replicate_index
    from .search import IndexSearcher

    idx = get_index(sf_dir)
    replica = idx["index_dir"].rstrip("/") + "-replica-del"
    replicate_index(idx["index_dir"], replica)
    delete_by_term(replica, "dup")
    searcher = IndexSearcher(load_merge_manifest(replica))
    docs, _scores = searcher.search("data", k=searcher.doc_count)
    return pa.table({"doc_id": pa.array(np.sort(docs), type=pa.int64())})


def lmdirichlet_topk_sharded(sf_dir: str, k: int = 10) -> pa.Table:
    """The LM Similarity plug on the DISTRIBUTED scatter/gather path:
    the same 'data join' query under LMDirichletSimilarity fans out over
    doc shards with global stats injected — shard-local LM scores are
    globally comparable because every weight derives solely from the
    shipped (df, ttf) + collection stats, so the reduce stays a TopDocs
    merge and the result is bit-identical to the single searcher (the
    oracle IS lmdirichlet_topk's)."""
    import ray.data

    from .search import search_dataset_sharded

    idx = get_index(sf_dir)
    qds = ray.data.from_items([{"query_id": 0, "query": "data join", "k": k}])
    out = search_dataset_sharded(
        qds, idx["build_manifest"], n_shards=3, similarity="lmdirichlet"
    ).to_pandas()
    out = out.sort_values("rank")
    return pa.table(
        {
            "rank": pa.array(out["rank"].astype("int64")),
            "doc_id": pa.array(out["doc_id"].astype("int64")),
            "score": pa.array(out["score"].astype("float32")),
        }
    )


def omit_norms_topk(sf_dir: str, query: str = "data join", k: int = 10) -> pa.Table:
    """Top-k with norms OMITTED (FieldType.omitNorms: absent norms read
    as the long 1 — LeafSimScorer.java:47-54 — so every doc scores as
    length 1; tf still counts, length normalization vanishes). Exact
    oracle: the BM25 chain with the norm-cache entry for length 1."""
    from .checkpoint import load_merge_manifest
    from .search import IndexSearcher

    idx = get_index(sf_dir)
    searcher = IndexSearcher(load_merge_manifest(idx["index_dir"]), omit_norms=True)
    docs, scores = searcher.search(query, k=k)
    return pa.table(
        {
            "rank": pa.array(np.arange(len(docs)), type=pa.int64()),
            "doc_id": pa.array(docs, type=pa.int64()),
            "score": pa.array(scores, type=pa.float32()),
        }
    )


def query_counts(sf_dir: str) -> pa.Table:
    """IndexSearcher.count over the reference query shapes (the exact
    hit-count API, Weight#count fast path for single terms): (query, n).
    Exact oracle recomputes each count from the raw text."""
    from .checkpoint import load_merge_manifest
    from .search import IndexSearcher

    idx = get_index(sf_dir)
    searcher = IndexSearcher(load_merge_manifest(idx["index_dir"]))
    queries = [
        "data",
        "data join",
        "+data +join",
        "+data -dup",
        '"data join"',
        "*",
    ]
    return pa.table(
        {
            "query": pa.array(queries, type=pa.string()),
            "n": pa.array(
                [searcher.count(q) for q in queries], type=pa.int64()
            ),
        }
    )


def live_query_match_docs(sf_dir: str) -> pa.Table:
    """deleteDocuments(Query) + liveDocs masking: replicate the index,
    delete every doc matching the BOOLEAN query '+dup +slow'
    (IndexWriter.deleteDocuments(Query) — the by-query overload the
    by-term entry doesn't exercise), then the 'data' match set on the
    replica excludes exactly the docs containing BOTH terms. Oracle:
    data docs minus (dup AND slow) docs."""
    from .checkpoint import load_merge_manifest
    from .deletes import delete_by_query
    from .replicate import replicate_index
    from .search import IndexSearcher

    idx = get_index(sf_dir)
    replica = idx["index_dir"].rstrip("/") + "-replica-delq"
    replicate_index(idx["index_dir"], replica)
    delete_by_query(replica, "+dup +slow")
    searcher = IndexSearcher(load_merge_manifest(replica))
    docs, _scores = searcher.search("data", k=searcher.doc_count)
    return pa.table({"doc_id": pa.array(np.sort(docs), type=pa.int64())})


def get_synonym_index(sf_dir: str, partition_docs: int = 2048) -> dict:
    """Index variant built with an index-time synonym graph
    (SynonymGraphFilter role): 'quick' stacked at every 'fast' position.
    Separate cache variant; shares the pages dir."""
    from .analyze import Analyzer
    from .build import build_index
    from .checkpoint import load_manifest, load_merge_manifest
    from .fixtures import pages_from_documents, write_pages
    from .merge import merge_by_term

    n_rows = pq.read_metadata(os.path.join(sf_dir, "documents.parquet")).num_rows
    root = _cache_dir(sf_dir, n_rows, "-syn")
    pages_dir = os.path.join(_cache_dir(sf_dir, n_rows), "pages")
    index_dir = os.path.join(root, "index")
    os.makedirs(root, exist_ok=True)
    build_manifest = load_manifest(index_dir)
    if build_manifest is None:
        if not os.path.exists(os.path.join(pages_dir, "pages-00000.parquet")):
            write_pages(pages_from_documents(sf_dir), pages_dir, n_files=4)
        build_manifest = build_index(
            pages_dir,
            index_dir,
            partition_docs=partition_docs,
            from_html=True,
            analyzer=Analyzer(synonyms=(("fast", ("quick",)),)),
        )
    merge_manifest = load_merge_manifest(index_dir)
    if merge_manifest is None:
        merge_manifest = merge_by_term(build_manifest, index_dir)
    return {
        "index_dir": index_dir,
        "build_manifest": build_manifest,
        "merge_manifest": merge_manifest,
    }


def get_common_grams_index(sf_dir: str, partition_docs: int = 2048) -> dict:
    """Index variant built with CommonGramsFilter (analysis/commongrams/
    CommonGramsFilter.java): bigrams "w1_w2" stacked at w1's position for
    every stream-adjacent pair touching the common set ('the'). Separate
    cache variant; shares the pages dir."""
    from .analyze import Analyzer
    from .build import build_index
    from .checkpoint import load_manifest, load_merge_manifest
    from .fixtures import pages_from_documents, write_pages
    from .merge import merge_by_term

    n_rows = pq.read_metadata(os.path.join(sf_dir, "documents.parquet")).num_rows
    root = _cache_dir(sf_dir, n_rows, "-cg")
    pages_dir = os.path.join(_cache_dir(sf_dir, n_rows), "pages")
    index_dir = os.path.join(root, "index")
    os.makedirs(root, exist_ok=True)
    build_manifest = load_manifest(index_dir)
    if build_manifest is None:
        if not os.path.exists(os.path.join(pages_dir, "pages-00000.parquet")):
            write_pages(pages_from_documents(sf_dir), pages_dir, n_files=4)
        build_manifest = build_index(
            pages_dir,
            index_dir,
            partition_docs=partition_docs,
            from_html=True,
            analyzer=Analyzer(common_grams=("the",)),
        )
    merge_manifest = load_merge_manifest(index_dir)
    if merge_manifest is None:
        merge_manifest = merge_by_term(build_manifest, index_dir)
    return {
        "index_dir": index_dir,
        "build_manifest": build_manifest,
        "merge_manifest": merge_manifest,
    }


def get_keyword_repeat_index(sf_dir: str, partition_docs: int = 2048) -> dict:
    """Index variant built with KeywordRepeatFilter + PorterStemFilter +
    RemoveDuplicatesTokenFilter (miscellaneous/KeywordRepeatFilter.java,
    RemoveDuplicatesTokenFilter.java): every position indexes the
    original token AND its Porter stem (posIncr 0) when they differ, so
    both exact-form and stemmed queries match. Separate cache variant;
    shares the pages dir."""
    from .analyze import Analyzer
    from .build import build_index
    from .checkpoint import load_manifest, load_merge_manifest
    from .fixtures import pages_from_documents, write_pages
    from .merge import merge_by_term

    n_rows = pq.read_metadata(os.path.join(sf_dir, "documents.parquet")).num_rows
    root = _cache_dir(sf_dir, n_rows, "-kr")
    pages_dir = os.path.join(_cache_dir(sf_dir, n_rows), "pages")
    index_dir = os.path.join(root, "index")
    os.makedirs(root, exist_ok=True)
    build_manifest = load_manifest(index_dir)
    if build_manifest is None:
        if not os.path.exists(os.path.join(pages_dir, "pages-00000.parquet")):
            write_pages(pages_from_documents(sf_dir), pages_dir, n_files=4)
        build_manifest = build_index(
            pages_dir,
            index_dir,
            partition_docs=partition_docs,
            from_html=True,
            analyzer=Analyzer(filters=("porter",), keyword_repeat=True),
        )
    merge_manifest = load_merge_manifest(index_dir)
    if merge_manifest is None:
        merge_manifest = merge_by_term(build_manifest, index_dir)
    return {
        "index_dir": index_dir,
        "build_manifest": build_manifest,
        "merge_manifest": merge_manifest,
    }


def keyword_repeat_docs(
    sf_dir: str, terms: tuple[str, ...] = ("query", "queri", "data")
) -> pa.Table:
    """(term, doc_id, freq) postings over the keyword-repeat index: the
    ORIGINAL surface form and its Porter stem both resolve — 'queri'
    (the stem) carries exactly the 'query' occurrences, while unchanged
    stems ('data') index once (RemoveDuplicates). Oracle: raw token
    counts, with stem terms mapped back to the vocabulary words that
    stem to them."""
    from .checkpoint import load_merge_manifest
    from .search import IndexSearcher

    idx = get_keyword_repeat_index(sf_dir)
    searcher = IndexSearcher(load_merge_manifest(idx["index_dir"]))
    t_out: list[str] = []
    d_out: list[np.ndarray] = []
    f_out: list[np.ndarray] = []
    for t in terms:
        docs_all, freqs_all = [], []
        for seg in searcher.segments:
            docs, freqs = seg.postings(t)
            docs_all.append(docs)
            freqs_all.append(freqs)
        docs = np.concatenate(docs_all) if docs_all else np.empty(0, np.int64)
        freqs = np.concatenate(freqs_all) if freqs_all else np.empty(0, np.int64)
        order = np.argsort(docs)
        t_out.extend([t] * len(docs))
        d_out.append(docs[order])
        f_out.append(freqs[order].astype(np.int64))
    return pa.table(
        {
            "term": pa.array(t_out, type=pa.string()),
            "doc_id": pa.array(
                np.concatenate(d_out) if d_out else np.empty(0, np.int64)
            ),
            "freq": pa.array(
                np.concatenate(f_out) if f_out else np.empty(0, np.int64)
            ),
        }
    )


def common_grams_docs(sf_dir: str, gram: str = "the_data") -> pa.Table:
    """(doc_id, freq) for a common-gram term — the CommonGramsQueryFilter
    contract (commongrams/CommonGramsQueryFilter.java): a query pair
    touching a common word is answered by ONE gram-term postings read
    instead of a positional phrase intersection. Oracle: the adjacent-
    positions self-join the gram materialized at index time."""
    from .checkpoint import load_merge_manifest
    from .search import IndexSearcher

    idx = get_common_grams_index(sf_dir)
    searcher = IndexSearcher(load_merge_manifest(idx["index_dir"]))
    docs_all, freqs_all = [], []
    for seg in searcher.segments:
        docs, freqs = seg.postings(gram)
        docs_all.append(docs)
        freqs_all.append(freqs)
    docs = np.concatenate(docs_all) if docs_all else np.empty(0, np.int64)
    freqs = np.concatenate(freqs_all) if freqs_all else np.empty(0, np.int64)
    order = np.argsort(docs)
    return pa.table(
        {
            "doc_id": pa.array(docs[order], type=pa.int64()),
            "freq": pa.array(freqs[order].astype(np.int64), type=pa.int64()),
        }
    )


def synonym_phrase_match_docs(sf_dir: str) -> pa.Table:
    """Phrase '"quick row"' over the synonym-graph index: 'quick' is
    stacked at every 'fast' position (posIncr 0), so the phrase matches
    docs with a 'fast row' adjacency — the SynonymGraphFilter contract
    that stacked tokens participate in phrases. Oracle: the b.p = a.p+1
    positions self-join ('quick' does not occur natively in the fixture
    vocabulary)."""
    from .checkpoint import load_merge_manifest
    from .search import IndexSearcher, _phrase_postings

    idx = get_synonym_index(sf_dir)
    searcher = IndexSearcher(load_merge_manifest(idx["index_dir"]))
    docs_all = []
    for seg in searcher.segments:
        docs, _f = _phrase_postings(seg, ("quick", "row"))
        docs_all.append(docs)
    out = np.sort(np.concatenate(docs_all)) if docs_all else np.empty(0, np.int64)
    return pa.table({"doc_id": pa.array(out, type=pa.int64())})


def term_vector_doc(sf_dir: str, doc_id: int = 7) -> pa.Table:
    """Per-document term vector — IndexReader.getTermVector(doc, field)
    (the stored .tvd term-vectors role, codecs/compressing/
    CompressingTermVectorsFormat): (term, pos) rows for one doc, served
    by a doc_id-pushdown row-store fetch + the analyzer (the engine
    stores the forward text, so the vector recomputes instead of
    duplicating a per-doc postings copy — same information, same API)."""
    import pyarrow.dataset as pads

    from .analyze import analyze_batch_with_positions

    src = os.path.join(sf_dir, "documents.parquet")
    t = pads.dataset(src).to_table(
        columns=["text"], filter=pads.field("doc_id") == doc_id
    )
    text = t.column("text")[0].as_py() if t.num_rows else ""
    flat, _lengths, positions = analyze_batch_with_positions([text or ""])
    order = np.argsort(positions, kind="stable")
    return pa.table(
        {
            "term": pa.array([flat[i] for i in order.tolist()], type=pa.string()),
            "pos": pa.array(positions[order], type=pa.int64()),
        }
    )


def stats_component_nchars(sf_dir: str, term: str = "data") -> pa.Table:
    """Solr StatsComponent over a query's result set (solr StatsComponent
    min/max/sum/count): n_chars stats of the docs matching ``term``,
    served from the index postings + the DocValues sidecar (no row-store
    scan). Integer stats — exact oracle."""
    from .checkpoint import load_merge_manifest
    from .docvalues import DocValuesReader
    from .search import IndexSearcher

    idx = get_index(sf_dir)
    searcher = IndexSearcher(load_merge_manifest(idx["index_dir"]))
    docs_all = [seg.postings(term)[0] for seg in searcher.segments]
    docs = np.sort(np.concatenate(docs_all)) if docs_all else np.empty(0, np.int64)
    dv = DocValuesReader(idx["build_manifest"]["partitions"])
    vals = dv.values_for(docs, "n_chars").astype(np.int64)
    return pa.table(
        {
            "count": pa.array([len(vals)], type=pa.int64()),
            "min": pa.array([int(vals.min()) if len(vals) else 0], type=pa.int64()),
            "max": pa.array([int(vals.max()) if len(vals) else 0], type=pa.int64()),
            "sum": pa.array([int(vals.sum()) if len(vals) else 0], type=pa.int64()),
        }
    )


def nrt_match_docs(sf_dir: str, term: str = "data") -> pa.Table:
    """addDocuments + NRT reopen: replicate the index, flush a recrawl
    batch (the first 50 docs re-added with ids N+i — the
    dedup_pages_by_url recrawl pattern) as an NRT segment, reopen, and
    match ``term`` — new docs are visible without a merge. Oracle: the
    term's doc set UNION the shifted recrawl ids."""
    import pyarrow.dataset as pads

    from .nrt import nrt_add_documents, nrt_reader
    from .replicate import replicate_index

    idx = get_index(sf_dir)
    replica = idx["index_dir"].rstrip("/") + "-replica-nrt"
    replicate_index(idx["index_dir"], replica)
    src = os.path.join(sf_dir, "documents.parquet")
    n_docs = pq.read_metadata(src).num_rows
    t = pads.dataset(src).to_table(
        columns=["doc_id", "text"], filter=pads.field("doc_id") < 50
    )
    new_ids = t.column("doc_id").to_numpy().astype(np.int64) + n_docs
    order = np.argsort(new_ids)
    nrt_add_documents(
        replica,
        new_ids[order],
        [t.column("text").to_pylist()[i] for i in order.tolist()],
    )
    searcher = nrt_reader(replica)
    docs, _scores = searcher.search(term, k=searcher.doc_count)
    return pa.table({"doc_id": pa.array(np.sort(docs), type=pa.int64())})


def more_like_this_terms(sf_dir: str, doc_id: int = 7) -> pa.Table:
    """MoreLikeThis term selection for one example doc (MoreLikeThis.java
    createQueue): tf from the analyzed doc text (doc_id-pushdown row-store
    read), df from a term-pushdown pruned dictionary read, ClassicSimilarity
    idf, top terms by (tf*idf desc, term asc). Integer-exact output."""
    import pyarrow.dataset as pads

    from .mlt import mlt_terms_table

    idx = get_index(sf_dir)
    src = os.path.join(sf_dir, "documents.parquet")
    t = pads.dataset(src).to_table(
        columns=["text"], filter=pads.field("doc_id") == doc_id
    )
    text = t.column("text")[0].as_py() if t.num_rows else ""
    return mlt_terms_table(
        idx["merge_manifest"],
        text,
        doc_id,
        max_query_terms=10,
        min_term_freq=2,
        min_doc_freq=5,
    )


MLT_FREE_TEXT = "data data join join merge hash the the data table query scan"


def mlt_like_text_topk(sf_dir: str, text: str | None = None, k: int = 10) -> pa.Table:
    """MoreLikeThis from FREE TEXT (MoreLikeThis.like(Reader) — the
    'find documents like this pasted snippet' entry point, no example
    doc in the index): identical term selection + SHOULD search as the
    by-doc variant, with tf from the supplied text. Exact oracle: the
    literal text's token counts replay in SQL."""
    from .checkpoint import load_merge_manifest
    from .mlt import select_like_terms
    from .search import IndexSearcher

    idx = get_index(sf_dir)
    sel = select_like_terms(
        idx["merge_manifest"],
        text if text is not None else MLT_FREE_TEXT,
        max_query_terms=10,
        min_term_freq=2,
        min_doc_freq=5,
    )
    if not sel:
        return pa.table(
            {
                "rank": pa.array([], type=pa.int64()),
                "doc_id": pa.array([], type=pa.int64()),
                "score": pa.array([], type=pa.float32()),
            }
        )
    searcher = IndexSearcher(load_merge_manifest(idx["index_dir"]))
    docs, scores = searcher.search(" ".join(term for term, _, _, _ in sel), k)
    return pa.table(
        {
            "rank": pa.array(np.arange(len(docs)), type=pa.int64()),
            "doc_id": pa.array(docs, type=pa.int64()),
            "score": pa.array(scores, type=pa.float32()),
        }
    )


def more_like_this_topk(sf_dir: str, doc_id: int = 7, k: int = 10) -> pa.Table:
    """Full MLT: selected terms searched as a SHOULD query through the
    normal BM25 path (MoreLikeThis.like -> createQuery -> search);
    (rank, doc_id, score) — the example doc naturally ranks first."""
    from .checkpoint import load_merge_manifest
    from .mlt import select_like_terms
    from .search import IndexSearcher

    import pyarrow.dataset as pads

    idx = get_index(sf_dir)
    src = os.path.join(sf_dir, "documents.parquet")
    t = pads.dataset(src).to_table(
        columns=["text"], filter=pads.field("doc_id") == doc_id
    )
    text = t.column("text")[0].as_py() if t.num_rows else ""
    sel = select_like_terms(
        idx["merge_manifest"], text, max_query_terms=10, min_term_freq=2, min_doc_freq=5
    )
    if not sel:
        return pa.table(
            {
                "rank": pa.array([], type=pa.int64()),
                "doc_id": pa.array([], type=pa.int64()),
                "score": pa.array([], type=pa.float32()),
            }
        )
    searcher = IndexSearcher(load_merge_manifest(idx["index_dir"]))
    docs, scores = searcher.search(" ".join(term for term, _, _, _ in sel), k)
    return pa.table(
        {
            "rank": pa.array(np.arange(len(docs)), type=pa.int64()),
            "doc_id": pa.array(docs, type=pa.int64()),
            "score": pa.array(scores, type=pa.float32()),
        }
    )


def prf_expand_topk(
    sf_dir: str,
    query: str = "data",
    fb_k: int = 10,
    max_terms: int = 10,
    k: int = 10,
) -> pa.Table:
    """Pseudo-relevance feedback (Rocchio 1971 / blind RF, the classic
    two-pass expansion): first-pass BM25 top-``fb_k`` for ``query``,
    expansion terms selected from the feedback docs' concatenated token
    stream with the MoreLikeThis rule (tf >= 2 in the pseudo-doc,
    df >= 5, top-``max_terms`` by tf * idf — queries/mlt
    MoreLikeThis.java:570-620 retrieveTerms/createQueue over a
    multi-doc reader), then a second pass searching [original +
    expansions] as a SHOULD disjunction in selection order.

    Every stage is a driver-green chain: first-pass ranks = the
    bm25_topk f32 CTE; the selection = the more_like_this selection CTE
    with the pseudo-doc as tf source (concatenating texts with spaces
    preserves the token multiset — tokens are [a-z0-9]+); the final
    fold = the flagship clause-ordered f64 accumulation. The feedback
    fetch is a doc_id-pushdown read of fb_k rows — bounded, never a
    corpus scan."""
    import pyarrow.dataset as pads

    from .checkpoint import load_merge_manifest
    from .mlt import select_like_terms
    from .search import IndexSearcher

    idx = get_index(sf_dir)
    searcher = IndexSearcher(load_merge_manifest(idx["index_dir"]))
    d1, _ = searcher.search(query, fb_k)

    src = os.path.join(sf_dir, "documents.parquet")
    t = pads.dataset(src).to_table(
        columns=["text"], filter=pads.field("doc_id").isin([int(d) for d in d1])
    )
    pseudo_doc = " ".join(x or "" for x in t.column("text").to_pylist())
    sel = select_like_terms(
        idx["merge_manifest"],
        pseudo_doc,
        max_query_terms=max_terms,
        min_term_freq=2,
        min_doc_freq=5,
    )
    terms = [query] + [term for term, _, _, _ in sel if term != query]
    docs, scores = searcher.search(" ".join(terms), k)
    return pa.table(
        {
            "rank": pa.array(np.arange(len(docs)), type=pa.int64()),
            "doc_id": pa.array(docs, type=pa.int64()),
            "score": pa.array(scores, type=pa.float32()),
        }
    )


def bm25_topk_sharded(sf_dir: str, n_shards: int = 3) -> pa.Table:
    """The doc-sharded scatter/gather search path (SURVEY §3.2) over the
    partition index: must produce the same hits as the single-searcher
    plan for plain boolean queries (TopDocs-merge exactness)."""
    import ray.data

    from .search import search_dataset_sharded

    idx = get_index(sf_dir)
    # the fan-out rewrites prefix/match-all against the full dictionary, so
    # the ENTIRE reference set (incl. '*' queries) goes through the shards
    queries = ray.data.from_items(
        [{"query_id": q, "query": s, "k": k} for q, s, k in REFERENCE_QUERIES]
    )
    return search_dataset_sharded(queries, idx["build_manifest"], n_shards=n_shards)


def bm25_search_after_pages(
    sf_dir: str, query: str = "data join", page_k: int = 10, n_pages: int = 3
) -> pa.Table:
    """Deep paging — IndexSearcher.searchAfter
    (search/IndexSearcher.java:416-433, PagingTopScoreDocCollector in
    search/TopScoreDocCollector.java:66-107): page 1 via search(), every
    next page via search_after() on the previous page's LAST (score, doc)
    mark. Ranks are absolute, so the chained pages must equal one big
    top-(page_k * n_pages); the oracle replays that as OFFSET pagination
    over the f32 score CTE."""
    from .checkpoint import load_merge_manifest
    from .search import IndexSearcher

    idx = get_index(sf_dir)
    searcher = IndexSearcher(load_merge_manifest(idx["index_dir"]))
    ranks: list[int] = []
    docs_out: list[int] = []
    scores_out: list[float] = []
    after: tuple[float, int] | None = None
    base = 0
    for _ in range(n_pages):
        d, s = searcher.search_after(query, after, k=page_k)
        ranks.extend(range(base, base + len(d)))
        docs_out.extend(d.tolist())
        scores_out.extend(s.tolist())
        if len(d) < page_k:
            break  # past the last page
        after = (float(s[-1]), int(d[-1]))
        base += len(d)
    return pa.table(
        {
            "rank": pa.array(ranks, type=pa.int32()),
            "doc_id": pa.array(docs_out, type=pa.int64()),
            "score": pa.array(scores_out, type=pa.float32()),
        }
    )


def cursor_mark_sharded(
    sf_dir: str, query: str = "data join", page_k: int = 10, n_shards: int = 3
) -> pa.Table:
    """Solr cursorMark deep paging over the doc-sharded scatter/gather
    path (Solr CursorMark: the totem is the last hit's sort values,
    re-sent to every shard next page): page 1's mark from the merged
    searcher, page 2 executed by search_dataset_sharded with the mark
    shipped alongside the plan — every shard pages locally against the
    same global mark and the reduce stays a plain TopDocs merge. Emits
    page 2 with absolute ranks."""
    import ray.data

    from .checkpoint import load_merge_manifest
    from .search import IndexSearcher, search_dataset_sharded

    idx = get_index(sf_dir)
    searcher = IndexSearcher(load_merge_manifest(idx["index_dir"]))
    d1, s1 = searcher.search(query, k=page_k)
    if len(d1) < page_k:
        return pa.table(
            {
                "rank": pa.array([], type=pa.int32()),
                "doc_id": pa.array([], type=pa.int64()),
                "score": pa.array([], type=pa.float32()),
            }
        )
    queries = ray.data.from_items(
        [
            {
                "query_id": 0,
                "query": query,
                "k": page_k,
                "after_score": float(s1[-1]),
                "after_doc": int(d1[-1]),
            }
        ]
    )
    res = search_dataset_sharded(
        queries, idx["build_manifest"], n_shards=n_shards
    ).to_arrow_refs()
    import ray as _ray

    tbl = pa.concat_tables([_ray.get(r) for r in res])
    rank = tbl["rank"].to_numpy().astype(np.int32) + np.int32(page_k)
    return pa.table(
        {
            "rank": pa.array(rank),
            "doc_id": tbl["doc_id"].combine_chunks(),
            "score": tbl["score"].combine_chunks(),
        }
    )


def rerank_topk(
    sf_dir: str,
    query: str = "data join",
    rerank_query: str = "merge",
    weight: float = 2.0,
    window: int = 30,
    k: int = 10,
) -> pa.Table:
    """Two-pass re-ranking — QueryRescorer
    (search/QueryRescorer.java:51-131) with the Solr ReRank combine
    (ReRankQParserPlugin.java:86-92, reRankDocs window + reRankWeight):
    first pass BM25 top-``window``, second pass re-scores that window
    with ``rerank_query``, combined = (float)((double)first +
    weight * (double)second) on matches, first unchanged otherwise."""
    from .checkpoint import load_merge_manifest
    from .search import IndexSearcher

    idx = get_index(sf_dir)
    searcher = IndexSearcher(load_merge_manifest(idx["index_dir"]))
    d1, s1 = searcher.search(query, k=window)
    d2, s2 = searcher.rescore(d1, s1, rerank_query, weight=weight, top_n=k)
    return pa.table(
        {
            "rank": pa.array(np.arange(len(d2), dtype=np.int32)),
            "doc_id": pa.array(d2, type=pa.int64()),
            "score": pa.array(s2, type=pa.float32()),
        }
    )


def corpus_curation(
    sf_dir: str,
    quality_min: float = 0.35,
    dup_num: int = 19,
    dup_den: int = 20,
    bigram_num: int = 1,
    bigram_den: int = 10,
):
    """End-to-end training-corpus curation — the composed LLM-data
    pipeline (C4/Gopher/FineWeb shape) as ONE streaming Dataset flow
    over documents ∪ a deterministic recrawl copy (doc_id + n, same
    text — the dedup_pages_by_url fixture pattern, so the dedup stage
    has real work):

      1. language ID gate (lang_pred == 'en', the langid chain);
      2. quality gate (composite score >= quality_min, the bit-exact
         f64 chain);
      3. Gopher repetition gates in INTEGER arithmetic
         (n_dup_tokens * dup_den <= n_tokens * dup_num;
          top_bigram_cnt * bigram_den <= n_bigrams * bigram_num);
      4. exact content dedup (groupby(md5) with NATIVE Min/Count —
         every text-derived column is constant within a group, so the
         winner's quality/token columns are Min()s too, no arg-min
         packing needed);
      5. BPE-ish token budget per kept doc.

    One map_batches actor pool computes every per-doc signal (profiles
    and regexes built once per actor in __init__), survivors stream
    into one hash groupby — the only shuffle; rejected docs never leave
    their input task. Returns (doc_id, quality, n_bpe_tokens,
    dup_count) for kept docs."""
    import ray.data

    from .dedup import content_hash_batch
    from .rayenv import Opaque, read_parquet_clean
    from .rayenv import remote_args as _rargs
    from .textops import LangId, QualityScorer, bpe_token_count_batch, gopher_repetition_batch

    src_path = os.path.join(sf_dir, "documents.parquet")
    n_docs = pq.read_metadata(src_path).num_rows
    ds = read_parquet_clean(src_path, columns=["doc_id", "text"])

    def shift(b: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        return b.set_column(
            b.schema.get_field_index("doc_id"),
            "doc_id",
            pc.add(b.column("doc_id"), n_docs),
        )

    src = ds.union(ds.map_batches(shift, batch_format="pyarrow", **_rargs()))

    class CurationStage:
        def __init__(self, params):
            p = params.obj if hasattr(params, "obj") else params
            self.quality_min = p["quality_min"]
            self.dup_num, self.dup_den = p["dup_num"], p["dup_den"]
            self.bigram_num, self.bigram_den = p["bigram_num"], p["bigram_den"]
            self.lid = LangId()
            self.qs = QualityScorer()

        def __call__(self, b: pa.Table) -> pa.Table:
            lang = np.asarray(self.lid(b).column("lang_pred").to_pylist())
            quality = self.qs(b).column("quality").to_numpy()
            g = gopher_repetition_batch(b)
            n_tok = g.column("n_tokens").to_numpy()
            n_dup = g.column("n_dup_tokens").to_numpy()
            n_bi = g.column("n_bigrams").to_numpy()
            top_bi = g.column("top_bigram_cnt").to_numpy()
            keep = (
                (lang == "en")
                & (quality >= self.quality_min)
                & (n_dup * self.dup_den <= n_tok * self.dup_num)
                & (top_bi * self.bigram_den <= n_bi * self.bigram_num)
            )
            kept = b.filter(pa.array(keep))
            kept = content_hash_batch(kept)
            n_bpe = bpe_token_count_batch(kept).column("n_bpe_tokens")
            return pa.table(
                {
                    "doc_id": kept.column("doc_id"),
                    "content_hash": kept.column("content_hash"),
                    "quality": pa.array(quality[keep], type=pa.float64()),
                    "n_bpe_tokens": n_bpe,
                }
            )

    from ray.data.aggregate import Count, Min

    params = Opaque(
        {
            "quality_min": quality_min,
            "dup_num": dup_num,
            "dup_den": dup_den,
            "bigram_num": bigram_num,
            "bigram_den": bigram_den,
        }
    )
    surv = src.map_batches(
        CurationStage,
        batch_format="pyarrow",
        concurrency=(1, 8),
        fn_constructor_args=(params,),
        **_rargs(),
    )
    agg = surv.groupby("content_hash").aggregate(
        Min("doc_id", alias_name="doc_id"),
        Min("quality", alias_name="quality"),
        Min("n_bpe_tokens", alias_name="n_bpe_tokens"),
        Count(alias_name="dup_count"),
    )

    def finish(b: pa.Table) -> pa.Table:
        return pa.table(
            {
                "doc_id": b.column("doc_id").cast(pa.int64()),
                "quality": b.column("quality"),
                "n_bpe_tokens": b.column("n_bpe_tokens").cast(pa.int64()),
                "dup_count": b.column("dup_count").cast(pa.int64()),
            }
        )

    return agg.map_batches(finish, batch_format="pyarrow", **_rargs())


def rrf_fusion_topk(
    sf_dir: str,
    query: str = "data join",
    query_vec_id: int = 0,
    n_each: int = 10,
    k: int = 10,
    rrf_k: int = 60,
) -> pa.Table:
    """Reciprocal Rank Fusion of a lexical BM25 list and a dense cosine
    list over the shared id space (embeddings.vec_id indexes
    documents.doc_id) — the rank-based hybrid-retrieval combiner of
    Cormack/Clarke/Buettcher SIGIR'09, the shape Solr/Elasticsearch ship
    as "hybrid search" (the reference era predates a built-in; the role
    slots beside QueryRescorer, search/QueryRescorer.java:51).

    score(d) = 1/(rrf_k + r_lex(d)) + 1/(rrf_k + r_dense(d)) with
    1-based ranks and +0.0 for a missing list. Each addend is ONE
    correctly-rounded f64 division and the fusion is ONE f64 add
    (lexical first), so the fused score replays bit-for-bit in DuckDB;
    the input ranks are integers from two independently driver-green
    chains (the bm25_topk f32 CTE and the ann_cosine_top10 rank order).

    Scale posture: both retrievers are distributed (index scatter /
    per-batch matmul partial top-k); the fusion itself touches only the
    <= 2*n_each surviving rows — bounded by k, never by corpus size."""
    import pyarrow.dataset as pads
    import ray.data

    from . import ann
    from .checkpoint import load_merge_manifest
    from .search import IndexSearcher

    idx = get_index(sf_dir)
    searcher = IndexSearcher(load_merge_manifest(idx["index_dir"]))
    lex_docs, _ = searcher.search(query, n_each)
    lex_rank = {int(d): i + 1 for i, d in enumerate(lex_docs)}

    emb_path = os.path.join(sf_dir, "embeddings.parquet")
    qt = pads.dataset(emb_path).to_table(
        columns=["embedding"], filter=pads.field("vec_id") == query_vec_id
    )
    qv = np.asarray(qt.column("embedding")[0].as_py(), dtype=np.float64)
    dense = ann.brute_force_topk_ds(
        ray.data.read_parquet(emb_path),
        qv[None, :],
        np.asarray([query_vec_id]),
        k=n_each,
    ).to_pandas()  # bounded: exactly n_each rows reach the driver
    dense_rank = {
        int(n): int(r) + 1 for n, r in zip(dense["neighbor_id"], dense["rank"])
    }

    fused: list[tuple[int, float]] = []
    for d in sorted(set(lex_rank) | set(dense_rank)):
        a = 1.0 / (rrf_k + lex_rank[d]) if d in lex_rank else 0.0
        b = 1.0 / (rrf_k + dense_rank[d]) if d in dense_rank else 0.0
        fused.append((d, a + b))  # one f64 add, lexical addend first
    fused.sort(key=lambda t: (-t[1], t[0]))
    fused = fused[:k]
    return pa.table(
        {
            "rank": pa.array(np.arange(len(fused)), type=pa.int64()),
            "doc_id": pa.array([d for d, _ in fused], type=pa.int64()),
            "rrf": pa.array([s for _, s in fused], type=pa.float64()),
        }
    )


def word_delimiter_terms(sf_dir: str) -> "object":
    """WordDelimiterGraphFilter terms for injected product-code-style
    tokens (analysis/common/.../miscellaneous/WordDelimiterGraphFilter.java
    — Solr's text_en_splitting splitter): every doc contributes the token
    ``Wi-Fi{doc_id % 10}PowerShot's`` (deterministic injection, the
    pii_scrub pattern), expanded with GENERATE_WORD_PARTS +
    GENERATE_NUMBER_PARTS + CATENATE_WORDS + CATENATE_ALL +
    PRESERVE_ORIGINAL and lowercased downstream (the chain order:
    WDGF splits on case BEFORE LowerCaseFilter). Emits (doc_id, term)
    rows; only 10 distinct injected tokens exist, so the expansion is
    memoized per batch (no per-row state machine in the hot loop)."""
    import ray.data

    from .filters import word_delimiter_parts
    from .rayenv import read_parquet_clean

    ds = read_parquet_clean(
        os.path.join(sf_dir, "documents.parquet"), columns=["doc_id"]
    )
    expansions = {
        d: [
            t.lower()
            for t in word_delimiter_parts(
                f"Wi-Fi{d}PowerShot's",
                catenate_words=True,
                catenate_all=True,
                preserve_original=True,
            )
        ]
        for d in range(10)
    }

    def _expand(batch: pa.Table) -> pa.Table:
        ids = batch.column("doc_id").to_numpy()
        n = len(expansions[0])
        out_ids = np.repeat(ids, n)
        terms = np.concatenate([np.array(expansions[int(i) % 10]) for i in ids])
        return pa.table(
            {
                "doc_id": pa.array(out_ids, type=pa.int64()),
                "term": pa.array(terms, type=pa.string()),
            }
        )

    from .rayenv import remote_args as _ra

    return ds.map_batches(_expand, batch_format="pyarrow", **_ra())


def get_points(sf_dir: str, field: str = "n_chars") -> tuple[dict, dict]:
    """Points index over one numeric DV column of the cached corpus index
    (built once per corpus, write-once resume). Returns (index, points
    manifest)."""
    from .points import build_points

    idx = get_index(sf_dir)
    pts = build_points(idx["build_manifest"], idx["index_dir"], field)
    return idx, pts


def points_range_match_docs(sf_dir: str, lo: int = 150, hi: int = 400) -> pa.Table:
    """LongPoint.newRangeQuery(field, lo, hi) over the n_chars points
    index (document/LongPoint.java:120-143 — bounds INCLUSIVE; BKD leaf
    prune per engine/points.py). Oracle: n_chars BETWEEN lo AND hi."""
    from .points import range_docs

    _idx, pts = get_points(sf_dir)
    return range_docs(pts, lo, hi)


def term_points_filter_docs(
    sf_dir: str, term: str = "data", lo: int = 150, hi: int = 400
) -> pa.Table:
    """BooleanQuery{ MUST TermQuery, FILTER LongPoint.newRangeQuery } —
    the reference's standard "text match + numeric filter" plan
    (BooleanClause.Occur.FILTER, search/BooleanClause.java:31-38: the
    range clause restricts matches but contributes no score). The term
    funnel comes from the inverted index, the range set from the points
    leaves; intersection is the filter conjunction."""
    from .checkpoint import load_merge_manifest
    from .points import range_docs
    from .search import IndexSearcher

    idx, pts = get_points(sf_dir)
    searcher = IndexSearcher(load_merge_manifest(idx["index_dir"]))
    docs, _scores = searcher.search(term, k=searcher.doc_count)
    range_set = range_docs(pts, lo, hi).column("doc_id").to_numpy()
    both = np.intersect1d(np.asarray(docs, dtype=np.int64), range_set)
    return pa.table({"doc_id": pa.array(both, type=pa.int64())})


def range_field_match_docs(sf_dir: str, q_lo: int = 3000, q_hi: int = 6000):
    """Range-field query (document/LongRange + RangeFieldQuery.java
    QueryType): per-doc [lo, hi] intervals indexed lo-sorted with
    min-lo/max-hi leaf stats; every doc range intersecting the query
    range streams out classified WITHIN / CONTAINS / CROSSES. Exact
    integer oracle replays the doc_id-derived interval fixture."""
    from .points import build_range_field, range_field_docs

    idx = get_index(sf_dir)
    rm = build_range_field(idx["build_manifest"], idx["index_dir"])
    return range_field_docs(rm, q_lo, q_hi)


def index_or_dv_filter_docs(
    sf_dir: str, term: str = "data", lo: int = 150, hi: int = 400
) -> pa.Table:
    """IndexOrDocValuesQuery (search/IndexOrDocValuesQuery.java:30-76):
    the same numeric-range predicate carries TWO strategies — the points
    index (fast when the range leads) and per-candidate DocValues
    verification (fast when another clause leads with far fewer docs).
    The planner compares lead costs (term df vs the points side's
    footer-stats estimate, ScorerSupplier.cost()) and either verifies
    the term's candidates against the DV sidecar (dvQuery path) or runs
    the points range and intersects (indexQuery path). Both paths
    return the identical doc set (asserted in tests), so the oracle is
    the same term + BETWEEN conjunction as term_points_filter_docs."""
    from .checkpoint import load_merge_manifest
    from .docvalues import DocValuesReader
    from .points import range_docs, range_estimate
    from .search import IndexSearcher

    idx, pts = get_points(sf_dir)
    searcher = IndexSearcher(load_merge_manifest(idx["index_dir"]))
    df, _ttf = searcher.global_term_stats(term)
    est = range_estimate(pts, lo, hi)
    docs, _scores = searcher.search(term, k=searcher.doc_count)
    docs = np.asarray(docs, dtype=np.int64)
    if df <= est:
        # dvQuery path: random-access verification of the term's candidates
        dv = DocValuesReader(idx["build_manifest"]["partitions"])
        vals = dv.values_for(docs, pts["field"])
        both = np.sort(docs[(vals >= lo) & (vals <= hi)])
    else:
        # indexQuery path: the points tree leads, conjunction intersects
        range_set = range_docs(pts, lo, hi).column("doc_id").to_numpy()
        both = np.intersect1d(docs, range_set)
    return pa.table({"doc_id": pa.array(both, type=pa.int64())})


def get_geo(sf_dir: str) -> dict:
    """Geo points index (LatLonPoint role) over the cached corpus index —
    coordinates are the documented doc_id-derived integer fixture
    (engine/geo.py synth_latlon); built once, write-once resume."""
    from .geo import build_geo

    idx = get_index(sf_dir)
    return build_geo(idx["build_manifest"], idx["index_dir"])


def geo_box_match_docs(
    sf_dir: str,
    min_lat: int = -30_000,
    max_lat: int = 30_000,
    min_lon: int = -60_000,
    max_lon: int = 90_000,
):
    """LatLonPoint.newBoxQuery (inclusive integer milli-degrees) — the
    2-D leaf scan with lat/lon row-group pruning. Exact integer oracle
    recomputes the coordinate fixture in SQL. Returns the streamed
    Dataset (the match set never collects on the driver)."""
    from .geo import box_docs

    return box_docs(get_geo(sf_dir), min_lat, max_lat, min_lon, max_lon)


def shape_box_match_docs(
    sf_dir: str,
    min_lat: int = -30_000,
    max_lat: int = 30_000,
    min_lon: int = -60_000,
    max_lon: int = 90_000,
):
    """LatLonShapeBoundingBoxQuery over per-doc diamond shapes
    (document/LatLonShape.java box query with spatial relations): the
    shape index's arm-expanded bbox prune + closed-form exact integer
    test (clamped L1 distance vs arm); (doc_id, relation) streamed.
    Exact oracle replays the center/arm fixture and both relations."""
    from .geo import build_shapes, shape_box_docs

    idx = get_index(sf_dir)
    shapes = build_shapes(idx["build_manifest"], idx["index_dir"])
    return shape_box_docs(shapes, min_lat, max_lat, min_lon, max_lon)


def geo_heatmap_facet(
    sf_dir: str,
    min_lat: int = -60_000,
    max_lat: int = 60_000,
    min_lon: int = -120_000,
    max_lon: int = 120_000,
    grid: int = 8,
) -> pa.Table:
    """Solr facet.heatmap over the geo point fixture: grid-cell counts
    with per-file partial vectors (see geo.heatmap_facet). Exact integer
    oracle replays the fixture + cell arithmetic."""
    from .geo import heatmap_facet

    return heatmap_facet(get_geo(sf_dir), min_lat, max_lat, min_lon, max_lon, grid)


def geo_distance_match_docs(
    sf_dir: str, lat: float = 10.0, lon: float = 20.0, radius_m: float = 2_000_000.0
):
    """LatLonPoint.newDistanceQuery: bounding-rectangle prefilter
    (Rectangle.fromPointDistance role) then the exact haversine mask on
    candidates only; streamed Dataset result. Exact oracle replays the
    same libm chain in SQL (same-machine trig matches bit-for-bit)."""
    from .geo import distance_docs

    return distance_docs(get_geo(sf_dir), lat, lon, radius_m)


EXPRESSION_SRC = "o_totalprice / 1000.0 + sqrt(o_orderkey) - ln(o_custkey + 1)"


def expression_score_topk(sf_dir: str, k: int = 25) -> pa.Table:
    """Compiled-expression top-k (lucene/expressions JavascriptCompiler
    role — engine/expressions.py): the arithmetic source compiles once
    into a vectorized numpy function, evaluates per batch over pruned
    Arrow columns, partial top-k combiner per batch. Exact float64 SQL
    oracle (same op order, same libm)."""
    from .expressions import expression_topk_dataset
    from .relational import _read

    ds = _read(sf_dir, "orders", ["o_orderkey", "o_custkey", "o_totalprice"])
    return expression_topk_dataset(
        ds,
        EXPRESSION_SRC,
        bindings=["o_totalprice", "o_orderkey", "o_custkey"],
        id_col="o_orderkey",
        k=k,
    )


def frange_docs(sf_dir: str, lo: float = 100.0, hi: float = 200.0):
    """Solr {!frange l= u=} / FunctionRangeQuery
    (queries/function/FunctionRangeQuery.java): docs whose compiled
    function value falls in the inclusive [lo, hi] — the same expression
    compiler as expression_score_topk, evaluated as a streamed filter.
    Exact float64 oracle (identical op order, same libm sqrt/ln)."""
    from .expressions import expression_range_dataset
    from .relational import _read

    ds = _read(sf_dir, "orders", ["o_orderkey", "o_custkey", "o_totalprice"])
    return expression_range_dataset(
        ds,
        EXPRESSION_SRC,
        bindings=["o_totalprice", "o_orderkey", "o_custkey"],
        id_col="o_orderkey",
        lo=lo,
        hi=hi,
    )


# pentagon over the milli-degree grid (lat, lon) — covers a mid-density
# band of the doc_id-derived coordinate fixture
GEO_POLYGON: list[tuple[int, int]] = [
    (-40_000, -120_000),
    (45_000, -90_000),
    (60_000, 30_000),
    (0, 100_000),
    (-55_000, 20_000),
]


def geo_polygon_match_docs(sf_dir: str, poly: list[tuple[int, int]] | None = None):
    """LatLonPoint.newPolygonQuery (even-odd interior over integer
    milli-degrees — engine/geo.py point_in_polygon_mask): bounding-box
    leaf prune + exact int64 crossing parity; streamed Dataset result.
    The oracle replays the same per-edge cross-multiplication in SQL."""
    from .geo import polygon_docs

    return polygon_docs(get_geo(sf_dir), poly or GEO_POLYGON)


def points2d_box_match_docs(
    sf_dir: str,
    user_lo: int = 20,
    user_hi: int = 60,
    ts_lo: int = 1_704_844_800_000_000,  # 2024-01-10 00:00:00 UTC, micros
    ts_hi: int = 1_705_708_800_000_000,  # 2024-01-20 00:00:00 UTC, micros
):
    """2-D BKD box query (IntPoint.newRangeQuery 2-D, inclusive) over the
    events table's (user_id, ts) — alternating-median kd leaf layout,
    leaf-stat pruning on both dims, streamed Dataset result. Exact
    integer oracle: user_id/epoch_us(ts) BETWEEN in SQL."""
    import pyarrow.parquet as _pq

    from .points import box_docs_2d, build_points_2d

    src = os.path.join(sf_dir, "events.parquet")
    n = _pq.read_metadata(src).num_rows
    tag = os.path.basename(os.path.normpath(sf_dir)) or "sf"
    out_dir = os.path.join(CACHE_ROOT, f"{tag}-events{n}-points2d")
    man = build_points_2d(
        src, out_dir, fields=("user_id", "ts"), id_col="event_id",
        rows_per_leaf=256,
    )
    return box_docs_2d(man, user_lo, user_hi, ts_lo, ts_hi)


def geo_nearest_k(
    sf_dir: str, lat: float = 10.0, lon: float = 20.0, k: int = 10
) -> pa.Table:
    """Distance sort (LatLonDocValuesField.newDistanceSort /
    nearest-neighbor prototype): k closest docs, (distance, doc_id)
    tie-break; per-file partial top-k combiner, k-row driver merge."""
    from .geo import nearest_k

    return nearest_k(get_geo(sf_dir), lat, lon, k)

def terms_component(
    sf_dir: str,
    lower: str = "d",
    upper: str = "n",
    limit: int = 20,
    sort: str = "index",
) -> pa.Table:
    """Solr TermsComponent role (solr/handler/component/TermsComponent.java:
    terms.lower / terms.upper / terms.limit / terms.sort): dictionary terms
    in [lower, upper) with df, sorted by term asc ("index") or df desc
    ("count", tie term asc), capped at ``limit``. Served by a pruned
    (term, df) range read over the merged dictionary shards — parquet
    row-group term stats prune non-overlapping shards, nothing scans
    postings. Oracle: the dictionary recomputed from documents.text."""
    import pyarrow.dataset as pads

    idx = get_index(sf_dir)
    shard_paths = [s["path"] for s in idx["merge_manifest"]["shards"]]
    tbl = pads.dataset(shard_paths).to_table(
        columns=["term", "df"],
        filter=(pads.field("term") >= lower) & (pads.field("term") < upper),
    )
    t = tbl.to_pandas()
    if sort == "count":
        t = t.sort_values(["df", "term"], ascending=[False, True])
    else:
        t = t.sort_values("term")
    t = t.head(limit).reset_index(drop=True)
    return pa.table(
        {
            "term": pa.array(t["term"], type=pa.string()),
            "df": pa.array(t["df"].astype("int64"), type=pa.int64()),
        }
    )


def sort_by_fields(sf_dir: str, term: str = "data", k: int = 20) -> pa.Table:
    """Multi-key Sort over DocValues (search/Sort.java with SortField
    chains; TopFieldCollector comparator cascade): docs matching ``term``
    ordered by (n_chars DESC, lang ASC, doc_id ASC) top ``k`` — both sort
    keys served from the DV sidecar (doc-range-routed pruned reads), the
    row store is never touched. Oracle: same ORDER BY over documents."""
    from .checkpoint import load_merge_manifest
    from .docvalues import DocValuesReader
    from .search import IndexSearcher

    idx = get_index(sf_dir)
    searcher = IndexSearcher(load_merge_manifest(idx["index_dir"]))
    docs_all = []
    for seg in searcher.segments:
        docs, _ = seg.postings(term)
        docs_all.append(docs)
    docs = (
        np.concatenate(docs_all) if docs_all else np.empty(0, dtype=np.int64)
    )
    if len(docs) == 0:
        return pa.table(
            {
                "doc_id": pa.array([], type=pa.int64()),
                "n_chars": pa.array([], type=pa.int64()),
                "lang": pa.array([], type=pa.string()),
            }
        )
    dv = DocValuesReader(idx["build_manifest"]["partitions"])
    n_chars = dv.values_for(docs, "n_chars").astype(np.int64)
    lang = dv.values_for(docs, "lang")
    # comparator cascade: n_chars desc, lang asc, doc_id asc
    order = np.lexsort((docs, lang, -n_chars))[:k]
    return pa.table(
        {
            "doc_id": pa.array(docs[order], type=pa.int64()),
            "n_chars": pa.array(n_chars[order], type=pa.int64()),
            "lang": pa.array([str(x) for x in lang[order]], type=pa.string()),
        }
    )


def dv_update_sort(sf_dir: str, k: int = 20) -> pa.Table:
    """In-place numeric DocValues update + sort-by-field
    (IndexWriter.updateNumericDocValue, IndexWriter.java:1715): replicate
    the index, set n_chars = 9999 for every doc containing 'dup' (a new DV
    generation — segments untouched), then the (n_chars DESC, doc_id ASC)
    top-k of 'data' matches reflects the UPDATED values served through the
    DocValuesReader overlay. Oracle: same CASE expression over documents."""
    from .checkpoint import load_merge_manifest
    from .docvalues import DocValuesReader, dv_update_map, update_numeric_docvalue
    from .replicate import replicate_index
    from .search import IndexSearcher

    idx = get_index(sf_dir)
    replica = idx["index_dir"].rstrip("/") + "-replica-dvu"
    replicate_index(idx["index_dir"], replica)
    update_numeric_docvalue(replica, "dup", field="n_chars", value=9999)
    searcher = IndexSearcher(load_merge_manifest(replica))
    docs_all = [seg.postings("data")[0] for seg in searcher.segments]
    docs = np.concatenate(docs_all) if docs_all else np.empty(0, dtype=np.int64)
    if len(docs) == 0:
        return pa.table(
            {
                "rank": pa.array([], type=pa.int64()),
                "doc_id": pa.array([], type=pa.int64()),
                "n_chars": pa.array([], type=pa.int64()),
            }
        )
    dv = DocValuesReader(
        idx["build_manifest"]["partitions"], updates=dv_update_map(replica)
    )
    n_chars = dv.values_for(docs, "n_chars").astype(np.int64)
    order = np.lexsort((docs, -n_chars))[:k]
    return pa.table(
        {
            "rank": pa.array(np.arange(len(order)), type=pa.int64()),
            "doc_id": pa.array(docs[order], type=pa.int64()),
            "n_chars": pa.array(n_chars[order], type=pa.int64()),
        }
    )


def fuzzy_complete_body(sf_dir: str) -> pa.Table:
    """FuzzySuggester completions over the merged body dictionary: keys
    with an embedded typo complete to high-df terms whose same-length
    prefix is within 1 edit (first char exact; keys < 3 chars exact).
    Exact oracle via substr + DuckDB levenshtein."""
    from .suggest import fuzzy_complete

    idx = get_index(sf_dir)
    keys = ["dara", "joyn", "wixdow", "cu", "qxery"]
    return fuzzy_complete(idx["merge_manifest"], keys, max_edits=1, top_n=10)


def bm25_scores_exact(sf_dir: str, term: str = "data") -> pa.Table:
    """Every match of a single TermQuery with its exact float32 BM25 score
    (rank, doc_id, score) — the north rule's "rank-identical top-k docIDs
    and scores" surfaced as a driver entry whose DuckDB oracle recomputes
    the FULL scoring chain from documents.text: df/sum_ttf stats, SmallFloat
    byte4 norms, and every float32 op of BM25Similarity.java:188-235
    replayed as CAST(double-op AS FLOAT) (exact by Figueroa's double-
    rounding theorem: 53 >= 2*24 + 2 for +,-,*,/). k = doc_count is the
    GATE-scale full-set check by design; production search paths cap k
    (top-k collectors) — this entry exists to pin score identity."""
    from .checkpoint import load_merge_manifest
    from .search import IndexSearcher

    idx = get_index(sf_dir)
    searcher = IndexSearcher(load_merge_manifest(idx["index_dir"]))
    docs, scores = searcher.search(term, k=searcher.doc_count)
    return pa.table(
        {
            "rank": pa.array(np.arange(len(docs)), type=pa.int64()),
            "doc_id": pa.array(docs, type=pa.int64()),
            "score": pa.array(scores, type=pa.float32()),
        }
    )


def bm25_bool_scores_exact(sf_dir: str, query: str = "data merge") -> pa.Table:
    """2-term disjunction with exact float32 scores (rank, doc_id, score):
    per-term float32 scores accumulate in a float64 then cast
    (DisjunctionSumScorer contract) — exact for two addends, so the SQL
    oracle replays the whole chain bit-for-bit."""
    from .checkpoint import load_merge_manifest
    from .search import IndexSearcher

    idx = get_index(sf_dir)
    searcher = IndexSearcher(load_merge_manifest(idx["index_dir"]))
    docs, scores = searcher.search(query, k=searcher.doc_count)
    return pa.table(
        {
            "rank": pa.array(np.arange(len(docs)), type=pa.int64()),
            "doc_id": pa.array(docs, type=pa.int64()),
            "score": pa.array(scores, type=pa.float32()),
        }
    )


def bm25_phrase_scores_exact(sf_dir: str, phrase: str = '"data join"') -> pa.Table:
    """Exact float32 PhraseQuery scores (slop 0): idf = two per-term
    float32 idfs summed in a double then cast (BM25Similarity.idfExplain),
    freq = the integer adjacency count — every op SQL-replayable, so the
    phrase SCORING chain (not just the match set) gets an independent
    bit-exact oracle."""
    from .checkpoint import load_merge_manifest
    from .search import IndexSearcher

    idx = get_index(sf_dir)
    searcher = IndexSearcher(load_merge_manifest(idx["index_dir"]))
    docs, scores = searcher.search(phrase, k=searcher.doc_count)
    return pa.table(
        {
            "rank": pa.array(np.arange(len(docs)), type=pa.int64()),
            "doc_id": pa.array(docs, type=pa.int64()),
            "score": pa.array(scores, type=pa.float32()),
        }
    )


def lang_stats_facet(sf_dir: str) -> "pa.Table":
    """JSON-facet-with-stats role (Solr json.facet sub-aggregations /
    stats.facet): per lang bucket over the index's DV SIDECAR — doc count
    plus sum/min/max of the n_chars numeric DV. One streamed pass with
    per-block Arrow group-aggregates (the map-side combiner), then a
    native groupby over (blocks x langs) partials; the row store is never
    read. Exact SQL oracle over documents."""
    import ray
    from ray.data.aggregate import Max, Min, Sum

    from .docvalues import read_doc_values_dataset
    from .rayenv import remote_args as _rargs

    idx = get_index(sf_dir)
    ds = read_doc_values_dataset(idx["build_manifest"], ["lang", "n_chars"])

    def partial(b: pa.Table) -> pa.Table:
        agg = b.group_by("lang").aggregate(
            [("n_chars", "count"), ("n_chars", "sum"), ("n_chars", "min"), ("n_chars", "max")]
        )
        # select by generated name, not position (key-vs-aggregate column
        # order differs across pyarrow versions)
        return pa.table(
            {
                "lang": agg.column("lang"),
                "n_docs": agg.column("n_chars_count"),
                "sum_nchars": agg.column("n_chars_sum"),
                "min_nchars": agg.column("n_chars_min"),
                "max_nchars": agg.column("n_chars_max"),
            }
        )

    out = (
        ds.map_batches(partial, batch_format="pyarrow", **_rargs())
        .groupby("lang")
        .aggregate(
            Sum("n_docs", alias_name="n_docs"),
            Sum("sum_nchars", alias_name="sum_nchars"),
            Min("min_nchars", alias_name="min_nchars"),
            Max("max_nchars", alias_name="max_nchars"),
        )
    )
    import pyarrow as _pa

    t = _pa.Table.from_pandas(out.to_pandas(), preserve_index=False)
    return _pa.table(
        {
            "lang": t.column("lang"),
            "n_docs": t.column("n_docs").cast(_pa.int64()),
            "sum_nchars": t.column("sum_nchars").cast(_pa.int64()),
            "min_nchars": t.column("min_nchars").cast(_pa.int64()),
            "max_nchars": t.column("max_nchars").cast(_pa.int64()),
        }
    )


def infix_complete_body(sf_dir: str, fragment: str = "er", top_n: int = 10) -> "pa.Table":
    """AnalyzingInfixSuggester role (suggest/analyzing/
    AnalyzingInfixSuggester.java:118-150 lookup): completions whose term
    CONTAINS the fragment anywhere, ranked by weight (df desc, term asc).
    Unlike the prefix suggester there is no term-range pushdown — the
    dictionary scan is full (the reference pays the same: its infix index
    is a separate search index over suggestion n-grams); per-batch partial
    top-n keeps the reduce driver-small."""
    import ray
    import ray.data

    from .rayenv import remote_args as _rargs

    idx = get_index(sf_dir)
    shard_paths = [s["path"] for s in idx["merge_manifest"]["shards"]]
    frag = fragment.lower()

    def _cand(batch: pa.Table) -> pa.Table:
        terms = batch.column("term").to_pylist()
        dfs = batch.column("df").to_numpy()
        scored = sorted(
            ((-int(dfs[i]), t) for i, t in enumerate(terms) if frag in t)
        )[:top_n]
        return pa.table(
            {
                "suggestion": pa.array([t for _, t in scored], type=pa.string()),
                "df": pa.array([-ndf for ndf, _ in scored], type=pa.int64()),
            }
        )

    partials = (
        ray.data.read_parquet(shard_paths, columns=["term", "df"])
        .map_batches(_cand, batch_format="pyarrow", **_rargs())
        .take_all()
    )
    scored = sorted((-int(r["df"]), r["suggestion"]) for r in partials)[:top_n]
    return pa.table(
        {
            "rank": pa.array(range(len(scored)), type=pa.int64()),
            "suggestion": pa.array([t for _, t in scored], type=pa.string()),
            "df": pa.array([-ndf for ndf, _ in scored], type=pa.int64()),
        }
    )


def export_sorted_docs(sf_dir: str, term: str = "data") -> "ray.data.Dataset":
    """Solr /export handler role (sorted full-result streaming export over
    DocValues, no row store, no top-k cutoff): every match of ``term``
    with its sort keys, ordered (n_chars desc, doc_id asc). The match set
    routes a doc_id filter into a streamed scan of the DV sidecar
    (broadcast as a sorted array in the task closure — the /export
    contract is one query's matches, not a join), and the ordering is a
    DISTRIBUTED Ray Dataset sort, not a driver sort."""
    import ray
    import ray.data

    from .checkpoint import load_merge_manifest
    from .docvalues import read_doc_values_dataset
    from .rayenv import remote_args as _rargs
    from .search import IndexSearcher

    idx = get_index(sf_dir)
    searcher = IndexSearcher(load_merge_manifest(idx["index_dir"]))
    docs_all = [seg.postings(term)[0] for seg in searcher.segments]
    match = np.sort(np.concatenate(docs_all)) if docs_all else np.empty(0, dtype=np.int64)
    # the match set rides every task's closure — refuse rather than ship
    # gigabytes for a stop-word-sized export (the scale path is a Dataset
    # hash join of the match ids against the DV scan)
    if len(match) > 10_000_000:
        raise ValueError(
            f"export_sorted_docs: {len(match)} matching docs would broadcast "
            "the match set to every scan task; join the match ids as a "
            "Dataset instead for exports this large"
        )

    ds = read_doc_values_dataset(idx["build_manifest"], ["n_chars"])

    def filt(b: pa.Table) -> pa.Table:
        d = b.column("doc_id").to_numpy()
        pos = np.searchsorted(match, d)
        pos = np.clip(pos, 0, max(len(match) - 1, 0))
        m = (match[pos] == d) if len(match) else np.zeros(len(d), dtype=bool)
        return pa.table(
            {
                "doc_id": pa.array(d[m]),
                "n_chars": pa.array(
                    b.column("n_chars").to_numpy(zero_copy_only=False)[m].astype(np.int64)
                ),
            }
        )

    return ds.map_batches(filt, batch_format="pyarrow", **_rargs()).sort(
        ["n_chars", "doc_id"], descending=[True, False]
    )


def ltr_rerank_topk(
    sf_dir: str,
    query: str = "data merge",
    window: int = 50,
    k: int = 20,
    weights: tuple = (0.5, 0.05, 0.25, -0.001),
) -> pa.Table:
    """Learning-to-rank rescoring — the Solr LTR contrib role
    (solr/contrib/ltr: LTRScoringQuery rescores the top ``window`` of
    the first pass, FeatureLogger extracts each candidate's feature
    vector, LinearModel.java score(...) = sum_i w_i * f_i). Features:
    f_bm25 (first-pass float32 score), f_tf_sum (total query-term
    freq), f_matched (matched-clause count), f_doc_len (SmallFloat-
    decoded norm length — the same value BM25 used). Model score is a
    LEFT-ASSOCIATED f64 chain of single ops
    (((w0*f1 + w1*f2) + w2*f3) + w3*f4), so the DuckDB replay is
    bit-exact; rerank order = (score desc, doc_id asc).

    The per-candidate feature extraction is bounded by ``window`` (the
    Solr reRankDocs contract — LTR never scores the full corpus), so
    the driver-side loop here is O(window), matching the existing
    QueryRescorer shape; the first pass is the searcher's normal
    distributed/driver path."""
    from .checkpoint import load_merge_manifest
    from .search import IndexSearcher

    idx = get_index(sf_dir)
    searcher = IndexSearcher(load_merge_manifest(idx["index_dir"]))
    d1, s1 = searcher.search(query, k=window)
    w0, w1, w2, w3 = (float(w) for w in weights)
    rows = []
    for doc, sc in zip(d1.tolist(), s1.tolist()):
        ex = searcher.explain(query, doc)
        tf_sum = int(sum(det["freq"] for det in ex["details"]))
        matched = len(ex["details"])
        dl = int(ex["details"][0]["doc_len"]) if ex["details"] else 0
        f1 = float(np.float32(sc))
        ms = (w0 * f1) + (w1 * float(tf_sum))
        ms = ms + (w2 * float(matched))
        ms = ms + (w3 * float(dl))
        rows.append((int(doc), np.float32(sc), tf_sum, matched, dl, ms))
    rows.sort(key=lambda r: (-r[5], r[0]))
    rows = rows[:k]
    return pa.table(
        {
            "rank": pa.array(np.arange(len(rows)), type=pa.int64()),
            "doc_id": pa.array([r[0] for r in rows], type=pa.int64()),
            "f_bm25": pa.array([r[1] for r in rows], type=pa.float32()),
            "f_tf_sum": pa.array([r[2] for r in rows], type=pa.int64()),
            "f_matched": pa.array([r[3] for r in rows], type=pa.int64()),
            "f_doc_len": pa.array([r[4] for r in rows], type=pa.int64()),
            "score": pa.array([r[5] for r in rows], type=pa.float64()),
        }
    )
