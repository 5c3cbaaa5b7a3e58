"""Monitor/percolator (engine/monitor.py): per-doc evaluator unit tests,
presearcher losslessness, and the driver entry vs DuckDB at sf0.001."""

import numpy as np
import pytest

from engine.monitor import (
    compile_queries,
    matches_doc,
    query_anchors,
)
from engine.queryparse import parse_query


def _m(query: str, tokens: list[str]) -> bool:
    q = parse_query(query)
    return matches_doc(q, tokens, np.arange(len(tokens), dtype=np.int64))


def test_matches_doc_clause_families():
    toks = ["data", "join", "fast", "hash"]
    assert _m("data", toks)
    assert not _m("merge", toks)
    assert _m("+data +join", toks)
    assert not _m("+data +merge", toks)
    assert _m("+data -merge", toks)
    assert not _m("+data -hash", toks)
    assert _m('"data join"', toks)
    assert not _m('"join data"', toks)
    assert _m('"data fast"~1', ["data", "x", "fast"])
    assert not _m('"data fast"~0', ["data", "x", "fast"])
    assert _m("da*", toks)
    assert not _m("zz*", toks)
    assert _m("d?ta", toks)
    assert _m("/d[a-z]ta/", toks)
    assert _m("[data TO hash]", toks)  # term range includes 'fast'
    assert not _m("[x TO z]", toks)
    assert _m("joim~1", toks)
    assert not _m("jomp~1", toks)
    assert _m("*", toks)
    assert not _m("", toks)  # empty query matches nothing


def test_matches_doc_nested_and_msm():
    toks = ["data", "hash"]
    assert _m("+(data join) +(hash merge)", toks)
    assert not _m("+(data join) +(miss gone)", toks)
    assert _m("-(miss gone) data", toks)
    q = parse_query("data join hash")
    from dataclasses import replace

    q2 = replace(q, min_should_match=2)
    assert matches_doc(q2, ["data", "hash"], np.arange(2, dtype=np.int64))
    assert not matches_doc(q2, ["data"], np.arange(1, dtype=np.int64))


def test_query_anchors_shapes():
    # conjunction anchors on its longest must term (TermWeightor default)
    assert query_anchors(parse_query("+data +joining")) == {"joining"}
    # disjunction anchors on the union
    assert query_anchors(parse_query("data join")) == {"data", "join"}
    # phrase anchors on its longest term
    assert query_anchors(parse_query('"data joining"')) == {"joining"}
    # multi-term families are unanchorable
    assert query_anchors(parse_query("jo*")) is None
    assert query_anchors(parse_query("*")) is None
    # nested: must-sub anchors suffice
    assert query_anchors(parse_query("+(alpha beta) +(g h)")) == {
        "alpha",
        "beta",
    }


QUERIES = [
    ("t0", "data"),
    ("t1", "+data +join"),
    ("t2", "hash merge"),
    ("t3", '"data join"'),
    ("t4", '"data join"~2'),
    ("t5", "+hash -dup"),
    ("t6", "jo*"),
    ("t7", "+(data join) +(hash merge)"),
    ("t8", "d?ta"),
    ("t9", "[data TO fast]"),
    ("t10", "joim~1"),
]


def test_presearcher_lossless():
    """Anchored candidate selection must never lose a match vs brute
    evaluation of every query (the Presearcher contract)."""
    rng = np.random.default_rng(23)
    vocab = ["data", "join", "hash", "merge", "dup", "fast", "x", "jolt"]
    compiled, anchor_map, always = compile_queries(QUERIES)
    for _ in range(200):
        toks = [
            vocab[i] for i in rng.integers(0, len(vocab), rng.integers(0, 12))
        ]
        pos = np.arange(len(toks), dtype=np.int64)
        brute = {
            qid for qid, ir in compiled.items() if matches_doc(ir, toks, pos)
        }
        cand = set(always)
        for t in set(toks):
            cand.update(anchor_map.get(t, ()))
        pruned = {qid for qid in cand if matches_doc(compiled[qid], toks, pos)}
        assert pruned == brute, (toks, brute - pruned)


@pytest.mark.usefixtures("ray_session")
def test_percolate_entry_matches_duckdb():
    import duckdb

    import __ray_entry__ as e

    qs, sql = e.queries(), e.oracle_sql()
    got = qs["percolate_matches"]("/root/testdata/sf0.001").to_pandas()
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW documents AS SELECT * FROM "
        "read_parquet('/root/testdata/sf0.001/documents.parquet')"
    )
    exp = con.execute(sql["percolate_matches"]).fetchdf()
    key = ["doc_id", "query_id"]
    got_s = got.sort_values(key).reset_index(drop=True)
    exp_s = exp.sort_values(key).reset_index(drop=True)
    assert len(got_s) == len(exp_s)
    assert got_s[key].equals(exp_s[key].astype(got_s[key].dtypes.to_dict()))
    # every registered query family matched at least once at sf0.001
    assert set(got["query_id"]) == {
        "q_data",
        "q_conj",
        "q_phrase",
        "q_disj",
        "q_not",
        "q_sloppy",
        "q_prefix",
        "q_nested",
    }
