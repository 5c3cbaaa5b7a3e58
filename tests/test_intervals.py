"""Interval queries (engine/intervals.py): brute-force minimality
oracles over random docs + driver entries vs DuckDB at sf0.001."""

import numpy as np
import pytest

from engine.intervals import (
    filter_intervals,
    ordered_intervals,
    unordered_intervals,
)


def _brute_minimal(cands: list[tuple[int, int]]) -> set[tuple[int, int]]:
    """Windows not strictly containing another candidate window."""
    out = set()
    cs = set(cands)
    for s, e in cs:
        contains_other = any(
            (s2 >= s and e2 <= e and (s2, e2) != (s, e)) for s2, e2 in cs
        )
        if not contains_other:
            out.add((s, e))
    return out


def _all_ordered_windows(pos_lists):
    import itertools

    out = []
    for sel in itertools.product(*[p.tolist() for p in pos_lists]):
        if all(sel[i] > sel[i - 1] for i in range(1, len(sel))):
            out.append((sel[0], sel[-1]))
    return out


def _all_unordered_windows(pos_lists):
    import itertools

    out = []
    for sel in itertools.product(*[p.tolist() for p in pos_lists]):
        out.append((min(sel), max(sel)))
    return out


def _rand_pos(rng, n_terms, max_pos=25):
    used = set()
    lists = []
    for _ in range(n_terms):
        k = int(rng.integers(1, 5))
        ps = []
        while len(ps) < k:
            p = int(rng.integers(0, max_pos))
            if p not in used:
                used.add(p)
                ps.append(p)
        lists.append(np.array(sorted(ps), dtype=np.int64))
    return lists


def test_ordered_minimality_brute_force():
    rng = np.random.default_rng(5)
    for _ in range(300):
        k = int(rng.integers(2, 4))
        lists = _rand_pos(rng, k)
        got = {(int(s), int(e)) for s, e, _g in ordered_intervals(lists)}
        exp = _brute_minimal(_all_ordered_windows(lists))
        assert got == exp, lists


def test_unordered_minimality_brute_force():
    rng = np.random.default_rng(9)
    for _ in range(300):
        k = int(rng.integers(2, 4))
        lists = _rand_pos(rng, k)
        got = {(int(s), int(e)) for s, e, _g in unordered_intervals(lists)}
        exp = _brute_minimal(_all_unordered_windows(lists))
        assert got == exp, lists


def test_gaps_and_filters():
    lists = [np.array([0, 7]), np.array([3, 9])]
    iv = ordered_intervals(lists)
    # minimal ordered: (0,3) gaps 2 and (7,9) gaps 1
    assert iv.tolist() == [[0, 3, 2], [7, 9, 1]]
    assert filter_intervals(iv, max_gaps=1).tolist() == [[7, 9, 1]]
    assert filter_intervals(iv, max_width=3).tolist() == [[7, 9, 1]]
    assert len(filter_intervals(iv, max_gaps=0)) == 0


@pytest.mark.usefixtures("ray_session")
def test_interval_entries_match_duckdb():
    import duckdb

    import __ray_entry__ as e

    qs, sql = e.queries(), e.oracle_sql()
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW documents AS SELECT * FROM "
        "read_parquet('/root/testdata/sf0.001/documents.parquet')"
    )
    for name in ("intervals_ordered_docs", "intervals_unordered_docs"):
        got = qs[name]("/root/testdata/sf0.001").to_pandas()
        exp = con.execute(sql[name]).fetchdf()
        got = got.sort_values("doc_id").reset_index(drop=True)
        exp = exp.sort_values("doc_id").reset_index(drop=True)
        assert got["doc_id"].tolist() == exp["doc_id"].tolist(), name
        assert got["matches"].tolist() == exp["matches"].astype(int).tolist()
        assert len(got) > 0
