"""DirectSpellChecker-analogue suggester: banded-DP exactness and the
distributed dictionary scan vs an in-process brute force."""

import numpy as np
import pytest

from engine.suggest import levenshtein_banded, spell_suggest


def _lev_full(a: str, b: str) -> int:
    la, lb = len(a), len(b)
    d = np.arange(lb + 1)
    for i in range(1, la + 1):
        prev_diag = d[0]
        d[0] = i
        for j in range(1, lb + 1):
            cur = d[j]
            d[j] = min(
                d[j] + 1,
                d[j - 1] + 1,
                prev_diag + (0 if a[i - 1] == b[j - 1] else 1),
            )
            prev_diag = cur
    return int(d[lb])


def test_banded_equals_full_dp():
    rng = np.random.default_rng(99)
    alpha = "abcde"
    words = [
        "".join(rng.choice(list(alpha), size=rng.integers(0, 8)))
        for _ in range(60)
    ]
    for max_d in (1, 2, 3):
        for a in words[:30]:
            for b in words[30:]:
                full = _lev_full(a, b)
                banded = levenshtein_banded(a, b, max_d)
                if full <= max_d:
                    assert banded == full, (a, b, max_d)
                else:
                    assert banded == max_d + 1, (a, b, max_d)


def test_banded_matches_duckdb():
    # the oracle's levenshtein() must be the same function
    import duckdb

    pairs = [("kitten", "sitting"), ("dta", "data"), ("", "ab"), ("xy", "xy"),
             ("abcd", "dcba"), ("query", "qurey")]
    con = duckdb.connect()
    for a, b in pairs:
        want = con.execute("SELECT levenshtein(?, ?)", [a, b]).fetchone()[0]
        got = levenshtein_banded(a, b, 10)
        assert got == want, (a, b)


@pytest.mark.usefixtures("ray_session")
def test_spell_suggest_matches_brute_force(tmp_path_factory):
    import pyarrow.parquet as pq

    from engine.build import invert_to_segment
    from engine.checkpoint import finalize_build_manifest
    from engine.fixtures import make_pages
    from engine.merge import merge_by_term

    root = tmp_path_factory.mktemp("suggestidx")
    pages = make_pages(400, seed=23)
    texts = pages.column("text").to_pylist()
    rows = []
    for s in range(2):
        lo, hi = s * 200, (s + 1) * 200
        seg_dir = str(root / f"partitions/p{lo:012d}")
        meta = invert_to_segment(
            np.arange(lo, hi, dtype=np.int64), texts[lo:hi], seg_dir
        )
        rows.append(
            {k: meta[k] for k in ("doc_base", "n_docs", "sum_ttf", "n_terms", "wall_ms")}
            | {"seg_dir": seg_dir}
        )
    manifest = finalize_build_manifest(str(root), rows)
    mm = merge_by_term(manifest, str(root))

    # brute force over the full dictionary
    import pyarrow as pa

    dict_tbl = pa.concat_tables(
        [pq.read_table(s["path"], columns=["term", "df"]) for s in mm["shards"]]
    )
    terms = dict_tbl.column("term").to_pylist()
    dfs = dict_tbl.column("df").to_pylist()
    words = ["the0", "t0000", "s0003", "zzzzzzz"]

    def brute(w, max_edits=2, top_n=5):
        scored = []
        for t, df in zip(terms, dfs):
            if t == w:
                continue
            d = _lev_full(w, t)
            if d <= max_edits:
                scored.append((d, -int(df), t))
        scored.sort()
        return scored[:top_n]

    out = spell_suggest(mm, words, max_edits=2, top_n=5).to_pandas()
    for w in words:
        got = [
            (int(r.dist), -int(r.df), r.suggestion)
            for r in out[out["word"] == w].sort_values("rank").itertuples()
        ]
        assert got == brute(w), w
    assert (out[out["word"] == "zzzzzzz"]).empty  # nothing within 2 edits
    # ranks are dense from 0 per word
    for w, g in out.groupby("word"):
        assert g["rank"].tolist() == list(range(len(g)))


@pytest.mark.usefixtures("ray_session")
def test_complete_prefix_weight_order():
    from engine.pipelines import get_index
    from engine.suggest import complete_prefix

    idx = get_index("/root/testdata/sf0.001")
    mm = idx["merge_manifest"]
    out = complete_prefix(mm, "s", top_n=10).to_pandas()
    assert len(out) > 0
    assert all(s.startswith("s") for s in out["suggestion"])
    # weight-descending, term-asc on ties, dense ranks
    dfs = out["df"].tolist()
    assert dfs == sorted(dfs, reverse=True)
    for i in range(1, len(out)):
        if dfs[i] == dfs[i - 1]:
            assert out["suggestion"].iloc[i - 1] < out["suggestion"].iloc[i]
    assert out["rank"].tolist() == list(range(len(out)))
    # no-match prefix => typed empty table
    empty = complete_prefix(mm, "zzzzzz")
    assert empty.num_rows == 0 and empty.column_names == ["rank", "suggestion", "df"]


@pytest.mark.usefixtures("ray_session")
def test_word_breaks_single_split():
    from engine.pipelines import get_index
    from engine.suggest import word_breaks

    idx = get_index("/root/testdata/sf0.001")
    mm = idx["merge_manifest"]
    out = word_breaks(mm, ["datajoin", "zzqqzz"], top_n=5).to_pandas()
    dj = out[out["word"] == "datajoin"]
    assert ("data", "join") in set(zip(dj["left_part"], dj["right_part"]))
    # every suggestion reassembles the word and both halves carry df > 0
    for r in out.itertuples():
        assert r.left_part + r.right_part == r.word
        assert r.df_left > 0 and r.df_right > 0
    assert out[out["word"] == "zzqqzz"].empty
    # NUM_CHANGES_THEN_MAX_FREQUENCY: max(df) non-increasing down the ranks
    m = dj[["df_left", "df_right"]].max(axis=1).tolist()
    assert m == sorted(m, reverse=True)
