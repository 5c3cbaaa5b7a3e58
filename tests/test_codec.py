"""Codec round-trips (model: TestForUtil/TestPForUtil/TestForDeltaUtil and
BasePostingsFormatTestCase randomized corpora)."""

import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st

from engine.codec import (
    BLOCK_SIZE,
    decode_block,
    decode_term_postings,
    encode_term_postings,
    impact_frontier,
    merge_frontiers,
    pack_block,
    read_vints,
    unpack_block,
    write_vints,
)


# ---------------------------------------------------------------- vint


@given(st.lists(st.integers(min_value=0, max_value=2**63 - 1), max_size=300))
@settings(max_examples=60, deadline=None)
def test_vint_roundtrip(vals):
    arr = np.array(vals, dtype=np.uint64)
    buf = write_vints(arr)
    out, off = read_vints(buf, len(vals))
    np.testing.assert_array_equal(out, arr)
    assert off == len(buf)


def test_vint_sizes():
    assert write_vints(np.array([0], dtype=np.uint64)) == b"\x00"
    assert write_vints(np.array([127], dtype=np.uint64)) == b"\x7f"
    assert write_vints(np.array([128], dtype=np.uint64)) == b"\x80\x01"
    assert len(write_vints(np.array([2**63 - 1], dtype=np.uint64))) == 9


def test_vint_concat_streams():
    a = np.array([5, 300, 1], dtype=np.uint64)
    b = np.array([2**40], dtype=np.uint64)
    buf = write_vints(a) + write_vints(b)
    va, off = read_vints(buf, 3)
    vb, off = read_vints(buf, 1, off)
    np.testing.assert_array_equal(va, a)
    np.testing.assert_array_equal(vb, b)


# ---------------------------------------------------------------- FOR pack


@given(
    st.integers(min_value=1, max_value=63).flatmap(
        lambda w: st.tuples(
            st.just(w),
            st.lists(
                st.integers(min_value=0, max_value=2**w - 1),
                min_size=BLOCK_SIZE,
                max_size=BLOCK_SIZE,
            ),
        )
    )
)
@settings(max_examples=40, deadline=None)
def test_pack_roundtrip(wv):
    w, vals = wv
    arr = np.array(vals, dtype=np.uint64)
    buf = pack_block(arr, w)
    assert len(buf) == (BLOCK_SIZE * w + 7) // 8
    np.testing.assert_array_equal(unpack_block(buf, w), arr)


# ---------------------------------------------------------------- impacts


def test_impact_frontier_dominance():
    f, n = impact_frontier(np.array([3, 5, 2, 5]), np.array([10, 12, 9, 20]))
    # (5,12) dominates (3,10)? no: norm 12 > 10. pairs: (2,9),(3,10),(5,12),(5,20)
    # (5,20) dominated by (5,12); (3,10) not dominated by (2,9); survivors:
    assert list(zip(f.tolist(), n.tolist())) == [(2, 9), (3, 10), (5, 12)]


def test_impact_frontier_single_norm():
    f, n = impact_frontier(np.array([1, 7, 3]), np.array([4, 4, 4]))
    assert f.tolist() == [7] and n.tolist() == [4]


@given(
    st.lists(
        st.tuples(
            st.integers(min_value=1, max_value=1000),
            st.integers(min_value=0, max_value=255),
        ),
        min_size=1,
        max_size=200,
    )
)
@settings(max_examples=40, deadline=None)
def test_impact_frontier_property(pairs):
    fr = np.array([p[0] for p in pairs])
    no = np.array([p[1] for p in pairs])
    f, n = impact_frontier(fr, no)
    # every input pair is dominated by some frontier pair
    for pf, pn in pairs:
        assert any(ff >= pf and nn <= pn for ff, nn in zip(f.tolist(), n.tolist()))
    # frontier itself has no internal dominance and is sorted
    assert all(n[i] < n[i + 1] and f[i] < f[i + 1] for i in range(len(n) - 1))


def test_merge_frontiers():
    f, n = merge_frontiers(
        np.array([2]), np.array([5], dtype=np.uint8), np.array([4]), np.array([9], dtype=np.uint8)
    )
    assert list(zip(f.tolist(), n.tolist())) == [(2, 5), (4, 9)]


# ---------------------------------------------------------------- postings


def _random_postings(rng, df, max_doc=None, max_freq=2**17):
    max_doc = max_doc or df * 50
    docs = np.sort(rng.choice(max_doc, size=df, replace=False)).astype(np.int64)
    freqs = np.where(
        rng.random(df) < 0.6, 1, rng.integers(1, max_freq, size=df)
    ).astype(np.int64)
    norms = rng.integers(0, 256, size=df).astype(np.uint8)
    return docs, freqs, norms


def test_postings_roundtrip_various_sizes():
    rng = np.random.default_rng(42)
    for df in [2, 3, 127, 128, 129, 255, 256, 300, 1000, 5000]:
        docs, freqs, norms = _random_postings(rng, df)
        tp = encode_term_postings(docs, freqs, norms)
        out_docs, out_freqs = decode_term_postings(tp.blob, df)
        np.testing.assert_array_equal(out_docs, docs)
        np.testing.assert_array_equal(out_freqs, freqs)
        nblocks = (df + BLOCK_SIZE - 1) // BLOCK_SIZE if df % BLOCK_SIZE else df // BLOCK_SIZE
        assert len(tp.block_last_doc) == nblocks
        assert tp.block_last_doc[-1] == docs[-1]
        assert len(tp.imp_start) == nblocks + 1


def test_postings_dense_all_ones_special():
    # adjacent docs, all freqs 1 -> doc blocks collapse to 1 byte, freq token 0
    df = 256
    docs = np.arange(1000, 1000 + df, dtype=np.int64)
    freqs = np.ones(df, dtype=np.int64)
    norms = np.full(df, 7, dtype=np.uint8)
    tp = encode_term_postings(docs, freqs, norms)
    # 2 full blocks: block0: 1B doc token + (1B freq token + 1B vint); same block1,
    # except block0's first delta is 1001 so it is packed, not special
    out_docs, out_freqs = decode_term_postings(tp.blob, df)
    np.testing.assert_array_equal(out_docs, docs)
    np.testing.assert_array_equal(out_freqs, freqs)
    assert len(tp.blob) < 200  # massively compressed vs 256*16 raw bytes


def test_decode_individual_blocks():
    rng = np.random.default_rng(7)
    df = 128 * 3 + 17
    docs, freqs, norms = _random_postings(rng, df)
    tp = encode_term_postings(docs, freqs, norms)
    prev = -1
    got_docs, got_freqs = [], []
    for b in range(len(tp.block_last_doc)):
        d, f = decode_block(tp.blob, tp.block_offset, b, df, prev)
        got_docs.append(d)
        got_freqs.append(f)
        prev = int(d[-1])
        assert prev == tp.block_last_doc[b]
    np.testing.assert_array_equal(np.concatenate(got_docs), docs)
    np.testing.assert_array_equal(np.concatenate(got_freqs), freqs)


def test_large_doc_ids_1e12():
    # global docIDs at 10^12-doc scale must round-trip (wide deltas)
    docs = np.array([10**12, 10**12 + 3, 10**12 + 10**9], dtype=np.int64)
    freqs = np.array([1, 9, 1], dtype=np.int64)
    norms = np.array([3, 3, 3], dtype=np.uint8)
    tp = encode_term_postings(docs, freqs, norms)
    out_docs, out_freqs = decode_term_postings(tp.blob, 3)
    np.testing.assert_array_equal(out_docs, docs)
    np.testing.assert_array_equal(out_freqs, freqs)


@given(st.integers(min_value=2, max_value=600), st.integers(min_value=0, max_value=2**31))
@settings(max_examples=30, deadline=None)
def test_postings_roundtrip_property(df, seed):
    rng = np.random.default_rng(seed)
    docs, freqs, norms = _random_postings(rng, df)
    tp = encode_term_postings(docs, freqs, norms)
    out_docs, out_freqs = decode_term_postings(tp.blob, df)
    np.testing.assert_array_equal(out_docs, docs)
    np.testing.assert_array_equal(out_freqs, freqs)


def test_indexed_decode_matches_plain():
    from engine.codec import decode_term_postings_indexed

    rng = np.random.default_rng(99)
    for df in [2, 127, 128, 129, 500, 1000, 128 * 7, 128 * 7 + 55]:
        docs, freqs, norms = _random_postings(rng, df)
        tp = encode_term_postings(docs, freqs, norms)
        d1, f1 = decode_term_postings(tp.blob, df)
        d2, f2 = decode_term_postings_indexed(tp.blob, df, tp.block_offset)
        np.testing.assert_array_equal(d1, d2)
        np.testing.assert_array_equal(f1, f2)
    # adjacent docs with all-ones deltas + all-equal freqs (special tokens)
    df = 300
    docs = np.arange(5, 5 + df, dtype=np.int64)
    freqs = np.full(df, 7, dtype=np.int64)
    tp = encode_term_postings(docs, freqs, np.full(df, 3, dtype=np.uint8))
    d2, f2 = decode_term_postings_indexed(tp.blob, df, tp.block_offset)
    np.testing.assert_array_equal(d2, docs)
    np.testing.assert_array_equal(f2, freqs)


def test_offsets_roundtrip():
    """Offsets stream (IndexOptions ..._AND_OFFSETS, the .pay offset role):
    interleaved (start delta, length) VInts reset per doc must round-trip
    for arbitrary ascending spans."""
    import numpy as np

    from engine.codec import decode_offsets, encode_offsets

    rng = np.random.default_rng(5)
    freqs = rng.integers(1, 6, size=40).astype(np.int64)
    starts_l, ends_l = [], []
    for f in freqs:
        s = np.cumsum(rng.integers(1, 50, size=int(f))) - 1
        e = s + rng.integers(1, 20, size=int(f))
        starts_l.append(s)
        ends_l.append(e)
    starts = np.concatenate(starts_l)
    ends = np.concatenate(ends_l)
    blob = encode_offsets(starts, ends, freqs)
    got_s, got_e = decode_offsets(blob, freqs)
    assert len(got_s) == len(freqs)
    for i in range(len(freqs)):
        np.testing.assert_array_equal(got_s[i], starts_l[i])
        np.testing.assert_array_equal(got_e[i], ends_l[i])


def test_offsets_concat_is_valid_stream():
    """Doc-disjoint runs byte-concatenate into one valid offsets stream
    (deltas reset per doc) — the merge concat invariant."""
    import numpy as np

    from engine.codec import decode_offsets, encode_offsets

    f1 = np.array([2, 1], dtype=np.int64)
    b1 = encode_offsets(np.array([3, 10, 0]), np.array([7, 14, 4]), f1)
    f2 = np.array([3], dtype=np.int64)
    b2 = encode_offsets(np.array([5, 9, 20]), np.array([8, 12, 26]), f2)
    got_s, got_e = decode_offsets(b1 + b2, np.concatenate([f1, f2]))
    assert [s.tolist() for s in got_s] == [[3, 10], [0], [5, 9, 20]]
    assert [e.tolist() for e in got_e] == [[7, 14], [4], [8, 12, 26]]
