"""Roundtrip property tests for the blocked posting codec — the Spark-side
analog of Lucene's BasePostingsFormatTestCase (random postings through the
codec must decode exactly; SURVEY.md §5)."""

from __future__ import annotations

import numpy as np
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from lucene_solr_spark.codecs.postings_codec import (
    BLOCK_SIZE,
    block_impacts,
    decode_blocks,
    decode_postings,
    encode_postings,
    pack_bits,
    unpack_bits,
    vint_decode,
    vint_encode,
)


@given(
    st.lists(st.integers(0, 2**31 - 1), min_size=0, max_size=300),
    st.integers(1, 32),
)
def test_pack_bits_roundtrip(vals, width):
    vals = [v & ((1 << width) - 1) for v in vals]
    arr = np.asarray(vals, dtype=np.uint64)
    out = unpack_bits(pack_bits(arr, width), len(arr), width)
    assert out.tolist() == vals


@given(st.lists(st.integers(0, 2**40), min_size=0, max_size=200))
def test_vint_roundtrip(vals):
    arr = np.asarray(vals, dtype=np.int64)
    assert vint_decode(vint_encode(arr)).tolist() == vals


def _random_postings(rng, df):
    doc_ids = np.sort(rng.choice(df * 20, size=df, replace=False)).astype(np.int64)
    tfs = (rng.zipf(1.6, size=df).clip(1, 10_000)).astype(np.int64)
    norms = rng.integers(0, 256, size=df).astype(np.int64)
    return doc_ids, tfs, norms


@pytest.mark.parametrize(
    "df", [1, 2, 5, 127, 128, 129, 255, 256, 257, 1000, 5000]
)
def test_encode_decode_roundtrip(df):
    rng = np.random.default_rng(df)
    doc_ids, tfs, norms = _random_postings(rng, df)
    enc = encode_postings(doc_ids, tfs, norms)
    d, t = decode_postings(enc)
    np.testing.assert_array_equal(d, doc_ids)
    np.testing.assert_array_equal(t, tfs)
    assert enc.df == df
    assert enc.ttf == int(tfs.sum())
    # block metadata consistency
    n_blocks = len(enc.block_last)
    assert enc.imp_off[-1] == len(enc.imp_freq)
    assert len(enc.imp_off) == n_blocks + 1
    assert enc.block_last[-1] == doc_ids[-1]


def test_dense_block_one_byte():
    """All-1 deltas → 1 header byte per block (ForDeltaUtil dense case)."""
    doc_ids = np.arange(1000, 1000 + 256, dtype=np.int64)
    tfs = np.ones(256, dtype=np.int64)
    norms = np.full(256, 7, dtype=np.int64)
    enc = encode_postings(doc_ids, tfs, norms)
    assert enc.n_full_blocks == 2
    assert enc.doc_blob == b"\x00\x00"
    d, t = decode_postings(enc)
    np.testing.assert_array_equal(d, doc_ids)
    np.testing.assert_array_equal(t, tfs)


def test_singleton_pulsing():
    enc = encode_postings(
        np.asarray([42], np.int64), np.asarray([7], np.int64), np.asarray([3], np.int64)
    )
    assert enc.singleton_doc == 42 and enc.singleton_tf == 7
    assert enc.doc_blob == b"" and enc.tail_blob == b""
    d, t = decode_postings(enc)
    assert d.tolist() == [42] and t.tolist() == [7]


@settings(max_examples=30)
@given(st.integers(129, 2000), st.integers(0, 2**31))
def test_partial_block_decode(df, seed):
    """Random block subsets decode to exactly those blocks' postings —
    the skip-list replacement contract."""
    rng = np.random.default_rng(seed % 2**32)
    doc_ids, tfs, norms = _random_postings(rng, df)
    enc = encode_postings(doc_ids, tfs, norms)
    n_blocks = len(enc.block_last)
    pick = rng.choice(n_blocks, size=max(1, n_blocks // 2), replace=False)
    d, t = decode_blocks(enc, pick)
    expect_d, expect_t = [], []
    for b in sorted(set(pick.tolist())):
        lo = b * BLOCK_SIZE
        hi = min(df, (b + 1) * BLOCK_SIZE)
        expect_d.append(doc_ids[lo:hi])
        expect_t.append(tfs[lo:hi])
    np.testing.assert_array_equal(d, np.concatenate(expect_d))
    np.testing.assert_array_equal(t, np.concatenate(expect_t))


def test_impacts_frontier_properties():
    rng = np.random.default_rng(0)
    freqs = rng.integers(1, 500, size=128).astype(np.int64)
    norms = rng.integers(0, 256, size=128).astype(np.int64)
    f, n = block_impacts(freqs, norms)
    # strictly increasing freq with strictly increasing norm
    assert (np.diff(f) > 0).all()
    assert (np.diff(n) > 0).all()
    # every original pair is dominated by some frontier pair
    for fq, nm in zip(freqs, norms):
        assert ((f >= fq) & (n <= nm)).any()
    # frontier pairs are real (freq, norm) combos achieving max freq per norm
    for fq, nm in zip(f, n):
        assert ((freqs >= fq) & (norms == nm)).any()


def test_block_first_last_bounds():
    rng = np.random.default_rng(3)
    doc_ids, tfs, norms = _random_postings(rng, 700)
    enc = encode_postings(doc_ids, tfs, norms)
    for i in range(enc.n_full_blocks):
        blk = doc_ids[i * BLOCK_SIZE : (i + 1) * BLOCK_SIZE]
        assert enc.block_first[i] == blk[0]
        assert enc.block_last[i] == blk[-1]
