"""Posting codec: literal-byte goldens, round trips, block-max invariant.

Mirrors FIXTURES.md §6: known doc_id lists → expected gaps → expected varint
bytes; block-max upper-bound property with block size 4.
"""

from __future__ import annotations

import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st

from instructor_embedding_spark.functions.codec import (
    block_metadata,
    decode_postings,
    delta_decode,
    delta_encode,
    encode_postings,
    varint_decode,
    varint_encode,
)


def test_varint_literal_bytes():
    # 0→00, 1→01, 127→7f, 128→80 01, 300→ac 02, 16384→80 80 01
    assert varint_encode(np.array([0], dtype=np.uint64)) == b"\x00"
    assert varint_encode(np.array([1], dtype=np.uint64)) == b"\x01"
    assert varint_encode(np.array([127], dtype=np.uint64)) == b"\x7f"
    assert varint_encode(np.array([128], dtype=np.uint64)) == b"\x80\x01"
    assert varint_encode(np.array([300], dtype=np.uint64)) == b"\xac\x02"
    assert varint_encode(np.array([16384], dtype=np.uint64)) == b"\x80\x80\x01"
    assert (
        varint_encode(np.array([1, 128, 300], dtype=np.uint64))
        == b"\x01\x80\x01\xac\x02"
    )


def test_delta_goldens():
    docs = np.array([3, 7, 8, 20], dtype=np.uint64)
    gaps = delta_encode(docs)
    assert gaps.tolist() == [3, 4, 1, 12]
    assert delta_decode(gaps).tolist() == [3, 7, 8, 20]


def test_postings_roundtrip_golden():
    docs = np.array([3, 7, 8, 20, 150, 151], dtype=np.uint64)
    tfs = np.array([1, 2, 1, 5, 1, 300], dtype=np.uint64)
    db, tb = encode_postings(docs, tfs)
    # gaps 3,4,1,12,130,1 → varint 03 04 01 0c 82 01 01
    assert db == b"\x03\x04\x01\x0c\x82\x01\x01"
    d2, t2 = decode_postings(db, tb)
    assert d2.tolist() == docs.tolist()
    assert t2.tolist() == tfs.tolist()


def test_empty():
    assert varint_encode(np.empty(0, dtype=np.uint64)) == b""
    assert varint_decode(b"").size == 0
    d, t = decode_postings(b"", b"")
    assert d.size == 0 and t.size == 0


@settings(max_examples=200, deadline=None)
@given(
    st.lists(st.integers(min_value=0, max_value=2**62), min_size=0, max_size=200)
)
def test_varint_roundtrip_property(vals):
    arr = np.array(sorted(vals), dtype=np.uint64)
    assert varint_decode(varint_encode(arr)).tolist() == arr.tolist()


@settings(max_examples=100, deadline=None)
@given(
    st.sets(st.integers(min_value=0, max_value=10**9), min_size=1, max_size=300),
    st.integers(min_value=1, max_value=7),
)
def test_block_metadata_upper_bound(doc_set, block_size):
    docs = np.array(sorted(doc_set), dtype=np.uint64)
    rng = np.random.default_rng(42)
    impacts = rng.uniform(0.01, 10.0, size=docs.size)
    first, last, bmax = block_metadata(docs, impacts, block_size=block_size)
    n_blocks = int(np.ceil(docs.size / block_size))
    assert first.size == last.size == bmax.size == n_blocks
    for i in range(docs.size):
        blk = i // block_size
        assert impacts[i] <= bmax[blk] + 0.0  # true upper bound
        assert first[blk] <= int(docs[i]) <= last[blk] or not (
            blk * block_size <= i <= min((blk + 1) * block_size - 1, docs.size - 1)
        )


def test_block_metadata_golden_blocksize_4():
    docs = np.arange(10, dtype=np.uint64) * 2  # 0,2,...,18
    impacts = np.array([1, 5, 2, 3, 9, 1, 1, 1, 4, 2], dtype=np.float64)
    first, last, bmax = block_metadata(docs, impacts, block_size=4)
    assert first.tolist() == [0, 8, 16]
    assert last.tolist() == [6, 14, 18]
    assert bmax.tolist() == [5.0, 9.0, 4.0]


def test_varint_encode_segmented_equivalence():
    import numpy as np

    from instructor_embedding_spark.functions.codec import (
        varint_encode,
        varint_encode_segmented,
    )

    rng = np.random.default_rng(11)
    vals = rng.integers(0, 2 ** 40, size=5000, dtype=np.uint64)
    vals[::97] = 0
    vals[::131] = 2 ** 63  # multi-byte extremes
    starts = np.unique(rng.integers(0, vals.size, size=200))
    starts[0] = 0
    got = varint_encode_segmented(vals, starts)
    ends = list(starts[1:]) + [vals.size]
    want = [varint_encode(vals[s:e]) for s, e in zip(starts, ends)]
    assert got == want
    assert varint_encode_segmented(np.empty(0, dtype=np.uint64),
                                   np.empty(0, dtype=np.int64)) == []


@given(
    st.lists(st.integers(min_value=0, max_value=2 ** 64 - 1), min_size=0,
             max_size=400),
    st.data(),
)
@settings(max_examples=60, deadline=None)
def test_varint_encode_segmented_property(vals, data):
    import numpy as np

    from instructor_embedding_spark.functions.codec import (
        varint_encode,
        varint_encode_segmented,
    )

    v = np.asarray(vals, dtype=np.uint64)
    if v.size == 0:
        starts = np.empty(0, dtype=np.int64)
    else:
        cuts = data.draw(
            st.lists(st.integers(0, v.size - 1), min_size=0, max_size=20)
        )
        starts = np.unique(np.asarray([0] + cuts, dtype=np.int64))
    got = varint_encode_segmented(v, starts)
    ends = list(starts[1:]) + [v.size]
    want = [varint_encode(v[s:e]) for s, e in zip(starts, ends)]
    assert got == want
