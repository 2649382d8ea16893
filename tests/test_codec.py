"""Varbyte/delta codec: known byte vectors, roundtrips, block
independence (FIXTURES.md / SURVEY.md §5 unit plan)."""

import numpy as np
import pytest

from luc4ir_spark.functions.codec import (
    decode_block,
    decode_posting_list,
    encode_posting_list,
    varbyte_decode,
    varbyte_encode,
)


def test_varbyte_known_bytes():
    # 0 -> 0x00; 1 -> 0x01; 127 -> 0x7f; 128 -> 0x80 0x01 (LSB-first 7-bit)
    assert varbyte_encode(np.array([0])) == b"\x00"
    assert varbyte_encode(np.array([1])) == b"\x01"
    assert varbyte_encode(np.array([127])) == b"\x7f"
    assert varbyte_encode(np.array([128])) == b"\x80\x01"
    assert varbyte_encode(np.array([300])) == b"\xac\x02"
    assert varbyte_encode(np.array([1, 128])) == b"\x01\x80\x01"


@pytest.mark.parametrize("seed", [0, 1, 2])
def test_varbyte_roundtrip(seed):
    rng = np.random.default_rng(seed)
    vals = rng.integers(0, 2**40, size=1000, dtype=np.int64)
    vals[:10] = [0, 1, 127, 128, 129, 16383, 16384, 2**21, 2**35, 2**40 - 1]
    blob = varbyte_encode(vals)
    out, used = varbyte_decode(blob)
    assert used == len(blob)
    np.testing.assert_array_equal(out.astype(np.int64), vals)


def test_varbyte_partial_decode():
    vals = np.array([5, 300, 7, 70000, 2])
    blob = varbyte_encode(vals)
    first3, used = varbyte_decode(blob, 0, count=3)
    np.testing.assert_array_equal(first3.astype(int), [5, 300, 7])
    rest, _ = varbyte_decode(blob, used, count=2)
    np.testing.assert_array_equal(rest.astype(int), [70000, 2])


def test_varbyte_empty():
    assert varbyte_encode(np.array([], dtype=np.int64)) == b""
    out, used = varbyte_decode(b"")
    assert out.size == 0 and used == 0


@pytest.mark.parametrize("n,block_size", [(1, 4), (5, 4), (128, 128), (1000, 128), (257, 64)])
def test_posting_roundtrip(n, block_size):
    rng = np.random.default_rng(42)
    doc_ids = np.sort(
        rng.choice(np.arange(10 * n, dtype=np.int64), size=n, replace=False)
    )
    tfs = rng.integers(1, 50, size=n)
    dls = rng.integers(5, 500, size=n)
    blob, d = encode_posting_list(doc_ids, tfs, dls, block_size=block_size)
    ids2, tfs2, dls2 = decode_posting_list(blob, d)
    np.testing.assert_array_equal(ids2, doc_ids)
    np.testing.assert_array_equal(tfs2, tfs)
    np.testing.assert_array_equal(dls2, dls)
    # directory invariants
    exp_blocks = (n + block_size - 1) // block_size
    assert d.offsets.size == exp_blocks
    assert int(d.n_docs.sum()) == n
    assert d.last_doc[-1] == doc_ids[-1]


def test_block_independence():
    """Any single block decodes without touching other blocks' bytes."""
    doc_ids = np.arange(0, 1000, 3, dtype=np.int64)
    n = doc_ids.size
    tfs = (doc_ids % 7) + 1
    dls = (doc_ids % 91) + 10
    blob, d = encode_posting_list(doc_ids, tfs, dls, block_size=32)
    buf = np.frombuffer(blob, dtype=np.uint8)
    for b in range(d.offsets.size):
        lo, hi = b * 32, min((b + 1) * 32, n)
        # corrupt everything OUTSIDE the block; decode must be unaffected
        start = int(d.offsets[b])
        end = int(d.offsets[b + 1]) if b + 1 < d.offsets.size else buf.size
        corrupted = buf.copy()
        corrupted[:start] = 0xFF
        corrupted[end:] = 0xFF
        ids2, tfs2, dls2 = decode_block(corrupted, d, b)
        np.testing.assert_array_equal(ids2, doc_ids[lo:hi])
        np.testing.assert_array_equal(tfs2, tfs[lo:hi])
        np.testing.assert_array_equal(dls2, dls[lo:hi])


def test_impacts():
    doc_ids = np.arange(100, dtype=np.int64)
    tfs = np.arange(1, 101)
    dls = np.arange(1000, 1100)
    _, d = encode_posting_list(doc_ids, tfs, dls, block_size=50)
    np.testing.assert_array_equal(d.max_tf, [50, 100])
    np.testing.assert_array_equal(d.min_dl, [1000, 1050])
    np.testing.assert_array_equal(d.last_doc, [49, 99])


def test_positions_roundtrip_property():
    """Hypothesis: encode_positions/decode_positions are exact inverses
    for any strictly increasing non-negative int sequence, including
    freq-bounded decodes from concatenated buffers."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    @settings(max_examples=200, deadline=None)
    @given(
        st.lists(
            st.integers(min_value=0, max_value=2**31 - 1),
            min_size=1,
            max_size=200,
            unique=True,
        )
    )
    def check(vals):
        import numpy as np

        from luc4ir_spark.functions import codec

        p = np.array(sorted(vals), dtype=np.int64)
        blob = codec.encode_positions(p)
        assert codec.decode_positions(blob, freq=p.size).tolist() == p.tolist()
        # freq-bounded decode ignores a concatenated tail
        tail = codec.encode_positions(np.array([1, 5], dtype=np.int64))
        both = blob + tail
        assert (
            codec.decode_positions(both, freq=p.size).tolist() == p.tolist()
        )

    check()


def test_positions_reject_unsorted():
    import numpy as np
    import pytest as pt

    from luc4ir_spark.functions import codec

    with pt.raises(ValueError):
        codec.encode_positions(np.array([3, 1], dtype=np.int64))
    with pt.raises(ValueError):
        codec.encode_positions(np.array([2, 2], dtype=np.int64))


def test_blob_bytes_analytic_replay():
    """octet_length(blob) == the analytic varbyte length formula
    (1 + floor(log128 v)) summed over block-absolute-first deltas,
    tfs and doc_lens — with multi-byte values exercised."""
    import numpy as np

    from luc4ir_spark.functions.codec import encode_posting_list

    ids = np.array([5, 130, 17000, 17001, 2_200_000], dtype=np.int64)
    tfs = np.array([1, 200, 3, 16500, 7], dtype=np.int64)
    dls = np.array([50, 129, 80, 90, 2_097_152], dtype=np.int64)

    def vb(v):
        return 1 if v < 128 else 2 if v < 16384 else 3 if v < 2097152 else 4

    for bs in (2, 3, 128):
        blob, _ = encode_posting_list(ids, tfs, dls, block_size=bs)
        exp = 0
        for i, d in enumerate(ids):
            delta = d if i % bs == 0 else d - ids[i - 1]
            exp += vb(delta) + vb(tfs[i]) + vb(dls[i])
        assert len(blob) == exp, bs
