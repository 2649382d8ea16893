"""Posting-list codec: delta + varbyte, block layout, impact metadata.

The reference delegates posting compression to its index library's codec
(FOR/vint blocks); this is our own numpy implementation, designed for
block-max pruning at query time:

- postings for one (term, salt) are sorted by doc_id and cut into blocks
  of ``block_size`` docs;
- each block is INDEPENDENTLY decodable (the first doc_id of a block is
  stored absolute, the rest delta-encoded) so a scorer can skip straight
  to a block without touching prior bytes;
- per block the directory keeps (byte_offset, n_docs, last_doc_id,
  max_tf, min_doc_len): max_tf + min_doc_len give a similarity-agnostic
  upper bound for any score monotone increasing in tf and decreasing in
  dl (BM25, LM) — the "impact" that block-max WAND needs;
- streams inside a block: varbyte deltas, varbyte tfs, varbyte doc_lens,
  concatenated; all encode/decode paths are numpy-vectorized (no per-
  value Python in the hot loop).

Wire layout of a blob: concatenation of per-block segments; the block
directory travels as sibling array<> columns in the postings table (not
inside the blob) so Spark can prune/filter on it without decoding.
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np

DEFAULT_BLOCK_SIZE = 128


def varbyte_encode(values: np.ndarray) -> bytes:
    """Vectorized varbyte (LEB128-style, 7 bits/byte, high bit =
    continuation). Accepts any non-negative int array."""
    a = np.asarray(values, dtype=np.uint64)
    if a.size == 0:
        return b""
    # bytes needed per value: ceil(bitlength/7), min 1
    nbits = np.zeros(a.shape, dtype=np.int64)
    tmp = a.copy()
    while True:
        nz = tmp > 0
        if not nz.any():
            break
        nbits[nz] += 1
        tmp >>= np.uint64(7)
    nbits = np.maximum(nbits, 1)
    max_nb = int(nbits.max())
    # byte matrix (n, max_nb): k-th byte = bits 7k..7k+6, continuation if k < nb-1
    out = np.zeros((a.size, max_nb), dtype=np.uint8)
    keep = np.zeros((a.size, max_nb), dtype=bool)
    for k in range(max_nb):
        byte_k = ((a >> np.uint64(7 * k)) & np.uint64(0x7F)).astype(np.uint8)
        cont = (k < nbits - 1).astype(np.uint8) << 7
        out[:, k] = byte_k | cont
        keep[:, k] = k < nbits
    return out[keep].tobytes()


def varbyte_decode(buf: bytes | np.ndarray, offset: int = 0, count: int | None = None):
    """Vectorized decode. Returns (values: uint64 array, bytes_consumed).

    With ``count`` given, decodes exactly that many values starting at
    ``offset``; otherwise decodes to the end of the buffer."""
    b = np.frombuffer(buf, dtype=np.uint8) if not isinstance(buf, np.ndarray) else buf
    b = b[offset:]
    if b.size == 0:
        return np.zeros(0, dtype=np.uint64), 0
    is_term = (b & 0x80) == 0
    if count is not None:
        # index of the count-th terminator bounds the region
        term_pos = np.flatnonzero(is_term)
        end = int(term_pos[count - 1]) + 1 if count > 0 else 0
        b = b[:end]
        is_term = is_term[:end]
    n = int(is_term.sum())
    if n == 0:
        return np.zeros(0, dtype=np.uint64), 0
    # start byte index of each value; per-byte position within its value
    term_idx = np.flatnonzero(is_term)
    starts = np.zeros(n, dtype=np.int64)
    starts[1:] = term_idx[:-1] + 1
    vid = np.zeros(b.size, dtype=np.int64)
    vid[1:] = np.cumsum(is_term[:-1])
    pos = np.arange(b.size, dtype=np.int64) - starts[vid]
    shifted = (b & np.uint64(0x7F)).astype(np.uint64) << (
        7 * pos
    ).astype(np.uint64)
    # contiguous segment sum: reduceat is ~10x faster than np.add.at
    vals = np.add.reduceat(shifted, starts)
    return vals, int(b.size)


@dataclass
class BlockDirectory:
    """Per-block skip metadata (sibling columns of the blob)."""

    offsets: np.ndarray    # int64 byte offset of each block in the blob
    n_docs: np.ndarray     # int32 docs per block
    last_doc: np.ndarray   # int64 last doc_id per block (skip pointer)
    max_tf: np.ndarray     # int32 impact: max tf in block
    min_dl: np.ndarray     # int64 impact: min doc_len in block


def encode_posting_list(
    doc_ids: np.ndarray,
    tfs: np.ndarray,
    doc_lens: np.ndarray,
    block_size: int = DEFAULT_BLOCK_SIZE,
) -> tuple[bytes, BlockDirectory]:
    """Sorted postings -> (blob, directory). doc_ids MUST be ascending."""
    doc_ids = np.asarray(doc_ids, dtype=np.int64)
    tfs = np.asarray(tfs, dtype=np.int64)
    doc_lens = np.asarray(doc_lens, dtype=np.int64)
    n = doc_ids.size
    n_blocks = (n + block_size - 1) // block_size
    segments: list[bytes] = []
    offsets = np.zeros(n_blocks, dtype=np.int64)
    nd = np.zeros(n_blocks, dtype=np.int32)
    last = np.zeros(n_blocks, dtype=np.int64)
    mtf = np.zeros(n_blocks, dtype=np.int32)
    mdl = np.zeros(n_blocks, dtype=np.int64)
    pos = 0
    for i in range(n_blocks):
        lo, hi = i * block_size, min((i + 1) * block_size, n)
        ids = doc_ids[lo:hi]
        deltas = np.empty(ids.size, dtype=np.uint64)
        deltas[0] = ids[0]  # absolute first doc -> block independence
        if ids.size > 1:
            deltas[1:] = np.diff(ids).astype(np.uint64)
        seg = (
            varbyte_encode(deltas)
            + varbyte_encode(tfs[lo:hi])
            + varbyte_encode(doc_lens[lo:hi])
        )
        segments.append(seg)
        offsets[i] = pos
        nd[i] = hi - lo
        last[i] = ids[-1]
        mtf[i] = int(tfs[lo:hi].max())
        mdl[i] = int(doc_lens[lo:hi].min())
        pos += len(seg)
    return b"".join(segments), BlockDirectory(offsets, nd, last, mtf, mdl)


def decode_block(
    blob: bytes | np.ndarray, directory: BlockDirectory, block_idx: int
) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Decode ONE block -> (doc_ids, tfs, doc_lens), touching only that
    block's bytes (the skip path of the WAND scorer)."""
    off = int(directory.offsets[block_idx])
    cnt = int(directory.n_docs[block_idx])
    buf = np.frombuffer(blob, dtype=np.uint8) if not isinstance(blob, np.ndarray) else blob
    deltas, used1 = varbyte_decode(buf, off, cnt)
    tfs, used2 = varbyte_decode(buf, off + used1, cnt)
    dls, _ = varbyte_decode(buf, off + used1 + used2, cnt)
    doc_ids = np.cumsum(deltas.astype(np.int64))
    return doc_ids, tfs.astype(np.int64), dls.astype(np.int64)


def decode_block_range(
    blob: bytes | np.ndarray,
    directory: BlockDirectory,
    b0: int,
    b1: int,
) -> list[tuple[np.ndarray, np.ndarray, np.ndarray]]:
    """Decode blocks [b0, b1) in ONE varbyte pass -> per-block
    (doc_ids, tfs, doc_lens).

    Per-block decode pays numpy's fixed per-op overhead ~30x per block
    (3 streams x ~10 vector ops on ~128-value arrays); a block-max
    scorer that touches a contiguous run of blocks per window was
    spending ~1 ms/block on overhead alone. Here the whole byte span is
    one varbyte_decode (a single set of large-array ops) and the
    per-block work is just slicing + one cumsum each."""
    buf = (
        np.frombuffer(blob, dtype=np.uint8)
        if not isinstance(blob, np.ndarray)
        else blob
    )
    n_blocks = directory.offsets.size
    b0 = max(0, b0)
    b1 = min(n_blocks, b1)
    if b1 <= b0:
        return []
    off = int(directory.offsets[b0])
    end = int(directory.offsets[b1]) if b1 < n_blocks else buf.size
    counts = directory.n_docs[b0:b1].astype(np.int64)
    total = int(counts.sum()) * 3
    vals, _ = varbyte_decode(buf[off:end], 0, total)
    out = []
    p = 0
    for c in counts:
        c = int(c)
        deltas = vals[p : p + c]
        tfs = vals[p + c : p + 2 * c]
        dls = vals[p + 2 * c : p + 3 * c]
        p += 3 * c
        out.append(
            (
                np.cumsum(deltas.astype(np.int64)),
                tfs.astype(np.int64),
                dls.astype(np.int64),
            )
        )
    return out


def decode_posting_list(
    blob: bytes | np.ndarray, directory: BlockDirectory
) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Decode the whole list (exhaustive-scoring path / tests)."""
    parts = [
        decode_block(blob, directory, i)
        for i in range(directory.offsets.size)
    ]
    if not parts:
        empty = np.zeros(0, dtype=np.int64)
        return empty, empty.copy(), empty.copy()
    return (
        np.concatenate([p[0] for p in parts]),
        np.concatenate([p[1] for p in parts]),
        np.concatenate([p[2] for p in parts]),
    )


def encode_positions(positions: np.ndarray) -> bytes:
    """Delta + varbyte for one posting's SORTED position stream — the
    .pos-file encoding (Lucene stores per-posting position deltas
    vint-encoded the same way). Positions are 0-based token offsets;
    the first is stored absolute, the rest as gaps."""
    p = np.asarray(positions, dtype=np.int64)
    if p.size == 0:
        return b""
    deltas = np.empty(p.size, dtype=np.int64)
    deltas[0] = p[0]
    deltas[1:] = np.diff(p)
    if (deltas[1:] <= 0).any():
        raise ValueError("positions must be strictly increasing")
    return varbyte_encode(deltas)


def decode_positions(blob: bytes, freq: int | None = None) -> np.ndarray:
    """Inverse of ``encode_positions``: cumulative sum of the decoded
    gaps. ``freq`` (the posting's tf) bounds the decode when the blob
    is a shared buffer slice; omitted = decode to the end."""
    vals, _ = varbyte_decode(blob, count=freq)
    return np.cumsum(vals.astype(np.int64))
