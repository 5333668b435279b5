"""Posting-block binary codec: delta + varint packed docID/tf blocks with
block-max impact metadata — numpy-vectorized (no per-value Python loops).

Spark restatement of Lucene's postings format (SURVEY.md §3.1 / §4.1):

  Lucene84PostingsWriter writes blocks of 128 docs as delta-encoded,
  bit-packed (FOR/PFOR) ints (`lucene/core/.../codecs/lucene84/ForUtil.java`
  ≈L40, `PForUtil.java`), with per-block competitive (tf, norm) impact pairs
  (`CompetitiveImpactAccumulator.java` ≈L30) powering block-max WAND.

Ours: delta + LEB128 varint (byte-aligned — Arrow/pandas friendly, and
varint beats bit-packing for Zipf-distributed deltas at the tail), with
per-block `(max_tf, min_dlq)` — the impact pair that upper-bounds BM25 for
any (k1, b) since the score is increasing in tf and decreasing in doc
length. Block layout is decided by the CALLER (fixed doc-ranges, so blocks
align across terms — see indexer.build_packed_index).

Wire format of one packed array: varint(n) then n LEB128 varints of the
values (caller pre-deltas doc_ids).
"""

from __future__ import annotations

import numpy as np

__all__ = [
    "varint_encode",
    "varint_decode",
    "pack_postings_block",
    "unpack_postings_block",
]


def varint_encode_raw(values: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """LEB128-encode a uint64 array, vectorized, WITHOUT framing.

    Returns (buffer uint8[N], nbytes int64[n]) — per-value byte lengths let
    callers slice multi-group buffers (the partition-level packer encodes a
    whole partition once, then cuts per-block blobs by offset).

    Strategy: compute per-value byte length, then scatter each value's
    7-bit groups into the flat buffer with fancy indexing — O(total_bytes)
    numpy work, no Python-level per-value loop.
    """
    v = np.ascontiguousarray(values, dtype=np.uint64)
    if v.size == 0:
        return np.empty(0, dtype=np.uint8), np.empty(0, dtype=np.int64)
    nbytes = _varint_len(v)
    total = int(nbytes.sum())
    out = np.empty(total, dtype=np.uint8)
    # position of each value's first byte
    starts = np.concatenate(([0], np.cumsum(nbytes)[:-1])).astype(np.int64)
    max_len = int(nbytes.max())
    for k in range(max_len):
        sel = nbytes > k  # values that have a k-th byte
        idx = starts[sel] + k
        chunk = (v[sel] >> np.uint64(7 * k)) & np.uint64(0x7F)
        cont = (nbytes[sel] - 1) > k  # continuation bit
        out[idx] = chunk.astype(np.uint8) | (cont.astype(np.uint8) << 7)
    return out, nbytes


def varint_encode(values: np.ndarray) -> bytes:
    """Framed LEB128: varint(n) header + n raw varints."""
    v = np.ascontiguousarray(values, dtype=np.uint64)
    header = _encode_small(np.array([v.size], dtype=np.uint64))
    if v.size == 0:
        return bytes(header)
    out, _ = varint_encode_raw(v)
    return bytes(header) + out.tobytes()


def _varint_len(v: np.ndarray) -> np.ndarray:
    """LEB128 byte length per value: 1 + #thresholds (2^7k) the value
    reaches — a handful of vectorized compares, stops at the array max."""
    nbytes = np.ones(v.size, dtype=np.int64)
    vmax = int(v.max()) if v.size else 0
    k = 7
    while k < 64 and vmax >= (1 << k):
        nbytes += v >= np.uint64(1 << k)
        k += 7
    return nbytes


def _encode_small(v: np.ndarray) -> bytearray:
    """Scalar LEB128 for the tiny length header."""
    out = bytearray()
    x = int(v[0])
    while True:
        b = x & 0x7F
        x >>= 7
        if x:
            out.append(b | 0x80)
        else:
            out.append(b)
            return out


def varint_decode(data: bytes, offset: int = 0) -> tuple[np.ndarray, int]:
    """Decode one LEB128-framed array; returns (values, next_offset).

    Vectorized: classify continuation bits once, then combine 7-bit groups
    by value with a segmented shift-or (loop over max byte-length only).
    """
    buf = np.frombuffer(data, dtype=np.uint8, offset=offset)
    # scalar-decode the length header
    n = 0
    shift = 0
    i = 0
    while True:
        b = int(buf[i])
        n |= (b & 0x7F) << shift
        shift += 7
        i += 1
        if not (b & 0x80):
            break
    if n == 0:
        return np.empty(0, dtype=np.uint64), offset + i
    body = buf[i:]
    cont = (body & 0x80) != 0
    # value id of each byte: cumulative count of terminated values before it
    ends = ~cont
    val_id = np.concatenate(([0], np.cumsum(ends)[:-1].astype(np.int64)))
    # keep exactly the bytes of the first n values
    keep = val_id < n
    nbytes_used = int(keep.sum())
    body = body[:nbytes_used]
    val_id = val_id[:nbytes_used]
    # byte index within its value
    first = np.concatenate(([True], val_id[1:] != val_id[:-1]))
    pos = np.arange(nbytes_used, dtype=np.int64)
    start_of_val = pos[first]
    byte_pos = pos - start_of_val[val_id]
    out = np.zeros(n, dtype=np.uint64)
    payload = body.astype(np.uint64) & np.uint64(0x7F)
    # each value contributes at most one byte per position k, so plain
    # fancy assignment with |= precomputed is race-free per iteration
    for k in range(int(byte_pos.max()) + 1):
        sel = byte_pos == k
        out[val_id[sel]] |= payload[sel] << np.uint64(7 * k)
    return out, offset + i + nbytes_used


def pack_postings_block(
    doc_ids: np.ndarray, tfs: np.ndarray
) -> tuple[bytes, bytes]:
    """(sorted doc_ids, tfs) -> (docs_blob, tfs_blob); doc_ids delta-coded."""
    d = np.asarray(doc_ids, dtype=np.int64)
    deltas = np.empty_like(d)
    if d.size:
        deltas[0] = d[0]
        np.subtract(d[1:], d[:-1], out=deltas[1:])
    return (
        varint_encode(deltas.astype(np.uint64)),
        varint_encode(np.asarray(tfs, dtype=np.uint64)),
    )


def unpack_postings_block(
    docs_blob: bytes, tfs_blob: bytes
) -> tuple[np.ndarray, np.ndarray]:
    deltas, _ = varint_decode(docs_blob)
    tfs, _ = varint_decode(tfs_blob)
    return np.cumsum(deltas.astype(np.int64)), tfs.astype(np.int64)
