"""Delta-gap + varbyte posting-block codec (numpy-vectorized).

Classic IR varbyte (Manning/Raghavan/Schütze, "Introduction to Information
Retrieval" §5.3): each integer is stored big-endian in 7-bit groups, one per
byte; the LAST byte of each integer has its high bit set.  Doc-id lists are
delta-gapped per block: the first doc_id of a block is stored absolute, the
rest as gaps — every block is therefore independently decodable, which is
what lets block-max WAND skip whole blocks without touching their bytes.

Both encode and decode are vectorized over numpy arrays; no per-int Python
loops in the hot path (decode runs inside the query operator, encode inside
the build operator, both under Arrow-batched pandas UDFs).
"""

from __future__ import annotations

import numpy as np


def encode_varbyte(values) -> bytes:
    """Varbyte-encode a sequence of non-negative int64s."""
    v = np.ascontiguousarray(values, dtype=np.int64)
    if v.size == 0:
        return b""
    if (v < 0).any():
        raise ValueError("varbyte requires non-negative values")
    # byte-length of each value (>=1)
    lens = np.ones(v.size, dtype=np.int64)
    tmp = v >> 7
    while (tmp > 0).any():
        lens += tmp > 0
        tmp >>= 7
    ends = np.cumsum(lens) - 1  # index of each value's terminator byte
    out = np.zeros(int(lens.sum()), dtype=np.uint8)
    rem = v.copy()
    out[ends] = (rem & 0x7F) | 0x80  # terminator byte (low 7 bits + stop bit)
    rem >>= 7
    k = 1
    active = lens > k
    while active.any():
        out[ends[active] - k] = rem[active] & 0x7F
        rem >>= 7
        k += 1
        active = lens > k
    return out.tobytes()


def decode_varbyte(buf: bytes) -> np.ndarray:
    """Decode varbyte bytes back to an int64 array. Fully vectorized."""
    b = np.frombuffer(buf, dtype=np.uint8)
    if b.size == 0:
        return np.empty(0, dtype=np.int64)
    term_idx = np.flatnonzero(b & 0x80)  # terminator positions
    n = term_idx.size
    # group id per byte: 0-based index of the integer each byte belongs to
    gid = np.zeros(b.size, dtype=np.int64)
    gid[term_idx[:-1] + 1] = 1
    gid = np.cumsum(gid)
    shifts = (term_idx[gid] - np.arange(b.size)) * 7
    vals = (b & 0x7F).astype(np.int64) << shifts
    out = np.zeros(n, dtype=np.int64)
    np.add.at(out, gid, vals)
    return out


def encode_doc_ids(doc_ids) -> bytes:
    """Delta-gap + varbyte for a strictly-increasing doc_id block."""
    d = np.ascontiguousarray(doc_ids, dtype=np.int64)
    if d.size == 0:
        return b""
    gaps = np.empty_like(d)
    gaps[0] = d[0]
    np.subtract(d[1:], d[:-1], out=gaps[1:])
    if d.size > 1 and (gaps[1:] <= 0).any():
        raise ValueError("doc_ids must be strictly increasing within a block")
    return encode_varbyte(gaps)


def decode_doc_ids(buf: bytes) -> np.ndarray:
    return np.cumsum(decode_varbyte(buf))


def encode_tfs(tfs) -> bytes:
    """tf values are small positive ints; plain varbyte (no delta)."""
    return encode_varbyte(tfs)


def decode_tfs(buf: bytes) -> np.ndarray:
    return decode_varbyte(buf)
