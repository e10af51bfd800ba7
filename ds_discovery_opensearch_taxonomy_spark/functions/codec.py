"""Posting-list codecs: docID-gap + varbyte blocks, NumPy-vectorized.

The persistent index stores, per (field, term, salt, block):

* ``docids`` — strictly increasing int64, gap-encoded then varbyte packed;
* ``tfs``   — term frequency per posting, varbyte;
* ``dls``   — document field length per posting, varbyte (kept inline so the
  scorer needs no doc-stats join at query time; at 100 TB scale this can be
  swapped for a co-partitioned norms table);
* ``posdata`` — delta-encoded positions, varbyte (Lucene .pos-file
  analogue; needed for phrase/slop).  Per-posting position COUNTS are not
  stored — they equal ``tfs`` — and each posting's delta chain restarts at
  an absolute value, so posting byte-runs concatenate freely across
  staging rows and block boundaries.

All encode/decode paths are vectorized (no per-int Python loops): encoding
computes per-value byte widths with bit arithmetic and scatters 7-bit groups;
decoding finds value boundaries from continuation bits with cumsum and
reduces 7-bit groups with a fixed-width matrix fold.
"""

from __future__ import annotations

import numpy as np

_U64 = np.uint64
_MASK7 = _U64(0x7F)
_CONT = np.uint8(0x80)


#: width thresholds: value >= _VB_TH[k] needs at least k+2 bytes
_VB_TH = np.uint64(1) << (np.arange(1, 10, dtype=np.uint64) * _U64(7))


def varbyte_encode_offsets(values: np.ndarray) -> tuple[bytes, np.ndarray]:
    """Like :func:`varbyte_encode` but also returns the per-value END byte
    offsets, so callers can slice the encoded stream at value boundaries
    (block cutting without re-encoding).

    Scatter is per BYTE POSITION (at most 10 masked passes, each touching
    only the values wide enough to reach that byte) rather than per output
    byte via arange/repeat — for gap-heavy streams where most values fit
    one byte this is ~3x less memory traffic, and the encode is the single
    hottest kernel of the postings merge (BENCH.md round 4)."""
    v = np.ascontiguousarray(values, dtype=np.uint64)
    if v.size == 0:
        return b"", np.empty(0, dtype=np.int64)
    widths = np.searchsorted(_VB_TH, v, side="right") + 1
    ends = np.cumsum(widths)
    starts = ends - widths
    out = np.empty(int(ends[-1]), dtype=np.uint8)
    maxw = int(widths.max())
    # byte position 0 of every value (int64 view: numpy's uint64->uint8
    # cast after a ufunc temp measured ~7x slower than the signed path)
    b0 = (v.view(np.int64) & 0x7F).astype(np.uint8)
    b0[widths > 1] |= _CONT
    out[starts] = b0
    for j in range(1, maxw):
        m = widths > j
        bj = ((v[m] >> _U64(7 * j)).view(np.int64) & 0x7F).astype(np.uint8)
        bj[widths[m] > j + 1] |= _CONT
        out[starts[m] + j] = bj
    return out.tobytes(), ends


def varbyte_encode(values: np.ndarray) -> bytes:
    """Vectorized LEB128-style varbyte: 7 bits per byte, MSB set on all but
    the final byte of each value."""
    return varbyte_encode_offsets(values)[0]


def varbyte_decode(data: bytes, count: int | None = None) -> np.ndarray:
    """Vectorized decode; returns uint64 array."""
    raw = np.frombuffer(data, dtype=np.uint8)
    if raw.size == 0:
        return np.empty(0, dtype=np.uint64)
    is_last = (raw & _CONT) == 0
    ends = np.flatnonzero(is_last)
    n = ends.size
    if n == raw.size:
        # all single-byte values (tf streams, dense gap streams) — the
        # dominant case in the eval kernel's decode profile
        vals = raw.astype(np.uint64)
        if count is not None and vals.size != count:
            raise ValueError(f"expected {count} values, decoded {vals.size}")
        return vals
    starts = np.empty_like(ends)
    starts[0] = 0
    starts[1:] = ends[:-1] + 1
    widths = ends - starts + 1
    # segmented shift-accumulate: O(total bytes), no (n, maxw) matrix
    pos_in = np.arange(raw.size, dtype=np.int64) - np.repeat(starts, widths)
    contrib = (raw & 0x7F).astype(np.uint64) << (
        pos_in.astype(np.uint64) * _U64(7)
    )
    vals = np.add.reduceat(contrib, starts)
    if count is not None and vals.size != count:
        raise ValueError(f"expected {count} values, decoded {vals.size}")
    return vals


def delta_encode(sorted_values: np.ndarray) -> np.ndarray:
    """Strictly-increasing int64 -> first value + gaps (all >= 0)."""
    v = np.ascontiguousarray(sorted_values, dtype=np.int64)
    out = np.empty_like(v)
    if v.size:
        out[0] = v[0]
        np.subtract(v[1:], v[:-1], out=out[1:])
    return out


def delta_decode(gaps: np.ndarray) -> np.ndarray:
    return np.cumsum(gaps.astype(np.int64))


def encode_docids(docids: np.ndarray, base: int = 0) -> bytes:
    """Gap+varbyte encode sorted signed int64 doc ids.

    ``base`` lets blocks chain (gap of first entry vs previous block's max);
    ids may be negative (xxhash64) so gaps are taken in unsigned space after
    an offset shift by int64 min."""
    u = np.ascontiguousarray(docids, dtype=np.int64).astype(np.uint64) + _U64(1 << 63)
    gaps = np.empty_like(u)
    if u.size:
        # first gap is taken modulo 2^64 against the base (decode re-wraps);
        # a base above the first id is only a compression loss, never wrong
        with np.errstate(over="ignore"):
            ub = (
                np.uint64(np.int64(base)) + _U64(1 << 63)
                if base is not None
                else _U64(0)
            )
            gaps[0] = u[0] - ub
        gaps[1:] = u[1:] - u[:-1]
    return varbyte_encode(gaps)


def decode_docids(data: bytes, base: int = 0) -> np.ndarray:
    gaps = varbyte_decode(data)
    if gaps.size == 0:
        return np.empty(0, dtype=np.int64)
    with np.errstate(over="ignore"):
        u = np.cumsum(gaps, dtype=np.uint64)
        if base is not None:
            u += np.uint64(np.int64(base)) + _U64(1 << 63)
        return (u - _U64(1 << 63)).astype(np.int64)


def encode_position_lists(position_lists: list) -> list[bytes]:
    """Per-posting sorted position lists -> one varbyte byte-string per
    posting (delta-encoded, first value absolute).  ONE vectorized codec
    pass over the whole batch; per-posting blobs are byte-slices of the
    batch stream (used by the index-build tokenizer so staging carries
    binary, not list<int>, columns)."""
    n = len(position_lists)
    if n == 0:
        return []
    lens = np.fromiter((len(p) for p in position_lists), dtype=np.int64, count=n)
    total = int(lens.sum())
    if total == 0:
        return [b""] * n
    flat = np.concatenate([np.asarray(p, dtype=np.int64) for p in position_lists])
    starts = np.zeros(n + 1, dtype=np.int64)
    np.cumsum(lens, out=starts[1:])
    deltas = np.empty_like(flat)
    deltas[0] = flat[0]
    deltas[1:] = flat[1:] - flat[:-1]
    seg = starts[:-1][lens > 0]
    deltas[seg] = flat[seg]
    data, ends = varbyte_encode_offsets(deltas.astype(np.uint64))
    be = np.zeros(total + 1, dtype=np.int64)
    be[1:] = ends
    return [data[be[starts[i]]:be[starts[i + 1]]] for i in range(n)]


def encode_position_groups(
    flat_positions: np.ndarray, group_starts: np.ndarray
) -> tuple[bytes, np.ndarray]:
    """Flat per-posting position stream -> (varbyte stream, byte boundaries).

    ``flat_positions`` holds every posting's sorted positions concatenated;
    ``group_starts`` marks each posting's first index.  Deltas are taken
    within a posting (absolute first value), encoded in ONE vectorized
    codec pass; posting i's bytes are
    ``stream[boundaries[i]:boundaries[i+1]]`` — the zero-per-posting-Python
    variant of :func:`encode_position_lists` used by the vectorized
    tokenizer (functions/vtokenize.py)."""
    flat = np.ascontiguousarray(flat_positions, dtype=np.int64)
    starts = np.ascontiguousarray(group_starts, dtype=np.int64)
    if flat.size == 0:
        return b"", np.zeros(len(starts) + 1, dtype=np.int64)
    deltas = np.empty_like(flat)
    deltas[0] = flat[0]
    deltas[1:] = flat[1:] - flat[:-1]
    deltas[starts] = flat[starts]
    data, ends = varbyte_encode_offsets(deltas.astype(np.uint64))
    bounds = np.zeros(len(starts) + 1, dtype=np.int64)
    nxt = np.append(starts[1:], len(flat))
    bounds[1:] = ends[nxt - 1]
    return data, bounds


def encode_positions(position_lists: list[np.ndarray]) -> bytes:
    """Per-posting sorted position lists -> concatenated delta varbyte."""
    return b"".join(encode_position_lists(position_lists))


def decode_positions(lens: np.ndarray, posdata: bytes) -> tuple[np.ndarray, np.ndarray]:
    """Returns (offsets, flat_positions): posting i's positions are
    ``flat_positions[offsets[i]:offsets[i+1]]`` (already delta-decoded).
    ``lens`` is the per-posting position count — i.e. the decoded ``tfs``
    array (position count == term frequency by construction)."""
    lens = np.asarray(lens, dtype=np.int64)
    flat_deltas = varbyte_decode(posdata).astype(np.int64)
    offsets = np.zeros(lens.size + 1, dtype=np.int64)
    np.cumsum(lens, out=offsets[1:])
    if flat_deltas.size == 0:
        return offsets, flat_deltas
    # segmented cumsum: positions restart at each posting boundary
    flat = np.cumsum(flat_deltas)
    starts = offsets[:-1][lens > 0]
    # subtract the carried prefix at each segment start
    corrections = np.zeros(flat_deltas.size, dtype=np.int64)
    seg_start_vals = flat[starts] - flat_deltas[starts]
    corrections[starts] = np.diff(np.concatenate([[0], seg_start_vals]))
    flat -= np.cumsum(corrections)
    return offsets, flat
