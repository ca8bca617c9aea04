"""Vectorized content-defined chunking kernel (numpy, Arrow-batch friendly).

The reference's rolling recurrence (rabin.d:218-239) has a data-dependent
table lookup per byte and cannot be vectorized as written.  But after 64
slides the digest equals the Rabin fingerprint of exactly the last 64
bytes (window purity, rabin.d:86-95), and GF(2) linearity decomposes that
fingerprint into 64 independent byte-position table lookups:

    fp(window) = XOR_{j=0..63} T_j[window[j]],   T_j[b] = (b·x^{8(63-j)}) mod P

so the fingerprint of *every* window position of a buffer is a handful of
vectorized gather+XOR passes, boundary candidates are
``(fp & splitmask) == 0`` (expected density 2^-average_bits), and chunk
selection is a trivial greedy walk over the sparse candidate list with
the min/max clamps and EOF rule of SURVEY.md §2.2.

Two speedups on top of the plain 64-gather formulation:

* candidate detection only needs the low bits of the fingerprint (the
  splitmask is below 2^32 for any practical ``average_bits``), so the
  scan gathers from uint32 tables — half the memory traffic;
* adjacent byte *pairs* are combined into one uint16 index, halving the
  number of passes: 32 gathers from 65536-entry uint32 tables.

Exact 64-bit cut fingerprints are then computed only at the chosen cut
positions (a few per chunk) from the full uint64 tables.

Verified bit-for-bit against the reference golden vectors (chunks1-4 and
the min/max bounds list, package.d:336-439,552-568) via tests/.
"""

from __future__ import annotations

from functools import lru_cache

import numpy as np

from . import polynomials as poly
from .chunker import Chunk, ChunkerParams
from .rabin import WINDOW_SIZE


@lru_cache(maxsize=8)
def positional_tables(pol: int) -> tuple[np.ndarray, np.ndarray]:
    """(T64, P16) lookup tables for a polynomial, cached per process
    (one build per Spark executor interpreter, like the reference's
    global table cache).

    T64[j, b]  : uint64 full fingerprint contribution of byte b at
                 window position j.
    P16[j2, v] : uint16 low-16-bit contribution of the byte *pair*
                 v = b_lo | b_hi<<8 at window positions (2*j2, 2*j2+1).
                 Candidate detection only needs the low splitmask bits;
                 when average_bits > 16 the sparse low-16 survivors are
                 re-verified against the exact 64-bit fingerprint. The
                 16-bit tables (128 KiB each) halve per-pass memory
                 traffic vs 32-bit and scale better across cores.
    """
    t64 = np.empty((WINDOW_SIZE, 256), dtype=np.uint64)
    for j in range(WINDOW_SIZE):
        shift = 8 * (WINDOW_SIZE - 1 - j)
        for b in range(256):
            t64[j, b] = poly.mod(b << shift, pol)
    t16 = (t64 & np.uint64(0xFFFF)).astype(np.uint16)
    # pair tables: P16[j2, lo | hi<<8] = T16[2j2, lo] ^ T16[2j2+1, hi]
    lo = np.arange(65536, dtype=np.intp) & 0xFF
    hi = np.arange(65536, dtype=np.intp) >> 8
    p16 = np.empty((WINDOW_SIZE // 2, 65536), dtype=np.uint16)
    for j2 in range(WINDOW_SIZE // 2):
        p16[j2] = t16[2 * j2][lo] ^ t16[2 * j2 + 1][hi]
    return t64, p16


def fingerprints_low16(arr: np.ndarray, pol: int, k0: int = 0, k1: int | None = None) -> np.ndarray:
    """Low 16 fingerprint bits for windows ``arr[k:k+64]``, k in [k0, k1).

    ``fp16[k - k0]`` is the fingerprint of ``arr[k : k+64]`` — the
    rolling digest observed just after sliding byte ``k+63``.  Indices
    are pre-cast to ``intp`` once (numpy gathers run ~1.7x faster on
    native index dtype) and each pass gathers into a reused buffer.
    """
    n = arr.shape[0]
    if k1 is None:
        k1 = n - WINDOW_SIZE + 1
    w = k1 - k0
    if w <= 0:
        return np.empty(0, dtype=np.uint16)
    _, p16 = positional_tables(pol)
    fp = np.empty(w, dtype=np.uint16)
    # Tile the scan so the pair-index slice stays L2-resident across all
    # 32 gather passes — streaming the whole index array from DRAM per
    # pass costs ~2x at multi-MB inputs. 64K positions (512 KiB of intp
    # indices) measured best-of-3 fastest on this class of hardware
    # (+10% vs 32K: fewer per-pass python/take fixed costs, still cache
    # resident).
    tile = 1 << 16
    tmp = np.empty(min(w, tile), dtype=np.uint16)
    for t0 in range(k0, k1, tile):
        t1 = min(t0 + tile, k1)
        tw = t1 - t0
        # uint16 pair stream: pairs[m - t0] = arr[m] | arr[m+1] << 8
        m1 = t1 + WINDOW_SIZE - 2
        pairs = arr[t0:m1].astype(np.intp)
        pairs |= arr[t0 + 1 : m1 + 1].astype(np.intp) << 8
        o0 = t0 - k0
        np.take(p16[0], pairs[:tw], out=fp[o0 : o0 + tw], mode="clip")
        view = tmp[:tw]
        for j2 in range(1, WINDOW_SIZE // 2):
            np.take(p16[j2], pairs[2 * j2 : 2 * j2 + tw], out=view, mode="clip")
            fp[o0 : o0 + tw] ^= view
    return fp


def _candidates(
    arr: np.ndarray, pol: int, splitmask: int, k0: int, k1: int
) -> np.ndarray:
    """Exact boundary-candidate fp indices in [k0, k1): low-16 filter,
    then sparse 64-bit verification when the mask has higher bits."""
    fp16 = fingerprints_low16(arr, pol, k0, k1)
    cand = np.flatnonzero((fp16 & np.uint16(splitmask & 0xFFFF)) == 0)
    if splitmask >> 16 and len(cand):
        full = _fp64_at(arr, cand + (k0 + WINDOW_SIZE - 1), pol)
        cand = cand[(full & np.uint64(splitmask)) == 0]
    return cand + k0


def _fp64_at(arr: np.ndarray, end_idx: np.ndarray, pol: int) -> np.ndarray:
    """Exact uint64 fingerprints of the windows *ending at* (inclusive)
    each index in ``end_idx`` — used only at the sparse cut positions."""
    t64, _ = positional_tables(pol)
    start = end_idx - (WINDOW_SIZE - 1)
    out = np.zeros(len(end_idx), dtype=np.uint64)
    for j in range(WINDOW_SIZE):
        out ^= t64[j][arr[start + j]]
    return out


def _eof_cut(data: bytes, s: int, params: ChunkerParams) -> int:
    """Cut fingerprint of a final chunk shorter than min_size: the
    digest is the plain (non-rolling) fingerprint of 0x01 followed by
    whatever tail got hashed (< 64 bytes, window never filled).

    Computed from the positional tables: byte at distance d from the
    end contributes T64[63-d][b] (T64[j][b] = b·x^{8(63-j)} mod P), and
    the leading 0x01 sits at distance len(tail)."""
    pre = params.min_size - WINDOW_SIZE
    tail = data[s + pre :] if len(data) - s > pre else b""
    t64, _ = positional_tables(params.pol)
    last = WINDOW_SIZE - 1
    fp = int(t64[last - len(tail)][1])  # the 0x01 marker byte
    for i, b in enumerate(tail):
        fp ^= int(t64[last - (len(tail) - 1 - i)][b])
    return fp


def chunk_buffer(data: bytes, params: ChunkerParams = ChunkerParams()) -> list[Chunk]:
    """Chunk one in-memory buffer; bit-for-bit equal to the scalar
    oracle (chunker.chunk_spans) and hence to the reference."""
    n = len(data)
    if n == 0:
        return []
    min_size, max_size = params.min_size, params.max_size
    if n < min_size:
        # single short chunk, no scan needed (the common case for
        # source-code rows at default params)
        return [Chunk(0, n, _eof_cut(data, 0, params))]

    arr = np.frombuffer(data, dtype=np.uint8)
    # Evaluate fingerprints lazily, only over scan regions: bytes below
    # s+min_size are never boundary-checked (the reference's pre-skip +
    # warm-up), and scanning stops at the first candidate — so work in
    # blocks of ~half the average chunk size.  At default params this
    # skips ~50% of all hashing.
    block = max(1 << 16, 1 << (params.average_bits - 1))

    spans: list[tuple[int, int]] = []  # (start, cut_pos)
    s = 0
    while s < n:
        lo, hi = s + min_size, min(s + max_size, n)
        c = hi
        # check positions c' in [lo, hi) → fp indices k = c' - 64
        k = lo - WINDOW_SIZE
        while k < hi - WINDOW_SIZE:
            k_end = min(k + block, hi - WINDOW_SIZE)
            cand = _candidates(arr, params.pol, params.splitmask, k, k_end)
            if len(cand):
                c = int(cand[0]) + WINDOW_SIZE
                break
            k = k_end
        spans.append((s, c))
        s = c

    # exact cut fingerprints, computed only at cut positions
    cuts = np.empty(len(spans), dtype=np.uint64)
    ends = np.array([e for _, e in spans], dtype=np.int64)
    full = ends - np.array([st for st, _ in spans], dtype=np.int64) >= min_size
    if full.any():
        cuts[full] = _fp64_at(arr, ends[full] - 1, params.pol)
    for i in np.flatnonzero(~full):
        # final short chunk (EOF before min_size)
        cuts[i] = _eof_cut(data, spans[i][0], params)
    return [Chunk(st, e - st, int(cut)) for (st, e), cut in zip(spans, cuts)]


#: documents larger than this take the lazy per-buffer path; smaller
#: ones amortize numpy fixed costs through one concatenated pass
_BATCH_DOC_LIMIT = 1 << 16


def chunk_many(buffers: list[bytes], params: ChunkerParams = ChunkerParams()) -> list[list[Chunk]]:
    """Chunk a batch of independent buffers (one Arrow batch of rows).

    Semantically identical to ``[chunk_buffer(b) for b in buffers]`` but
    amortizes the vectorized passes: small documents are concatenated
    into one byte array, fingerprinted in a single set of gather passes,
    and their boundary candidates selected per document from the global
    candidate list. Valid because a window never straddles a checked
    position's document start: checks happen only at offsets
    >= min_size >= 64 into each document, where the 64-byte window lies
    entirely inside that document (window purity, SURVEY.md §2.2.7).

    Documents below ``min_size`` are single chunks with an EOF cut and
    need no hashing at all; documents above 64 KiB go through the lazy
    segment scan of ``chunk_buffer``.
    """
    from .native import provider

    native = provider()
    if native is not None:
        raw = native.chunk_many_raw(
            list(buffers), params.pol, params.average_bits, params.min_size, params.max_size
        )
        return [[Chunk(o, ln, cut) for (o, ln, cut) in chunks] for chunks in raw]

    n_bufs = len(buffers)
    out: list[list[Chunk] | None] = [None] * n_bufs
    min_size, max_size = params.min_size, params.max_size

    batched: list[int] = []
    for i, data in enumerate(buffers):
        n = len(data)
        if n == 0:
            out[i] = []
        elif n < min_size:
            out[i] = [Chunk(0, n, _eof_cut(data, 0, params))]
        elif n > _BATCH_DOC_LIMIT:
            out[i] = chunk_buffer(data, params)
        else:
            batched.append(i)
    if not batched:
        return out

    import bisect

    blob = b"".join(buffers[i] for i in batched)
    arr = np.frombuffer(blob, dtype=np.uint8)
    cand: list[int] = (
        _candidates(arr, params.pol, params.splitmask, 0, len(arr) - WINDOW_SIZE + 1)
        + WINDOW_SIZE
    ).tolist()
    nc = len(cand)

    # pass 1: select spans (plain ints + bisect — cheap per chunk) and
    # collect every full-window cut position for ONE batched fp64 gather
    doc_spans: list[list[tuple[int, int]]] = []
    fp64_pos: list[int] = []
    fp64_ref: list[tuple[int, int]] = []  # (doc#, span#) -> fp64 index
    base = 0
    for d, i in enumerate(batched):
        n = len(buffers[i])
        spans: list[tuple[int, int]] = []  # doc-relative
        s = 0
        while s < n:
            lo, hi = s + min_size, min(s + max_size, n)
            ci = bisect.bisect_left(cand, base + lo)
            c = cand[ci] - base if ci < nc and cand[ci] < base + hi else hi
            if c - s >= min_size:
                fp64_ref.append((d, len(spans)))
                fp64_pos.append(base + c - 1)
            spans.append((s, c))
            s = c
        doc_spans.append(spans)
        base += n

    fp64 = (
        _fp64_at(arr, np.asarray(fp64_pos, dtype=np.int64), params.pol)
        if fp64_pos
        else np.empty(0, dtype=np.uint64)
    )
    cuts: list[list[int | None]] = [[None] * len(s) for s in doc_spans]
    for (d, j), v in zip(fp64_ref, fp64.tolist()):
        cuts[d][j] = v
    for d, i in enumerate(batched):
        data = buffers[i]
        out[i] = [
            Chunk(st, e - st, cuts[d][j] if cuts[d][j] is not None else _eof_cut(data, st, params))
            for j, (st, e) in enumerate(doc_spans[d])
        ]
    return out
