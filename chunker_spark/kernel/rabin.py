"""Scalar rolling Rabin fingerprint — the byte-exact test oracle.

Direct, intentionally simple Python statement of the rolling-hash
semantics in `/root/reference/src/chunker/rabin.d` (operators O6-O15 in
SURVEY.md §2.1): a 64-byte circular window over a degree-53 GF(2)
polynomial, with the classic two-table optimization —

* ``out_table[b]`` = fingerprint of ``b`` followed by 63 zero bytes;
  XOR-ing it cancels the byte leaving the window (GF(2) linearity).
* ``mod_table[t]`` = one-XOR modular reduction for top byte ``t``.

This module is NOT the engine's hot path (see vectorized.py); it exists
so property tests can check the vectorized kernel against an
independent, obviously-faithful implementation.
"""

from __future__ import annotations

from functools import lru_cache

from . import polynomials as poly

WINDOW_SIZE = 64
_U64 = (1 << 64) - 1


@lru_cache(maxsize=8)
def tables(pol: int) -> tuple[tuple[int, ...], tuple[int, ...], int]:
    """(out_table, mod_table, pol_shift) for a polynomial.

    Cached per process — the analogue of the reference's global table
    cache (rabin.d:52-56), and of one-per-executor memoization in Spark.
    """
    k = poly.deg(pol)
    out_table = []
    for b in range(256):
        h = b
        for _ in range(WINDOW_SIZE - 1):
            h = poly.mod(h << 8, pol)
        out_table.append(poly.mod(h, pol))
    mod_table = [poly.mod(b << k, pol) | (b << k) for b in range(256)]
    return tuple(out_table), tuple(mod_table), k - 8


class RabinHash:
    """Stateful rolling hash over a 64-byte window (scalar oracle)."""

    __slots__ = ("_out", "_mod", "_shift", "window", "wpos", "digest")

    def __init__(self, pol: int = poly.DEFAULT_POL) -> None:
        self._out, self._mod, self._shift = tables(pol)
        self.window = bytearray(WINDOW_SIZE)
        self.wpos = 0
        self.digest = 0

    def start(self) -> None:
        self.window[:] = bytes(WINDOW_SIZE)
        self.wpos = 0
        self.digest = 0

    def finish(self) -> int:
        """Return the current digest, then reset (rabin.d:42-47)."""
        d = self.digest
        self.start()
        return d

    def slide(self, b: int) -> None:
        """Slide byte ``b`` in and the oldest window byte out."""
        w = self.window
        evicted = w[self.wpos]
        w[self.wpos] = b
        self.wpos = (self.wpos + 1) % WINDOW_SIZE
        d = self.digest ^ self._out[evicted]
        d = (((d << 8) | b) ^ self._mod[d >> self._shift]) & _U64
        self.digest = d

    def put(self, data: bytes) -> None:
        for b in data:
            self.slide(b)

    def put_until(self, data: bytes, mask: int) -> int:
        """Slide bytes until ``digest & mask == 0``; the test runs
        *before* each slide (matches rabin.d:202-215). Returns the
        number of bytes consumed."""
        for i, b in enumerate(data):
            if (self.digest & mask) == 0:
                return i
            self.slide(b)
        return len(data)


def fingerprint(data: bytes, pol: int = poly.DEFAULT_POL) -> int:
    """Rabin fingerprint of ``data`` interpreted as one big polynomial
    (append-only, no window) — equals the rolling digest whenever fewer
    than 64 bytes have been slid since start."""
    h = 0
    for b in data:
        h = poly.mod((h << 8) | b, pol)
    return h
