"""Scalar content-defined chunker — the byte-exact boundary oracle.

States the reference's boundary policy (SURVEY.md §2.2, derived from
/root/reference/src/chunker/package.d:173-260) over a complete in-memory
buffer.  The distributed engine never runs this on data; it is the
referee the vectorized kernel (vectorized.py) is property-tested against.

Boundary policy, per chunk starting at offset ``s``:

1. hash state is reset and a literal ``0x01`` byte is slid in;
2. the first ``min_size - 64`` bytes are copied but never hashed;
3. the next 64 bytes (up to ``s + min_size``) warm the window up with
   no boundary checks;
4. from count ``c = min_size``, *before* consuming each next byte, cut
   when ``digest & ((1 << average_bits) - 1) == 0``;
5. at ``c == max_size`` the chunk is force-cut with ``cut = digest``;
6. at end of input the remainder forms the final chunk regardless of
   ``min_size``; its ``cut`` is the digest at EOF.

The emitted ``cut`` is always < 2^53 (degree-53 modulus), so it is safe
in a Spark LongType column.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Iterator

from . import polynomials as poly
from .rabin import WINDOW_SIZE, RabinHash

KIB = 1024
MIB = 1024 * KIB


@dataclass(frozen=True)
class ChunkerParams:
    """Chunking configuration (defaults = reference defaults,
    package.d:100-105: 1 MiB average, 512 KiB min, 8 MiB max)."""

    pol: int = poly.DEFAULT_POL
    average_bits: int = 20
    min_size: int = 512 * KIB
    max_size: int = 8 * MIB

    def __post_init__(self) -> None:
        if self.min_size < WINDOW_SIZE:
            raise ValueError(
                f"min_size must be >= window size {WINDOW_SIZE}, got {self.min_size}"
            )
        if self.max_size < self.min_size:
            raise ValueError("max_size must be >= min_size")
        if poly.deg(self.pol) != 53:
            raise ValueError("polynomial must have degree 53")

    @property
    def splitmask(self) -> int:
        return (1 << self.average_bits) - 1


@dataclass(frozen=True)
class Chunk:
    offset: int
    length: int
    cut: int

    @property
    def end(self) -> int:
        return self.offset + self.length


def chunk_spans(data: bytes, params: ChunkerParams = ChunkerParams()) -> Iterator[Chunk]:
    """Yield (offset, length, cut) spans covering ``data`` exactly."""
    n = len(data)
    mask = params.splitmask
    pre = params.min_size - WINDOW_SIZE
    s = 0
    h = RabinHash(params.pol)
    while s < n:
        h.start()
        h.slide(1)
        # phase 2+3: unhashed pre-skip, then 64-byte warm-up
        warm_end = min(s + params.min_size, n)
        h.put(data[min(s + pre, n):warm_end])
        # phase 4+5+6: scan with check-before-slide; no check at the
        # force-cut position or at EOF
        limit = min(s + params.max_size, n)
        pos = warm_end
        while pos < limit:
            if (h.digest & mask) == 0:
                break
            h.slide(data[pos])
            pos += 1
        else:
            pos = limit
        yield Chunk(s, pos - s, h.digest)
        s = pos


def chunk_list(data: bytes, params: ChunkerParams = ChunkerParams()) -> list[Chunk]:
    return list(chunk_spans(data, params))
