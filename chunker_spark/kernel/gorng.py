"""Deterministic test-data generator compatible with Go math/rand.

The reference regenerates the Go repository's golden-vector input with an
exact port of Go's additive lagged-Fibonacci generator
(/root/reference/src/chunker/internal/gorng.d:183-255 and
internal/helpers.d:8-25).  We need the same byte streams so the golden
chunk vectors (lengths, cut fingerprints, sha256 digests) can anchor this
engine bit-for-bit.

Algorithm (public, from the Go standard library): Mitchell-Reeds additive
generator with register length 607 and tap 273, seeded through a Lehmer
LCG ``x' = 48271*x mod (2^31-1)`` and the constant ``RNG_COOKED`` table.

The draw loop is a linear recurrence ``vec[feed] += vec[tap]`` with both
cursors stepping down in lockstep, so a full block of 607 draws splits
into three dependency-free segments (273 + 273 + 61) that numpy can
evaluate vectorized; ``int64`` wrap-around addition matches Go's uint64
overflow semantics exactly.
"""

from __future__ import annotations

import numpy as np

from .gorng_data import RNG_COOKED, RNG_LEN, RNG_TAP

_INT32_MAX = (1 << 31) - 1
_MASK63 = (1 << 63) - 1


def _seed_rand(x: int) -> int:
    # Lehmer LCG via Schrage's method (A=48271, Q=44488, R=3399).
    hi, lo = divmod(x, 44488)
    x = 48271 * lo - 3399 * hi
    return x + _INT32_MAX if x < 0 else x


class GoRand:
    """Seeded Go math/rand source producing the uint64 draw stream."""

    def __init__(self, seed: int) -> None:
        seed %= _INT32_MAX
        if seed < 0:
            seed += _INT32_MAX
        if seed == 0:
            seed = 89482311
        x = seed
        for _ in range(20):
            x = _seed_rand(x)
        vec = np.empty(RNG_LEN, dtype=np.int64)
        for i in range(RNG_LEN):
            x = _seed_rand(x)
            u = x << 40
            x = _seed_rand(x)
            u ^= x << 20
            x = _seed_rand(x)
            u ^= x
            u ^= RNG_COOKED[i]
            u &= (1 << 64) - 1  # two's-complement wrap to signed 64
            vec[i] = u - (1 << 64) if u >= (1 << 63) else u
        self._vec = vec
        # cursor state expressed as "draws already taken" within the
        # canonical block rotation; tap starts at 0, feed at LEN-TAP.
        self._tap = 0
        self._feed = RNG_LEN - RNG_TAP
        #: unconsumed tail of the last drawn block — served first on the
        #: next call so successive uint64_array calls see the exact
        #: sequential Go math/rand stream (blocks are drawn whole for
        #: vectorization, but never skipped)
        self._pending = np.empty(0, dtype=np.uint64)

    def _draw_block(self) -> np.ndarray:
        """Produce the next RNG_LEN uint64 draws, vectorized.

        Draw i updates vec[feed_i] += vec[tap_i] with
        feed_i = (feed0-1-i) mod L and tap_i = feed_i + (L-TAP) mod L.
        Within one block, vec[tap_i] was rewritten at draw i-TAP, so the
        block splits at multiples of TAP into independent segments.
        """
        L, T = RNG_LEN, RNG_TAP
        vec = self._vec
        feed0, tap0 = self._feed, self._tap
        feed_idx = (feed0 - 1 - np.arange(L)) % L
        tap_idx = (tap0 - 1 - np.arange(L)) % L
        out = np.empty(L, dtype=np.int64)
        start = 0
        with np.errstate(over="ignore"):
            while start < L:
                stop = min(start + T, L)
                seg = slice(start, stop)
                out[seg] = vec[feed_idx[seg]] + vec[tap_idx[seg]]
                vec[feed_idx[seg]] = out[seg]
                start = stop
        return out.view(np.uint64)

    def uint64_array(self, count: int) -> np.ndarray:
        """Next ``count`` uint64 draws as a numpy array. Sequential:
        leftover draws from the last vectorized block are buffered and
        served first, so N calls of any sizes produce the same stream
        as one call for the total."""
        if count <= 0:
            return np.empty(0, dtype=np.uint64)
        blocks = [self._pending]
        have = len(self._pending)
        while have < count:
            b = self._draw_block()
            blocks.append(b)
            have += len(b)
        out = np.concatenate(blocks)
        self._pending = out[count:]
        return out[:count]


def get_random(seed: int, count: int) -> bytes:
    """Deterministic byte buffer, equal to the reference's getRandom.

    Four bytes per draw from bits 31..62 of int63(), little-endian
    (internal/helpers.d:8-25).
    """
    rng = GoRand(seed)
    ndraw = (count + 3) // 4
    draws = rng.uint64_array(ndraw)
    r32 = ((draws & np.uint64(_MASK63)) >> np.uint64(31)).astype(np.uint32)
    return r32.tobytes()[:count]
