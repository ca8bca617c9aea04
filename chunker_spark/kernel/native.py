"""Optional native CDC-kernel seam behind ``chunk_many``.

The numpy kernel runs ~23 MB/s/core on the batched small-document path
(BENCH/BASELINE.md "Reference kernel baseline"); native implementations
of this exact Rabin scheme (the reference is a port of restic's Go
chunker) run roughly 10x that per core. This seam lets a deployment
close that gap with a compiled extension — cython/rust — WITHOUT
touching any Spark plumbing: ``vectorized.chunk_many`` consults the
provider first and falls back to numpy, so the extension's absence (as
in this sandbox, which has no build toolchain) changes nothing.

Provider contract (duck-typed, validated by the injection test):

    chunk_many_raw(buffers: list[bytes], pol: int, average_bits: int,
                   min_size: int, max_size: int)
        -> list[list[tuple[int, int, int]]]   # (offset, length, cut)

per buffer, covering it exactly, bit-for-bit equal to the scalar oracle
(kernel/chunker.py) — the property tests that pin numpy against the
oracle are the acceptance bar for any native provider too.

Discovery: an installed ``chunker_native`` module is picked up
automatically; ``set_provider`` injects one explicitly (tests, vendored
builds). ``set_provider(None)`` restores the numpy path.
"""

from __future__ import annotations

_UNRESOLVED = object()
_provider = _UNRESOLVED


def provider():
    """The active native provider module/object, or None (numpy path)."""
    global _provider
    if _provider is _UNRESOLVED:
        try:
            import chunker_native  # compiled extension; not in this sandbox

            _provider = chunker_native
        except ImportError:
            _provider = None
    return _provider


def set_provider(mod) -> None:
    """Inject (or with None: clear) the native provider explicitly."""
    global _provider
    _provider = mod
