"""T1 + T2: kernel golden vectors and scalar↔vectorized equivalence.

Golden vectors anchor this engine to the reference repository
bit-for-bit (lengths, cut fingerprints, chunk sha256 digests from
/root/reference/src/chunker/package.d:336-439,552-568). Property tests
then pin the vectorized numpy kernel to the scalar oracle on random
buffers and parameters.
"""

import hashlib

import pytest

from chunker_spark.kernel import chunker as sc
from chunker_spark.kernel import polynomials as poly
from chunker_spark.kernel import vectorized as vec
from chunker_spark.kernel.gorng import get_random
from chunker_spark.kernel.rabin import RabinHash, fingerprint

from .golden_vectors import (
    BOUNDS_SIZES,
    BUFFER_SHA256,
    CHUNKS1,
    CHUNKS2,
    CHUNKS3,
    CHUNKS4,
    TEST_POL,
)

import functools


@functools.lru_cache(maxsize=1)
def data32() -> bytes:
    return get_random(23, 32 * 1024 * 1024)


def test_gorng_buffer_sha256():
    assert hashlib.sha256(data32()).hexdigest() == BUFFER_SHA256


GOLDEN_CASES = [
    ("chunks1", CHUNKS1, dict()),
    ("chunks3", CHUNKS3, dict(average_bits=19)),
    ("chunks4", CHUNKS4, dict(min_size=786432, max_size=1310720)),
]


def _assert_matches(data, got, expected):
    assert len(got) == len(expected)
    pos = 0
    for i, (c, (length, cut, digest)) in enumerate(zip(got, expected)):
        assert c.offset == pos, i
        assert c.length == length, i
        assert c.cut == cut, (i, hex(c.cut), hex(cut))
        assert hashlib.sha256(data[c.offset : c.end]).hexdigest() == digest, i
        pos = c.end
    assert pos == len(data)  # chunks tile the input exactly


@pytest.mark.parametrize("kernel", [vec.chunk_buffer, sc.chunk_list], ids=["vectorized", "scalar"])
@pytest.mark.parametrize("name,expected,kw", GOLDEN_CASES, ids=[c[0] for c in GOLDEN_CASES])
def test_golden_vectors(kernel, name, expected, kw):
    if kernel is sc.chunk_list and name != "chunks1":
        pytest.skip("scalar oracle runs one full-size golden case (slow path)")
    params = sc.ChunkerParams(pol=TEST_POL, **kw)
    _assert_matches(data32(), kernel(data32(), params), expected)


@pytest.mark.parametrize("kernel", [vec.chunk_buffer, sc.chunk_list], ids=["vectorized", "scalar"])
def test_golden_zeros(kernel):
    data = bytes(len(CHUNKS2) * 524288)
    _assert_matches(data, kernel(data, sc.ChunkerParams(pol=TEST_POL)), CHUNKS2)


@pytest.mark.parametrize("kernel", [vec.chunk_buffer, sc.chunk_list], ids=["vectorized", "scalar"])
def test_golden_bounds(kernel):
    """Strict min/max bounds (off-by-one guard), package.d:552-568."""
    data = get_random(23, 64 * 1024)
    params = sc.ChunkerParams(pol=TEST_POL, average_bits=7, min_size=126, max_size=130)
    got = kernel(data, params)
    assert [c.length for c in got if c.length != 130] == BOUNDS_SIZES
    assert all(126 <= c.length <= 130 for c in got[:-1])


def test_short_input_single_chunk():
    """Input below min_size-64 → one chunk, cut == H(0x01) == 1."""
    for n in (0, 1, 63, 64, 1000):
        data = get_random(7, 1000)[:n]
        got = vec.chunk_buffer(data, sc.ChunkerParams(pol=TEST_POL))
        if n == 0:
            assert got == []
        else:
            assert len(got) == 1 and got[0].length == n and got[0].cut == 1


def test_random_polynomial_changes_chunks():
    """A different irreducible polynomial must cut differently
    (behavioral test mirroring package.d:572-598)."""
    p = poly.get_random_pol(seed=99)
    assert p != TEST_POL and poly.irreducible(p)
    data = data32()[: 4 * 1024 * 1024]
    a = vec.chunk_buffer(data, sc.ChunkerParams(pol=TEST_POL))
    b = vec.chunk_buffer(data, sc.ChunkerParams(pol=p))
    assert (a[0].length, a[0].cut) != (b[0].length, b[0].cut)


@pytest.mark.parametrize("seed,size,kw", [
    (1, 300_000, dict(average_bits=12, min_size=1024, max_size=16384)),
    (2, 100_001, dict(average_bits=8, min_size=64, max_size=1 << 20)),
    (3, 65_536, dict(average_bits=10, min_size=4096, max_size=4096 * 2)),
    (4, 131_072, dict(average_bits=16, min_size=2048, max_size=65536)),
    (5, 777, dict(average_bits=9, min_size=256, max_size=1024)),
    (6, 524_288 + 17, dict()),          # default params, straddles min_size
    (7, 524_288 - 1, dict()),           # one byte short of min_size
    (8, 524_288 - 64, dict()),          # exactly pre (nothing hashed)
    (9, 524_288 - 63, dict()),          # pre + 1 (one byte hashed)
])
def test_vectorized_equals_scalar(seed, size, kw):
    data = get_random(seed, size)
    params = sc.ChunkerParams(pol=TEST_POL, **kw)
    assert vec.chunk_buffer(data, params) == sc.chunk_list(data, params)


def test_vectorized_equals_scalar_zeros_and_repeats():
    for data in (bytes(10_000), b"abcdef" * 5_000, bytes(range(256)) * 64):
        params = sc.ChunkerParams(pol=TEST_POL, average_bits=8, min_size=128, max_size=4096)
        assert vec.chunk_buffer(data, params) == sc.chunk_list(data, params)


def test_rolling_window_purity():
    """After >= 64 slides the digest equals the pure fingerprint of the
    last 64 bytes (rabin.d:86-95) — basis of the vectorized kernel."""
    data = get_random(11, 500)
    h = RabinHash(TEST_POL)
    h.slide(1)
    h.put(data)
    assert h.digest == fingerprint(data[-64:], TEST_POL)


def test_put_until_checks_before_slide():
    """put_until tests the mask before consuming each byte, so a
    pre-satisfied mask consumes nothing (rabin.d:202-215)."""
    h = RabinHash(TEST_POL)
    assert h.put_until(b"xyz", 0xFF) == 0
    assert h.digest == 0


def test_params_validation():
    with pytest.raises(ValueError):
        sc.ChunkerParams(min_size=32)  # below window size
    with pytest.raises(ValueError):
        sc.ChunkerParams(min_size=2048, max_size=1024)
    with pytest.raises(ValueError):
        sc.ChunkerParams(pol=0b111)  # degree != 53


def test_polynomial_algebra():
    # reference unit vectors: polynomials.d irreducibility table (subset)
    assert poly.irreducible(0x3DA3358B4DC173)
    assert poly.irreducible(0x2482734CACCA49)
    for p in (0x38F1E565E288DF, 0x30A8295B9D5C91, 0x255F4350B962CB):
        assert not poly.irreducible(p)
    # mulmod vectors from polynomials.d:700-732
    assert poly.mulmod(0x1230, 0x230, 0x55) == 0x22
    assert poly.mulmod(0x0EAE8C07DBBB3026, 0xD5D6DB9DE04771DE, 0xDD2BDA3B77C9) == 0x425AE8595B7A
    # div/mod consistency
    q, r = poly.divmod2(0x5B, 0x35)
    assert poly.add(poly.mul(q, 0x35), r) == 0x5B
    assert poly.deg(0) == -1 and poly.deg(1) == 0 and poly.deg(0x40) == 6


def test_gorng_sequential_calls_match_one_call():
    """uint64_array is a sequential view of Go math/rand's stream:
    split calls of any sizes concatenate to one big call (leftover
    block draws are buffered, never skipped)."""
    import numpy as np

    from chunker_spark.kernel.gorng import GoRand

    one = GoRand(23).uint64_array(1500)
    split = GoRand(23)
    parts = [split.uint64_array(n) for n in (1, 606, 300, 593)]
    assert np.array_equal(np.concatenate(parts), one)


def test_polynomial_formatting_roundtrip():
    """O23 parity: hex toString, expand, parseBin — pinned to the
    reference's own unittest vectors (polynomials.d:79-83, 252-278)."""
    from chunker_spark.kernel.polynomials import (
        DEFAULT_POL,
        expand,
        parse_bin,
        parse_hex,
        to_hex,
    )

    assert to_hex(DEFAULT_POL) == "0x3da3358b4dc173"
    assert parse_hex(to_hex(DEFAULT_POL)) == DEFAULT_POL
    # reference expand() golden string for Pol(0x3DA3358B4DC173)
    assert expand(DEFAULT_POL) == (
        "x^53+x^52+x^51+x^50+x^48+x^47+x^45+x^41+x^40+x^37+x^36+x^34+x^32"
        "+x^31+x^27+x^25+x^24+x^22+x^19+x^18+x^16+x^15+x^14+x^8+x^6+x^5+x^4+x+1"
    )
    # parseBin vectors from the reference mul unittest
    assert parse_bin("1101") == 0b1101
    assert parse_bin("10") == 2
    assert parse_bin(f"{DEFAULT_POL:b}") == DEFAULT_POL
    assert expand(0) == "0"


def test_native_seam_absent_and_injectable():
    """The native-kernel seam: with the provider cleared chunk_many runs
    the numpy path unchanged; an injected provider satisfying the
    chunk_many_raw contract is used and its (offset, length, cut) tuples
    surface as Chunk lists. The scalar oracle doubles as a reference
    provider, so the injected path's output must equal the numpy path's
    exactly. (The bundled C provider's own acceptance suite is
    tests/test_native_kernel.py.)"""
    from chunker_spark.kernel import native
    from chunker_spark.kernel.chunker import ChunkerParams, chunk_list
    from chunker_spark.kernel.gorng import get_random
    from chunker_spark.kernel.vectorized import chunk_many

    params = ChunkerParams(average_bits=8, min_size=128, max_size=2048)
    bufs = [bytes(get_random(seed, 5000 + seed * 700)) for seed in (1, 2, 3)] + [b"", b"tiny"]

    native.set_provider(None)  # force the numpy path
    numpy_out = chunk_many(bufs, params)

    class ScalarProvider:
        calls = 0

        @staticmethod
        def chunk_many_raw(buffers, pol, average_bits, min_size, max_size):
            ScalarProvider.calls += 1
            p = ChunkerParams(
                pol=pol, average_bits=average_bits, min_size=min_size, max_size=max_size
            )
            return [
                [(c.offset, c.length, c.cut) for c in chunk_list(b, p)] for b in buffers
            ]

    native.set_provider(ScalarProvider)
    try:
        injected_out = chunk_many(bufs, params)
    finally:
        native.set_provider(None)
    assert ScalarProvider.calls == 1
    assert injected_out == numpy_out
    # and clearing really restores the numpy path
    assert chunk_many(bufs, params) == numpy_out
    native._provider = native._UNRESOLVED  # back to auto-discovery
