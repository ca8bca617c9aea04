"""Hypothesis fuzz: the vectorized kernel equals the scalar oracle and
satisfies the tiling/bounds contract on ARBITRARY byte strings — not
just the golden fixtures (random printable / Go-rand data). Catches
edge shapes the parametrized tests can't enumerate: runs, repeats,
high-byte content, sizes straddling pre/min/max boundaries."""

from hypothesis import given, settings, strategies as st

import chunker_spark.kernel.chunker as sc
import chunker_spark.kernel.vectorized as vec

TEST_POL = 0x3DA3358B4DC173

PARAM_SETS = [
    dict(average_bits=8, min_size=64, max_size=1024),
    dict(average_bits=9, min_size=128, max_size=4096),
    dict(average_bits=6, min_size=70, max_size=200),  # tight min/max band
]


@settings(max_examples=40, deadline=None)
@given(
    data=st.binary(min_size=0, max_size=8192),
    pi=st.integers(min_value=0, max_value=len(PARAM_SETS) - 1),
)
def test_fuzz_vectorized_equals_scalar_and_tiles(data, pi):
    params = sc.ChunkerParams(pol=TEST_POL, **PARAM_SETS[pi])
    got = vec.chunk_buffer(data, params)
    assert got == sc.chunk_list(data, params)
    # tiling: chunks cover the buffer exactly, in order
    pos = 0
    for i, c in enumerate(got):
        assert c.offset == pos
        assert c.length > 0
        pos += c.length
        if i < len(got) - 1:  # every non-final chunk respects bounds
            assert params.min_size <= c.length <= params.max_size
        else:
            assert c.length <= params.max_size
    assert pos == len(data)
    assert (len(got) == 0) == (len(data) == 0)


@settings(max_examples=20, deadline=None)
@given(st.binary(min_size=1, max_size=4096))
def test_fuzz_edit_locality(data):
    """CDC dedup property: flipping one byte changes only a bounded
    window of chunks — chunks strictly before/after the edit's
    neighborhood keep identical (offset, length, cut) tuples far away."""
    params = sc.ChunkerParams(pol=TEST_POL, average_bits=6, min_size=64, max_size=512)
    a = vec.chunk_buffer(data, params)
    idx = len(data) // 2
    edited = data[:idx] + bytes([data[idx] ^ 0xFF]) + data[idx + 1 :]
    b = vec.chunk_buffer(edited, params)
    # chunks fully contained in the prefix before (edit - max_size) are unchanged
    safe = idx - params.max_size
    pa = [c for c in a if c.offset + c.length <= safe]
    pb = [c for c in b if c.offset + c.length <= safe]
    assert pa == pb
