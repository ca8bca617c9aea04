"""GF(2)[x] polynomial arithmetic on plain Python ints.

A polynomial is an int whose bit *i* is the coefficient of x^i — the same
encoding as the reference (`/root/reference/src/chunker/polynomials.d:4-7`).
Used driver-side only: building the rolling-hash lookup tables, testing
irreducibility, and deriving random polynomials.  Semantics match the
reference operators O16-O23 (SURVEY.md §2.1); the hot path never calls
these (tables are precomputed, see rabin.py / vectorized.py).
"""

from __future__ import annotations

from collections.abc import Iterator

#: Default/test polynomial of the reference and of restic
#: (/root/reference/src/chunker/package.d:327-328). Irreducible, degree 53.
DEFAULT_POL = 0x3DA3358B4DC173

RAND_POL_MAX_TRIES = 1_000_000


def deg(x: int) -> int:
    """Degree of the polynomial; -1 for the zero polynomial."""
    return x.bit_length() - 1


def add(x: int, y: int) -> int:
    """Addition over GF(2) (identical to subtraction): XOR."""
    return x ^ y


def mul(x: int, y: int) -> int:
    """Carry-less multiplication (Python ints never overflow)."""
    if x == 0 or y == 0:
        return 0
    res = 0
    while y:
        low = y & -y
        res ^= x << (low.bit_length() - 1)
        y ^= low
    return res


def divmod2(x: int, d: int) -> tuple[int, int]:
    """Long division over GF(2)[x]; returns (quotient, remainder)."""
    if d == 0:
        raise ZeroDivisionError("polynomial division by zero")
    q = 0
    dd = deg(d)
    while True:
        diff = deg(x) - dd
        if diff < 0:
            return q, x
        q |= 1 << diff
        x ^= d << diff


def mod(x: int, d: int) -> int:
    """Remainder of GF(2)[x] long division."""
    if d == 0:
        raise ZeroDivisionError("polynomial division by zero")
    dd = deg(d)
    while True:
        diff = deg(x) - dd
        if diff < 0:
            return x
        x ^= d << diff


def gcd(x: int, f: int) -> int:
    """Greatest common divisor over GF(2)[x] (Euclid)."""
    while f:
        x, f = f, mod(x, f)
    return x


def mulmod(a: int, b: int, g: int) -> int:
    """(a * b) mod g without growing past deg(g) intermediate values."""
    if a == 0 or b == 0:
        return 0
    a = mod(a, g)
    res = 0
    dg = deg(g)
    while b:
        if b & 1:
            res ^= a
        b >>= 1
        a <<= 1
        if deg(a) >= dg:
            a ^= g << (deg(a) - dg)
    return mod(res, g)


def _qp(p: int, g: int) -> int:
    """(x^(2^p) - x) mod g, by repeated squaring (Ben-Or helper)."""
    res = 0b10  # x
    i = 1
    num = 1 << p
    while i < num:
        res = mulmod(res, res, g)
        i *= 2
    return mod(res ^ 0b10, g)


def irreducible(f: int) -> bool:
    """Ben-Or reducibility test: f is irreducible over GF(2) iff
    gcd(f, x^(2^i) - x mod f) == 1 for all 1 <= i <= deg(f)/2."""
    for i in range(1, deg(f) // 2 + 1):
        if gcd(f, _qp(i, f)) != 1:
            return False
    return True


def derive(byte_source: Iterator[int]) -> int:
    """Draw random degree-53 irreducible polynomials from a byte stream.

    Eight bytes big-endian per candidate, masked to bits 0..53 with bits
    53 and 0 forced on; retried until irreducible (same scheme as the
    reference's Pol.derive). Deterministic given a deterministic source.
    """
    for _ in range(RAND_POL_MAX_TRIES):
        f = 0
        for _ in range(8):
            f = (f << 8) | (next(byte_source) & 0xFF)
        f &= (1 << 54) - 1
        f |= (1 << 53) | 1
        if irreducible(f):
            return f
    raise RuntimeError("unable to find a random irreducible polynomial")


def get_random_pol(seed: int = 0) -> int:
    """Random irreducible degree-53 polynomial from a seeded stream."""
    import random

    rng = random.Random(seed)
    return derive(iter(lambda: rng.getrandbits(8), None))


def to_expr(x: int) -> str:
    """Human-readable polynomial expression — same output as the
    reference's ``expand`` (polynomials.d:260-278: "x^53+…+x+1")."""
    if x == 0:
        return "0"
    terms = []
    for i in range(deg(x), -1, -1):
        if (x >> i) & 1:
            terms.append("1" if i == 0 else ("x" if i == 1 else f"x^{i}"))
    return "+".join(terms)


#: reference alias (polynomials.d:260 `expand`)
expand = to_expr


def to_hex(x: int) -> str:
    """Coefficients in hex, identical to the reference's ``toString``
    (polynomials.d:251-256: "0x" + lowercase hex digits)."""
    return f"0x{x:x}"


def parse_bin(s: str) -> int:
    """Parse a base-2 coefficient string (reference's unittest helper
    ``parseBin``, polynomials.d:79-83). Round-trips with ``f"{x:b}"``."""
    return int(s, 2)


def parse_hex(s: str) -> int:
    """Inverse of ``to_hex`` (accepts with or without the 0x prefix)."""
    return int(s, 16)
