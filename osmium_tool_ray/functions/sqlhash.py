"""SQL-twin generators for the engine's hash primitives.

Emit DuckDB SQL expression strings that reproduce functions/hashing.py
bit-for-bit — so sketch outputs (SimHash, MinHash signatures) can be
exact-oracled by the driver instead of rows-only checked. All arithmetic
runs in HUGEINT (128-bit) with explicit mod-2^64 folds; 64x64-bit
multiplies are split into 32-bit halves so no intermediate exceeds
HUGEINT range.

The generated SQL is machine-built and deliberately explicit; it is the
*oracle* side only — the engine side stays vectorized numpy."""

from __future__ import annotations

M64 = 1 << 64
M32 = 1 << 32

FNV_OFFSET = 0xCBF29CE484222325
FNV_PRIME = 0x100000001B3
SM_GAMMA = 0x9E3779B97F4A7C15
SM_M1 = 0xBF58476D1CE4E5B9
SM_M2 = 0x94D049BB133111EB


def _let(val: str, body) -> str:
    """Bind `val` to a lambda variable and evaluate body(var) — DuckDB has
    no LET, but list_transform([v], x -> f(x))[1] is one."""
    return f"list_transform([{val}], _z -> {body('_z')})[1]"


def xor64(a: str, b: str) -> str:
    return f"xor(CAST({a} AS HUGEINT), CAST({b} AS HUGEINT))"


def mul64(z: str, c: int) -> str:
    """(z * c) mod 2^64 for 0 <= z < 2^64 and a 64-bit constant c, via
    32-bit split so the widest intermediate is < 2^96."""
    def body(v: str) -> str:
        return (f"(({v} % {M32}) * {c} + ((({v} // {M32}) * {c}) % {M32}) * {M32})"
                f" % {M64}")
    return _let(z, body)


def splitmix64_sql(x: str) -> str:
    """splitmix64 finalizer (functions/hashing.splitmix64) over a HUGEINT
    SQL expression in [0, 2^64)."""
    z0 = f"(CAST({x} AS HUGEINT) + {SM_GAMMA}) % {M64}"

    def step_shift_xor(v: str, k: int) -> str:
        return xor64(v, f"({v} // {1 << k})")

    z1 = _let(z0, lambda v: step_shift_xor(v, 30))
    z2 = mul64(z1, SM_M1)
    z3 = _let(z2, lambda v: step_shift_xor(v, 27))
    z4 = mul64(z3, SM_M2)
    z5 = _let(z4, lambda v: step_shift_xor(v, 31))
    return z5


def fnv1a_sql(s: str) -> str:
    """FNV-1a 64 over the bytes of an ASCII string expression (the oracle
    corpus is ASCII; ascii() returns codepoints, which equal bytes there)."""
    bytes_list = (f"list_transform(list_filter(string_split({s}, ''), "
                  f"_c -> _c <> ''), _c -> CAST(ascii(_c) AS HUGEINT))")
    init = f"CAST({FNV_OFFSET} AS HUGEINT)"
    fold = f"({xor64('_h', '_b')} * {FNV_PRIME}) % {M64}"
    return (f"list_reduce(list_prepend({init}, {bytes_list}), "
            f"(_h, _b) -> {fold})")


def hash_str_sql(s: str, seed: int = 0) -> str:
    """SQL twin of functions/hashing.hash_str_u64(s, seed)."""
    h = fnv1a_sql(s)
    if seed:
        salt = (seed * SM_GAMMA) % M64
        h = xor64(h, str(salt))
    return splitmix64_sql(h)


def u64_to_i64_sql(x: str) -> str:
    """Reinterpret a [0, 2^64) HUGEINT expression as signed int64 (the
    numpy .view(int64) the engine uses for Arrow columns)."""
    return _let(f"CAST({x} AS HUGEINT)",
                lambda v: f"CAST({v} - CASE WHEN {v} >= {1 << 63} "
                          f"THEN {M64} ELSE 0 END AS BIGINT)")


def hash64_const(x: int, seed: int = 0) -> int:
    """Python-side constant fold of functions/hashing.hash64 for scalar x
    (used to precompute permutation salts as SQL literals)."""
    import numpy as np

    from .hashing import hash64
    return int(hash64(np.asarray([x], dtype=np.uint64), seed=seed)[0])
