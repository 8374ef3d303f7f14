"""Vectorized deterministic hashing primitives (numpy, no Ray).

Used for: synthetic pixel generation, phash, content fingerprints, minhash
permutations, salted shuffle keys. All functions are pure and seed-stable so
pipeline outputs are byte-reproducible across runs/retries (the reference's
whole test suite relies on byte-stable outputs; see
/root/reference/cmake/run_test_compare_output.cmake).
"""

from __future__ import annotations

import numpy as np

_U64 = np.uint64

# splitmix64 constants (public domain, Sebastiano Vigna)
_SM_GAMMA = _U64(0x9E3779B97F4A7C15)
_SM_M1 = _U64(0xBF58476D1CE4E5B9)
_SM_M2 = _U64(0x94D049BB133111EB)


def splitmix64(x: np.ndarray) -> np.ndarray:
    """Vectorized splitmix64 finalizer. x: uint64 array -> uint64 array.
    In-place ops on one scratch buffer — two allocations total instead of
    eight (this runs over every pixel word of the corpus)."""
    z = np.add(x, _SM_GAMMA, dtype=_U64)
    t = np.right_shift(z, _U64(30))
    z ^= t
    z *= _SM_M1
    np.right_shift(z, _U64(27), out=t)
    z ^= t
    z *= _SM_M2
    np.right_shift(z, _U64(31), out=t)
    z ^= t
    return z


def splitmix64_into(x: np.ndarray, out: np.ndarray,
                    t: np.ndarray) -> np.ndarray:
    """splitmix64 finalizer with caller-provided buffers: writes the mix
    of `x` into `out` using `t` as scratch — ZERO allocations (`out` may
    alias `x`). Hot stages that mix the same large buffer many times per
    batch (the 64 minhash permutations over the flat shingle array) call
    this with two reused scratch arrays: per-call fresh multi-MB
    temporaries are mmap/munmap'd by numpy, and at worker concurrency the
    page-zeroing + TLB shootdowns anti-scale the whole map stage (the
    same pathology measured on DominantColors' per-chunk histograms)."""
    np.add(x, _SM_GAMMA, out=out)
    np.right_shift(out, _U64(30), out=t)
    out ^= t
    out *= _SM_M1
    np.right_shift(out, _U64(27), out=t)
    out ^= t
    out *= _SM_M2
    np.right_shift(out, _U64(31), out=t)
    out ^= t
    return out


def hash64(x: np.ndarray, seed: int = 0) -> np.ndarray:
    """Seeded 64-bit mix of an integer array."""
    with np.errstate(over="ignore"):
        return splitmix64(x.astype(_U64) ^ (_U64(seed & 0xFFFFFFFFFFFFFFFF) * _SM_GAMMA))


def hash_str_u64(values, seed: int = 0) -> np.ndarray:
    """FNV-1a 64-bit over utf-8 bytes of each string, then splitmix finalize.

    Vectorized over the concatenated byte buffer: O(total_bytes) numpy work,
    no per-row Python hashing. `values` is any sequence of str (or a pyarrow
    StringArray via .to_numpy(zero_copy_only=False)).
    """
    import pyarrow as pa

    if isinstance(values, (pa.Array, pa.ChunkedArray)):
        arr = values.combine_chunks() if isinstance(values, pa.ChunkedArray) else values
    else:
        arr = pa.array(list(values), type=pa.string())
    if arr.null_count:
        arr = arr.fill_null("")
    arr = arr.cast(pa.large_string())
    buf = np.frombuffer(arr.buffers()[2] or b"", dtype=np.uint8)
    offs = np.frombuffer(arr.buffers()[1], dtype=np.int64)[arr.offset:arr.offset + len(arr) + 1]
    # polynomial rolling hash via segmented evaluation: h_i = sum b_j * P^(end-1-j)
    # computed with cumulative products is numerically messy in uint64; instead do
    # a chunked FNV loop over the max string length (loop length = max_len, each
    # iteration vectorized over all rows).
    n = len(arr)
    h = np.full(n, _U64(0xCBF29CE484222325), dtype=_U64)
    prime = _U64(0x100000001B3)
    starts = offs[:-1].copy()
    lens = (offs[1:] - offs[:-1]).astype(np.int64)
    max_len = int(lens.max()) if n else 0
    with np.errstate(over="ignore"):
        if max_len:
            # rows sorted longest-first: the per-char active set is then
            # a CONTIGUOUS prefix, so each round is in-place ops on
            # views + one small byte gather — the former per-char
            # boolean mask + four fancy-indexed u64 temporaries were
            # ~6n fresh bytes x max_len rounds of allocation churn
            # (this runs on every string-keyed shuffle's hash)
            order = np.argsort(-lens, kind="stable")
            starts_o = starts[order]
            neg = -lens[order]                  # ascending
            ho = h[order]
            idxbuf = np.empty(n, dtype=np.int64)
            for i in range(max_len):
                m = int(np.searchsorted(neg, -(i + 1), side="right"))
                if m == 0:
                    break
                np.add(starts_o[:m], i, out=idxbuf[:m])
                hv = ho[:m]
                np.bitwise_xor(hv, buf[idxbuf[:m]], out=hv)
                np.multiply(hv, prime, out=hv)
            h[order] = ho
        return splitmix64(h ^ (_U64(seed & 0xFFFFFFFFFFFFFFFF) * _SM_GAMMA))


def to_int64(u: np.ndarray) -> np.ndarray:
    """Reinterpret uint64 as signed int64 (for Arrow int64 columns)."""
    return u.view(np.int64)
