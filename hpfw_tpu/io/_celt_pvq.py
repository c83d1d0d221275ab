"""PVQ codeword enumeration (CWRS) + spreading rotation — RFC 6716 §4.3.4.

A CELT band shape is a vector of N integers with sum(|y|) = K pulses,
indexed canonically among all V(N, K) such vectors. The decoder maps a
uniform integer (ec.dec_uint) back to the pulse vector (cwrsi), normalizes
it to the unit sphere, and applies the inverse spreading rotation.

Counts: V(N, K) = V(N-1, K) + V(N, K-1) + V(N-1, K-1), V(N, 0) = 1,
V(0, K>0) = 0. U(K, N) := (V(N, K) - V(N-1, K)) / 2 is the number of
codewords whose first coordinate is strictly positive; the index layout per
coordinate is [0, U(K,N)) positive, [U(K,N), U(K+1,N)) zero, rest negative
(mirrored). Exact big-int arithmetic (Python ints) — the reference's 32-bit
tables are an optimization, not a semantic.

Reference parity: libopus cwrs.c / vq.c behavior; self-inverse and
count-consistency tested exhaustively for small (N, K) in
tests/test_opus.py, end-to-end certified against the system libopus oracle
(io/opus_ref.py).
"""

from __future__ import annotations

import functools
import math

import numpy as np


@functools.lru_cache(maxsize=None)
def pvq_v(n: int, k: int) -> int:
    """Number of N-dim integer vectors with L1 norm exactly K."""
    if k == 0:
        return 1
    if n == 0:
        return 0
    return pvq_v(n - 1, k) + pvq_v(n, k - 1) + pvq_v(n - 1, k - 1)


def _u(k: int, n: int) -> int:
    """Codewords of dim n, norm k, with first coordinate > 0."""
    if k > n:
        # U is symmetric under (k, n) swap (cwrs.c row layout); computing
        # via the smaller V-row keeps the recursion shallow.
        return (pvq_v(n, k) - pvq_v(n - 1, k)) // 2 if n >= 1 else 0
    return (pvq_v(n, k) - pvq_v(n - 1, k)) // 2 if n >= 1 else 0


def cwrsi(n: int, k: int, i: int) -> np.ndarray:
    """Index -> pulse vector (the reference enumeration, §4.3.4.1)."""
    assert n >= 1 and k >= 0
    y = np.zeros(n, dtype=np.int32)
    if k == 0:
        return y
    pos = 0
    while n > 2:
        p = _u(k, n)
        q = _u(k + 1, n)
        if p <= i < q:
            i -= p
            y[pos] = 0
        else:
            neg = i >= q
            if neg:
                i -= q
            k0 = k
            p = _u(k, n)
            while p > i:
                k -= 1
                p = _u(k, n)
            i -= p
            v = k0 - k
            y[pos] = -v if neg else v
        pos += 1
        n -= 1
    if n == 2:
        p = 2 * k + 1
        neg = i >= p
        if neg:
            i -= p
        k0 = k
        k = (i + 1) >> 1
        if k:
            i -= 2 * k - 1
        v = k0 - k
        y[pos] = -v if neg else v
        pos += 1
    # n == 1: all remaining pulses, sign from the final index bit
    y[pos] = -k if i else k
    return y


def decode_pulses(dec, n: int, k: int) -> np.ndarray:
    """Range-decode one PVQ codeword index and expand it (§4.3.4)."""
    return cwrsi(n, k, dec.dec_uint(pvq_v(n, k)))


# -- spreading rotation (vq.c) ------------------------------------------------

SPREAD_NONE = 0
SPREAD_LIGHT = 1
SPREAD_NORMAL = 2
SPREAD_AGGRESSIVE = 3

_SPREAD_FACTOR = (15, 10, 5)     # LIGHT, NORMAL, AGGRESSIVE


def _exp_rotation1(x: np.ndarray, stride: int, c: float, s: float) -> None:
    """One Givens cascade pass, in place (vq.c exp_rotation1, float)."""
    ln = x.shape[0]
    for i in range(ln - stride):
        x1 = x[i]
        x2 = x[i + stride]
        x[i + stride] = c * x2 + s * x1
        x[i] = c * x1 - s * x2
    for i in range(ln - 2 * stride - 1, -1, -1):
        x1 = x[i]
        x2 = x[i + stride]
        x[i + stride] = c * x2 + s * x1
        x[i] = c * x1 - s * x2


def exp_rotation(x: np.ndarray, dirn: int, stride: int, k: int,
                 spread: int) -> None:
    """Spreading rotation over `stride` interleaved blocks, in place.

    dirn=-1 is the decode (inverse) direction. No-op when the band is
    dense enough (2K >= N) or spreading is off — exactly the reference's
    gate, which the encoder relies on for bit-exact shape reconstruction.
    """
    n = x.shape[0]
    if 2 * k >= n or spread == SPREAD_NONE:
        return
    factor = _SPREAD_FACTOR[spread - 1]
    gain = n / (n + factor * k)
    theta = 0.5 * gain * gain
    c = math.cos(0.5 * math.pi * theta)
    s = math.cos(0.5 * math.pi * (1.0 - theta))     # sin
    stride2 = 0
    if n >= 8 * stride:
        stride2 = 1
        while (stride2 * stride2 + stride2) * stride + (stride >> 2) < n:
            stride2 += 1
    ln = n // stride
    for i in range(stride):
        seg = x[i * ln:(i + 1) * ln]
        if dirn < 0:
            if stride2:
                _exp_rotation1(seg, stride2, s, c)
            _exp_rotation1(seg, 1, c, s)
        else:
            _exp_rotation1(seg, 1, c, -s)
            if stride2:
                _exp_rotation1(seg, stride2, s, -c)


def extract_collapse_mask(y: np.ndarray, b: int) -> int:
    """Which of the B short blocks received any pulse (bands.c)."""
    if b <= 1:
        return 1
    n = y.shape[0]
    n0 = n // b
    mask = 0
    for blk in range(b):
        if np.any(y[blk * n0:(blk + 1) * n0]):
            mask |= 1 << blk
    return mask


def normalize_residual(y: np.ndarray, gain: float) -> np.ndarray:
    """Unit-normalize the pulse vector scaled by `gain` (vq.c, float)."""
    e = float(np.dot(y.astype(np.float64), y.astype(np.float64)))
    g = gain / math.sqrt(e) if e > 0 else 0.0
    return (g * y).astype(np.float64)


def alg_unquant(dec, x_out: np.ndarray, n: int, k: int, spread: int, b: int,
                gain: float) -> int:
    """Decode one PVQ band shape into x_out (length n); returns the
    collapse mask (bands.c alg_unquant)."""
    y = decode_pulses(dec, n, k)
    x = normalize_residual(y, gain)
    exp_rotation(x, -1, b, k, spread)
    x_out[:] = x
    return extract_collapse_mask(y, b)
