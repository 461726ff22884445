"""Host polynomial utilities over F_p4 (reference: risc0/zkp/src/core/poly.rs).

Operates on numpy arrays of ext elements (shape (..., 4), Montgomery form).
These run on tiny inputs (per-register tap interpolation, verifier checks).
"""

from __future__ import annotations

import numpy as np

from .. import field as F


def ext_zero():
    return np.zeros(4, np.uint32)


def ext_one():
    out = np.zeros(4, np.uint32)
    out[0] = F.R % F.P
    return out


def poly_eval(coeffs, x):
    """sum_i coeffs[i] x^i; coeffs (n, 4), x (4,)."""
    tot = ext_zero()
    cur = ext_one()
    for c in np.asarray(coeffs, np.uint32):
        tot = F.add_np(tot, F.ext_mul_np(c, cur))
        cur = F.ext_mul_np(cur, x)
    return tot


def poly_divide(p, z):
    """In-place division of p (n,4) by (x - z); returns remainder (poly.rs:79-89)."""
    cur = ext_zero()
    for i in range(len(p) - 1, -1, -1):
        nxt = F.add_np(F.ext_mul_np(z, cur), p[i])
        p[i] = cur
        cur = nxt
    return cur


def poly_interpolate(xs, fxs):
    """Lagrange interpolation -> coefficients (poly.rs:34-76).

    xs, fxs: (size, 4).  Returns (size, 4).
    """
    size = len(xs)
    if size == 1:
        return np.asarray(fxs[:1], np.uint32).copy()
    if size == 2:
        out = np.zeros((2, 4), np.uint32)
        out[1] = F.ext_mul_np(F.sub_np(fxs[1], fxs[0]), F.ext_inv_np(F.sub_np(xs[1], xs[0])))
        out[0] = F.sub_np(fxs[0], F.ext_mul_np(out[1], xs[0]))
        return out
    ft = np.zeros((size + 1, 4), np.uint32)
    ft[0] = ext_one()
    for i in range(size):
        for j in range(i, -1, -1):
            value = ft[j].copy()
            ft[j + 1] = F.add_np(ft[j + 1], value)
            ft[j] = F.ext_mul_np(ft[j], F.neg_np(xs[i]))
    out = np.zeros((size, 4), np.uint32)
    for i in range(size):
        fr = ft.copy()
        poly_divide(fr, xs[i])
        fr_xi = poly_eval(fr, xs[i])
        mul = F.ext_mul_np(fxs[i], F.ext_inv_np(fr_xi))
        for j in range(size):
            out[j] = F.add_np(out[j], F.ext_mul_np(mul, fr[j]))
    return out
