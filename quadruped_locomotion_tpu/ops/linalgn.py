"""Unrolled batched small-matrix factorizations (n ≤ ~32) for TPU.

Same philosophy as :mod:`.linalg3` one size up: ``jnp.linalg.solve`` on
(…, 18, 18) / (…, 30, 30) batches lowers to pivoted LU routines whose
per-element loops and dynamic slices leave the VPU idle — profiling the
batched articulated plant at 4096 scenarios put ~170 ms of a ~215 ms
control substep in these solves. Unrolling the factorization at trace
time turns it into a few thousand *fused elementwise* madds where the
batch rides the vector lanes — the plain-XLA sibling of the Pallas QP
kernel's layout (`ops/qp_pallas.py`), without needing a custom kernel
because there is no data-dependent control flow to hide.

Provides:

* :func:`spd_solve` — Cholesky solve for SPD (…, n, n) systems.
* :func:`kkt_contact_solve` — the articulated plant's masked contact
  KKT system solved via the M-Schur complement (two SPD factorizations
  of 18 and 12 instead of one pivoted 30×30 LU):
      M v̇ − Aᵀλ = r₁,   A v̇ + Cλ = r₂
  ⇒   (A M⁻¹ Aᵀ + C) λ = r₂ − A M⁻¹ r₁,   v̇ = M⁻¹(r₁ + Aᵀλ).
  M (the mass matrix) is SPD; C > 0 makes the Schur complement SPD.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def _chol(a):
    """Unrolled Cholesky of a list-of-lists of batched scalars.
    Returns L with RECIPROCAL diagonal stored (as in ops/qp_pallas)."""
    n = len(a)
    L = [[None] * n for _ in range(n)]
    for j in range(n):
        acc = a[j][j]
        for k in range(j):
            acc = acc - L[j][k] * L[j][k]
        acc = jnp.maximum(acc, 1e-30)
        rd = jax.lax.rsqrt(acc)
        L[j][j] = rd
        for i in range(j + 1, n):
            acc2 = a[i][j]
            for k in range(j):
                acc2 = acc2 - L[i][k] * L[j][k]
            L[i][j] = acc2 * rd
    return L


def _chol_solve_list(L, b):
    """Solve L Lᵀ x = b for b a list of batched scalars."""
    n = len(b)
    y = [None] * n
    for i in range(n):
        acc = b[i]
        for k in range(i):
            acc = acc - L[i][k] * y[k]
        y[i] = acc * L[i][i]
    x = [None] * n
    for i in reversed(range(n)):
        acc = y[i]
        for k in range(i + 1, n):
            acc = acc - L[k][i] * x[k]
        x[i] = acc * L[i][i]
    return x


def _unpack(A, n):
    return [[A[..., i, j] for j in range(n)] for i in range(n)]


def spd_solve(A: jax.Array, b: jax.Array) -> jax.Array:
    """Solve A x = b for SPD A (…, n, n), b (…, n) — unrolled Cholesky,
    batch in the lanes, zero control flow."""
    n = A.shape[-1]
    L = _chol(_unpack(A, n))
    x = _chol_solve_list(L, [b[..., i] for i in range(n)])
    return jnp.stack(x, axis=-1)


def kkt_contact_solve(
    m_mat: jax.Array,  # (…, n, n) SPD mass matrix
    a: jax.Array,      # (…, m, n) (masked) constraint rows
    comp: jax.Array,   # (…, m) positive compliance diagonal
    r1: jax.Array,     # (…, n)
    r2: jax.Array,     # (…, m)
):
    """Solve the contact KKT system via the M-Schur complement.

    Returns (v̇ (…, n), λ (…, m)). One f32 iterative-refinement pass on
    the full KKT residual keeps accuracy on par with the pivoted LU it
    replaces (the compliance 1e-6 makes the Schur path lose ~1 digit
    otherwise).
    """
    n = m_mat.shape[-1]
    m = a.shape[-2]
    Lm = _chol(_unpack(m_mat, n))
    arows = [[a[..., p, i] for i in range(n)] for p in range(m)]

    def msolve(vec):
        return _chol_solve_list(Lm, vec)

    # X_p = M⁻¹ aᵀ_p for each constraint row p
    X = [msolve(arows[p]) for p in range(m)]
    # S = A M⁻¹ Aᵀ + diag(comp)
    S = [[None] * m for _ in range(m)]
    for p in range(m):
        for q in range(p + 1):
            acc = comp[..., p] if p == q else None
            for i in range(n):
                t = arows[p][i] * X[q][i]
                acc = t if acc is None else acc + t
            S[p][q] = acc
            S[q][p] = acc
    Ls = _chol(S)

    r1l = [r1[..., i] for i in range(n)]
    r2l = [r2[..., p] for p in range(m)]

    def solve_once(r1l, r2l):
        minv_r1 = msolve(r1l)
        rhs = []
        for p in range(m):
            acc = r2l[p]
            for i in range(n):
                acc = acc - arows[p][i] * minv_r1[i]
            rhs.append(acc)
        lam = _chol_solve_list(Ls, rhs)
        rhs_v = []
        for i in range(n):
            acc = r1l[i]
            for p in range(m):
                acc = acc + arows[p][i] * lam[p]
            rhs_v.append(acc)
        v = msolve(rhs_v)
        return v, lam

    v, lam = solve_once(r1l, r2l)

    # one refinement pass on the ORIGINAL KKT residual
    res1 = []
    for i in range(n):
        acc = r1l[i]
        for j in range(n):
            acc = acc - m_mat[..., i, j] * v[j]
        for p in range(m):
            acc = acc + arows[p][i] * lam[p]
        res1.append(acc)
    res2 = []
    for p in range(m):
        acc = r2l[p] - comp[..., p] * lam[p]
        for i in range(n):
            acc = acc - arows[p][i] * v[i]
        res2.append(acc)
    dv, dlam = solve_once(res1, res2)
    v = [v[i] + dv[i] for i in range(n)]
    lam = [lam[p] + dlam[p] for p in range(m)]
    return jnp.stack(v, axis=-1), jnp.stack(lam, axis=-1)
