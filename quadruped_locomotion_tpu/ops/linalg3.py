"""Closed-form 3×3 linear solves for batched TPU execution.

``jnp.linalg.solve`` on a (…, 3, 3) batch lowers to an LU routine with
per-element loops and dynamic slices — the same terrible-occupancy
pattern that motivated the Pallas QP kernel (`ops/qp_pallas.py`). At
leg-scale (every plant substep and swing-torque computation solves 3×3
systems per leg per scenario) those routines dominated the batched
rollout: profiling at batch 4096 on v5e put the plant step at ~180 ms
of a ~215 ms control substep, almost all of it in batched 3×3
``linalg.solve``.

A 3×3 solve has a closed form (Cramer / adjugate) that is pure
elementwise arithmetic — ~40 multiply-adds and one division, perfectly
lane-vectorized by XLA with zero control flow. For the well-conditioned
systems in the hot path (damped-least-squares normal matrices
JJᵀ + λ²I, leg mass matrices M + h·b·I, trunk inertia) float32 Cramer
is accurate to ~1e-6 relative — the same class as the factorization
route.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def solve3(A: jax.Array, b: jax.Array) -> jax.Array:
    """Solve A x = b for A (..., 3, 3), b (..., 3) in closed form.

    Batched over any leading dims; no loops, no dynamic slices. The
    determinant is guarded with a sign-preserving epsilon so singular
    inputs yield large-but-finite results (matching the spirit of the
    damped solves at every call site) instead of inf/nan.
    """
    a00 = A[..., 0, 0]
    a01 = A[..., 0, 1]
    a02 = A[..., 0, 2]
    a10 = A[..., 1, 0]
    a11 = A[..., 1, 1]
    a12 = A[..., 1, 2]
    a20 = A[..., 2, 0]
    a21 = A[..., 2, 1]
    a22 = A[..., 2, 2]

    c00 = a11 * a22 - a12 * a21
    c01 = a12 * a20 - a10 * a22
    c02 = a10 * a21 - a11 * a20
    c10 = a02 * a21 - a01 * a22
    c11 = a00 * a22 - a02 * a20
    c12 = a01 * a20 - a00 * a21
    c20 = a01 * a12 - a02 * a11
    c21 = a02 * a10 - a00 * a12
    c22 = a00 * a11 - a01 * a10

    det = a00 * c00 + a01 * c01 + a02 * c02
    eps = jnp.asarray(
        1e-300 if det.dtype == jnp.float64 else 1e-30, det.dtype
    )
    det_safe = jnp.where(
        jnp.abs(det) < eps, jnp.where(det < 0, -eps, eps), det
    )
    inv_det = 1.0 / det_safe

    b0 = b[..., 0]
    b1 = b[..., 1]
    b2 = b[..., 2]
    x0 = (c00 * b0 + c10 * b1 + c20 * b2) * inv_det
    x1 = (c01 * b0 + c11 * b1 + c21 * b2) * inv_det
    x2 = (c02 * b0 + c12 * b1 + c22 * b2) * inv_det
    return jnp.stack([x0, x1, x2], axis=-1)
