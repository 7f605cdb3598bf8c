"""Unrolled batched small-matrix solvers vs the LAPACK-backed routines.

`ops/linalg3.py` / `ops/linalgn.py` replace pivoted `jnp.linalg.solve`
in the hot paths (the TPU plant runs the unrolled Schur KKT; CPU keeps
LU). These tests pin the two implementations together so the TPU path
can't drift from the reference-quality factorizations.
"""

import jax
import jax.numpy as jnp
import numpy as np

from quadruped_locomotion_tpu.ops import linalg3, linalgn


def test_solve3_matches_lapack():
    rng = np.random.default_rng(0)
    M = rng.normal(size=(64, 3, 3))
    A = jnp.asarray(
        np.einsum("bij,bkj->bik", M, M) + 0.1 * np.eye(3), jnp.float32
    )
    b = jnp.asarray(rng.normal(size=(64, 3)), jnp.float32)
    x = linalg3.solve3(A, b)
    x_ref = jnp.linalg.solve(A, b[..., None])[..., 0]
    np.testing.assert_allclose(
        np.asarray(x), np.asarray(x_ref), rtol=2e-4, atol=2e-5
    )


def test_spd_solve_matches_lapack():
    # n=8 keeps the unrolled graph's XLA:CPU compile in CI range; the
    # code path is shape-generic (the TPU plant instantiates n=18).
    rng = np.random.default_rng(1)
    n = 8
    M = rng.normal(size=(4, n, n))
    A = jnp.asarray(
        np.einsum("bij,bkj->bik", M, M) + n * np.eye(n), jnp.float32
    )
    b = jnp.asarray(rng.normal(size=(4, n)), jnp.float32)
    x = jax.jit(linalgn.spd_solve)(A, b)
    x_ref = jnp.linalg.solve(A, b[..., None])[..., 0]
    np.testing.assert_allclose(
        np.asarray(x), np.asarray(x_ref), rtol=1e-3, atol=1e-4
    )


def test_kkt_contact_solve_matches_block_lu():
    """The M-Schur contact solve must match the pivoted 30×30 LU the CPU
    path uses — including masked (inactive) rows with unit compliance
    and the reference's 1e-6 contact compliance on active rows."""
    # small dims for CPU compile time; shape-generic code (TPU: 18/12)
    rng = np.random.default_rng(2)
    B, n, m = 3, 7, 5
    M = rng.normal(size=(B, n, n))
    m_mat = jnp.asarray(
        np.einsum("bij,bkj->bik", M, M) / n + 2.0 * np.eye(n), jnp.float32
    )
    a_full = rng.normal(size=(B, m, n)).astype(np.float32)
    mask = rng.uniform(size=(B, m)) < 0.6
    a = jnp.asarray(np.where(mask[..., None], a_full, 0.0))
    comp = jnp.asarray(np.where(mask, 1e-6, 1.0), jnp.float32)
    r1 = jnp.asarray(rng.normal(size=(B, n)) * 10, jnp.float32)
    r2 = jnp.asarray(
        np.where(mask, rng.normal(size=(B, m)), 0.0), jnp.float32
    )

    v, lam = jax.jit(linalgn.kkt_contact_solve)(m_mat, a, comp, r1, r2)

    kkt = jnp.concatenate(
        [
            jnp.concatenate([m_mat, -jnp.swapaxes(a, -1, -2)], axis=-1),
            jnp.concatenate(
                [a, jax.vmap(jnp.diag)(comp)], axis=-1
            ),
        ],
        axis=-2,
    )
    rhs = jnp.concatenate([r1, r2], axis=-1)
    sol = jnp.linalg.solve(kkt, rhs[..., None])[..., 0]
    np.testing.assert_allclose(
        np.asarray(v), np.asarray(sol[..., :n]), rtol=5e-3, atol=5e-4
    )
    np.testing.assert_allclose(
        np.asarray(lam), np.asarray(sol[..., n:]), rtol=5e-3, atol=2e-2
    )
    # masked rows must carry (near-)zero multipliers
    lam_inactive = np.asarray(lam)[~mask]
    assert np.abs(lam_inactive).max() < 1e-3
