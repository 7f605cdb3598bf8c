"""Pallas TPU kernel: batched contact-force QP at speed of light.

The force-distribution QP (SURVEY.md §2.6, the north-star kernel:
``ContactForceDistribution::solveOptimization`` via OOQP/MA27,
``ContactForceDistribution.cpp:385-514``) is tiny — n=12 variables,
mi=20 inequality rows — but must be solved by the thousands (batched
scenarios) per control tick. The generic XLA path (`ops/qp.py`) vmaps
``jnp.linalg.cholesky``/triangular solves, which lower to per-element
loops with terrible occupancy at these sizes: the chip spends its time
on dispatch, not math.

This kernel flips the layout: **batch lives in the vector lanes**. Each
*scalar* of the problem (one entry of G, D, x, …) is an (8, 128) tile
holding 1024 independent instances, so every step of the interior-point
method — building the Schur matrix M = G + Dᵀdiag(z/s)D, its Cholesky,
the triangular solves, the fraction-to-boundary line search — becomes a
short sequence of fully-dense VPU ops with zero wasted lanes and no
data-dependent control flow. The n=12 linear algebra is unrolled at
trace time (static shapes); the IPM iterations run in a
``jax.lax.fori_loop``.

The math mirrors ``ops/qp.py``'s fixed-iteration Mehrotra
predictor-corrector exactly (same regularization, fraction-to-boundary,
convergence freeze), so the two backends agree to float32 tolerance and
share tests. Inequality-only (the hot path); the rare equality-
constrained double-solve (leg-load factors) stays on the XLA path.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

N = 12  # primal variables (3 force components × 4 legs)
MI = 20  # inequality rows (min normal force + 4-edge pyramid × 4 legs)
TILE = (8, 128)  # one instance-batch tile: 1024 QPs
TILE_B = TILE[0] * TILE[1]

_DELTA = 1e-6  # Tikhonov regularization (matches ops/qp.py f32 policy)
_S_FLOOR = 1e-9
_TOL = 1e-6


def _tri_solve_lower(L, b):
    """Solve L y = b for unrolled lower-triangular L (lists of tiles)."""
    m = len(b)
    y = [None] * m
    for i in range(m):
        acc = b[i]
        for k in range(i):
            acc = acc - L[i][k] * y[k]
        y[i] = acc * L[i][i]  # L[i][i] holds 1/diag (precomputed)
    return y


def _tri_solve_upper_t(L, b):
    """Solve Lᵀ x = b (same reciprocal-diagonal convention)."""
    m = len(b)
    x = [None] * m
    for i in reversed(range(m)):
        acc = b[i]
        for k in range(i + 1, m):
            acc = acc - L[k][i] * x[k]
        x[i] = acc * L[i][i]
    return x


def _cholesky(M):
    """Unrolled Cholesky; returns L with RECIPROCAL diagonal stored."""
    m = len(M)
    L = [[None] * m for _ in range(m)]
    for j in range(m):
        acc = M[j][j]
        for k in range(j):
            acc = acc - L[j][k] * L[j][k]
        # guard: keep positive (converged/frozen instances may drift)
        acc = jnp.maximum(acc, 1e-30)
        rdiag = jax.lax.rsqrt(acc)
        L[j][j] = rdiag  # store 1/sqrt(acc)
        for i in range(j + 1, m):
            acc2 = M[i][j]
            for k in range(j):
                acc2 = acc2 - L[i][k] * L[j][k]
            L[i][j] = acc2 * rdiag
    return L


def _chol_solve(L, b):
    return _tri_solve_upper_t(L, _tri_solve_lower(L, b))


def _scaled_cholesky(M):
    """Jacobi-equilibrated Cholesky: factor diag(s)·M·diag(s) with
    s = 1/√diag(M); returns (L, s). Keeps the f32 factorization finite
    deep into the IPM endgame where cond(M) ~ 1/eps (mirrors ops/qp.py)."""
    m = len(M)
    dsc = [jax.lax.rsqrt(jnp.maximum(M[i][i], 1e-30)) for i in range(m)]
    Ms = [[M[i][j] * dsc[i] * dsc[j] for j in range(m)] for i in range(m)]
    return _cholesky(Ms), dsc


def _scaled_solve(L, dsc, b):
    """Solve M x = b through the equilibrated factor."""
    m = len(b)
    y = _chol_solve(L, [b[i] * dsc[i] for i in range(m)])
    return [y[i] * dsc[i] for i in range(m)]


def _max_over(vals):
    acc = vals[0]
    for v in vals[1:]:
        acc = jnp.maximum(acc, v)
    return acc


def _honest_kkt_tiles(G, g, D, d, x, z, scale_g, scale_d):
    """Point KKT residual (stationarity / violation / complementarity /
    dual sign) of (x, z) — the tile twin of ops.qp._honest_kkt."""
    stat = []
    for i in range(N):
        acc = g[i]
        for j in range(N):
            acc = acc + G[i][j] * x[j]
        for k in range(MI):
            acc = acc - D[k][i] * z[k]
        stat.append(jnp.abs(acc))
    slack = []
    for k in range(MI):
        acc = -d[k]
        for j in range(N):
            acc = acc + D[k][j] * x[j]
        slack.append(acc)
    viol = _max_over([jnp.maximum(-slack[k], 0.0) for k in range(MI)])
    comp = slack[0] * 0.0
    for k in range(MI):
        comp = comp + z[k] * jnp.abs(slack[k])
    comp = comp * (1.0 / MI)
    zmax = _max_over([jnp.abs(z[k]) for k in range(MI)])
    dual = _max_over([jnp.maximum(-z[k], 0.0) for k in range(MI)]) / (
        1.0 + zmax
    )
    return jnp.maximum(
        jnp.maximum(_max_over(stat) / scale_g, dual),
        jnp.maximum(viol / scale_d, comp / scale_g),
    )


def _min_over(vals):
    acc = vals[0]
    for v in vals[1:]:
        acc = jnp.minimum(acc, v)
    return acc


def _step_len(v, dv):
    """Fraction-to-boundary: min(1, 0.995·min_k(-v/dv | dv<0))."""
    ratios = [
        jnp.where(dv[k] < 0.0, -v[k] / jnp.where(dv[k] < 0.0, dv[k], -1.0),
                  jnp.float32(jnp.inf))
        for k in range(MI)
    ]
    return jnp.minimum(jnp.float32(1.0), 0.995 * _min_over(ratios))


def _ipm_kernel(iters: int, G_ref, g_ref, D_ref, d_ref, x_ref, s_ref,
                z_ref, kkt_ref):
    # ---- load the problem into registers: lists of (8,128) tiles ------
    G = [[G_ref[i * N + j] for j in range(N)] for i in range(N)]
    g = [g_ref[i] for i in range(N)]
    D = [[D_ref[k * N + j] for j in range(N)] for k in range(MI)]
    d = [d_ref[k] for k in range(MI)]

    one = jnp.ones(TILE, jnp.float32)
    zero = jnp.zeros(TILE, jnp.float32)

    Greg = [[G[i][j] + (_DELTA if i == j else 0.0) for j in range(N)]
            for i in range(N)]

    # residual normalization scales (match ops/qp.py)
    scale_g = 1.0 + _max_over([jnp.abs(v) for v in g])
    scale_d = 1.0 + _max_over([jnp.abs(v) for v in d])

    # ---- start point ---------------------------------------------------
    L0 = _cholesky(Greg)
    x = _chol_solve(L0, [-v for v in g])
    s = []
    for k in range(MI):
        acc = -d[k]
        for j in range(N):
            acc = acc + D[k][j] * x[j]
        s.append(jnp.maximum(acc, 1.0))
    z = [one] * MI

    carry = (
        jnp.stack(x),  # (N,8,128)
        jnp.stack(s),  # (MI,8,128)
        jnp.stack(z),
        jnp.stack(x),  # best-so-far x
        jnp.stack(z),  # best-so-far z
        jnp.full(TILE, jnp.inf, jnp.float32),  # best kkt
        zero,  # done mask (1.0 = frozen)
        jnp.full(TILE, jnp.inf, jnp.float32),  # kkt
    )

    def body(_, carry):
        xs, ss, zs_, xbs, zbs, kb, done, kkt = carry
        x = [xs[i] for i in range(N)]
        s = [ss[k] for k in range(MI)]
        z = [zs_[k] for k in range(MI)]

        # residuals
        r_d = []
        for i in range(N):
            acc = g[i]
            for j in range(N):
                acc = acc + G[i][j] * x[j]
            for k in range(MI):
                acc = acc - D[k][i] * z[k]
            r_d.append(acc)
        r_p = []
        for k in range(MI):
            acc = -d[k] - s[k]
            for j in range(N):
                acc = acc + D[k][j] * x[j]
            r_p.append(acc)
        mu = zero
        for k in range(MI):
            mu = mu + s[k] * z[k]
        mu = mu * (1.0 / MI)

        s_safe = [jnp.maximum(s[k], _S_FLOOR) for k in range(MI)]
        zs_ratio = [z[k] / s_safe[k] for k in range(MI)]
        DS = [[D[k][j] * zs_ratio[k] for j in range(N)] for k in range(MI)]

        # M = Greg + Dᵀ diag(z/s) D (symmetric; build lower half)
        M = [[None] * N for _ in range(N)]
        for i in range(N):
            for j in range(i + 1):
                acc = Greg[i][j]
                for k in range(MI):
                    acc = acc + DS[k][i] * D[k][j]
                M[i][j] = acc
                M[j][i] = acc
        L, dsc = _scaled_cholesky(M)

        def kkt_step(r_c):
            rhs = []
            for i in range(N):
                acc = -r_d[i]
                for k in range(MI):
                    acc = acc - D[k][i] * (
                        (r_c[k] + z[k] * r_p[k]) / s_safe[k]
                    )
                rhs.append(acc)
            dx = _scaled_solve(L, dsc, rhs)
            ds = []
            for k in range(MI):
                acc = r_p[k]
                for j in range(N):
                    acc = acc + D[k][j] * dx[j]
                ds.append(acc)
            dz = [
                -(r_c[k] + z[k] * ds[k]) / s_safe[k] for k in range(MI)
            ]
            return dx, ds, dz

        # predictor
        r_c_aff = [s[k] * z[k] for k in range(MI)]
        dx_a, ds_a, dz_a = kkt_step(r_c_aff)
        alpha_p = _step_len(s, ds_a)
        alpha_d = _step_len(z, dz_a)
        mu_aff = zero
        for k in range(MI):
            mu_aff = mu_aff + (s[k] + alpha_p * ds_a[k]) * (
                z[k] + alpha_d * dz_a[k]
            )
        mu_aff = mu_aff * (1.0 / MI)
        ratio = mu_aff / jnp.maximum(mu, 1e-30)
        sigma = jnp.clip(ratio * ratio * ratio, 0.0, 1.0)

        # corrector
        r_c = [
            s[k] * z[k] + ds_a[k] * dz_a[k] - sigma * mu for k in range(MI)
        ]
        dx, ds, dz = kkt_step(r_c)
        alpha = jnp.minimum(_step_len(s, ds), _step_len(z, dz))

        x_new = [x[i] + alpha * dx[i] for i in range(N)]
        s_new = [s[k] + alpha * ds[k] for k in range(MI)]
        z_new = [z[k] + alpha * dz[k] for k in range(MI)]

        # kkt_new measures the CURRENT iterate — update the best-so-far
        # (a late garbage step near the f32 wall can't worsen the output).
        kkt_new = jnp.maximum(
            _max_over([jnp.abs(v) for v in r_d]) / scale_g,
            jnp.maximum(
                _max_over([jnp.abs(v) for v in r_p]) / scale_d,
                mu / scale_g,
            ),
        )
        better = kkt_new < kb
        xbs2 = jnp.stack(
            [jnp.where(better, x[i], xbs[i]) for i in range(N)]
        )
        zbs2 = jnp.stack(
            [jnp.where(better, z[k], zbs[k]) for k in range(MI)]
        )
        kb2 = jnp.where(better, kkt_new, kb)

        # freeze on convergence or non-finite update
        total = zero
        for i in range(N):
            total = total + x_new[i]
        for k in range(MI):
            total = total + s_new[k] + z_new[k]
        bad = jnp.logical_not(jnp.isfinite(total))
        newly_done = jnp.logical_or(kkt_new < _TOL, bad)
        keep = jnp.logical_and(done < 0.5, jnp.logical_not(bad))

        xs2 = jnp.stack(
            [jnp.where(keep, x_new[i], x[i]) for i in range(N)]
        )
        ss2 = jnp.stack(
            [jnp.where(keep, s_new[k], s[k]) for k in range(MI)]
        )
        zs2 = jnp.stack(
            [jnp.where(keep, z_new[k], z[k]) for k in range(MI)]
        )
        done2 = jnp.maximum(done, newly_done.astype(jnp.float32))
        kkt2 = jnp.where(keep, kkt_new, kkt)
        return (xs2, ss2, zs2, xbs2, zbs2, kb2, done2, kkt2)

    xs, ss, zs_, xbs, zbs, _kb, _done, _kkt = jax.lax.fori_loop(
        0, iters, body, carry
    )
    x = [xs[i] for i in range(N)]
    s = [ss[k] for k in range(MI)]
    z = [zs_[k] for k in range(MI)]
    xb = [xbs[i] for i in range(N)]
    zb = [zbs[k] for k in range(MI)]

    # ---- endgame: honest residuals, best-of, active-set polish ---------
    # (mirrors ops/qp.py exactly; see _honest_kkt/_polish there)
    k_last = _honest_kkt_tiles(G, g, D, d, x, z, scale_g, scale_d)
    k_best = _honest_kkt_tiles(G, g, D, d, xb, zb, scale_g, scale_d)
    take_last = k_last <= k_best
    x = [jnp.where(take_last, x[i], xb[i]) for i in range(N)]
    z = [jnp.where(take_last, z[k], zb[k]) for k in range(MI)]
    kkt = jnp.where(take_last, k_last, k_best)

    # Active set from the selected point: z > slack.
    slack = []
    for k in range(MI):
        acc = -d[k]
        for j in range(N):
            acc = acc + D[k][j] * x[j]
        slack.append(acc)
    w = [
        jnp.where(z[k] > slack[k], 1.0, 0.0).astype(jnp.float32)
        for k in range(MI)
    ]
    Ew = [[D[k][j] * w[k] for j in range(N)] for k in range(MI)]
    # K = Ew G⁻¹ Ewᵀ + diag(1-w) + δI  (MI×MI, symmetric)
    GiEwT = [_chol_solve(L0, Ew[k]) for k in range(MI)]
    K = [[None] * MI for _ in range(MI)]
    for a in range(MI):
        for bq in range(a + 1):
            acc = zero if a != bq else (1.0 - w[a]) + _DELTA
            for j in range(N):
                acc = acc + Ew[a][j] * GiEwT[bq][j]
            K[a][bq] = acc
            K[bq][a] = acc
    LK, dscK = _scaled_cholesky(K)

    # xp = G⁻¹(-g), λ = 0, then refinement sweeps on the KKT system.
    xp = _chol_solve(L0, [-v for v in g])
    lam = [zero] * MI
    for _ in range(4):
        # r1 = -g + Ewᵀλ - G xp ; r2 = w ⊙ (d - E xp)
        r1 = []
        for i in range(N):
            acc = -g[i]
            for k in range(MI):
                acc = acc + Ew[k][i] * lam[k]
            for j in range(N):
                acc = acc - G[i][j] * xp[j]
            r1.append(acc)
        r2 = []
        for k in range(MI):
            acc = d[k]
            for j in range(N):
                acc = acc - D[k][j] * xp[j]
            r2.append(acc * w[k])
        t = _chol_solve(L0, r1)
        rhs2 = []
        for k in range(MI):
            acc = r2[k]
            for j in range(N):
                acc = acc - Ew[k][j] * t[j]
            rhs2.append(acc)
        dlam = _scaled_solve(LK, dscK, rhs2)
        r1d = []
        for i in range(N):
            acc = r1[i]
            for k in range(MI):
                acc = acc + Ew[k][i] * dlam[k]
            r1d.append(acc)
        dx = _chol_solve(L0, r1d)
        xp = [xp[i] + dx[i] for i in range(N)]
        lam = [lam[k] + dlam[k] for k in range(MI)]
    lam = [lam[k] * w[k] for k in range(MI)]
    k_pol = _honest_kkt_tiles(G, g, D, d, xp, lam, scale_g, scale_d)
    take_pol = k_pol < kkt  # False on non-finite k_pol
    x = [jnp.where(take_pol, xp[i], x[i]) for i in range(N)]
    z = [jnp.where(take_pol, lam[k], z[k]) for k in range(MI)]
    kkt = jnp.where(take_pol, k_pol, kkt)
    # returned s = slack of the returned x (floored at 0)
    for k in range(MI):
        acc = -d[k]
        for j in range(N):
            acc = acc + D[k][j] * x[j]
        s[k] = jnp.maximum(acc, 0.0)

    for i in range(N):
        x_ref[i] = x[i]
    for k in range(MI):
        s_ref[k] = s[k]
        z_ref[k] = z[k]
    kkt_ref[0] = kkt


def _pack(x, nb):
    """(B, E) → (nb, E, 8, 128): entry-major tiles, batch in lanes."""
    b, e = x.shape
    x = x.reshape(nb, TILE[0], TILE[1], e)
    return jnp.transpose(x, (0, 3, 1, 2))


def _unpack(x):
    """(nb, E, 8, 128) → (B, E)."""
    nb, e = x.shape[0], x.shape[1]
    return jnp.transpose(x, (0, 2, 3, 1)).reshape(nb * TILE_B, e)


@functools.partial(jax.jit, static_argnames=("iters", "interpret"))
def solve_fd_qp(G, g, D, d, iters: int = 15, interpret: bool = False):
    """Batched force-distribution QP: min ½xᵀGx+gᵀx s.t. Dx ≥ d.

    Args: G (B,12,12), g (B,12), D (B,20,12), d (B,20), float32.
    Returns (x (B,12), s (B,20), z (B,20), kkt (B,)). The batch is
    padded to a multiple of 1024 internally.
    """
    B = G.shape[0]
    nb = -(-B // TILE_B)
    pad = nb * TILE_B - B

    def prep(a, e):
        a = a.reshape(B, e).astype(jnp.float32)
        if pad:
            a = jnp.concatenate(
                [a, jnp.broadcast_to(a[-1:], (pad, e))], axis=0
            )
        return _pack(a, nb)

    Gp = prep(G, N * N)
    gp = prep(g, N)
    Dp = prep(D, MI * N)
    dp = prep(d, MI)

    kernel = functools.partial(_ipm_kernel, iters)
    grid = (nb,)
    bs = lambda e: pl.BlockSpec(
        (1, e) + TILE,
        lambda i: (i, 0, 0, 0),
        memory_space=pltpu.VMEM,
    )

    def kernel4(G_ref, g_ref, D_ref, d_ref, x_ref, s_ref, z_ref, kkt_ref):
        # drop the leading grid-block axis
        kernel(
            G_ref[0], g_ref[0], D_ref[0], d_ref[0],
            x_ref.at[0], s_ref.at[0], z_ref.at[0], kkt_ref.at[0],
        )

    x, s, z, kkt = pl.pallas_call(
        kernel4,
        grid=grid,
        in_specs=[bs(N * N), bs(N), bs(MI * N), bs(MI)],
        out_specs=(bs(N), bs(MI), bs(MI), bs(1)),
        out_shape=(
            jax.ShapeDtypeStruct((nb, N) + TILE, jnp.float32),
            jax.ShapeDtypeStruct((nb, MI) + TILE, jnp.float32),
            jax.ShapeDtypeStruct((nb, MI) + TILE, jnp.float32),
            jax.ShapeDtypeStruct((nb, 1) + TILE, jnp.float32),
        ),
        interpret=interpret,
    )(Gp, gp, Dp, dp)

    return (
        _unpack(x)[:B],
        _unpack(s)[:B],
        _unpack(z)[:B],
        _unpack(kkt)[:B, 0],
    )


def solve_weighted_ls_fd_qp(
    A, S, b, W, D, d, iters: int = 15, interpret: bool = False
):
    """Batched OOQP formulation (G = 2AᵀSA + diag(W), g = −2AᵀSb) on the
    Pallas backend — the batched twin of ``ops.qp.solve_weighted_ls_qp``
    for the inequality-only force-distribution problem."""
    with jax.default_matmul_precision("highest"):
        SA = A * S[..., :, None]
        G = 2.0 * jnp.einsum("bij,bik->bjk", A, SA) + jax.vmap(jnp.diag)(W)
        g = -2.0 * jnp.einsum("bij,bi->bj", SA, b)
    return solve_fd_qp(G, g, D, d, iters=iters, interpret=interpret)
