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
share tests. Inequality-only BY DESIGN: the reference's rare
equality-constrained double-solve (leg-load factors,
``ContactForceDistribution.cpp:338-383``) is handled by ELIMINATION in
the batched dispatch (``control/force_distribution.py::
solve_fd_qp_batched(load_factors=...)`` re-dispatches the reduced
inequality-only problem), so engaging load factors keeps this kernel in
the hot loop — no equality rows are ever needed on-chip.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

N = 12  # primal variables (3 force components × 4 legs)
MI = 20  # inequality rows (min normal force + 4-edge pyramid × 4 legs)
# Default instance-batch tile (sublanes, lanes). The f32 VREG is (8,128);
# taller tiles hold tile_rows/8 independent VREGs per problem scalar, so
# every step of the serial Cholesky/solve dependency chain issues that
# many independent VPU ops back-to-back — instruction-level parallelism
# that hides the VPU result latency (the r3 roofline's
# "multi-instance-per-lane packing" lever). Measured on v5e at batch
# 4096 (best-of-3, 30 reps): 16 sublanes is the sweet spot (~+15% over
# 8); 32/64 need a raised VMEM limit and lose it to spill traffic.
TILE = (8, 128)
TILE_B = TILE[0] * TILE[1]
DEFAULT_TILE_ROWS = 16

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


def _step_len_recip(rv, dv):
    """Fraction-to-boundary via precomputed reciprocals ``rv = 1/v``:
    min_k(-v/dv | dv<0) = 1/max_k(-dv·rv | dv<0), so the whole search
    costs ONE division instead of MI. VPU divides are the kernel's most
    expensive scalar op (~10× a madd); the IPM's four step-length
    searches per iteration were ~45% of its division count."""
    terms = [
        jnp.where(dv[k] < 0.0, -dv[k] * rv[k], jnp.float32(0.0))
        for k in range(MI)
    ]
    m = _max_over(terms)  # ≥ 0; 0 ⇒ unbounded step (alpha = 1)
    alpha = 0.995 / jnp.maximum(m, 1e-30)
    return jnp.where(m > 0.0, jnp.minimum(jnp.float32(1.0), alpha),
                     jnp.float32(1.0))


def _ipm_kernel(iters: int, G_ref, g_ref, D_ref, d_ref, x_ref, s_ref,
                z_ref, kkt_ref):
    # ---- load the problem into registers: lists of (tr,128) tiles -----
    # (tr sublanes = tr/8 independent f32 VREGs per problem scalar → ILP
    # across instance groups through the serial factorization chain)
    G = [[G_ref[i * N + j] for j in range(N)] for i in range(N)]
    g = [g_ref[i] for i in range(N)]
    D = [[D_ref[k * N + j] for j in range(N)] for k in range(MI)]
    d = [d_ref[k] for k in range(MI)]

    tile = tuple(g[0].shape)
    one = jnp.ones(tile, jnp.float32)
    zero = jnp.zeros(tile, jnp.float32)

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
        jnp.full(tile, jnp.inf, jnp.float32),  # best kkt
        zero,  # done mask (1.0 = frozen)
        jnp.full(tile, jnp.inf, jnp.float32),  # kkt
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

        # reciprocals once per iteration, reused by the Schur build, both
        # KKT back-substitutions, and all four step-length searches —
        # cuts the per-iteration VPU division count ~4× (181 → ~45).
        rs = [1.0 / jnp.maximum(s[k], _S_FLOOR) for k in range(MI)]
        rz = [1.0 / jnp.maximum(z[k], _S_FLOOR) for k in range(MI)]
        zs_ratio = [z[k] * rs[k] for k in range(MI)]
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
                        (r_c[k] + z[k] * r_p[k]) * rs[k]
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
                -(r_c[k] + z[k] * ds[k]) * rs[k] for k in range(MI)
            ]
            return dx, ds, dz

        # predictor
        r_c_aff = [s[k] * z[k] for k in range(MI)]
        dx_a, ds_a, dz_a = kkt_step(r_c_aff)
        alpha_p = _step_len_recip(rs, ds_a)
        alpha_d = _step_len_recip(rz, dz_a)
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
        alpha = jnp.minimum(_step_len_recip(rs, ds), _step_len_recip(rz, dz))

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


def _pack(x, nb, tile):
    """(B, E) → (nb, E, tr, 128): entry-major tiles, batch in lanes."""
    b, e = x.shape
    x = x.reshape(nb, tile[0], tile[1], e)
    return jnp.transpose(x, (0, 3, 1, 2))


def _unpack(x):
    """(nb, E, tr, 128) → (B, E)."""
    nb, e, tr, tl = x.shape
    return jnp.transpose(x, (0, 2, 3, 1)).reshape(nb * tr * tl, e)


@functools.partial(
    jax.jit, static_argnames=("iters", "interpret", "tile_rows")
)
def solve_fd_qp(
    G, g, D, d,
    iters: int = 15,
    interpret: bool = False,
    tile_rows: int | None = None,
):
    """Batched force-distribution QP: min ½xᵀGx+gᵀx s.t. Dx ≥ d.

    Args: G (B,12,12), g (B,12), D (B,20,12), d (B,20), float32.
    Returns (x (B,12), s (B,20), z (B,20), kkt (B,)). The batch is
    padded to a multiple of ``tile_rows·128`` internally.

    ``tile_rows`` (multiple of 8) sets the sublane height of the
    instance tile: tile_rows/8 independent f32 VREGs per problem scalar
    give the VPU that much instruction-level parallelism through the
    serial Cholesky/triangular-solve chains (the dominant latency at
    these tiny dims). Default ``DEFAULT_TILE_ROWS``, capped so a small
    batch doesn't pad to more than one tile.
    """
    B = G.shape[0]
    if tile_rows is None:
        tile_rows = DEFAULT_TILE_ROWS
    # don't pad a small batch up to a huge single tile
    while tile_rows > 8 and (tile_rows // 2) * 128 >= B:
        tile_rows //= 2
    tile = (tile_rows, 128)
    tile_b = tile_rows * 128
    nb = -(-B // tile_b)
    pad = nb * tile_b - B

    def prep(a, e):
        a = a.reshape(B, e).astype(jnp.float32)
        if pad:
            a = jnp.concatenate(
                [a, jnp.broadcast_to(a[-1:], (pad, e))], axis=0
            )
        return _pack(a, nb, tile)

    Gp = prep(G, N * N)
    gp = prep(g, N)
    Dp = prep(D, MI * N)
    dp = prep(d, MI)

    kernel = functools.partial(_ipm_kernel, iters)
    grid = (nb,)
    bs = lambda e: pl.BlockSpec(
        (1, e) + tile,
        lambda i: (i, 0, 0, 0),
        memory_space=pltpu.VMEM,
    )

    def kernel4(G_ref, g_ref, D_ref, d_ref, x_ref, s_ref, z_ref, kkt_ref):
        # drop the leading grid-block axis
        kernel(
            G_ref[0], g_ref[0], D_ref[0], d_ref[0],
            x_ref.at[0], s_ref.at[0], z_ref.at[0], kkt_ref.at[0],
        )

    # Block VMEM footprint: (in 416 + out 53) scalars × tile bytes, plus
    # Mosaic's spill/stack space for the unrolled algebra. The default
    # 16 MiB scoped limit fits tile_rows ≤ 16; lift it for taller tiles
    # (v5e has 128 MiB VMEM per core).
    tile_bytes = tile[0] * tile[1] * 4
    vmem_limit = min(
        int((416 + 53) * tile_bytes * 2.2) + (8 << 20), 100 << 20
    )
    x, s, z, kkt = pl.pallas_call(
        kernel4,
        grid=grid,
        in_specs=[bs(N * N), bs(N), bs(MI * N), bs(MI)],
        out_specs=(bs(N), bs(MI), bs(MI), bs(1)),
        out_shape=(
            jax.ShapeDtypeStruct((nb, N) + tile, jnp.float32),
            jax.ShapeDtypeStruct((nb, MI) + tile, jnp.float32),
            jax.ShapeDtypeStruct((nb, MI) + tile, jnp.float32),
            jax.ShapeDtypeStruct((nb, 1) + tile, jnp.float32),
        ),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=max(vmem_limit, 32 << 20)
        ),
        interpret=interpret,
    )(Gp, gp, Dp, dp)

    return (
        _unpack(x)[:B],
        _unpack(s)[:B],
        _unpack(z)[:B],
        _unpack(kkt)[:B, 0],
    )


class _ListRef:
    """Write-collecting stand-in for a Pallas output Ref — lets the
    kernel body run as plain traced JAX ops (see solve_fd_qp_emulated)."""

    def __init__(self, n):
        self.vals = [None] * n

    def __setitem__(self, idx, val):
        self.vals[idx] = val


def solve_fd_qp_emulated(G, g, D, d, iters: int = 15, tile_rows: int = 8):
    """Run the EXACT Pallas kernel trace as ordinary JAX ops — the same
    unrolled IPM + polish math on the same (tile_rows, 128) instance
    tiles — under ``jax.disable_jit()`` (pure eager). This is the
    kernel's CPU test vehicle: a bug introduced in the kernel body fails
    here without TPU hardware.

    Why eager: the kernel body is a ~40k-op unrolled graph (by design —
    on TPU Mosaic consumes it directly); both the Pallas interpreter and
    XLA:CPU take many minutes to build it, while eager dispatch runs it
    in ~20 s. Host-level only — do NOT call inside a jit trace.

    Same signature/returns as :func:`solve_fd_qp`.
    """
    with jax.disable_jit():
        return _solve_fd_qp_emulated_impl(G, g, D, d, iters, tile_rows)


def _solve_fd_qp_emulated_impl(G, g, D, d, iters, tile_rows):
    B = G.shape[0]
    while tile_rows > 8 and (tile_rows // 2) * 128 >= B:
        tile_rows //= 2
    tile = (tile_rows, 128)
    tile_b = tile_rows * 128
    nb = -(-B // tile_b)
    pad = nb * tile_b - B

    def prep(a, e):
        a = a.reshape(B, e).astype(jnp.float32)
        if pad:
            a = jnp.concatenate(
                [a, jnp.broadcast_to(a[-1:], (pad, e))], axis=0
            )
        return _pack(a, nb, tile)

    Gp = prep(G, N * N)
    gp = prep(g, N)
    Dp = prep(D, MI * N)
    dp = prep(d, MI)

    xs, ss, zs, kkts = [], [], [], []
    for i in range(nb):
        x_ref, s_ref = _ListRef(N), _ListRef(MI)
        z_ref, kkt_ref = _ListRef(MI), _ListRef(1)
        _ipm_kernel(
            iters, Gp[i], gp[i], Dp[i], dp[i],
            x_ref, s_ref, z_ref, kkt_ref,
        )
        xs.append(jnp.stack(x_ref.vals))
        ss.append(jnp.stack(s_ref.vals))
        zs.append(jnp.stack(z_ref.vals))
        kkts.append(jnp.stack(kkt_ref.vals))
    return (
        _unpack(jnp.stack(xs))[:B],
        _unpack(jnp.stack(ss))[:B],
        _unpack(jnp.stack(zs))[:B],
        _unpack(jnp.stack(kkts))[:B, 0],
    )


def solve_weighted_ls_fd_qp(
    A, S, b, W, D, d,
    iters: int = 15,
    interpret: bool = False,
    tile_rows: int | None = None,
    emulate: bool = False,
):
    """Batched OOQP formulation (G = 2AᵀSA + diag(W), g = −2AᵀSb) on the
    Pallas backend — the batched twin of ``ops.qp.solve_weighted_ls_qp``
    for the inequality-only force-distribution problem.

    ``emulate=True`` runs the kernel trace as plain JAX ops
    (:func:`solve_fd_qp_emulated`) — CPU test coverage of the kernel."""
    with jax.default_matmul_precision("highest"):
        SA = A * S[..., :, None]
        G = 2.0 * jnp.einsum("bij,bik->bjk", A, SA) + jax.vmap(jnp.diag)(W)
        g = -2.0 * jnp.einsum("bij,bi->bj", SA, b)
    if emulate:
        return solve_fd_qp_emulated(
            G, g, D, d, iters=iters,
            tile_rows=8 if tile_rows is None else tile_rows,
        )
    return solve_fd_qp(
        G, g, D, d, iters=iters, interpret=interpret, tile_rows=tile_rows
    )
