"""Batched dense QP solver for TPU (fixed-iteration primal-dual IPM).

TPU-native replacement for the reference's QP stack:

* ``quadprogpp::solve_quadprog`` — Goldfarb–Idnani dual active-set
  (``qp_solver/include/qp_solver/QuadProg++.h:69``),
* OOQP + MA27 interior point used at runtime by the contact-force
  distribution (``balance_controller/src/contact_force_distribution/
  ContactForceDistribution.cpp:490``).

Those solvers iterate data-dependently (active-set pivots / adaptive
termination), which XLA cannot batch. Here we solve

    min ½ xᵀG x + gᵀx   s.t.   C x = c,   D x ≥ d

with a *fixed-iteration* Mehrotra predictor–corrector interior-point
method: every instance in a batch runs the same static program (one
Cholesky of an n×n Schur matrix + two triangular solve pairs per
iteration), so thousands of QPs vmap/shard onto the MXU/VPU with zero
divergence. Steps collapse to ~0 once converged, so extra iterations are
numerically harmless; a `done` freeze keeps converged iterates bit-stable.

Disabled rows (for masked variable-size problems, e.g. 2-leg stance in a
4-leg layout): zero the row of D and set d ≤ -1; the row is then always
strictly satisfied and its multiplier decays to ~0.

Shapes are static: G (n,n), g (n,), D (mi,n), d (mi,), optional C (me,n),
c (me,). Batch with jax.vmap.
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp


class QpSolution(NamedTuple):
    x: jax.Array  # (n,) primal solution
    z: jax.Array  # (mi,) inequality multipliers
    y: jax.Array  # (me,) equality multipliers (zeros if no equalities)
    s: jax.Array  # (mi,) slacks Dx - d
    iterations: jax.Array  # scalar int: iterations until convergence
    kkt_error: jax.Array  # scalar: final max KKT residual


def _chol_solve(chol, b):
    """Solve A x = b given chol = cholesky(A, lower). b: (..., n) or (n, k)."""
    y = jax.scipy.linalg.solve_triangular(chol, b, lower=True)
    return jax.scipy.linalg.solve_triangular(chol.T, y, lower=False)


@partial(jax.jit, static_argnames=("iters", "polish"))
def solve_qp(
    G: jax.Array,
    g: jax.Array,
    D: jax.Array,
    d: jax.Array,
    C: jax.Array | None = None,
    c: jax.Array | None = None,
    iters: int = 25,
    tol: float | None = None,
    warm: tuple[jax.Array, jax.Array] | None = None,
    polish: str = "full",
) -> QpSolution:
    """Solve one QP instance (vmap over leading axes for batches).

    All matmuls run at HIGHEST precision: TPU's default bf16 multiply
    passes are catastrophic for IPM KKT systems (condition grows like
    1/μ); true-f32 matmuls cost ~2× on the MXU and keep convergence.

    ``warm`` = (x_prev, z_prev) from the previous solve of a slowly-
    varying problem (e.g. the 400 Hz controller tick re-solving an
    almost-identical QP every 2.5 ms): the primal/dual iterates start
    from the previous optimum (slacks floored to keep the start strictly
    interior), so ~8 iterations reach the KKT quality a cold start needs
    ~15-20 for. This is the host-realtime-loop lever the reference gets
    from OOQP's warm-startable interior point.

    ``polish`` = "full" (default: 2 candidate active sets + 3 iterated
    chain steps — the golden-trace-grade endgame) or "light" (1
    candidate + 1 chain step — half the polish cost at ~1e-3 N typical
    accuracy, the realtime-loop setting).
    """
    with jax.default_matmul_precision("highest"):
        return _solve_qp_impl(G, g, D, d, C, c, iters, tol, warm, polish)


def _honest_kkt(G, g, D, d, x, z, scale_g, scale_d, C=None, c=None, y=None):
    """Full KKT residual of a candidate (x, z): stationarity, primal
    violation, mean complementarity — the same normalization as the loop's
    convergence test, but measuring the point itself (no slack variable)."""
    mi = D.shape[-2]
    stat = G @ x + g - D.T @ z
    if C is not None:
        stat = stat - C.T @ y
    slack = D @ x - d
    viol = jnp.max(jnp.maximum(-slack, 0.0))
    comp = jnp.dot(z, jnp.abs(slack)) / mi
    dual = jnp.max(jnp.maximum(-z, 0.0)) / (1.0 + jnp.max(jnp.abs(z)))
    kkt = jnp.maximum(
        jnp.maximum(jnp.max(jnp.abs(stat)) / scale_g, dual),
        jnp.maximum(viol / scale_d, comp / scale_g),
    )
    if C is not None:
        kkt = jnp.maximum(kkt, jnp.max(jnp.abs(C @ x - c)) / scale_d)
    return kkt


_DEBUG_TRAIL = None  # set to a list by diagnostics to capture selection


def _solve_qp_impl(
    G, g, D, d, C, c, iters, tol, warm=None, polish="full"
) -> QpSolution:
    dtype = G.dtype
    n = G.shape[-1]
    mi = D.shape[-2]
    has_eq = C is not None
    me = C.shape[-2] if has_eq else 0

    if tol is None:
        tol = 1e-10 if dtype == jnp.float64 else 1e-6
    s_floor = jnp.asarray(1e-14 if dtype == jnp.float64 else 1e-9, dtype)
    eye_n = jnp.eye(n, dtype=dtype)
    delta = jnp.asarray(1e-9 if dtype == jnp.float64 else 1e-6, dtype)
    G_reg = G + delta * eye_n
    # Residual normalization scales (relative convergence test).
    scale_g = 1.0 + jnp.max(jnp.abs(g))
    scale_d = 1.0 + jnp.max(jnp.abs(d))

    # --- starting point (strictly feasible slacks/duals) -------------------
    chol0 = jnp.linalg.cholesky(G_reg)
    x0 = _chol_solve(chol0, -g)
    if has_eq:
        # project x0 onto Cx = c: x0 += G⁻¹Cᵀ (C G⁻¹ Cᵀ)⁻¹ (c - C x0)
        GiCt = _chol_solve(chol0, C.T)
        schur_e = C @ GiCt + delta * jnp.eye(me, dtype=dtype)
        y0 = jnp.linalg.solve(schur_e, c - C @ x0)
        x0 = x0 + GiCt @ y0
    else:
        y0 = jnp.zeros((0,), dtype)

    if warm is None:
        s0 = jnp.maximum(D @ x0 - d, 1.0)
        z0 = jnp.ones((mi,), dtype)
    else:
        # Warm start from the previous tick's optimum: strictly-interior
        # floors keep the barrier well-defined; the floor (1e-2) is far
        # enough inside that one centering step absorbs drift between
        # consecutive 2.5 ms problems.
        xw, zw = warm
        x0 = jnp.where(jnp.all(jnp.isfinite(xw)), xw, x0)
        s0 = jnp.maximum(D @ x0 - d, 1e-2)
        z0 = jnp.clip(jnp.where(jnp.isfinite(zw), zw, 1.0), 1e-2, 1e6)

    def body(carry, _):
        x, s, z, y, best, done, it_count, kkt = carry

        r_d = G @ x + g - D.T @ z
        if has_eq:
            r_d = r_d - C.T @ y
            r_e = C @ x - c
        r_p = D @ x - d - s
        mu = jnp.dot(s, z) / mi

        s_safe = jnp.maximum(s, s_floor)
        zs = z / s_safe
        M = G_reg + (D.T * zs) @ D
        # Jacobi (diagonal) equilibration before the Cholesky: in the IPM
        # endgame z/s of active rows reaches 1/eps and cond(M) with it;
        # symmetric diagonal scaling keeps the f32 factorization finite
        # far deeper into the endgame.
        dsc = jax.lax.rsqrt(jnp.maximum(jnp.diagonal(M), s_floor))
        chol = jnp.linalg.cholesky(M * dsc[:, None] * dsc[None, :])

        def msolve(b):
            """M⁻¹ b through the equilibrated factor (vector or matrix)."""
            scale = dsc[:, None] if b.ndim == 2 else dsc
            return scale * _chol_solve(chol, scale * b)

        def kkt_step(r_c):
            """Solve the reduced Newton system for a given centering rhs."""
            rhs = -r_d - D.T @ ((r_c + z * r_p) / s_safe)
            if has_eq:
                MiCt = msolve(C.T)
                Mirhs = msolve(rhs)
                schur = C @ MiCt + delta * jnp.eye(me, dtype=dtype)
                dy = jnp.linalg.solve(schur, -(C @ Mirhs) - r_e)
                dx = Mirhs + MiCt @ dy
            else:
                dy = y
                dx = msolve(rhs)
            ds = D @ dx + r_p
            dz = -(r_c + z * ds) / s_safe
            return dx, ds, dz, dy

        def step_len(v, dv):
            """Fraction-to-boundary: max α ∈ (0,1] with v + α dv ≥ (1-τ) v."""
            ratio = jnp.where(dv < 0, -v / jnp.where(dv < 0, dv, -1.0), jnp.inf)
            return jnp.minimum(1.0, 0.995 * jnp.min(ratio))

        # Predictor (affine scaling).
        r_c_aff = s * z
        dx_a, ds_a, dz_a, _ = kkt_step(r_c_aff)
        alpha_p = step_len(s, ds_a)
        alpha_d = step_len(z, dz_a)
        mu_aff = jnp.dot(s + alpha_p * ds_a, z + alpha_d * dz_a) / mi
        sigma = jnp.clip((mu_aff / jnp.maximum(mu, 1e-30)) ** 3, 0.0, 1.0)

        # Corrector with Mehrotra second-order term.
        r_c = s * z + ds_a * dz_a - sigma * mu
        dx, ds, dz, dy = kkt_step(r_c)
        alpha = jnp.minimum(step_len(s, ds), step_len(z, dz))

        x_new = x + alpha * dx
        s_new = s + alpha * ds
        z_new = z + alpha * dz
        y_new = y + alpha * dy if has_eq else y

        # kkt_new measures the CURRENT iterate (pre-step residuals) —
        # track the best-so-far point by it, so a late garbage step near
        # the f32 conditioning wall can never worsen the returned answer.
        kkt_new = jnp.maximum(
            jnp.max(jnp.abs(r_d)) / scale_g,
            jnp.maximum(jnp.max(jnp.abs(r_p)) / scale_d, mu / scale_g),
        )
        if has_eq:
            kkt_new = jnp.maximum(kkt_new, jnp.max(jnp.abs(r_e)) / scale_d)
        xb, sb, zb, yb, kb = best
        better = kkt_new < kb
        best = (
            jnp.where(better, x, xb),
            jnp.where(better, s, sb),
            jnp.where(better, z, zb),
            jnp.where(better, y, yb) if has_eq else yb,
            jnp.where(better, kkt_new, kb),
        )

        # Freeze converged instances (bit-stable, avoids the f32 endgame
        # blowup when z/s of active constraints diverges), and freeze on
        # any non-finite update (keeps the last good iterate).
        bad = jnp.logical_not(
            jnp.isfinite(jnp.sum(x_new) + jnp.sum(s_new) + jnp.sum(z_new))
        )
        newly_done = jnp.logical_or(kkt_new < tol, bad)
        keep = jnp.logical_not(jnp.logical_or(done, bad))
        out = (
            jnp.where(keep, x_new, x),
            jnp.where(keep, s_new, s),
            jnp.where(keep, z_new, z),
            jnp.where(keep, y_new, y) if has_eq else y,
            best,
            jnp.logical_or(done, newly_done),
            it_count + jnp.logical_not(done).astype(jnp.int32),
            jnp.where(keep, kkt_new, kkt),
        )
        return out, None

    init = (
        x0,
        s0,
        z0,
        y0,
        (x0, s0, z0, y0, jnp.asarray(jnp.inf, dtype)),
        jnp.asarray(False),
        jnp.asarray(0, jnp.int32),
        jnp.asarray(jnp.inf, dtype),
    )
    (x, s, z, y, best, _, it_count, _), _ = jax.lax.scan(
        body, init, None, length=iters
    )
    # Pick the better of (last, best-so-far) by the honest point residual.
    xb, sb, zb, yb, _ = best
    k_last = _honest_kkt(
        G, g, D, d, x, z, scale_g, scale_d,
        C=C, c=c, y=y if has_eq else None,
    )
    k_best = _honest_kkt(
        G, g, D, d, xb, zb, scale_g, scale_d,
        C=C, c=c, y=yb if has_eq else None,
    )
    take_last = k_last <= k_best
    x = jnp.where(take_last, x, xb)
    s = jnp.where(take_last, s, sb)
    z = jnp.where(take_last, z, zb)
    if has_eq:
        y = jnp.where(take_last, y, yb)
    kkt = jnp.where(take_last, k_last, k_best)

    # Active-set polish (≙ OSQP solution polishing): solve the equality-
    # constrained QP on the apparent active set through the well-
    # conditioned chol(G_reg) with compensated iterative refinement —
    # recovers (beyond-)f32 KKT wherever the IPM identified the active
    # set, which a fixed-iteration f32 endgame cannot do on its own.
    #
    # Two candidate active sets (degenerate weight-transfer instants
    # make z>s and small-slack disagree), and a floor-aware selection:
    # the f32-evaluated KKT saturates at a noise floor ~1e-6·scale, so
    # "k_pol < kkt" alone is a coin flip between a polished point that
    # is exact to ~1e-3 N and an IPM point sitting O(1 N) away along the
    # W=1e-4 flat valley (both measure ≈ the floor). Prefer the polished
    # point whenever its measured KKT reaches the floor.
    slack_ipm = D @ x - d
    act_slack = (
        slack_ipm < 1e-5 * (1.0 + jnp.abs(d))
    ).astype(dtype)

    # Candidate selection by EXACT-PENALTY MERIT (see _merit_dd): the
    # measured-KKT criterion is unusable here — its stationarity part
    # carries context-dependent f32 rounding noise ~1e-6·scale, and XLA
    # may clone the measurement per consumer with different roundings,
    # which de-synchronizes the selection masks. The merit needs only
    # the objective and violations, both EFT-compensated, and with
    # ρ > ‖λ*‖∞ its minimum over candidates is the constrained optimum.
    rho = 10.0 * (1.0 + jnp.max(jnp.abs(z)))
    merit_cur = _merit_dd(G, g, D, d, x, rho, C=C, c=c)
    sel = {"x": x, "z": z, "s": s, "y": y, "kkt": kkt,
           "merit": merit_cur}

    def consider(x_p, z_p, y_p):
        k_pol = _honest_kkt(
            G, g, D, d, x_p, z_p, scale_g, scale_d,
            C=C, c=c, y=y_p if has_eq else None,
        )
        merit_new = _merit_dd(G, g, D, d, x_p, rho, C=C, c=c)
        take = _dd_less(merit_new, sel["merit"])  # False on NaN merit
        if _DEBUG_TRAIL is not None:  # trace-time hook (tests only)
            _DEBUG_TRAIL.append(
                {"k_pol": k_pol, "take": take, "x": x_p,
                 "obj": merit_new, "k_cur": sel["kkt"]}
            )
        sel["x"] = jnp.where(take, x_p, sel["x"])
        sel["z"] = jnp.where(take, z_p, sel["z"])
        sel["s"] = jnp.where(
            take, jnp.maximum(D @ x_p - d, 0.0), sel["s"]
        )
        if has_eq:
            sel["y"] = jnp.where(take, y_p, sel["y"])
        sel["kkt"] = jnp.where(take, k_pol, sel["kkt"])
        sel["merit"] = tuple(
            jnp.where(take, n, o) for n, o in zip(merit_new, sel["merit"])
        )

    light = polish == "light"
    for act in ((None,) if light else (None, act_slack)):
        x_p, z_p, y_p = _polish(
            G, g, D, d, chol0, delta, x, z, C=C, c=c,
            rounds=3 if light else 4,
            act=act,
        )
        consider(x_p, z_p, y_p)

    # Iterated active-set chain: a near-degenerate f32 endgame can hand
    # the polish a WRONG active set with a plausible-looking residual
    # (observed: a weight-transfer tick whose f32 point sits on friction
    # faces {6,11} while the f64 optimum uses {18} — 2 N apart). One
    # primal-active-set-method step per round: polish, then re-identify
    # from the POLISHED point (drop rows whose multiplier came out
    # negative ⇒ z>slack false; add rows the candidate violates), and
    # polish again. The chain advances even when a candidate is worse —
    # only the best point by the lexicographic measure is RETURNED.
    x_c, z_c = x, z
    for _ in range(1 if light else 3):
        slack_c = D @ x_c - d
        act_c = jnp.logical_or(z_c > slack_c, slack_c < 0.0).astype(dtype)
        x_c, z_c, y_c = _polish(
            G, g, D, d, chol0, delta, x_c, z_c, C=C, c=c,
            rounds=3 if light else 4,
            act=act_c,
        )
        consider(x_c, z_c, y_c)
    return QpSolution(
        x=sel["x"], z=sel["z"], y=sel["y"], s=sel["s"],
        iterations=it_count, kkt_error=sel["kkt"],
    )


def _barrier(*xs):
    """Pin intermediate values to exactly-rounded f32.

    The error-free transforms below are IEEE-exact identities — but only
    if every intermediate is materialized at f32. When this solver is
    inlined into a larger jit, XLA's excess-precision/fusion rewrites
    evaluate subexpressions at higher precision or re-fuse them, which
    silently breaks the identities (measured: the same solve on the same
    data returns 0.05 N from the f64 optimum as a standalone jit but
    0.26-0.57 N inlined into the rollout graph). optimization_barrier
    forces materialization and blocks cross-expression rewrites.
    """
    out = jax.lax.optimization_barrier(xs)
    return out[0] if len(xs) == 1 else out


def _two_sum(a, b):
    """Knuth two-sum: s fl(a+b) and the EXACT rounding error err."""
    s = _barrier(a + b)
    bb = _barrier(s - a)
    err = (a - (s - bb)) + (b - bb)
    return s, err


def _split_f32(a):
    """Dekker split: a = hi + lo with 12-bit hi mantissa (f32)."""
    c = _barrier(a * 4097.0)  # 2^12 + 1
    hi = _barrier(c - (c - a))
    return hi, a - hi


def _prod_err(a, b):
    """Error-free product: p = fl(a·b), e exact with p + e = a·b."""
    p = _barrier(a * b)
    ha, la = _split_f32(a)
    hb, lb = _split_f32(b)
    e = ((ha * hb - p) + ha * lb + la * hb) + lb * la
    return p, e


def _comp_sum(pairs):
    """Compensated sum of (value, error) pairs → accurately-rounded total.

    Neumaier-style: two-sum the values, accumulate every rounding error
    plus the product errors in a compensation term, add once at the end.
    Effective ~f64 accuracy from pure f32 ops — works on TPU, where real
    float64 is unavailable inside the f32 pipeline.
    """
    s, comp = pairs[0]
    for p, e in pairs[1:]:
        s, err = _two_sum(s, p)
        comp = comp + (err + e)
    return s + comp


def _obj_dd(G, g, x):
    """Double-float QP objective ½xᵀGx + gᵀx → (hi, lo) pair.

    The selection tie-break needs ~1e-13 relative resolution (valley
    candidates differ by ~1e-10 of a ~1e5 objective); a single f32
    rounding of the result would erase it, so the value is RETURNED as
    an unevaluated hi+lo pair and compared with :func:`_dd_less`.
    """
    n = G.shape[-1]
    # t = G x as double-float per entry
    pairs = [_prod_err(G[:, j], x[j]) for j in range(n)]
    hi, lo = pairs[0]
    for p, e in pairs[1:]:
        hi, err = _two_sum(hi, p)
        lo = lo + (err + e)
    # obj = Σ_i x_i·(g_i + ½t_i)
    terms = []
    for i in range(n):
        terms.append(_prod_err(x[i], g[i]))
        terms.append(_prod_err(x[i], 0.5 * hi[i]))
        terms.append((x[i] * (0.5 * lo[i]), jnp.zeros_like(x[i])))
    s, comp = terms[0]
    for p, e in terms[1:]:
        s, err = _two_sum(s, p)
        comp = comp + (err + e)
    return s, comp


def _dd_less(a, b):
    """a < b for double-float pairs (hi, lo)."""
    d, e = _two_sum(a[0], -b[0])
    return d + (e + (a[1] - b[1])) < 0.0


def _viol_comp(D, d, x, C=None, c=None):
    """Total constraint violation Σ max(d−Dx, 0) (+ Σ|Cx−c|) with
    compensated row dot products — accurate to ~1e-9 where a plain f32
    slack evaluation carries ~1e-4 noise at |D||x| ~ 300."""
    n = D.shape[-1]
    pairs = [(-d, jnp.zeros_like(d))]
    for j in range(n):
        pairs.append(_prod_err(D[:, j], x[j]))
    slack = _comp_sum(pairs)
    viol = jnp.sum(jnp.maximum(-slack, 0.0))
    if C is not None:
        pairs = [(-c, jnp.zeros_like(c))]
        for j in range(n):
            pairs.append(_prod_err(C[:, j], x[j]))
        viol = viol + jnp.sum(jnp.abs(_comp_sum(pairs)))
    return viol


def _merit_dd(G, g, D, d, x, rho, C=None, c=None):
    """Exact-penalty merit φ(x) = obj(x) + ρ·viol(x) as a double-float
    pair. With ρ > ‖λ*‖∞ the unconstrained minimizer of φ over the
    candidate set IS the constrained optimum (classical ℓ1 exact
    penalty), so candidate selection needs NO stationarity measurement —
    the one quantity whose f32 evaluation is context-rounding-sensitive
    enough (~1e-6·scale noise, and XLA may clone it per consumer with
    different roundings) to make measurement-based selection unstable
    inside large compiled graphs."""
    hi, lo = _obj_dd(G, g, x)
    pv = rho * _viol_comp(D, d, x, C=C, c=c)
    s, e = _two_sum(hi, pv)
    lo = lo + e
    # non-finite candidates (diverged iterates) sort to +inf: any finite
    # candidate beats them, and they can never be selected.
    bad = jnp.logical_not(
        jnp.logical_and(jnp.isfinite(s), jnp.isfinite(lo))
    )
    return (
        jnp.where(bad, jnp.inf, s),
        jnp.where(bad, 0.0, lo),
    )


def _stationarity_comp(g, Ew, lam, G, xp):
    """Compensated stationarity residual r1 = −g + Ewᵀλ − G·xp.

    The polish refinement is limited by the accuracy of this residual:
    its terms reach |G||x| ~ 1e6 at the reference gains, so a plain f32
    evaluation carries O(0.1 N) noise — which the W = 1e-4 regularizer's
    flat valley amplifies into O(1 N) solution error (the golden-trace
    max-gate blocker). Error-free transforms recover the residual to
    ~f32 eps of its own (small) magnitude, so the refinement fixed point
    lands within ~1e-3 N of the float64 oracle.
    """
    m = Ew.shape[-2]
    n = G.shape[-1]
    zero = jnp.zeros_like(g)
    pairs = [(-g, zero)]
    for k in range(m):
        pairs.append(_prod_err(Ew[k], lam[k]))
    for j in range(n):
        pairs.append(_prod_err(-G[:, j], xp[j]))
    return _comp_sum(pairs)


def _eq_residual_comp(e, E, xp, w):
    """Compensated r2 = w ⊙ (e − E·xp)."""
    n = E.shape[-1]
    pairs = [(e, jnp.zeros_like(e))]
    for j in range(n):
        pairs.append(_prod_err(-E[:, j], xp[j]))
    return w * _comp_sum(pairs)


def _polish(G, g, D, d, chol_g, delta, x_ipm, z_ipm, C=None, c=None,
            rounds: int = 4, act=None):
    """Equality-constrained re-solve on the active set of (x_ipm, z_ipm).

    Active rows (z > s heuristic by default; pass ``act`` to override)
    of D — plus all equality rows — become equalities; the KKT system is
    solved via the Schur complement on the already-factored G_reg with
    ``rounds`` compensated iterative-refinement sweeps (each contracts
    the f32 error by ~cond·eps, so 3-4 rounds reach the compensated
    floor even at the reference's W=1e-4 regularizer conditioning).
    Masked fixed-shape: inactive rows carry identity diagonal + zero rhs.
    """
    dtype = G.dtype
    mi = D.shape[-2]
    slack = D @ x_ipm - d
    if act is None:
        act = (z_ipm > slack).astype(dtype)
    if C is not None:
        E = jnp.concatenate([C, D], axis=0)
        e = jnp.concatenate([c, d], axis=0)
        w = jnp.concatenate([jnp.ones(C.shape[-2], dtype), act])
    else:
        E, e, w = D, d, act
    m = E.shape[-2]

    def gsolve(b):
        return _chol_solve(chol_g, b)

    Ew = E * w[:, None]
    K = (
        Ew @ gsolve(Ew.T)
        + jnp.diag(1.0 - w)
        + delta * jnp.eye(m, dtype=dtype)
    )
    cholK = jnp.linalg.cholesky(K)

    xp = gsolve(-g)
    lam = jnp.zeros((m,), dtype)
    for _ in range(rounds):
        # Compensated residuals: the refinement contraction is limited by
        # residual accuracy, not by the f32 triangular solves (see
        # _stationarity_comp). Costs ~500 extra elementwise ops per
        # round on 12/20-vectors — noise next to the IPM itself.
        r1 = _stationarity_comp(g, Ew, lam, G, xp)
        r2 = _eq_residual_comp(e, E, xp, w)
        t = gsolve(r1)
        dlam = _chol_solve(cholK, r2 - Ew @ t)
        dx = gsolve(r1 + Ew.T @ dlam)
        xp = xp + dx
        lam = lam + dlam
    # ONE materialized candidate: the refinement fixed point is rounding-
    # sensitive along the W=1e-4 valley, and without the barrier XLA may
    # clone this whole computation into separate fusions per consumer
    # (the KKT measurement vs the selection where's) whose results
    # differ by O(1 N) — the selection then mixes fields of different
    # points (observed: returned x matching no measured candidate).
    xp, lam = jax.lax.optimization_barrier((xp, lam))
    lam = lam * w
    if C is not None:
        me = C.shape[-2]
        return xp, lam[me:], lam[:me]
    return xp, lam, None


def solve_weighted_ls_qp(
    A: jax.Array,
    S: jax.Array,
    b: jax.Array,
    W: jax.Array,
    D: jax.Array,
    d: jax.Array,
    C: jax.Array | None = None,
    c: jax.Array | None = None,
    iters: int = 25,
    warm: tuple[jax.Array, jax.Array] | None = None,
    polish: str = "full",
) -> QpSolution:
    """OOQP-formulation front end:  min (Ax−b)ᵀS(Ax−b) + xᵀWx
    s.t. Cx = c, Dx ≥ d.

    Mirrors ``ooqpei::QuadraticProblemFormulation::solve`` as called by
    ``ContactForceDistribution::solveOptimization``
    (ContactForceDistribution.cpp:490), with G = 2AᵀSA + W,
    g = −2AᵀSb (documented in-code at :400-434).
    S and W are given as diagonal vectors.
    """
    with jax.default_matmul_precision("highest"):
        SA = A * S[:, None]
        G = 2.0 * A.T @ SA + jnp.diag(W)
        g = -2.0 * SA.T @ b
    return solve_qp(
        G, g, D, d, C=C, c=c, iters=iters, warm=warm, polish=polish
    )


def kkt_residuals(G, g, D, d, sol: QpSolution, C=None, c=None):
    """Diagnostic KKT residuals (stationarity, feasibility, complementarity)."""
    stat = G @ sol.x + g - D.T @ sol.z
    if C is not None:
        stat = stat - C.T @ sol.y
    prim = jnp.minimum(D @ sol.x - d, 0.0)
    comp = sol.z * (D @ sol.x - d)
    out = {
        "stationarity": jnp.max(jnp.abs(stat)),
        "primal": jnp.max(jnp.abs(prim)),
        "complementarity": jnp.max(jnp.abs(comp)),
        "dual": jnp.max(jnp.maximum(-sol.z, 0.0)),
    }
    if C is not None:
        out["equality"] = jnp.max(jnp.abs(C @ sol.x - c))
    return out
