"""Contact-force distribution: the friction-cone QP + torque map.

TPU-native re-design of ``balance_controller/src/contact_force_distribution/
ContactForceDistribution.cpp`` (the reference's hot kernel, solved by
OOQP/MA27 on CPU). Solves, per scenario,

    min (Ax − b)ᵀ S (Ax − b) + xᵀ W x
    s.t. n_i·f_i ≥ f_min          (stance legs, :210-252)
         μ n_i·f_i ± t_{1,2}·f_i ≥ 0   (4-edge friction pyramid, :254-336)

with x the stacked ground-reaction forces (3 per leg), A = [I…I;
skew(r_i)…] (:168-206), b the virtual wrench. The problem is ALWAYS
12-dim with 20 inequality rows: swing legs are masked out by zeroing
their A/D entries and relaxing their constraint rows, which makes their
block of the objective decouple to min w·xᵀx → exactly 0 — no dynamic
shapes, fully vmap/shard-able.

The reference's "double solve" with per-leg load-factor equality
constraints (:338-383): legs being unloaded (factor < 1) get their force
pinned to factor × (first solution) by equality rows C x = c, and the QP
is solved again for the remaining legs. Here the equality is enforced by
*elimination* instead of KKT rows — pinned legs are masked out of the
second problem and their wrench moves to the right-hand side — which is
exact, keeps the problem strictly feasible for the interior-point
solver, and stays fixed-shape. Pass ``load_factors`` to
:func:`distribute` to engage it; ``None`` (the default, and the
reference's effective behavior — its factor<1 condition is commented
out at :153-156) runs a single solve.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..model.dynamics import gravity_torques
from ..model.kinematics import forward_kinematics, jacobians
from ..ops import qp
from ..types import GRAVITY, CfdParams, RobotModel, RobotState
from ..utils.rotations import quat_inv_rotate, skew


class ForceDistributionResult(NamedTuple):
    contact_forces: jax.Array  # (4,3) desired contact force per leg (base
    # frame; the force the LEG exerts on the ground = -x, :496-503)
    ground_reaction: jax.Array  # (4,3) ground-reaction force x per leg
    qp_solution: qp.QpSolution
    virtual_wrench_realized: jax.Array  # (6,) A @ x


def build_qp(
    model: RobotModel,
    params: CfdParams,
    state: RobotState,
    virtual_force: jax.Array,
    virtual_torque: jax.Array,
    feet_in_base: jax.Array | None = None,
):
    """Assemble (A, b, S, W, D, d) for one scenario. Shapes are static."""
    dtype = virtual_force.dtype
    if feet_in_base is None:
        feet_in_base = forward_kinematics(model, state.q)
    mask = state.support.astype(dtype)  # (4,)

    # A (6,12): top identity blocks, bottom skew(r_i); swing columns zeroed.
    eye3 = jnp.eye(3, dtype=dtype)
    a_top = jnp.concatenate([eye3 * mask[i] for i in range(4)], axis=1)
    a_bot = jnp.concatenate(
        [skew(feet_in_base[i]) * mask[i] for i in range(4)], axis=1
    )
    A = jnp.concatenate([a_top, a_bot], axis=0)
    b = jnp.concatenate([virtual_force, virtual_torque])
    S = params.s_weights.astype(dtype)
    W = jnp.full((12,), params.w_regularizer, dtype)

    # Surface normals and tangentials in base frame (:223-244, :272-326).
    # The first tangential lies in the base XZ-plane (t1 = n × ŷ_base,
    # :294) — anchored to the BODY, not the world: a world-anchored
    # pyramid rotates against the body with yaw and destabilizes turning.
    n_base = quat_inv_rotate(
        state.base.quaternion[None, :], state.surface_normal
    )  # (4,3)
    y_base = jnp.array([0.0, 1.0, 0.0], dtype)
    t1 = jnp.cross(n_base, jnp.broadcast_to(y_base, (4, 3)))
    t1 = t1 / jnp.maximum(jnp.linalg.norm(t1, axis=-1, keepdims=True), 1e-9)
    t2 = jnp.cross(n_base, t1)
    t2 = t2 / jnp.maximum(jnp.linalg.norm(t2, axis=-1, keepdims=True), 1e-9)

    mu = params.friction_coeff

    def leg_rows(i):
        block = jnp.zeros((5, 12), dtype)
        rows = jnp.stack(
            [
                n_base[i],                # min normal force
                mu * n_base[i] + t1[i],   # friction pyramid
                mu * n_base[i] - t1[i],
                mu * n_base[i] + t2[i],
                mu * n_base[i] - t2[i],
            ]
        )
        return block.at[:, 3 * i : 3 * i + 3].set(rows * mask[i])

    D = jnp.concatenate([leg_rows(i) for i in range(4)], axis=0)  # (20,12)
    d_leg = jnp.stack(
        [
            jnp.where(state.support, params.min_normal_force, -1.0),
            *([jnp.where(state.support, 0.0, -1.0)] * 4),
        ],
        axis=1,
    ).reshape(20)
    return A, b, S, W, D, d_leg


def solve_fd_qp_batched(
    A: jax.Array,  # (B,6,12)
    b: jax.Array,  # (B,6)
    S: jax.Array,  # (B,6)
    W: jax.Array,  # (B,12)
    D: jax.Array,  # (B,20,12)
    d: jax.Array,  # (B,20)
    iters: int = 15,
    backend: str = "auto",
    load_factors: jax.Array | None = None,  # (B,4)
    support: jax.Array | None = None,  # (B,4) bool, required w/ factors
) -> qp.QpSolution:
    """ONE solver dispatch for a whole batch of force-distribution QPs.

    This is the product's QP entry point for batched rollouts: instead of
    vmapping the generic XLA IPM per scenario (per-element loops, terrible
    occupancy at n=12), the entire batch goes to the lane-tiled Pallas
    kernel in a single call — the batch lives in the (8,128) vector
    lanes, so the chip does dense VPU math with zero wasted lanes
    (≙ the role of OOQP inside the controller tick,
    ``ContactForceDistribution.cpp:490`` — the QP *inside* the hot loop).

    ``backend``: "pallas" | "xla" | "auto" | "pallas_interpret". "auto"
    picks the Pallas kernel on TPU when the batch is big enough to fill
    at least one (8,128)-lane tile; the XLA IPM otherwise (CPU tests,
    small batches). "pallas_emulate" runs the exact kernel trace as
    plain JAX ops (CPU test coverage of the kernel code path).
    Both backends implement the same fixed-iteration Mehrotra IPM +
    active-set polish and agree to float32 tolerance (gated by
    ``tests/test_qp_pallas.py`` and the in-loop equivalence test).

    ``load_factors`` (+ ``support``) engages the reference's leg-load
    double solve (``ContactForceDistribution.cpp:338-383``) by
    ELIMINATION, exactly as :func:`distribute` does per-scenario:
    stance legs with factor < 1 are pinned to factor × (first solution),
    their wrench moves to the right-hand side, their columns/rows are
    masked out, and the batch is re-dispatched — both solves stay on
    whichever kernel backend was selected (the kernel is inequality-only
    by design; elimination needs no equality rows, so the Pallas path
    keeps the hot loop even with load factors engaged).
    """
    B = A.shape[0]
    if backend == "auto":
        backend = (
            "pallas"
            if jax.default_backend() == "tpu" and B >= 1024
            else "xla"
        )

    if backend in ("pallas", "pallas_emulate"):
        from ..ops import qp_pallas

        def dispatch(A, b, D, d):
            x, s, z, kkt = qp_pallas.solve_weighted_ls_fd_qp(
                A, S, b, W, D, d, iters=iters,
                emulate=(backend == "pallas_emulate"),
            )
            return qp.QpSolution(
                x=x,
                z=z,
                y=jnp.zeros((B, 0), x.dtype),
                s=s,
                iterations=jnp.full((B,), iters, jnp.int32),
                kkt_error=kkt,
            )
    else:
        def dispatch(A, b, D, d):
            return jax.vmap(
                lambda A, b, S, W, D, d: qp.solve_weighted_ls_qp(
                    A, S, b, W, D, d, iters=iters
                )
            )(A, b, S, W, D, d)

    sol = dispatch(A, b, D, d)
    if load_factors is None:
        return sol
    assert support is not None, "load_factors requires the support mask"

    # Eliminated second solve (≙ :338-383, same math as `distribute`).
    dtype = sol.x.dtype
    lf = jnp.asarray(load_factors, dtype)
    pinned = support & (lf < 1.0)  # (B,4)
    pin12 = jnp.repeat(pinned, 3, axis=-1)  # (B,12)
    x_pin = jnp.where(pin12, sol.x * jnp.repeat(lf, 3, axis=-1), 0.0)
    b2 = b - jnp.einsum("bij,bj->bi", A, x_pin)
    keep12 = (~pin12).astype(dtype)
    A2 = A * keep12[:, None, :]
    D2 = D * keep12[:, None, :]
    rows = jnp.repeat(pinned, 5, axis=-1)  # (B,20) pinned legs' rows
    D2 = D2 * (~rows).astype(dtype)[:, :, None]
    d2 = jnp.where(rows, -1.0, d)
    sol2 = dispatch(A2, b2, D2, d2)
    x2 = sol2.x * jnp.repeat((support & ~pinned).astype(dtype), 3, axis=-1)
    return sol2._replace(x=jnp.where(pin12, x_pin, x2))


def solve_formed_qp_batched(
    G: jax.Array,  # (B,12,12) formed quadratic
    g: jax.Array,  # (B,12)
    D: jax.Array,  # (B,20,12)
    d: jax.Array,  # (B,20)
    iters: int = 15,
    backend: str = "auto",
) -> qp.QpSolution:
    """Batched dispatch on an ALREADY-FORMED quadratic (see
    LocomotionContext.G/g): the hot-loop twin of
    :func:`solve_fd_qp_batched` without the per-backend G-formation —
    one f32 formation per tick, owned by the producer."""
    B = G.shape[0]
    if backend == "auto":
        backend = (
            "pallas"
            if jax.default_backend() == "tpu" and B >= 1024
            else "xla"
        )
    if backend in ("pallas", "pallas_emulate"):
        from ..ops import qp_pallas

        if backend == "pallas_emulate":
            x, s, z, kkt = qp_pallas.solve_fd_qp_emulated(
                G, g, D, d, iters=iters
            )
        else:
            x, s, z, kkt = qp_pallas.solve_fd_qp(G, g, D, d, iters=iters)
        return qp.QpSolution(
            x=x,
            z=z,
            y=jnp.zeros((B, 0), x.dtype),
            s=s,
            iterations=jnp.full((B,), iters, jnp.int32),
            kkt_error=kkt,
        )
    return jax.vmap(
        lambda G, g, D, d: qp.solve_qp(G, g, D, d, iters=iters)
    )(G, g, D, d)


def distribute(
    model: RobotModel,
    params: CfdParams,
    state: RobotState,
    virtual_force: jax.Array,
    virtual_torque: jax.Array,
    feet_in_base: jax.Array | None = None,
    iters: int = 20,
    load_factors: jax.Array | None = None,
    warm: tuple[jax.Array, jax.Array] | None = None,
    polish: str = "full",
) -> ForceDistributionResult:
    """≙ ``ContactForceDistribution::computeForceDistribution`` (:99-136).

    ``load_factors`` (4,) engages the double-solve leg-unloading path
    (:338-383): stance legs with factor < 1 are re-pinned to
    factor × (first solution) and the remaining legs re-optimized.

    ``warm``/``polish`` are the realtime-loop levers passed to the
    solver (see :func:`~..ops.qp.solve_qp`): warm-start from the
    previous tick's (x, z) and a lighter polish chain.
    """
    if feet_in_base is None:
        feet_in_base = forward_kinematics(model, state.q)
    A, b, S, W, D, d = build_qp(
        model, params, state, virtual_force, virtual_torque, feet_in_base
    )
    sol = qp.solve_weighted_ls_qp(
        A, S, b, W, D, d, iters=iters, warm=warm, polish=polish
    )
    x = sol.x * jnp.repeat(state.support.astype(sol.x.dtype), 3)

    if load_factors is not None:
        dtype = x.dtype
        lf = jnp.asarray(load_factors, dtype)
        pinned = state.support & (lf < 1.0)  # (4,)
        x_pin = x.reshape(4, 3) * lf[:, None]  # factor × first solution
        # wrench the pinned legs contribute, moved to the RHS
        f_pin = jnp.where(pinned[:, None], x_pin, 0.0)
        wrench_pin = jnp.concatenate(
            [
                jnp.sum(f_pin, axis=0),
                jnp.sum(jnp.cross(feet_in_base, f_pin), axis=0),
            ]
        )
        state2 = state.replace(support=state.support & ~pinned)
        A2, _, _, _, D2, d2 = build_qp(
            model, params, state2, virtual_force, virtual_torque,
            feet_in_base,
        )
        sol2 = qp.solve_weighted_ls_qp(
            A2, S, b - wrench_pin, W, D2, d2, iters=iters
        )
        x2 = sol2.x * jnp.repeat(state2.support.astype(dtype), 3)
        x = jnp.where(
            jnp.repeat(pinned, 3), x_pin.reshape(12), x2
        )
        sol = sol2
        A = A2

    grf = x.reshape(4, 3)
    return ForceDistributionResult(
        contact_forces=-grf,
        ground_reaction=grf,
        qp_solution=sol,
        virtual_wrench_realized=A @ sol.x + (
            0.0 if load_factors is None else wrench_pin
        ),
    )


def stance_torques(
    model: RobotModel,
    state: RobotState,
    contact_forces: jax.Array,
) -> jax.Array:
    """Map desired contact forces to stance joint torques:
    τ_i = J_iᵀ f_i + τ_gravity(q_i)  — ≙ ``computeJointTorques`` (:516-578).

    Returns (4,3); swing legs get pure gravity compensation there too
    (callers overwrite swing legs with the swing controller output).
    """
    dtype = contact_forces.dtype
    g_world = jnp.array([0.0, 0.0, -GRAVITY], dtype)
    g_base = quat_inv_rotate(state.base.quaternion, g_world)
    j = jacobians(model, state.q)  # (4,3,3)
    tau_f = jnp.einsum("lji,lj->li", j, contact_forces)
    tau_g = gravity_torques(model, state.q, g_base)
    return tau_f + tau_g
