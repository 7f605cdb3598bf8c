"""CPU-side tests of the Pallas force-distribution QP kernel.

The kernel (`ops/qp_pallas.py`) is the headline TPU path; these tests
run its EXACT trace as eager JAX ops (``solve_fd_qp_emulated``) so a
regression in the kernel body fails in the default (CPU) suite instead
of only when the driver happens to run bench on real TPU. Coverage
mirrors the solver-sanity spirit of the reference
(``ContactForceDistribution.cpp:496-511``): the worked stance cases,
masked 2/3-leg stances, the infeasible-wrench tail, and agreement with
the XLA IPM (`ops/qp.py`) which is itself oracle-verified in test_qp.py.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from quadruped_locomotion_tpu.control import force_distribution as fd
from quadruped_locomotion_tpu.control.vmc import compute_virtual_wrench
from quadruped_locomotion_tpu.ops import qp, qp_pallas
from quadruped_locomotion_tpu.rollout import simulator as simlib
from quadruped_locomotion_tpu.types import (
    BaseTarget,
    CfdParams,
    RobotModel,
    VmcGains,
)

ITERS = 15  # production iteration budget (bench.py headline)


def _stance_problems():
    """Force-distribution QPs spanning the kernel's operating envelope:
    full stance, two 3-leg stances, the trot 2-leg diagonal, and a
    displaced base whose requested wrench is friction-cone infeasible
    (the constraint-bound tail proven in bench.tail_proof)."""
    model = RobotModel.simpledog()
    gains = VmcGains.gazebo_defaults()
    cfd = CfdParams.defaults()
    sim = simlib.default_stance_state(model, height=0.4)
    target = BaseTarget.from_base(sim.robot.base)
    supports = jnp.array(
        [
            [1, 1, 1, 1],
            [1, 1, 1, 0],
            [0, 1, 1, 1],
            [1, 0, 0, 1],  # trot diagonal
            [0, 1, 1, 0],  # other diagonal
            [1, 1, 1, 1],
        ],
        bool,
    )
    offsets = jnp.array(
        [
            [0.0, 0.0, 0.0],
            [0.0, 0.01, 0.0],
            [-0.01, 0.0, 0.0],
            [0.01, -0.01, 0.0],
            [-0.005, 0.005, 0.0],
            [0.08, 0.08, 0.04],  # kp swamps the cone → infeasible wrench
        ],
        jnp.float32,
    )

    def make(sup, off):
        st = sim.robot.replace(
            base=sim.robot.base.replace(
                position=sim.robot.base.position + off
            ),
            support=sup,
        )
        vf, vt = compute_virtual_wrench(model, gains, st, target)
        return fd.build_qp(model, cfd, st, vf, vt)

    return jax.jit(jax.vmap(make))(supports, offsets)


def _objective(x, A, S, b, W):
    r = jnp.einsum("bij,bj->bi", A, x) - b
    return jnp.einsum("bi,bi->b", r * S, r) + jnp.einsum(
        "bi,bi->b", x * W, x
    )


def test_kernel_trace_matches_xla_on_stances():
    """The kernel's emulated trace must reach the XLA IPM's objective on
    every stance class — incl. masked legs and the infeasible tail."""
    A, b, S, W, D, d = _stance_problems()
    xe, se, ze, kkte = qp_pallas.solve_weighted_ls_fd_qp(
        A, S, b, W, D, d, iters=ITERS, emulate=True
    )
    sol = jax.jit(
        jax.vmap(lambda *a: qp.solve_weighted_ls_qp(*a, iters=ITERS))
    )(A, S, b, W, D, d)

    assert np.isfinite(np.asarray(xe)).all()
    assert np.isfinite(np.asarray(kkte)).all()
    # both converge: honest point-KKT residuals at the f32 scale
    assert float(jnp.max(kkte)) < 5e-3
    obj_e = np.asarray(_objective(xe, A, S, b, W))
    obj_x = np.asarray(_objective(sol.x, A, S, b, W))
    rel = np.abs(obj_e - obj_x) / (1.0 + np.abs(obj_x))
    assert rel.max() < 1e-4, f"objective gap {rel}"
    # feasibility of the returned point (Dx ≥ d within float32 slop)
    viol = np.asarray(
        jnp.min(jnp.einsum("bij,bj->bi", D, xe) - d, axis=-1)
    )
    assert viol.min() > -1e-3, f"constraint violation {viol}"


def test_kernel_trace_random_qps():
    """Generic PD inequality QPs (not force-distribution structured):
    the kernel's IPM must agree with the XLA IPM, which test_qp.py
    verifies against scipy."""
    B = 8
    rng = np.random.default_rng(0)
    M = rng.normal(size=(B, 12, 12))
    G = jnp.asarray(
        np.einsum("bij,bik->bjk", M, M) + 3 * np.eye(12), jnp.float32
    )
    g = jnp.asarray(rng.normal(size=(B, 12)), jnp.float32)
    D = jnp.asarray(rng.normal(size=(B, 20, 12)), jnp.float32)
    d = jnp.asarray(rng.normal(size=(B, 20)) - 1.0, jnp.float32)
    x, s, z, kkt = qp_pallas.solve_fd_qp_emulated(G, g, D, d, iters=ITERS)
    sol = jax.jit(
        jax.vmap(lambda G, g, D, d: qp.solve_qp(G, g, D, d, iters=ITERS))
    )(G, g, D, d)
    obj_e = 0.5 * jnp.einsum("bi,bij,bj->b", x, G, x) + jnp.einsum(
        "bi,bi->b", g, x
    )
    obj_x = 0.5 * jnp.einsum(
        "bi,bij,bj->b", sol.x, G, sol.x
    ) + jnp.einsum("bi,bi->b", g, sol.x)
    rel = np.asarray(jnp.abs(obj_e - obj_x) / (1.0 + jnp.abs(obj_x)))
    assert rel.max() < 1e-5, f"objective gap {rel}"
    assert float(jnp.max(kkt)) < 1e-4


def test_batched_dispatch_emulate_backend():
    """force_distribution.solve_fd_qp_batched routes "pallas_emulate"
    through the kernel trace and returns a QpSolution equivalent to the
    "xla" backend — the integration seam the batched rollout uses."""
    A, b, S, W, D, d = _stance_problems()
    sol_e = fd.solve_fd_qp_batched(
        A, b, S, W, D, d, iters=ITERS, backend="pallas_emulate"
    )
    sol_x = fd.solve_fd_qp_batched(
        A, b, S, W, D, d, iters=ITERS, backend="xla"
    )
    assert sol_e.x.shape == sol_x.x.shape
    assert sol_e.s.shape == sol_x.s.shape
    obj_e = np.asarray(_objective(sol_e.x, A, S, b, W))
    obj_x = np.asarray(_objective(sol_x.x, A, S, b, W))
    rel = np.abs(obj_e - obj_x) / (1.0 + np.abs(obj_x))
    assert rel.max() < 1e-4
    # the realized wrench (the physical output) must agree tightly
    wa = np.asarray(jnp.einsum("bij,bj->bi", A, sol_e.x - sol_x.x))
    assert np.abs(wa).max() < 0.5, f"wrench gap {np.abs(wa).max()}"
