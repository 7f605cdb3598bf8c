"""Standing-balance tests: VMC + force-distribution QP + torque map +
closed loop through the rigid-body simulator (BASELINE config 2)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from quadruped_locomotion_tpu.types import (
    GRAVITY,
    BaseTarget,
    CfdParams,
    RobotModel,
    RobotState,
    VmcGains,
)
from quadruped_locomotion_tpu.control.balance_controller import balance_update
from quadruped_locomotion_tpu.control.vmc import compute_virtual_wrench
from quadruped_locomotion_tpu.control import force_distribution as fd
from quadruped_locomotion_tpu.rollout import simulator as simlib


@pytest.fixture(scope="module")
def setup():
    model = RobotModel.simpledog()
    gains = VmcGains.gazebo_defaults()
    cfd = CfdParams.defaults()
    sim = simlib.default_stance_state(model, height=0.4)
    target = BaseTarget.from_base(sim.robot.base)
    return model, gains, cfd, sim, target


def test_virtual_wrench_at_rest_is_gravity_comp(setup):
    model, gains, cfd, sim, target = setup
    vf, vt = compute_virtual_wrench(model, gains, sim.robot, target)
    weight = float(model.total_mass) * GRAVITY  # 51 kg model
    np.testing.assert_allclose(np.asarray(vf), [0, 0, weight], atol=1e-2)
    np.testing.assert_allclose(np.asarray(vt), [0, 0, 0], atol=1e-2)


def test_force_distribution_statics(setup):
    model, gains, cfd, sim, target = setup
    vf, vt = compute_virtual_wrench(model, gains, sim.robot, target)
    res = fd.distribute(model, cfd, sim.robot, vf, vt, iters=25)
    # realized wrench matches requested wrench
    wrench = np.asarray(res.virtual_wrench_realized)
    np.testing.assert_allclose(wrench[:3], np.asarray(vf), atol=0.5)
    np.testing.assert_allclose(wrench[3:], np.asarray(vt), atol=0.5)
    grf = np.asarray(res.ground_reaction)
    # all normal forces above the minimum, pointing up
    assert np.all(grf[:, 2] >= float(cfd.min_normal_force) - 1e-3)
    # symmetric stance → near-equal load sharing
    np.testing.assert_allclose(
        grf[:, 2], np.full(4, grf[:, 2].mean()), rtol=0.02
    )
    # contact force (leg on ground) points down
    assert np.all(np.asarray(res.contact_forces)[:, 2] < 0)


def test_force_distribution_friction_constraints(setup):
    model, gains, cfd, sim, target = setup
    # hard lateral push request
    target2 = target.replace(
        position=target.position + jnp.array([0.0, 0.3, 0.0])
    )
    vf, vt = compute_virtual_wrench(model, gains, sim.robot, target2)
    res = fd.distribute(model, cfd, sim.robot, vf, vt, iters=25)
    grf = np.asarray(res.ground_reaction)
    mu = float(cfd.friction_coeff)
    # friction pyramid |f_t| <= mu f_n in both tangents (flat ground)
    assert np.all(np.abs(grf[:, 0]) <= mu * grf[:, 2] + 1e-2)
    assert np.all(np.abs(grf[:, 1]) <= mu * grf[:, 2] + 1e-2)
    assert np.all(grf[:, 2] >= float(cfd.min_normal_force) - 1e-3)


def test_three_leg_stance(setup):
    model, gains, cfd, sim, target = setup
    state3 = sim.robot.replace(
        support=jnp.array([True, True, True, False])
    )
    vf, vt = compute_virtual_wrench(model, gains, state3, target)
    res = fd.distribute(model, cfd, state3, vf, vt, iters=25)
    grf = np.asarray(res.ground_reaction)
    np.testing.assert_allclose(grf[3], 0.0, atol=1e-4)  # swing leg: no force
    np.testing.assert_allclose(
        grf[:, 2].sum(), float(model.total_mass) * GRAVITY, atol=1.0
    )


def test_stance_torque_map_consistency(setup):
    """τ = Jᵀf + τ_g must invert to the same contact force (sim consistency)."""
    model, gains, cfd, sim, target = setup
    tau, diag = balance_update(model, gains, cfd, sim.robot, target)
    assert np.all(np.abs(np.asarray(tau)) <= 300.0)
    from quadruped_locomotion_tpu.model.kinematics import jacobians
    from quadruped_locomotion_tpu.model.dynamics import gravity_torques
    from quadruped_locomotion_tpu.utils.rotations import quat_inv_rotate

    g_base = quat_inv_rotate(
        sim.robot.base.quaternion, jnp.array([0.0, 0.0, -GRAVITY])
    )
    j = jacobians(model, sim.robot.q)
    tau_g = gravity_torques(model, sim.robot.q, g_base)
    f_rec = jax.vmap(lambda jj, t: jnp.linalg.solve(jj.T, t))(j, tau - tau_g)
    np.testing.assert_allclose(
        np.asarray(f_rec),
        np.asarray(diag.distribution.contact_forces),
        atol=1e-2,
    )


def test_closed_loop_standing_recovery(setup):
    """Perturbed base recovers to target pose through the full loop at 400 Hz."""
    model, gains, cfd, sim, target = setup
    from quadruped_locomotion_tpu.utils.rotations import quat_from_rpy

    # perturb: 4 cm down, 1 cm lateral, 3° roll, small velocity
    base0 = sim.robot.base.replace(
        position=jnp.array([0.0, 0.01, 0.36]),
        quaternion=quat_from_rpy(0.05, -0.03, 0.0),
        linear_velocity=jnp.array([0.02, -0.02, 0.0]),
    )
    # joints consistent with pinned feet
    from quadruped_locomotion_tpu.model.kinematics import inverse_kinematics
    from quadruped_locomotion_tpu.utils.rotations import quat_inv_rotate

    feet_base = quat_inv_rotate(
        base0.quaternion[None], sim.feet_world - base0.position
    )
    q0 = inverse_kinematics(model, feet_base)
    sim0 = sim.replace(robot=sim.robot.replace(base=base0, q=q0))

    dt = 0.0025  # 400 Hz

    def tick(s, _):
        tau, _diag = balance_update(model, gains, cfd, s.robot, target, qp_iters=15)
        s2 = simlib.step(model, s, tau, dt)
        return s2, s2.robot.base.position

    steps = 800  # 2 s
    final, traj = jax.lax.scan(tick, sim0, None, length=steps)
    pos = np.asarray(final.robot.base.position)
    np.testing.assert_allclose(pos, [0.0, 0.0, 0.4], atol=5e-3)
    rollpitch = np.asarray(final.robot.base.quaternion[1:3])
    np.testing.assert_allclose(rollpitch, 0.0, atol=5e-3)
    vel = np.asarray(final.robot.base.linear_velocity)
    np.testing.assert_allclose(vel, 0.0, atol=1e-2)
    # feet never moved
    np.testing.assert_allclose(
        np.asarray(final.feet_world), np.asarray(sim.feet_world), atol=1e-5
    )
    # no NaNs anywhere on the trajectory
    assert np.all(np.isfinite(np.asarray(traj)))


def test_load_factor_double_solve(setup):
    """Leg-load-factor double solve (≙ ContactForceDistribution.cpp:338-383):
    an unloading leg's force is pinned to factor × (first solution) and the
    other legs pick up the slack so the wrench still matches."""
    model, gains, cfd, sim, target = setup
    vf, vt = compute_virtual_wrench(model, gains, sim.robot, target)
    res1 = fd.distribute(model, cfd, sim.robot, vf, vt, iters=25)
    lf = jnp.array([1.0, 1.0, 0.5, 1.0])
    res2 = fd.distribute(
        model, cfd, sim.robot, vf, vt, iters=25, load_factors=lf
    )
    g1 = np.asarray(res1.ground_reaction)
    g2 = np.asarray(res2.ground_reaction)
    # RH pinned at half its first-solve force
    np.testing.assert_allclose(g2[2], 0.5 * g1[2], atol=1e-3)
    # total wrench still realized by the remaining legs
    wrench = np.asarray(res2.virtual_wrench_realized)
    np.testing.assert_allclose(wrench[:3], np.asarray(vf), atol=1.0)
    np.testing.assert_allclose(wrench[3:], np.asarray(vt), atol=1.0)
    # the other legs carry more vertical load than before
    assert g2[[0, 1, 3], 2].sum() > g1[[0, 1, 3], 2].sum() + 1.0
    # factors of 1.0 everywhere reproduce the single solve
    res3 = fd.distribute(
        model, cfd, sim.robot, vf, vt, iters=25,
        load_factors=jnp.ones(4),
    )
    np.testing.assert_allclose(
        np.asarray(res3.ground_reaction), g1, atol=1e-4
    )


def test_batched_leg_load_elimination_matches_distribute(setup):
    """VERDICT r4 stretch item: engaging load factors in a BATCHED
    rollout keeps the kernel backend. The batched eliminated double
    solve (solve_fd_qp_batched(load_factors=...)) must agree with the
    per-scenario `distribute(load_factors=...)` reference, and the
    pallas_emulate backend (exact kernel trace) must agree with XLA."""
    model, gains, cfd, sim, target = setup
    vf, vt = compute_virtual_wrench(model, gains, sim.robot, target)

    B = 4
    rng = np.random.default_rng(7)
    noise = jnp.asarray(rng.uniform(-0.02, 0.02, size=(B, 3)), jnp.float32)

    def build(n):
        st = sim.robot.replace(
            base=sim.robot.base.replace(position=sim.robot.base.position + n)
        )
        vfi, vti = compute_virtual_wrench(model, gains, st, target)
        return fd.build_qp(model, cfd, st, vfi, vti)

    A, b, S, W, D, d = jax.jit(jax.vmap(build))(noise)
    lf = jnp.broadcast_to(jnp.array([1.0, 1.0, 0.5, 1.0]), (B, 4))
    support = jnp.ones((B, 4), bool)

    sol_x = fd.solve_fd_qp_batched(
        A, b, S, W, D, d, iters=25, backend="xla",
        load_factors=lf, support=support,
    )
    # reference: per-scenario distribute() with the same factors
    def ref(n):
        st = sim.robot.replace(
            base=sim.robot.base.replace(position=sim.robot.base.position + n)
        )
        vfi, vti = compute_virtual_wrench(model, gains, st, target)
        return fd.distribute(
            model, cfd, st, vfi, vti, iters=25,
            load_factors=jnp.array([1.0, 1.0, 0.5, 1.0]),
        ).ground_reaction

    grf_ref = jax.jit(jax.vmap(ref))(noise)
    # Physical quantity (realized wrench) must agree tightly; raw forces
    # get a looser gate — the W=1e-4 regularizer leaves a flat valley in
    # which different float32 lowerings land ~1 N apart on ~100 N
    # solutions with equal objective (same policy as the dryrun gates).
    An = np.asarray(A, np.float64)
    w_batched = np.einsum("bij,bj->bi", An, np.asarray(sol_x.x))
    w_ref = np.einsum(
        "bij,bj->bi", An, np.asarray(grf_ref).reshape(B, 12)
    )
    np.testing.assert_allclose(w_batched, w_ref, atol=0.5)
    np.testing.assert_allclose(
        np.asarray(sol_x.x).reshape(B, 4, 3), np.asarray(grf_ref), atol=2.0
    )
    # pinned leg carries exactly factor x its own first-solve force
    sol_1 = fd.solve_fd_qp_batched(A, b, S, W, D, d, iters=25, backend="xla")
    np.testing.assert_allclose(
        np.asarray(sol_x.x[:, 6:9]),
        0.5 * np.asarray(sol_1.x[:, 6:9]),
        atol=1e-3,
    )
    # kernel-trace backend agreement on the doubled solve
    sol_em = fd.solve_fd_qp_batched(
        A, b, S, W, D, d, iters=25, backend="pallas_emulate",
        load_factors=lf, support=support,
    )
    realized_x = np.einsum(
        "bij,bj->bi", np.asarray(A, np.float64), np.asarray(sol_x.x)
    )
    realized_em = np.einsum(
        "bij,bj->bi", np.asarray(A, np.float64), np.asarray(sol_em.x)
    )
    np.testing.assert_allclose(realized_em, realized_x, atol=0.5)
    np.testing.assert_allclose(
        np.asarray(sol_em.x), np.asarray(sol_x.x), atol=1.0
    )


def test_warm_start_light_polish_matches_cold_quality(setup):
    """The realtime-loop solver configuration (warm-started 8-iter IPM +
    light polish, runtime/manager.py) must reach the KKT quality and
    torques of the cold 15-iter full-polish default on a sequence of
    slowly-varying standing QPs — the property that makes 400 Hz hold
    on the host (VERDICT r4 item 5)."""
    model, gains, cfd, sim, target = setup

    warm = None
    warm_fn = jax.jit(
        lambda s, t, w: balance_update(
            model, gains, cfd, s, t, qp_iters=8, warm=w, polish="light"
        )
    )
    cold_fn = jax.jit(
        lambda s, t: balance_update(model, gains, cfd, s, t, qp_iters=15)
    )
    rng = np.random.default_rng(11)
    state = sim.robot
    for i in range(6):
        # slowly-varying base position, like consecutive 2.5 ms ticks
        state = state.replace(
            base=state.base.replace(
                position=state.base.position
                + jnp.asarray(rng.uniform(-2e-3, 2e-3, 3), jnp.float32)
            )
        )
        tau_w, diag_w = warm_fn(state, target, warm)
        sol = diag_w.distribution.qp_solution
        warm = (sol.x, sol.z)
        tau_c, diag_c = cold_fn(state, target)
        if i == 0:
            continue  # first warm tick starts from None-equivalent data
        assert float(sol.kkt_error) < 1e-5, (i, float(sol.kkt_error))
        np.testing.assert_allclose(
            np.asarray(tau_w), np.asarray(tau_c), atol=0.5
        )
        w_w = np.asarray(diag_w.distribution.virtual_wrench_realized)
        w_c = np.asarray(diag_c.distribution.virtual_wrench_realized)
        np.testing.assert_allclose(w_w, w_c, atol=0.5)
