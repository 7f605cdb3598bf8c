"""Contact FSM: 9-state transitions, memory/latching, and fault-injection
closed loops (≙ ros_balance_controller.cpp:233-380, 1086-1140 with states
from StateSwitcher.hpp:52-72)."""

import jax
import jax.numpy as jnp
import numpy as np

from quadruped_locomotion_tpu.control import contact_fsm as fsm_mod
from quadruped_locomotion_tpu.control.contact_fsm import (
    FsmState,
    apply_swing_reflexes,
    fsm_step,
    init_fsm_state,
)
from quadruped_locomotion_tpu.control.locomotion import (
    ControllerParams,
    locomotion_update,
)
from quadruped_locomotion_tpu.control.swing import joint_pd_gravity_torques
from quadruped_locomotion_tpu.rollout import simulator as simlib
from quadruped_locomotion_tpu.types import BaseTarget, RobotModel

F = jnp.asarray


def _step(fsm, desired, contact, sw, st, q=None, **kw):
    q = jnp.zeros((4, 3)) if q is None else q
    return fsm_step(fsm, F(desired), F(contact), F(sw), F(st), q, **kw)


def _stance_fsm():
    return FsmState(
        leg_state=jnp.full((4,), fsm_mod.STANCE_NORMAL, jnp.int32),
        stored_q=jnp.zeros((4, 3)),
        store_flag=jnp.zeros((4,), bool),
    )


class TestTransitions:
    def test_init_resolves_to_normal(self):
        fsm = init_fsm_state()
        _, out = _step(
            fsm, [True] * 4, [True] * 4, [0.0] * 4, [0.5] * 4
        )
        assert (np.asarray(out.leg_state) == fsm_mod.STANCE_NORMAL).all()
        assert np.asarray(out.support).all()

    def test_swing_contact_classification_by_phase(self):
        """:1103-1115 — grace ≤0.2, bump (0.2,0.5], early TD >0.5."""
        fsm = _stance_fsm()
        _, out = _step(
            fsm,
            [False] * 4,
            [True] * 4,
            [0.1, 0.3, 0.6, 0.15],
            [0.0] * 4,
        )
        st = np.asarray(out.leg_state)
        assert st[0] == fsm_mod.SWING_LATE_LIFTOFF
        assert st[1] == fsm_mod.SWING_BUMPED
        assert st[2] == fsm_mod.SWING_EARLY_TD
        assert st[3] == fsm_mod.SWING_LATE_LIFTOFF
        # reactions: only early TD loads; only bump retracts
        assert np.asarray(out.support).tolist() == [False, False, True, False]
        assert np.asarray(out.bumped).tolist() == [False, True, False, False]

    def test_swing_no_contact_is_normal(self):
        fsm = _stance_fsm()
        _, out = _step(fsm, [False] * 4, [False] * 4, [0.4] * 4, [0.0] * 4)
        assert (np.asarray(out.leg_state) == fsm_mod.SWING_NORMAL).all()
        assert not np.asarray(out.support).any()

    def test_stance_no_contact_thresholds(self):
        """:1128-1137 — late TD <0.1, hold in [0.1,0.5], lost >0.5."""
        fsm = _stance_fsm()
        _, out = _step(
            fsm, [True] * 4, [False] * 4, [0.0] * 4, [0.05, 0.3, 0.7, 0.02]
        )
        st = np.asarray(out.leg_state)
        assert st[0] == fsm_mod.SWING_LATE_TD
        assert st[1] == fsm_mod.STANCE_NORMAL  # held previous state
        assert st[2] == fsm_mod.STANCE_LOST
        assert st[3] == fsm_mod.SWING_LATE_TD
        assert np.asarray(out.freeze).tolist() == [False, False, True, False]
        assert np.asarray(out.support).tolist() == [False, True, False, False]

    def test_non_footstep_legs_always_stance_normal(self):
        """:1121-1125 — non-footstep stance legs never enter the reflex
        machinery (e.g. ee_target / leg_mode legs)."""
        fsm = _stance_fsm()
        _, out = _step(
            fsm,
            [True] * 4,
            [False] * 4,
            [0.0] * 4,
            [0.05] * 4,
            is_footstep=jnp.zeros(4, bool),
        )
        assert (np.asarray(out.leg_state) == fsm_mod.STANCE_NORMAL).all()

    def test_slip_detection(self):
        fsm = _stance_fsm()
        _, out = _step(
            fsm,
            [True] * 4,
            [True] * 4,
            [0.0] * 4,
            [0.5] * 4,
            foot_speed_tangential=F([0.0, 0.3, 0.05, 0.0]),
        )
        st = np.asarray(out.leg_state)
        assert st[1] == fsm_mod.STANCE_SLIPPING
        assert st[0] == st[2] == fsm_mod.STANCE_NORMAL
        # slipping is detect-only: still loaded (the reference declares the
        # state but has no reaction, StateSwitcher.hpp:55)
        assert np.asarray(out.support).all()


class TestMemory:
    def test_late_td_latches_through_hold_region(self):
        """A leg that missed touchdown keeps driving down through the
        no-assignment region 0.1 ≤ st ≤ 0.5 instead of oscillating."""
        fsm = _stance_fsm()
        fsm, out = _step(fsm, [True] * 4, [False] * 4, [0.0] * 4, [0.05] * 4)
        assert (np.asarray(out.leg_state) == fsm_mod.SWING_LATE_TD).all()
        for st in (0.15, 0.3, 0.45):
            fsm, out = _step(
                fsm, [True] * 4, [False] * 4, [0.0] * 4, [st] * 4
            )
            assert (np.asarray(out.leg_state) == fsm_mod.SWING_LATE_TD).all()
        # contact clears the latch
        fsm, out = _step(fsm, [True] * 4, [True] * 4, [0.0] * 4, [0.3] * 4)
        assert (np.asarray(out.leg_state) == fsm_mod.STANCE_NORMAL).all()

    def test_lost_contact_freeze_stores_entry_posture(self):
        fsm = _stance_fsm()
        q1 = jnp.arange(12.0).reshape(4, 3)
        fsm, out = _step(
            fsm, [True] * 4, [False] * 4, [0.0] * 4, [0.6] * 4, q=q1
        )
        assert np.asarray(out.freeze).all()
        np.testing.assert_allclose(np.asarray(out.q_freeze), np.asarray(q1))
        # posture stays pinned at the ENTRY value while the state latches
        q2 = q1 + 1.0
        fsm, out = _step(
            fsm, [True] * 4, [False] * 4, [0.0] * 4, [0.7] * 4, q=q2
        )
        np.testing.assert_allclose(np.asarray(out.q_freeze), np.asarray(q1))
        # back to normal clears the store flag; a new loss re-stores
        fsm, out = _step(
            fsm, [True] * 4, [True] * 4, [0.0] * 4, [0.8] * 4, q=q2
        )
        assert not np.asarray(fsm.store_flag).any()
        fsm, out = _step(
            fsm, [True] * 4, [False] * 4, [0.0] * 4, [0.6] * 4, q=q2
        )
        np.testing.assert_allclose(np.asarray(out.q_freeze), np.asarray(q2))

    def test_scan_and_vmap_compatible(self):
        def tick(fsm, contact):
            fsm, out = fsm_step(
                fsm,
                jnp.ones(4, bool),
                contact,
                jnp.zeros(4),
                jnp.full((4,), 0.6),
                jnp.zeros((4, 3)),
            )
            return fsm, out.leg_state

        contacts = jnp.stack(
            [jnp.ones((3, 4), bool), jnp.zeros((3, 4), bool)], axis=1
        )  # (3 steps, batch 2, 4 legs)
        fsm0 = jax.vmap(lambda _: init_fsm_state())(jnp.arange(2))
        _, states = jax.lax.scan(jax.vmap(tick), fsm0, contacts)
        assert states.shape == (3, 2, 4)
        assert (np.asarray(states[:, 0]) == fsm_mod.STANCE_NORMAL).all()
        assert (np.asarray(states[:, 1]) == fsm_mod.STANCE_LOST).all()


class TestFaultInjection:
    """Closed loops against the plant with injected sensor faults."""

    def _standing_loop(self, n_ticks, fault_fn, dt=0.0025, st_phase=1.0):
        """Standing balance at 400 Hz with a contact-sensor fault hook.

        fault_fn(i, contact) -> contact with the injected fault.
        ``st_phase``: the normalized stance phase reported to the FSM
        (1.0 = deep stance ⇒ loss triggers STANCE_LOST; 0.1–0.5 = the
        memory hold region).
        """
        model = RobotModel.simpledog()
        params = ControllerParams.defaults()
        sim = simlib.default_stance_state(model, height=0.4)
        target = BaseTarget.from_base(sim.robot.base)
        desired = jnp.ones(4, bool)

        def tick(carry, i):
            sim, fsm_state = carry
            contact = fault_fn(i, simlib.contact_sensor(sim))
            fsm_state2, fsm = fsm_step(
                fsm_state,
                desired,
                contact,
                jnp.zeros(4),
                jnp.full((4,), st_phase),
                sim.robot.q,
            )
            state = sim.robot.replace(support=fsm.support)
            hold = sim.feet_world
            tau, diag = locomotion_update(
                model, params, state, target, hold,
                jnp.zeros_like(hold), jnp.zeros_like(hold), qp_iters=15,
            )
            tau_freeze = joint_pd_gravity_torques(
                model, state, fsm.q_freeze, jnp.zeros((4, 3))
            )
            tau = jnp.where(fsm.freeze[:, None], tau_freeze, tau)
            sim2 = simlib.step(model, sim, tau, dt, support=fsm.support)
            return (sim2, fsm_state2), {
                "leg_state": fsm.leg_state,
                "base": sim2.robot.base.position,
                "quat": sim2.robot.base.quaternion,
                "q": sim2.robot.q,
            }

        fsm0 = init_fsm_state()
        (simf, _), tel = jax.jit(
            lambda c: jax.lax.scan(tick, c, jnp.arange(n_ticks))
        )((sim, fsm0))
        return simf, jax.device_get(tel)

    def test_yanked_contact_freezes_and_survives(self):
        """Yank one stance leg's contact mid-stand: the FSM must report
        STANCE_LOST, freeze that leg's joints, and the robot must keep
        balancing on the remaining three."""
        def fault(i, contact):
            lost = (i >= 100) & (i < 300)
            return contact & ~(jnp.arange(4) == 1) | (
                (jnp.arange(4) == 1) & contact & ~lost
            )

        simf, tel = self._standing_loop(400, fault)
        states = tel["leg_state"]
        assert (states[150:300, 1] == fsm_mod.STANCE_LOST).all()
        assert (states[:, [0, 2, 3]] == fsm_mod.STANCE_NORMAL).all()
        # frozen joints stay near the capture posture during the fault
        q_entry = tel["q"][100, 1]
        drift = np.abs(tel["q"][100:300, 1] - q_entry).max()
        assert drift < 0.15, drift
        # base survives on 3 legs and recovers after the fault clears
        bp = tel["base"]
        assert np.isfinite(bp).all()
        assert (bp[:, 2] > 0.3).all()
        assert (states[350:, 1] == fsm_mod.STANCE_NORMAL).all()

    def test_intermittent_contact_is_damped_by_memory(self):
        """A flickering contact sensor (1-tick dropouts) in the
        mid-stance hold region (st ∈ [0.1, 0.5], :1126-1137 assigns
        nothing) must not unload the leg: the previous StanceNormal is
        held, never Lost."""
        def fault(i, contact):
            flicker = (i >= 10) & ((i % 50) == 0)
            return contact & ~((jnp.arange(4) == 2) & flicker)

        _, tel = self._standing_loop(200, fault, st_phase=0.3)
        states = tel["leg_state"]
        assert (states[:, 2] != fsm_mod.STANCE_LOST).all()
        assert (states[:, 2] == fsm_mod.STANCE_NORMAL).all()


def test_bump_reflex_retracts_foot():
    """Obstacle bump mid-swing: reference overrides the swing target back
    and up from the measured foot position (:313-330)."""
    fsm = _stance_fsm()
    fsm, out = _step(fsm, [False] * 4, [True] * 4, [0.3] * 4, [0.0] * 4)
    assert (np.asarray(out.leg_state) == fsm_mod.SWING_BUMPED).all()
    pos_ref = jnp.tile(jnp.array([0.5, 0.1, 0.02]), (4, 1))
    feet = jnp.tile(jnp.array([0.45, 0.1, 0.04]), (4, 1))
    vel_ref = jnp.ones((4, 3))
    pos, vel, acc = apply_swing_reflexes(
        pos_ref, vel_ref, jnp.ones((4, 3)), feet, out
    )
    assert (np.asarray(pos[:, 0]) < 0.45).all()  # back
    assert (np.asarray(pos[:, 2]) > 0.04).all()  # up
    assert (np.asarray(vel) == 0).all()
    assert (np.asarray(acc) == 0).all()
