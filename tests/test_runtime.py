"""Runtime layer tests: native shm ring, HAL, controller manager.

≙ the reference's ros_control/EtherCAT runtime (SURVEY.md §2.6):
RobotStateInterface handle traffic, BalanceControllerManager's
read→update→write loop, controller switching, e-stop.
"""

import multiprocessing as mp

import numpy as np
import pytest

from quadruped_locomotion_tpu.runtime import hal as halmod
from quadruped_locomotion_tpu.runtime import manager as mgr
from quadruped_locomotion_tpu.types import RobotModel

MODEL = RobotModel.simpledog()


# --------------------------------------------------------------------------
# native shared-memory ring
# --------------------------------------------------------------------------


def test_shm_ring_push_pop_latest():
    from quadruped_locomotion_tpu.runtime.shm import ShmRing

    name = "/qlt_test_basic"
    ring = ShmRing.create(name, slot_floats=8, n_slots=4)
    try:
        assert ring.pop_latest(8) is None
        for i in range(10):  # wraps the 4-slot ring
            ring.push(np.full(8, i, np.float32))
        idx, vec = ring.pop_latest(8)
        assert idx == 9
        np.testing.assert_array_equal(vec, np.full(8, 9, np.float32))
        # read_at: recent slots available, lapped slots rejected
        assert ring.read_at(9, 8) is not None
        assert ring.read_at(2, 8) is None
        assert ring.head == 10
    finally:
        ring.close()
        ShmRing.unlink(name)


def _writer_proc(name, count):
    from quadruped_locomotion_tpu.runtime.shm import ShmRing

    ring = ShmRing.open(name)
    for i in range(count):
        ring.push(np.full(4, i, np.float32))
    ring.close()


def test_shm_ring_cross_process():
    from quadruped_locomotion_tpu.runtime.shm import ShmRing

    name = "/qlt_test_xproc"
    ring = ShmRing.create(name, slot_floats=4, n_slots=16)
    try:
        ctx = mp.get_context("spawn")
        p = ctx.Process(target=_writer_proc, args=(name, 500))
        p.start()
        p.join(timeout=60)
        assert p.exitcode == 0
        idx, vec = ring.pop_latest(4)
        assert idx == 499
        np.testing.assert_array_equal(vec, np.full(4, 499, np.float32))
    finally:
        ring.close()
        ShmRing.unlink(name)


def test_sample_pack_round_trip():
    s = halmod.RobotSample(
        base_position=np.array([1.0, 2, 3], np.float32),
        base_quaternion=np.array([1.0, 0, 0, 0], np.float32),
        base_linear_velocity=np.zeros(3, np.float32),
        base_angular_velocity=np.ones(3, np.float32),
        q=np.arange(12, dtype=np.float32).reshape(4, 3),
        qd=np.zeros((4, 3), np.float32),
        tau=np.ones((4, 3), np.float32),
        contacts=np.array([True, False, True, True]),
        estop=False,
        time=1.25,
    )
    back = halmod.RobotSample.unpack(s.pack())
    np.testing.assert_array_equal(back.q, s.q)
    np.testing.assert_array_equal(back.contacts, s.contacts)
    assert back.time == 1.25 and back.estop is False


# --------------------------------------------------------------------------
# controller manager against the sim HAL
# --------------------------------------------------------------------------


def _manager(height=0.4):
    hw = halmod.SimHardware(MODEL, height=height)
    m = mgr.ControllerManager(hw, MODEL)
    m.register(mgr.BalanceStandController(MODEL))
    m.register(mgr.FreezeController(MODEL))
    m.register(mgr.JointTorqueController())
    m.register(mgr.SingleLegController(MODEL, legs=(0,)))
    return m


def test_balance_stand_holds_height():
    m = _manager(height=0.4)
    m.switch("base_balance_controller")
    m.run(400)  # 1 s at 400 Hz
    s = m.hw.read()
    assert abs(s.base_position[2] - 0.4) < 0.02
    assert np.linalg.norm(s.base_linear_velocity) < 0.2
    assert np.isfinite(s.q).all()


def test_switch_and_estop():
    m = _manager()
    m.switch("base_balance_controller")
    m.run(40)
    m.switch("freeze_controller")  # re-inits from current state
    m.run(40)
    m.estop()
    m.run(10)
    # e-stop: commanded torques are zero → free-ish fall begins
    assert m.estopped
    s = m.hw.read()
    assert s.estop


def test_failed_update_keeps_previous_torques():
    m = _manager()
    m.switch("base_balance_controller")
    m.run(20)
    prev = m._last_tau.copy()

    class Broken(mgr.Controller):
        name = "broken"

        def update(self, sample):
            raise RuntimeError("boom")

    m.register(Broken())
    m.active = m.controllers["broken"]
    m.tick()
    np.testing.assert_array_equal(m._last_tau, prev)


def test_joint_torque_forwarding():
    m = _manager()
    jt = m.controllers["joint_torque_controller"]
    jt.command = np.full((4, 3), 5.0, np.float32)
    m.switch("joint_torque_controller")
    m.tick()
    np.testing.assert_allclose(m._last_tau, 5.0)
