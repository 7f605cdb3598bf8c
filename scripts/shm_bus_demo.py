"""Two-process robot-bus demo over the native shared-memory rings.

≙ the reference's process split: the EtherCAT/Gazebo bus process
(``balance_controller_manager.cpp``) and the controller — here, a child
process owns the plant (our simulator) and publishes RobotSamples at
400 Hz while the parent process runs the ControllerManager with the
balance controller over :class:`ShmHardware`.

Usage: python scripts/shm_bus_demo.py [ticks]
"""

import multiprocessing as mp
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

PREFIX = "/qlt_demo"


def bus_process(prefix: str, ticks: int):
    """The robot: steps the plant with whatever torques arrive."""
    os.environ["JAX_PLATFORMS"] = "cpu"
    import jax

    jax.config.update("jax_platforms", "cpu")
    import numpy as np

    from quadruped_locomotion_tpu.runtime import hal
    from quadruped_locomotion_tpu.runtime.shm import ShmRing
    from quadruped_locomotion_tpu.types import RobotModel

    state_ring = ShmRing.open(prefix + "_state")
    cmd_ring = ShmRing.open(prefix + "_cmd")
    robot = hal.SimHardware(RobotModel.simpledog(), height=0.4)

    # lockstep: one plant step per fresh command (≙ the Gazebo plugin
    # updating the controller manager each sim step,
    # robot_state_gazebo_ros_control_plugin.cpp:130-160)
    tau = np.zeros((4, 3), np.float32)
    last_cmd = -1
    for _ in range(ticks):
        state_ring.push(robot.read().pack())
        deadline = time.time() + 300
        got = None
        while time.time() < deadline:
            got = cmd_ring.pop_latest(hal.COMMAND_FLOATS)
            if got is not None and got[0] > last_cmd:
                break
            time.sleep(0.0002)
        if got is None or got[0] <= last_cmd:
            break  # controller gone
        last_cmd = got[0]
        tau, _mode, estop = hal.unpack_command(got[1])
        if estop:
            tau = np.zeros((4, 3), np.float32)
        robot.write(tau)
    state_ring.push(robot.read().pack())
    state_ring.close()
    cmd_ring.close()


def main():
    ticks = int(sys.argv[1]) if len(sys.argv) > 1 else 400
    os.environ.setdefault("JAX_PLATFORMS", "cpu")
    import jax

    jax.config.update("jax_platforms", "cpu")

    from quadruped_locomotion_tpu.runtime import hal, manager
    from quadruped_locomotion_tpu.runtime.shm import ShmRing
    from quadruped_locomotion_tpu.types import RobotModel

    hal.ShmHardware.create_rings(PREFIX)
    try:
        ctx = mp.get_context("spawn")
        bus = ctx.Process(target=bus_process, args=(PREFIX, ticks))
        bus.start()

        hw = hal.ShmHardware.connect(PREFIX)
        # wait for first sample
        deadline = time.time() + 120
        while time.time() < deadline:
            try:
                hw.read()
                break
            except TimeoutError:
                time.sleep(0.01)

        model = RobotModel.simpledog()
        m = manager.ControllerManager(hw, model)
        m.register(manager.BalanceStandController(model))
        m.switch("base_balance_controller")
        # track the bus while it lives (it is the clock and exits after
        # `ticks` plant steps)
        while bus.is_alive():
            m.tick()
            if m.ticks > 10 * ticks:
                break

        s = hw.read()
        print(
            f"final: t={s.time:.3f}s height={s.base_position[2]:.4f} "
            f"|v|={float((s.base_linear_velocity**2).sum())**0.5:.4f}"
        )
        bus.join(timeout=60)
        ok = abs(s.base_position[2] - 0.4) < 0.05
        print("OK" if ok else "FAIL")
        return 0 if ok else 1
    finally:
        ShmRing.unlink(PREFIX + "_state")
        ShmRing.unlink(PREFIX + "_cmd")


if __name__ == "__main__":
    raise SystemExit(main())
