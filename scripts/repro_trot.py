"""Repro: closed-loop trot, jit vs eager, selectable platform.

Usage: python scripts/repro_trot.py [cpu|axon] [steps]
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

platform = sys.argv[1] if len(sys.argv) > 1 else "cpu"
steps = int(sys.argv[2]) if len(sys.argv) > 2 else 200

os.environ["JAX_PLATFORMS"] = platform
import jax

jax.config.update("jax_platforms", platform)
import jax.numpy as jnp

from quadruped_locomotion_tpu.control.locomotion import ControllerParams
from quadruped_locomotion_tpu.gait.phase import GaitParams
from quadruped_locomotion_tpu.rollout import closed_loop as cl
from quadruped_locomotion_tpu.types import RobotModel

print("backend:", jax.default_backend(), jax.devices())

model = RobotModel.simpledog()
params = ControllerParams.defaults()
gait_params = GaitParams.trot_defaults()
ls0 = cl.init_locomotion(model, gait_params)
cmd = cl.Command.zero()
cmd = cmd.replace(linear_velocity=jnp.array([0.2, 0.0, 0.0]))


def run(jitted: bool):
    ls = ls0
    tick = cl.planner_tick
    if jitted:
        tick = jax.jit(tick, static_argnames=("qp_iters",))
    heights, kkts = [], []
    for i in range(steps):
        ls, kkt = tick(model, params, gait_params, ls, cmd)
        if i % 20 == 0 or i == steps - 1:
            h = float(ls.sim.robot.base.position[2])
            qn = float(jnp.linalg.norm(ls.sim.robot.qd))
            print(
                f"  [{'jit' if jitted else 'eager'}] t={i*0.01:5.2f}s "
                f"h={h:7.4f} |qd|={qn:9.3f} kkt={float(kkt):.2e} "
                f"pos={ls.sim.robot.base.position[:2]}"
            )
        heights.append(float(ls.sim.robot.base.position[2]))
        if not jnp.isfinite(ls.sim.robot.base.position).all():
            print("  DIVERGED (nan) at step", i)
            break
    return ls


print("=== jit ===")
ls_j = run(True)

if "--eager" in sys.argv:
    # Opt-in only: the eager loop re-traces closure-bound scan bodies
    # every tick and is extremely slow (see .claude/skills/verify).
    print("=== eager ===")
    ls_e = run(False)
    d = jnp.linalg.norm(
        ls_e.sim.robot.base.position - ls_j.sim.robot.base.position
    )
    print("final base pos diff eager-vs-jit:", float(d))
