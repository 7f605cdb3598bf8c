"""Command-line operator console.

≙ the reference's human-facing tooling (SURVEY.md §2.7): the rqt action
GUI (list collections, send actions), rqt monitor (goal progress), the
control panel's trot/pace switches (`/gait_generate_switch`,
`/pace_switch` services, ``rqt_control_panel_plugin_widget.cpp:17-250``)
and the action-loader services — regrouped as subcommands of
``python -m quadruped_locomotion_tpu``:

    list-actions [--collection ID]     ≙ list_actions srv / rqt list
    list-collections                   ≙ list_collections srv
    preview ACTION [--ticks N] [--out f.npz]   ≙ preview_action + RViz preview
    run ACTION [--ticks N]             ≙ send_action → full closed loop
    run-collection ID                  ≙ send_action_sequence
    trot --vx 0.2 --seconds 4          ≙ /gait_generate_switch + /cmd_vel
    pace --vx 0.2 --seconds 4          ≙ /pace_switch + /cmd_vel
    update                             ≙ update srv (re-scan registry)

Everything runs jitted; on a machine with the TPU plugin the compute
lands on the chip, otherwise CPU.
"""

from __future__ import annotations

import argparse
import json
import sys

import numpy as np


def _registry(args):
    from .action_loader import ActionRegistry, default_registry

    if getattr(args, "root", None):
        return ActionRegistry(args.root)
    return default_registry()


def _model_and_state(height=0.38):
    from ..rollout import simulator as simlib
    from ..types import RobotModel

    model = RobotModel.simpledog()
    sim = simlib.default_stance_state(model, height=height)
    return model, sim


def cmd_list_actions(args) -> int:
    reg = _registry(args)
    for a in reg.list_actions(args.collection):
        print(f"{a.id:>8}  {a.name:<28} {a.description}")
    return 0


def cmd_list_collections(args) -> int:
    reg = _registry(args)
    for c in reg.list_collections():
        seq = "sequence" if c.is_sequence else "set"
        print(f"{c.id:>8}  {c.name:<28} [{seq}] actions={list(c.action_ids)}")
    return 0


def cmd_preview(args) -> int:
    import jax

    from ..rollout import preview as pv

    reg = _registry(args)
    model, sim = _model_and_state(args.height)
    sched = reg.compile(
        args.action,
        sim.robot.base.position,
        sim.robot.base.quaternion,
        sim.feet_world,
    )
    ticks = args.ticks or int(sched.num_steps * 4.0 / 0.01)
    batch = jax.jit(
        lambda: pv.batch_preview(
            model,
            sched,
            sim.feet_world,
            sim.robot.base.position,
            sim.robot.base.quaternion,
            ticks,
        )
    )()
    done = bool(batch.done[-1])
    print(
        json.dumps(
            {
                "action": args.action,
                "ticks": ticks,
                "completed": done,
                "final_base": np.asarray(batch.base_position[-1]).tolist(),
                "final_feet": np.asarray(batch.feet_world[-1]).tolist(),
            }
        )
    )
    if getattr(args, "plot", None):
        from ..viz import plot_preview

        plot_preview(batch, args.plot, title=f"preview: {args.action}")
        print(f"preview plot saved to {args.plot}", file=sys.stderr)
    if args.out:
        np.savez(
            args.out,
            **{
                k: np.asarray(getattr(batch, k))
                for k in (
                    "times",
                    "base_position",
                    "base_quaternion",
                    "joint_positions",
                    "feet_world",
                    "support",
                    "step_index",
                )
            },
        )
        print(f"state batch saved to {args.out}", file=sys.stderr)
    return 0 if done else 1


def _run_schedule(model, sim, sched, ticks, qp_iters=15):
    import jax

    from ..control.locomotion import ControllerParams
    from ..planning import steps as steps_mod
    from ..rollout import script_loop as sl

    params = ControllerParams.defaults()
    es = steps_mod.init_exec_state(
        sim.feet_world, sim.robot.base.position, sim.robot.base.quaternion
    )
    import jax.numpy as jnp

    from ..control.contact_fsm import init_fsm_state

    ss0 = sl.ScriptState(
        sim=sim,
        exec=es,
        fsm=init_fsm_state(sim.feet_world.dtype),
        joint_i=jnp.zeros((4, 3), sim.feet_world.dtype),
    )
    ssf, tel = jax.jit(
        lambda ss: sl.run_schedule(
            model, params, sched, ss, ticks, qp_iters=qp_iters
        )
    )(ss0)
    return ssf, tel


def cmd_run(args) -> int:
    reg = _registry(args)
    model, sim = _model_and_state(args.height)
    sched = reg.compile(
        args.action,
        sim.robot.base.position,
        sim.robot.base.quaternion,
        sim.feet_world,
    )
    ticks = args.ticks or int(sched.num_steps * 4.0 / 0.01)
    ssf, tel = _run_schedule(model, sim, sched, ticks)
    if getattr(args, "plot", None):
        from ..viz import plot_telemetry

        plot_telemetry(tel, args.plot, title=f"run: {args.action}")
        print(f"telemetry plot saved to {args.plot}", file=sys.stderr)
    done = bool(np.asarray(tel["done"])[-1])
    print(
        json.dumps(
            {
                "action": args.action,
                "ticks": ticks,
                "completed": done,
                "final_base": np.asarray(
                    ssf.sim.robot.base.position
                ).tolist(),
                "max_qp_kkt": float(np.max(np.asarray(tel["qp_kkt"]))),
            }
        )
    )
    return 0 if done else 1


def cmd_run_collection(args) -> int:
    reg = _registry(args)
    model, sim = _model_and_state(args.height)
    for aid in reg.collections[args.collection].action_ids:
        sched = reg.compile(
            aid,
            sim.robot.base.position,
            sim.robot.base.quaternion,
            sim.feet_world,
        )
        ticks = int(sched.num_steps * 4.0 / 0.01)
        ssf, tel = _run_schedule(model, sim, sched, ticks)
        sim = ssf.sim
        print(
            f"action {aid}: done={bool(np.asarray(tel['done'])[-1])} "
            f"base={np.asarray(sim.robot.base.position).round(3).tolist()}",
            file=sys.stderr,
        )
    print(json.dumps({"collection": args.collection, "completed": True}))
    return 0


def _gait(args, pace: bool) -> int:
    import jax
    import jax.numpy as jnp

    from ..control.locomotion import ControllerParams
    from ..gait.phase import GaitParams
    from ..rollout import closed_loop as cl
    from ..types import RobotModel

    model = RobotModel.simpledog()
    params = ControllerParams.defaults()
    gp = (
        GaitParams.pace_defaults() if pace else GaitParams.trot_defaults()
    )
    ls0 = cl.init_locomotion(model, gp)
    cmd = cl.Command(
        linear_velocity=jnp.array([args.vx, args.vy, 0.0], jnp.float32),
        yaw_rate=jnp.asarray(args.wz, jnp.float32),
    )
    ticks = int(args.seconds / 0.01)
    lsf, tel = jax.jit(
        lambda ls: cl.rollout(model, params, gp, ls, cmd, ticks)
    )(ls0)
    base = np.asarray(tel["base_position"])
    if getattr(args, "plot", None):
        from ..viz import plot_telemetry

        plot_telemetry(
            tel, args.plot,
            title=f"{'pace' if pace else 'trot'} vx={args.vx}",
        )
        print(f"telemetry plot saved to {args.plot}", file=sys.stderr)
    out = {
        "gait": "pace" if pace else "trot",
        "seconds": args.seconds,
        "cmd": [args.vx, args.vy, args.wz],
        "distance": float(np.linalg.norm(base[-1, :2] - base[0, :2])),
        "mean_speed": float(
            np.linalg.norm(base[-1, :2] - base[0, :2]) / args.seconds
        ),
        "final_height": float(base[-1, 2]),
        "nan": bool(np.isnan(base).any()),
    }
    print(json.dumps(out))
    return 1 if out["nan"] else 0


def cmd_trot(args) -> int:
    return _gait(args, pace=False)


def cmd_pace(args) -> int:
    return _gait(args, pace=True)


def cmd_edit(args) -> int:
    """Interactive foothold/knot editing over a live action server —
    the headless free_gait_marker (≙ MarkerManager.cpp:87-300). Reads
    edit commands from stdin (or ``--script FILE``); see
    :func:`..api.marker.repl` for the command set."""
    from ..runtime.action_server import FreeGaitActionServer
    from ..types import RobotModel
    from .marker import MarkerSession, repl

    model = RobotModel.simpledog()
    srv = FreeGaitActionServer(model, capacity=16)
    session = MarkerSession(srv, height=args.height)
    print(session.describe())
    if args.script:
        with open(args.script) as f:
            lines = f.readlines()
    else:
        lines = sys.stdin
    repl(session, lines)
    fb = srv.last_feedback
    print(
        json.dumps(
            {
                "goals_sent": session.sent_goals,
                "queue_size": srv.queue_size,
                "done": bool(srv.state.exec.done),
                "final_feet": np.asarray(
                    srv.state.sim.feet_world
                ).tolist(),
                "last_status": None if fb is None else fb.status,
            }
        )
    )
    return 0


def cmd_update(args) -> int:
    reg = _registry(args)
    reg.update()
    print(
        f"registry: {len(reg.actions)} actions, "
        f"{len(reg.collections)} collections"
    )
    return 0


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(
        prog="quadruped_locomotion_tpu",
        description="TPU-native quadruped locomotion console",
    )
    p.add_argument(
        "--root",
        action="append",
        help="action-library root(s); default = bundled motion scripts",
    )
    sub = p.add_subparsers(dest="command", required=True)

    sp = sub.add_parser("list-actions")
    sp.add_argument("--collection", default=None)
    sp.set_defaults(fn=cmd_list_actions)

    sp = sub.add_parser("list-collections")
    sp.set_defaults(fn=cmd_list_collections)

    for name, fn in (("preview", cmd_preview), ("run", cmd_run)):
        sp = sub.add_parser(name)
        sp.add_argument("action")
        sp.add_argument("--ticks", type=int, default=None)
        sp.add_argument("--height", type=float, default=0.38)
        sp.add_argument("--plot", default=None, help="save PNG plot")
        if name == "preview":
            sp.add_argument("--out", default=None, help="save StateBatch .npz")
        sp.set_defaults(fn=fn)

    sp = sub.add_parser("run-collection")
    sp.add_argument("collection")
    sp.add_argument("--height", type=float, default=0.38)
    sp.set_defaults(fn=cmd_run_collection)

    for name, fn in (("trot", cmd_trot), ("pace", cmd_pace)):
        sp = sub.add_parser(name)
        sp.add_argument("--vx", type=float, default=0.2)
        sp.add_argument("--vy", type=float, default=0.0)
        sp.add_argument("--wz", type=float, default=0.0)
        sp.add_argument("--seconds", type=float, default=4.0)
        sp.add_argument("--plot", default=None, help="save PNG plot")
        sp.set_defaults(fn=fn)

    sp = sub.add_parser("edit")
    sp.add_argument("--height", type=float, default=0.4)
    sp.add_argument(
        "--script", default=None,
        help="read edit commands from a file instead of stdin",
    )
    sp.set_defaults(fn=cmd_edit)

    sp = sub.add_parser("update")
    sp.set_defaults(fn=cmd_update)
    return p


def main(argv=None) -> int:
    args = build_parser().parse_args(argv)
    return args.fn(args)


if __name__ == "__main__":
    raise SystemExit(main())
