"""YAML motion-script DSL → StepSchedule.

≙ the reference's action pipeline (``free_gait_python/src/free_gait/
free_gait.py:19-110`` parsing + ``free_gait_action_loader`` execution):
YAML motion scripts describe a list of steps, each combining per-leg
``footstep`` motions with a ``base_auto`` / ``base_target`` motion, in a
named source frame that is adapted to the world at load time
(``adapt_coordinates``, ``free_gait.py:401-460``).

The script is host-side Python (runs once, before jit); the result is a
fixed-shape :class:`~..planning.steps.StepSchedule` consumed by the scan
executor.

Schema (compatible with ``my_actions/motion_scripts``):

.. code-block:: yaml

    adapt_coordinates:
      - transform: {source_frame: foot_print}
    steps:
      - step:
          - base_auto: {height: 0.4}
          - footstep:
              name: LF_LEG
              profile_type: triangle
              profile_height: 0.10
              average_velocity: 0.15
              target: {position: [0.5, 0.25, 0.0]}
      - step:
          - base_target:
              average_linear_velocity: 0.1
              average_angular_velocity: 0.2
              target:
                position: [0.01, 0.0, 0.0]
                orientation: [0.0, 0.0, 0.4]   # rpy radians, or xyzw quat
      - step:
          - end_effector_target:
              name: LF_LEG
              ignore_contact: true
              ignore_for_pose_adaptation: true
              target_position: {frame: foot_print, position: [0.4, 0.25, 0.2]}
          - joint_trajectory:
              name: RH_LEG
              trajectory:
                knots:
                  - {time: 0.5, positions: [0, 1.57, -3.14]}
                  - {time: 1.5, positions: [0, 4.54, -3.53]}
          - leg_mode:
              name: LH_LEG
              support_leg: true
              surface_normal: [0, 0, 1]
      - step:
          - base_trajectory:
              trajectory:
                knots:
                  - {time: 1.0, position: [0.0, 0.0, 0.35],
                     orientation: [0, 0, 0.2]}
          - custom_command: {duration: 1.0, command: "whatever"}

Orientations accept 3 numbers (roll-pitch-yaw, radians) or 4 (an
``xyzw`` quaternion, the reference's geometry_msgs convention).
"""

from __future__ import annotations

import numpy as np
import yaml

from ..gait.footstep import (
    DEFAULT_AVERAGE_VELOCITY,
    DEFAULT_MIN_DURATION,
    DEFAULT_PROFILE_HEIGHT,
    PROFILE_SQUARE,
    PROFILE_STRAIGHT,
    PROFILE_TRAPEZOID,
    PROFILE_TRIANGLE,
)
from ..gait.spline import MAX_KNOTS
from ..planning.steps import (
    BASE_AUTO,
    BASE_NONE,
    BASE_TARGET,
    BASE_TRAJECTORY,
    DEFAULT_LEG_MODE_DURATION,
    LEG_EE_TARGET,
    LEG_EE_TRAJ,
    LEG_FOOTSTEP,
    LEG_JOINT_TRAJ,
    LEG_MODE,
    LEG_NONE,
    StepSchedule,
)

import jax.numpy as jnp

LEG_NAMES = {"LF_LEG": 0, "RF_LEG": 1, "RH_LEG": 2, "LH_LEG": 3}
PROFILES = {
    "triangle": PROFILE_TRIANGLE,
    "square": PROFILE_SQUARE,
    "straight": PROFILE_STRAIGHT,
    "trapezoid": PROFILE_TRAPEZOID,
}


def _rpy_to_quat(rpy):
    r, p, y = [0.5 * v for v in rpy]
    cr, sr, cp, spp, cy, sy = (
        np.cos(r), np.sin(r), np.cos(p), np.sin(p), np.cos(y), np.sin(y),
    )
    return np.array(
        [
            cr * cp * cy + sr * spp * sy,
            sr * cp * cy - cr * spp * sy,
            cr * spp * cy + sr * cp * sy,
            cr * cp * sy - sr * spp * cy,
        ]
    )


def _quat_mul(a, b):
    w1, x1, y1, z1 = a
    w2, x2, y2, z2 = b
    return np.array(
        [
            w1 * w2 - x1 * x2 - y1 * y2 - z1 * z2,
            w1 * x2 + x1 * w2 + y1 * z2 - z1 * y2,
            w1 * y2 - x1 * z2 + y1 * w2 + z1 * x2,
            w1 * z2 + x1 * y2 - y1 * x2 + z1 * w2,
        ]
    )


def _parse_orientation(o):
    """3 numbers → RPY radians; 4 numbers → xyzw quaternion (the
    reference's geometry_msgs convention). Returns wxyz."""
    o = np.asarray(o, np.float64)
    if o.shape == (4,):
        x, y, z, w = o
        q = np.array([w, x, y, z])
        return q / np.linalg.norm(q)
    return _rpy_to_quat(o)


def _quat_rotate(q, v):
    w, x, y, z = q
    u = np.array([x, y, z])
    return v + 2.0 * np.cross(u, np.cross(u, v) + w * v)


class FrameAdapter:
    """Resolves script-frame coordinates to world at load time
    (≙ adapt_coordinates; frames: odom/world, foot_print, base_link)."""

    def __init__(self, base_pos, base_quat, feet_world):
        self.base_pos = np.asarray(base_pos, np.float64)
        self.base_quat = np.asarray(base_quat, np.float64)
        feet = np.asarray(feet_world, np.float64)
        center = feet.mean(axis=0)
        # footprint frame: yaw of the base, origin at the foot centroid
        w, x, y, z = self.base_quat
        yaw = np.arctan2(2 * (w * z + x * y), 1 - 2 * (y * y + z * z))
        self.fp_origin = np.array([center[0], center[1], feet[:, 2].mean()])
        self.fp_quat = np.array(
            [np.cos(yaw / 2), 0.0, 0.0, np.sin(yaw / 2)]
        )

    def position(self, p, frame):
        p = np.asarray(p, np.float64)
        if frame in ("odom", "world", None):
            return p
        if frame == "foot_print":
            return self.fp_origin + _quat_rotate(self.fp_quat, p)
        if frame == "base_link":
            return self.base_pos + _quat_rotate(self.base_quat, p)
        raise ValueError(f"unknown frame {frame!r}")

    def orientation(self, o, frame):
        q = _parse_orientation(o)
        if frame in ("odom", "world", None):
            return q
        if frame == "foot_print":
            return _quat_mul(self.fp_quat, q)
        if frame == "base_link":
            return _quat_mul(self.base_quat, q)
        raise ValueError(f"unknown frame {frame!r}")


def load_action(
    source: str,
    base_pos,
    base_quat,
    feet_world,
    dtype=jnp.float32,
) -> StepSchedule:
    """Parse a YAML motion script (path or inline string) into a
    StepSchedule, resolving frames against the given robot state."""
    if "\n" not in source and source.endswith((".yaml", ".yml")):
        with open(source) as f:
            doc = yaml.safe_load(f)
    else:
        doc = yaml.safe_load(source)
    return build_schedule(doc, base_pos, base_quat, feet_world, dtype)


def build_schedule(
    doc: dict,
    base_pos,
    base_quat,
    feet_world,
    dtype=jnp.float32,
) -> StepSchedule:
    """Compile a parsed motion-script document (the YAML schema, as a
    dict — also produced by :mod:`.messages` goals) to a StepSchedule."""
    default_frame = None
    for tr in doc.get("adapt_coordinates", []) or []:
        t = tr.get("transform", {})
        default_frame = t.get("source_frame", default_frame)

    adapter = FrameAdapter(base_pos, base_quat, feet_world)
    steps = doc["steps"]
    S, K = len(steps), MAX_KNOTS

    leg_type = np.full((S, 4), LEG_NONE, np.int32)
    leg_target = np.zeros((S, 4, 3), np.float64)
    leg_profile = np.full((S, 4), PROFILE_TRIANGLE, np.int32)
    leg_ph = np.full((S, 4), DEFAULT_PROFILE_HEIGHT, np.float64)
    leg_av = np.full((S, 4), DEFAULT_AVERAGE_VELOCITY, np.float64)
    leg_ic = np.zeros((S, 4), bool)
    leg_ipa = np.zeros((S, 4), bool)
    leg_sup = np.ones((S, 4), bool)
    leg_norm = np.tile(np.array([0.0, 0.0, 1.0]), (S, 4, 1))
    leg_md = np.full((S, 4), DEFAULT_LEG_MODE_DURATION, np.float64)
    jt_t = np.zeros((S, 4, K), np.float64)
    jt_p = np.zeros((S, 4, K, 3), np.float64)
    jt_n = np.full((S, 4), 2, np.int32)
    base_mode = np.full((S,), BASE_NONE, np.int32)
    base_height = np.full((S,), 0.4, np.float64)
    base_tp = np.zeros((S, 3), np.float64)
    base_tq = np.tile(np.array([1.0, 0, 0, 0]), (S, 1))
    base_al = np.full((S,), 0.2, np.float64)
    base_aa = np.full((S,), 0.28, np.float64)
    base_it = np.zeros((S,), bool)
    base_margin = np.full((S,), 0.04, np.float64)
    bk_t = np.zeros((S, K), np.float64)
    bk_p = np.zeros((S, K, 3), np.float64)
    bk_q = np.tile(np.array([1.0, 0, 0, 0]), (S, K, 1))
    bk_n = np.full((S,), 2, np.int32)
    min_dur = np.full((S,), DEFAULT_MIN_DURATION, np.float64)

    def leg_common(si, leg, spec):
        leg_ic[si, leg] = bool(spec.get("ignore_contact", False))
        leg_ipa[si, leg] = bool(
            spec.get("ignore_for_pose_adaptation", False)
        )
        # target surface normal (all leg-motion msgs carry one)
        if spec.get("surface_normal") is not None:
            leg_norm[si, leg] = spec["surface_normal"]

    for si, entry in enumerate(steps):
        motions = entry.get("step", entry if isinstance(entry, list) else [])
        for m in motions:
            if "footstep" in m:
                fs = m["footstep"]
                leg = LEG_NAMES[fs["name"]]
                tgt = fs.get("target", {})
                frame = tgt.get("frame", default_frame)
                leg_type[si, leg] = LEG_FOOTSTEP
                leg_target[si, leg] = adapter.position(
                    tgt.get("position", [0, 0, 0]), frame
                )
                leg_profile[si, leg] = PROFILES.get(
                    str(fs.get("profile_type", "triangle")), PROFILE_TRIANGLE
                )
                leg_ph[si, leg] = fs.get(
                    "profile_height", DEFAULT_PROFILE_HEIGHT
                )
                leg_av[si, leg] = fs.get(
                    "average_velocity", DEFAULT_AVERAGE_VELOCITY
                )
                leg_common(si, leg, fs)
            elif "end_effector_target" in m:
                et = m["end_effector_target"]
                leg = LEG_NAMES[et["name"]]
                tgt = et.get("target_position", et.get("target", {}))
                frame = tgt.get("frame", default_frame)
                leg_type[si, leg] = LEG_EE_TARGET
                leg_target[si, leg] = adapter.position(
                    tgt.get("position", [0, 0, 0]), frame
                )
                leg_profile[si, leg] = PROFILE_STRAIGHT
                leg_av[si, leg] = et.get(
                    "average_velocity", DEFAULT_AVERAGE_VELOCITY
                )
                leg_common(si, leg, et)
            elif "end_effector_trajectory" in m:
                et = m["end_effector_trajectory"]
                leg = LEG_NAMES[et["name"]]
                knots = et.get("trajectory", {}).get("knots", [])
                if not 1 <= len(knots) <= K - 1:
                    raise ValueError(
                        f"end_effector_trajectory needs 1..{K - 1} knots, "
                        f"got {len(knots)}"
                    )
                frame = et.get("frame", default_frame)
                leg_type[si, leg] = LEG_EE_TRAJ
                jt_n[si, leg] = len(knots)
                for ki, kn in enumerate(knots):
                    jt_t[si, leg, ki] = kn["time"]
                    jt_p[si, leg, ki] = adapter.position(
                        kn.get("position", [0, 0, 0]), frame
                    )
                for ki in range(len(knots), K):
                    jt_t[si, leg, ki] = jt_t[si, leg, len(knots) - 1]
                    jt_p[si, leg, ki] = jt_p[si, leg, len(knots) - 1]
                # final stance foothold = last knot
                leg_target[si, leg] = jt_p[si, leg, len(knots) - 1]
                leg_common(si, leg, et)
            elif "joint_trajectory" in m:
                jt = m["joint_trajectory"]
                leg = LEG_NAMES[jt["name"]]
                knots = jt.get("trajectory", {}).get("knots", [])
                if not 1 <= len(knots) <= K - 1:
                    raise ValueError(
                        f"joint_trajectory needs 1..{K - 1} knots, "
                        f"got {len(knots)}"
                    )
                leg_type[si, leg] = LEG_JOINT_TRAJ
                jt_n[si, leg] = len(knots)
                for ki, kn in enumerate(knots):
                    jt_t[si, leg, ki] = kn["time"]
                    jt_p[si, leg, ki] = kn["positions"]
                # pad by repeating the last knot (mask-safe)
                for ki in range(len(knots), K):
                    jt_t[si, leg, ki] = jt_t[si, leg, len(knots) - 1]
                    jt_p[si, leg, ki] = jt_p[si, leg, len(knots) - 1]
                leg_common(si, leg, jt)
            elif "leg_mode" in m:
                lm = m["leg_mode"]
                leg = LEG_NAMES[lm["name"]]
                leg_type[si, leg] = LEG_MODE
                leg_sup[si, leg] = bool(lm.get("support_leg", True))
                leg_norm[si, leg] = lm.get("surface_normal", [0, 0, 1])
                leg_md[si, leg] = lm.get(
                    "duration", DEFAULT_LEG_MODE_DURATION
                )
                leg_common(si, leg, lm)
            elif "base_auto" in m:
                ba = m["base_auto"] or {}
                base_mode[si] = BASE_AUTO
                base_height[si] = ba.get("height", 0.4)
                base_al[si] = ba.get("average_linear_velocity", 0.2)
                base_aa[si] = ba.get("average_angular_velocity", 0.28)
                base_it[si] = bool(
                    ba.get("ignore_timing_of_leg_motion", False)
                )
                # Copied verbatim including an explicit 0.0 — the
                # reference honors zero margin (StepRosConverter.cpp:348
                # copies the value; BaseAuto.cpp uses it directly and its
                # tests send 0.0) despite the msg comment saying 0 means
                # "use default". Default applies only when absent.
                base_margin[si] = ba.get("support_margin", 0.04)
            elif "base_target" in m:
                bt = m["base_target"]
                tgt = bt.get("target", {})
                frame = tgt.get("frame", default_frame)
                base_mode[si] = BASE_TARGET
                base_tp[si] = adapter.position(
                    tgt.get("position", [0, 0, 0]), frame
                )
                base_tq[si] = adapter.orientation(
                    tgt.get("orientation", [0, 0, 0]), frame
                )
                base_al[si] = bt.get("average_linear_velocity", 0.2)
                base_aa[si] = bt.get("average_angular_velocity", 0.28)
                base_it[si] = bool(
                    bt.get("ignore_timing_of_leg_motion", False)
                )
            elif "base_trajectory" in m:
                btr = m["base_trajectory"]
                knots = btr.get("trajectory", {}).get("knots", [])
                if not 1 <= len(knots) <= K - 1:
                    raise ValueError(
                        f"base_trajectory needs 1..{K - 1} knots, "
                        f"got {len(knots)}"
                    )
                frame = btr.get("frame", default_frame)
                base_mode[si] = BASE_TRAJECTORY
                bk_n[si] = len(knots)
                for ki, kn in enumerate(knots):
                    bk_t[si, ki] = kn["time"]
                    bk_p[si, ki] = adapter.position(
                        kn.get("position", [0, 0, 0]), frame
                    )
                    bk_q[si, ki] = adapter.orientation(
                        kn.get("orientation", [0, 0, 0]), frame
                    )
                for ki in range(len(knots), K):
                    bk_t[si, ki] = bk_t[si, len(knots) - 1]
                    bk_p[si, ki] = bk_p[si, len(knots) - 1]
                    bk_q[si, ki] = bk_q[si, len(knots) - 1]
            elif "custom_command" in m:
                # ≙ CustomCommand (Step.cpp): opaque adapter commands;
                # here it holds the current stance for `duration`.
                cc = m["custom_command"] or {}
                min_dur[si] = max(
                    min_dur[si], float(cc.get("duration", 1.0))
                )

    f = lambda x: jnp.asarray(x, dtype)
    return StepSchedule(
        leg_motion_type=jnp.asarray(leg_type),
        leg_target=f(leg_target),
        leg_profile=jnp.asarray(leg_profile),
        leg_profile_height=f(leg_ph),
        leg_avg_velocity=f(leg_av),
        leg_ignore_contact=jnp.asarray(leg_ic),
        leg_ignore_pose_adapt=jnp.asarray(leg_ipa),
        leg_support_flag=jnp.asarray(leg_sup),
        leg_surface_normal=f(leg_norm),
        leg_mode_duration=f(leg_md),
        knot_times=f(jt_t),
        knot_values=f(jt_p),
        knot_n=jnp.asarray(jt_n),
        base_mode=jnp.asarray(base_mode),
        base_height=f(base_height),
        base_target_pos=f(base_tp),
        base_target_quat=f(base_tq),
        base_avg_lin=f(base_al),
        base_avg_ang=f(base_aa),
        base_ignore_timing=jnp.asarray(base_it),
        base_margin=f(base_margin),
        base_knot_times=f(bk_t),
        base_knot_pos=f(bk_p),
        base_knot_quat=f(bk_q),
        base_nknots=jnp.asarray(bk_n),
        min_duration=f(min_dur),
    )
