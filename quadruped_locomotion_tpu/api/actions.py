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

Schema (compatible in spirit with ``my_actions/motion_scripts``):

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
                orientation: [0.0, 0.0, 0.4]   # rpy, radians
"""

from __future__ import annotations

import numpy as np
import yaml

from ..gait.footstep import (
    DEFAULT_AVERAGE_VELOCITY,
    DEFAULT_PROFILE_HEIGHT,
    PROFILE_SQUARE,
    PROFILE_STRAIGHT,
    PROFILE_TRAPEZOID,
    PROFILE_TRIANGLE,
)
from ..planning.steps import (
    BASE_AUTO,
    BASE_NONE,
    BASE_TARGET,
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

    def orientation(self, rpy, frame):
        q = _rpy_to_quat(np.asarray(rpy, np.float64))
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
    S = len(steps)

    leg_active = np.zeros((S, 4), bool)
    leg_target = np.zeros((S, 4, 3), np.float64)
    leg_profile = np.full((S, 4), PROFILE_TRIANGLE, np.int32)
    leg_ph = np.full((S, 4), DEFAULT_PROFILE_HEIGHT, np.float64)
    leg_av = np.full((S, 4), DEFAULT_AVERAGE_VELOCITY, np.float64)
    base_mode = np.full((S,), BASE_NONE, np.int32)
    base_height = np.full((S,), 0.4, np.float64)
    base_tp = np.zeros((S, 3), np.float64)
    base_tq = np.tile(np.array([1.0, 0, 0, 0]), (S, 1))
    base_al = np.full((S,), 0.2, np.float64)
    base_aa = np.full((S,), 0.28, np.float64)

    for si, entry in enumerate(steps):
        motions = entry.get("step", entry if isinstance(entry, list) else [])
        for m in motions:
            if "footstep" in m:
                fs = m["footstep"]
                leg = LEG_NAMES[fs["name"]]
                tgt = fs.get("target", {})
                frame = tgt.get("frame", default_frame)
                leg_active[si, leg] = True
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
            elif "base_auto" in m:
                ba = m["base_auto"] or {}
                base_mode[si] = BASE_AUTO
                base_height[si] = ba.get("height", 0.4)
                base_al[si] = ba.get("average_linear_velocity", 0.2)
                base_aa[si] = ba.get("average_angular_velocity", 0.28)
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

    f = lambda x: jnp.asarray(x, dtype)
    return StepSchedule(
        leg_active=jnp.asarray(leg_active),
        leg_target=f(leg_target),
        leg_profile=jnp.asarray(leg_profile),
        leg_profile_height=f(leg_ph),
        leg_avg_velocity=f(leg_av),
        base_mode=jnp.asarray(base_mode),
        base_height=f(base_height),
        base_target_pos=f(base_tp),
        base_target_quat=f(base_tq),
        base_avg_lin=f(base_al),
        base_avg_ang=f(base_aa),
    )
