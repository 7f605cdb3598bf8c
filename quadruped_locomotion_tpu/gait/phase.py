"""Per-leg swing/stance phase machine (trot & pace).

≙ ``GaitGenerateClient`` phase logic
(``free_gait_ros/test/gait_generate_client.cpp``):
trot init LF+RH swing first, t_sw = t_st = 0.45 s (:82-118); pace init
with ⅓-offset stance phases (:120-154); ``advance(dt)`` timers (:627-680).

State is plain arrays — the whole machine is `where`-masked so it runs
inside `lax.scan` and vmaps over scenario batches.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from flax import struct

TROT = 0
PACE = 1


@struct.dataclass
class GaitParams:
    t_swing: jax.Array  # scalar
    t_stance: jax.Array  # scalar
    height: jax.Array  # nominal base height over footprint
    sigma_st: jax.Array  # (2,) erf widths, stance (0.8, 0.8)
    sigma_sw: jax.Array  # (2,) erf widths, swing (1.0, 1.0)
    # Tracking speed of the smoothed base reference toward the virtual-CoM
    # point (≙ StepParameters BaseAuto average linear velocity 0.2 m/s).
    base_avg_velocity: jax.Array  # scalar
    # Raibert capture-term gain per footprint axis (x, y) and the xy
    # velocity-reference blend (0 = Hermite tracking-spline velocity,
    # 1 = raw commanded velocity). Lateral needs a hotter capture than
    # longitudinal: the trot diagonals are mostly x-aligned, so roll-axis
    # tipping is only recoverable by stepping, not stance torque.
    capture_gain: jax.Array  # (2,)
    vel_cmd_blend: jax.Array  # scalar in [0,1]

    @classmethod
    def trot_defaults(cls, dtype=jnp.float32) -> "GaitParams":
        f = lambda x: jnp.asarray(x, dtype=dtype)
        return cls(
            # The reference trot timing (action_server_test.cpp:183, :243),
            # now the default: the fully-coupled articulated plant
            # (rollout/articulated.py) carries real leg inertia, and the
            # 0.45 s exchange is stable on it with a critically-tuned
            # lateral capture gain of 1.0 — the 2.2 over-capture the old
            # massless plant needed destabilizes the coupled diagonal
            # (roll limit-cycle); see tests/test_closed_loop.py.
            t_swing=f(0.45),
            t_stance=f(0.45),
            height=f(0.4),
            sigma_st=f([0.8, 0.8]),
            sigma_sw=f([1.0, 1.0]),
            base_avg_velocity=f(0.2),
            capture_gain=f([1.0, 1.0]),
            vel_cmd_blend=f(1.0),
        )

    @classmethod
    def pace_defaults(cls, dtype=jnp.float32) -> "GaitParams":
        f = lambda x: jnp.asarray(x, dtype=dtype)
        return cls(
            t_swing=f(0.5),
            t_stance=f(1.5),
            height=f(0.4),
            sigma_st=f([0.8, 0.8]),
            sigma_sw=f([1.0, 1.0]),
            base_avg_velocity=f(0.2),
            capture_gain=f([1.0, 2.2]),
            vel_cmd_blend=f(1.0),
        )


@struct.dataclass
class PhaseState:
    swing_phase: jax.Array  # (4,)
    stance_phase: jax.Array  # (4,)
    is_swing: jax.Array  # (4,) bool
    ready_to_swing: jax.Array  # (4,) bool — one-shot trigger at lift-off

    @classmethod
    def init_trot(cls, params: GaitParams, dtype=jnp.float32) -> "PhaseState":
        # LF + RH lift off on the very first tick
        # (gait_generate_client.cpp:89-111). All legs start in stance with
        # the lead pair's stance timer already expired, so the first
        # advance() fires `stance_done` → `ready_to_swing` and the gait
        # engine builds their swing splines through the normal path.
        t = params.t_stance.astype(dtype)
        z = jnp.zeros_like(t)
        return cls(
            swing_phase=jnp.zeros(4, dtype),
            stance_phase=jnp.stack([t, z, t, z]),
            is_swing=jnp.zeros(4, bool),
            ready_to_swing=jnp.zeros(4, bool),
        )

    @classmethod
    def init_pace(cls, params: GaitParams, dtype=jnp.float32) -> "PhaseState":
        # LF lifts first; RF/LH/RH staggered stance (:120-154). Leg order
        # LF,RF,RH,LH: RH at 2/3·t_st, LH at 1/3·t_st.
        t = params.t_stance.astype(dtype)
        z = jnp.zeros_like(t)
        return cls(
            swing_phase=jnp.zeros(4, dtype),
            stance_phase=jnp.stack([t, z, 2 * t / 3, t / 3]),
            is_swing=jnp.zeros(4, bool),
            ready_to_swing=jnp.zeros(4, bool),
        )

    @property
    def support(self) -> jax.Array:
        return jnp.logical_not(self.is_swing)


def advance(state: PhaseState, params: GaitParams, dt) -> PhaseState:
    """One timer tick (≙ GaitGenerateClient::advance, :627-680)."""
    sw = state.swing_phase + jnp.where(state.is_swing, dt, 0.0)
    st = state.stance_phase + jnp.where(state.is_swing, 0.0, dt)

    # Half-tick tolerance so swing_done and the partner legs' stance_done
    # fire on the SAME tick despite float accumulation error — otherwise
    # a trot has a one-tick all-airborne gap every cycle.
    eps = 0.5 * dt
    swing_done = state.is_swing & (sw > params.t_swing - eps)
    stance_done = (~state.is_swing) & (st > params.t_stance - eps)

    # Carry the overshoot residual into the new phase timer: resetting to
    # zero would shift this leg's next event by up to one tick relative to
    # its diagonal partner, and once skewed a trot has a recurring
    # all-airborne tick at every exchange.
    sw_res = jnp.maximum(st - params.t_stance, 0.0)
    st_res = jnp.maximum(sw - params.t_swing, 0.0)
    return PhaseState(
        swing_phase=jnp.where(stance_done, sw_res, jnp.where(swing_done, 0.0, sw)),
        stance_phase=jnp.where(swing_done, st_res, jnp.where(stance_done, 0.0, st)),
        is_swing=jnp.where(swing_done, False, jnp.where(stance_done, True, state.is_swing)),
        ready_to_swing=stance_done,  # one-shot: newly lifted legs
    )


def total_phase(state: PhaseState, params: GaitParams) -> jax.Array:
    """Normalized gait-cycle phase per leg ∈ [0,1] (swing first):
    ≙ updateBaseMotion's total_phase (:413-417)."""
    cycle = params.t_stance + params.t_swing
    return jnp.where(
        state.is_swing,
        state.swing_phase / cycle,
        (state.stance_phase + params.t_swing) / cycle,
    )


def com_weights(state: PhaseState, params: GaitParams) -> jax.Array:
    """erf-based per-leg CoM weights (≙ :418-427)."""
    p = total_phase(state, params)
    sq2 = jnp.sqrt(jnp.asarray(2.0, p.dtype))
    k_st = 0.5 * (
        jax.scipy.special.erf(p / (params.sigma_st[0] * sq2))
        + jax.scipy.special.erf((1 - p) / (params.sigma_st[1] * sq2))
    )
    k_sw = 0.5 * (
        2.0
        + jax.scipy.special.erf(-p / (params.sigma_sw[0] * sq2))
        + jax.scipy.special.erf((p - 1) / (params.sigma_sw[1] * sq2))
    )
    return jnp.where(state.is_swing, k_sw, k_st)
