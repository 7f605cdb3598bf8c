"""Trot/pace gait engine: footholds (Raibert), swing splines, base motion.

TPU-native re-design of ``GaitGenerateClient``
(``free_gait_ros/test/gait_generate_client.cpp``):

* Raibert foothold heuristic with hip projection (:233-396, heuristic at
  :260-261): Δp = 0.5·t_st·v_des + sqrt(z_hip/g)·(v − v_des);
* swing trajectories via the Footstep knot-profile splines (world frame);
* erf-weighted virtual-CoM base target (:398-539).

Differences from the reference (documented, deliberate):
* swing duration is exactly t_swing (the reference back-computes an
  average velocity whose min-duration clamp makes the spline ~0.3 s and
  lets the foot wait on the ground; tying the spline to the phase timer
  is strictly cleaner and keeps the same cycle);
* foothold targets are produced directly in world frame (the reference's
  "odom" branch) instead of the footprint-frame republishing dance.

Everything is `where`-masked; the whole engine advances inside
``lax.scan`` and vmaps over scenarios.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from flax import struct

from ..types import GRAVITY, BaseTarget, RobotModel, RobotState
from ..utils.rotations import quat_inv_rotate, quat_rotate, rpy_from_quat, quat_from_rpy
from . import phase as phase_mod
from .footstep import PROFILE_TRIANGLE, swing_trajectory
from .phase import GaitParams, PhaseState
from .spline import MAX_KNOTS, HermiteSpline


@struct.dataclass
class GaitState:
    phase: PhaseState
    # Batched-over-legs swing splines in world frame.
    swing_splines: HermiteSpline  # leaves have leading (4,) axis
    swing_targets: jax.Array  # (4,3) world
    swing_starts: jax.Array  # (4,3) world foot position at lift-off
    # Smoothed base reference (world). The reference never feeds the raw
    # virtual-CoM point to the controller as a step input: each gait tick
    # packs it into a BaseTarget whose executor fits a cubic Hermite from
    # the *current* reference pose/twist to the goal
    # (free_gait_core/src/base_motion/BaseTarget.cpp, refit on every goal
    # replacement). We carry the same (pos, vel) reference state and refit
    # every tick.
    base_ref_pos: jax.Array  # (3,)
    base_ref_vel: jax.Array  # (3,)
    # Integrated yaw command reference (clamped near the actual yaw so a
    # turn-rate the plant cannot deliver does not wind up).
    yaw_ref: jax.Array  # scalar


def _empty_splines(feet_world: jax.Array) -> HermiteSpline:
    zeros_t = jnp.zeros((4, MAX_KNOTS), feet_world.dtype)
    vals = jnp.tile(feet_world[:, None, :], (1, MAX_KNOTS, 1))
    return HermiteSpline(
        times=zeros_t,
        values=vals,
        tangents=jnp.zeros_like(vals),
        num_knots=jnp.full((4,), 2, jnp.int32),
        duration=jnp.zeros((4,), feet_world.dtype),
    )


def init_gait_state(
    gait_type: int, params: GaitParams, feet_world: jax.Array
) -> GaitState:
    if gait_type == phase_mod.PACE:
        ph = PhaseState.init_pace(params, feet_world.dtype)
    else:
        ph = PhaseState.init_trot(params, feet_world.dtype)
    footprint = jnp.mean(feet_world, axis=0)
    ref0 = footprint.at[2].set(
        params.height + jnp.mean(feet_world[:, 2]) - 0.02
    )
    return GaitState(
        phase=ph,
        swing_splines=_empty_splines(feet_world),
        swing_targets=feet_world,
        swing_starts=feet_world,
        base_ref_pos=ref0,
        base_ref_vel=jnp.zeros(3, feet_world.dtype),
        yaw_ref=jnp.zeros((), feet_world.dtype),
    )


def raibert_footholds(
    model: RobotModel,
    state: RobotState,
    params: GaitParams,
    v_desired_world: jax.Array,  # (3,) commanded base velocity, world/footprint
    footprint_center_z: jax.Array,  # scalar: mean support-foot height
    ground_height: jax.Array | float = 0.0,  # terrain height under the hips
    capture_gain=1.0,  # scalar or (2,): weight of the √(z/g)(v−v_des) term
    yaw_rate_desired=0.0,  # adds the per-hip tangential stance displacement
) -> jax.Array:
    """Target footholds in world frame for all four legs (4,3).

    ≙ generateFootHolds (:233-396): hip projected to the ground plane plus
    the Raibert displacement, rotated by the base yaw. The reference
    projects hips to the odom floor plane z=0 (:278) and offsets the
    foothold +0.02 above it (:271, :276) — ``ground_height`` generalizes
    that to non-zero terrain.
    """
    dtype = v_desired_world.dtype
    base = state.base
    height = base.position[2] - footprint_center_z
    xy = jnp.array([1.0, 1.0, 0.0], dtype)

    v_cur_base = quat_inv_rotate(base.quaternion, base.linear_velocity) * xy
    _, _, yaw = rpy_from_quat(base.quaternion)
    q_yaw = quat_from_rpy(jnp.zeros_like(yaw), jnp.zeros_like(yaw), yaw)
    # desired velocity expressed in the footprint (yaw-only) frame
    v_des_fp = quat_inv_rotate(q_yaw, v_desired_world) * xy

    z_hip = jnp.maximum(height, 1e-3)
    cap = jnp.broadcast_to(jnp.asarray(capture_gain, dtype), (2,))
    cap3 = jnp.concatenate([cap, jnp.zeros((1,), dtype)])
    displace_fp = 0.5 * params.t_stance * v_des_fp + cap3 * jnp.sqrt(
        z_hip / GRAVITY
    ) * (v_cur_base - v_des_fp)
    # The reference hovers footholds +0.02 above the elevation map (:271,
    # :276) and lets Gazebo contact close the gap; our plant needs the
    # swing target ON the surface for touchdown to register.
    displace_fp = displace_fp.at[2].set(0.0)

    # Kinematic hip (HAA + abduction-link offset) projected to the floor
    # plane, world frame (:276-279). NOT the ±0.075 "virtual hip" CoM
    # proxy: footholds must sit under the leg's neutral vertical
    # (±0.175 lateral, = default_stance_state) or every stance leg
    # carries a permanent ~15° abduction and the support polygon loses
    # half its width in roll. ``ground_height`` may be scalar or (4,)
    # per-leg terrain heights.
    gz = jnp.broadcast_to(jnp.asarray(ground_height, dtype), (4,))
    hips_world = base.position + quat_rotate(
        base.quaternion[None], model.hip_pos.astype(dtype)
    )
    hips_world = hips_world * xy[None, :] + gz[:, None] * (1 - xy)[None, :]

    displace_world = quat_rotate(q_yaw, displace_fp)
    displace_world = displace_world.at[2].set(0.0)
    # Turning: each hip sweeps tangentially at ω×r; place its foothold
    # half a stance ahead along that arc (the yaw analog of the 0.5·T·v
    # stance term; ≙ the reference regenerating footholds under the
    # rotating foot_print frame).
    wz = jnp.asarray(yaw_rate_desired, dtype)
    hip_fp = model.hip_pos.astype(dtype)
    tangential = wz * jnp.stack(
        [-hip_fp[:, 1], hip_fp[:, 0], jnp.zeros(4, dtype)], axis=1
    )
    displace_yaw = quat_rotate(q_yaw[None], 0.5 * params.t_stance * tangential)
    # hips_world z is already the terrain height; footholds land on it.
    return hips_world + displace_world[None, :] + displace_yaw * xy[None, :]


def _hermite_refit_step(p0, v0, p1, v1, duration, dt):
    """Advance a (pos, vel) reference one tick along the cubic Hermite from
    (p0,v0) to (p1,v1) over ``duration`` — the executor's evaluation of a
    freshly-refit BaseTarget trajectory (BaseTarget.cpp Hermite fit +
    Executor::writeTorsoMotion)."""
    s = jnp.clip(dt / duration, 0.0, 1.0)
    h00 = 2 * s**3 - 3 * s**2 + 1
    h10 = s**3 - 2 * s**2 + s
    h01 = -2 * s**3 + 3 * s**2
    h11 = s**3 - s**2
    p = h00 * p0 + h10 * duration * v0 + h01 * p1 + h11 * duration * v1
    g00 = 6 * s**2 - 6 * s
    g10 = 3 * s**2 - 4 * s + 1
    g01 = -6 * s**2 + 6 * s
    g11 = 3 * s**2 - 2 * s
    v = (g00 * p0 + g10 * duration * v0 + g01 * p1 + g11 * duration * v1) / duration
    return p, v


def com_target_raw(
    model: RobotModel,
    state: RobotState,
    gait: GaitState,
    params: GaitParams,
    feet_world: jax.Array,
) -> jax.Array:
    """Raw erf-weighted virtual-CoM point (≙ updateBaseMotion :398-539)."""
    dtype = feet_world.dtype
    w = phase_mod.com_weights(gait.phase, params)  # (4,)

    # CCW/CW neighbor blend (:428-455). Leg order LF,RF,RH,LH is a cycle
    # around the body.
    f = feet_world
    vp_sum = jnp.zeros(3, dtype)
    for j in range(4):
        cw = (j + 1) % 4
        ccw = (j - 1) % 4
        vp_cw = f[j] * w[j] + f[cw] * (1 - w[j])
        vp_ccw = f[j] * w[j] + f[ccw] * (1 - w[j])
        denom = w[j] + w[cw] + w[ccw]
        vp = (w[j] * f[j] + w[cw] * vp_cw + w[ccw] * vp_ccw) / jnp.maximum(
            denom, 1e-6
        )
        vp_sum = vp_sum + vp
    com_des = 0.25 * vp_sum

    support = gait.phase.support.astype(dtype)
    n_sup = jnp.maximum(jnp.sum(support), 1.0)
    footprint_z = jnp.sum(f[:, 2] * support) / n_sup
    return com_des.at[2].set(params.height + footprint_z - 0.02)


def base_target_smoothed(
    model: RobotModel,
    state: RobotState,
    gait: GaitState,
    params: GaitParams,
    feet_world: jax.Array,
    v_desired_world: jax.Array,
    yaw_rate_desired: jax.Array,
    dt,
):
    """Smoothed base reference: one Hermite-refit tick toward the raw
    virtual-CoM point. Returns (BaseTarget, new_ref_pos, new_ref_vel).

    Feeding the raw erf CoM directly would be a step input (it jumps ~10 cm
    at every gait-cycle boundary) and saturates the force QP; the reference
    instead tracks it through the BaseTarget Hermite machinery at
    ~``base_avg_velocity`` (StepParameters.hpp:24-85: BaseAuto average
    linear velocity 0.2 m/s).
    """
    dtype = feet_world.dtype
    # The CoM target is computed over "anchor" feet: actual positions for
    # support legs, but capture-FREE nominal footholds for swing legs.
    # Using the capture-shifted targets here closes a positive-feedback
    # loop — a lateral drift shifts the catch footholds, the CoM target
    # follows them, and the VMC then accelerates the drift it was
    # supposed to kill.
    nominal = raibert_footholds(
        model,
        state,
        params,
        v_desired_world,
        jnp.sum(feet_world[:, 2] * gait.phase.support.astype(dtype))
        / jnp.maximum(jnp.sum(gait.phase.support.astype(dtype)), 1.0),
        capture_gain=0.0,
        yaw_rate_desired=yaw_rate_desired,
    )
    feet_anchor = jnp.where(
        gait.phase.support[:, None], feet_world, nominal
    )
    com_des = com_target_raw(model, state, gait, params, feet_anchor)
    # Lead the CoM target one stance period ahead along the command (the
    # reference's extra t_stance·v_des displacement in its foothold→
    # BaseTarget chain, :334): without a leading target the kp term
    # produces no sustained propulsion and cruise speed saturates well
    # below the command.
    com_des = com_des + params.t_stance * v_desired_world * jnp.array(
        [1.0, 1.0, 0.0], dtype
    )

    dist = jnp.linalg.norm(com_des - gait.base_ref_pos)
    duration = jnp.clip(dist / params.base_avg_velocity, 0.2, 2.0)
    ref_pos, ref_vel = _hermite_refit_step(
        gait.base_ref_pos, gait.base_ref_vel, com_des, v_desired_world,
        duration, dt,
    )

    # Integrate the commanded turn rate into a yaw reference, clamped to
    # ±0.3 rad of the measured yaw (anti-windup).
    _, _, yaw = rpy_from_quat(state.base.quaternion)
    wz = jnp.asarray(yaw_rate_desired, dtype)
    yaw_err = gait.yaw_ref + wz * dt - yaw
    yaw_err = (yaw_err + jnp.pi) % (2 * jnp.pi) - jnp.pi
    yaw_ref = yaw + jnp.clip(yaw_err, -0.3, 0.3)
    zero = jnp.zeros_like(yaw)
    q_target = quat_from_rpy(zero, zero, yaw_ref)
    # xy velocity reference: blend of the Hermite tracking-spline
    # derivative (follows the robot — soft) and the raw command (anchored
    # — strong damping but cross-couples into roll through the contact
    # lever arm). Vertical rate always comes from the spline.
    a = params.vel_cmd_blend
    v_ref = jnp.stack(
        [
            a * v_desired_world[0] + (1 - a) * ref_vel[0],
            a * v_desired_world[1] + (1 - a) * ref_vel[1],
            ref_vel[2],
        ]
    )
    target = BaseTarget(
        position=ref_pos,
        quaternion=q_target,
        linear_velocity=v_ref,
        angular_velocity=jnp.stack([zero, zero, wz]),
    )
    return target, ref_pos, ref_vel, yaw_ref


def advance(
    model: RobotModel,
    gait: GaitState,
    state: RobotState,
    feet_world: jax.Array,
    params: GaitParams,
    v_desired_world: jax.Array,
    yaw_rate_desired,
    dt,
    terrain=None,
):
    """One gait tick. Returns (new GaitState, support mask (4,), swing
    foot pos/vel/acc in world (each (4,3)), BaseTarget, surface normals
    (4,3)). With a ``terrain`` Heightfield, footholds are snapped to the
    nearest traversable cell (≙ FootstepOptimization at :301, :334) and
    surface normals come from the map."""
    ph = phase_mod.advance(gait.phase, params, dt)

    support_f = ph.support.astype(feet_world.dtype)
    n_sup = jnp.maximum(jnp.sum(support_f), 1.0)
    footprint_z = jnp.sum(feet_world[:, 2] * support_f) / n_sup

    # Footholds are regenerated EVERY tick for legs in swing — the
    # reference runs generateFootHolds at 100 Hz and replaces the step
    # goal each tick (:233-396, :606-624), so the Raibert target tracks
    # the live base velocity. A frozen lift-off target would be half a
    # gait cycle stale at touchdown, which is exactly the time constant
    # of the inverted-pendulum tip — stale footholds cannot catch it.
    # Targets freeze over the final 20% of the swing so touchdown is not
    # chasing a moving point.
    if terrain is None:
        ground = 0.0
        normals = jnp.zeros_like(feet_world).at[:, 2].set(1.0)
    else:
        hips_3d = state.base.position[None, :] + quat_rotate(
            state.base.quaternion[None], model.hip_pos.astype(feet_world.dtype)
        )
        ground = jax.vmap(terrain.height_at)(hips_3d[:, :2])
        normals = None  # filled after foothold optimization
    targets = raibert_footholds(
        model, state, params, v_desired_world, footprint_z,
        ground_height=ground,
        capture_gain=params.capture_gain,
        yaw_rate_desired=yaw_rate_desired,
    )
    if terrain is not None:
        from ..terrain.heightfield import optimize_footholds

        targets, normals, _found = optimize_footholds(
            terrain, targets, hips_3d
        )
    update = ph.ready_to_swing | (
        ph.is_swing & (ph.swing_phase < 0.8 * params.t_swing)
    )
    new_targets = jnp.where(update[:, None], targets, gait.swing_targets)
    new_starts = jnp.where(
        ph.ready_to_swing[:, None], feet_world, gait.swing_starts
    )

    # (Re)build swing splines from the lift-off start toward the current
    # target. Spline time span is exactly t_swing: knot timing is
    # rescaled by the profile path length.
    def build(start, target):
        sp = swing_trajectory(
            start,
            target,
            profile=PROFILE_TRIANGLE,
            profile_height=0.15,  # gait_generate_client.cpp:372
        )
        # rescale knot times to the swing duration
        scale = params.t_swing / jnp.maximum(sp.duration, 1e-6)
        return sp.replace(
            times=sp.times * scale,
            tangents=sp.tangents / scale,
            duration=params.t_swing,
        )

    fresh = jax.vmap(build)(new_starts, new_targets)
    splines = jax.tree_util.tree_map(
        lambda new, old: jnp.where(
            update.reshape((-1,) + (1,) * (new.ndim - 1)), new, old
        ),
        fresh,
        gait.swing_splines,
    )

    # Evaluate swing trajectories at the current swing phase.
    pos = jax.vmap(lambda sp, t: sp.evaluate(t))(splines, ph.swing_phase)
    vel = jax.vmap(lambda sp, t: sp.velocity(t))(splines, ph.swing_phase)
    acc = jax.vmap(lambda sp, t: sp.acceleration(t))(splines, ph.swing_phase)

    new_gait = GaitState(
        phase=ph,
        swing_splines=splines,
        swing_targets=new_targets,
        swing_starts=new_starts,
        base_ref_pos=gait.base_ref_pos,
        base_ref_vel=gait.base_ref_vel,
        yaw_ref=gait.yaw_ref,
    )
    target, ref_pos, ref_vel, yaw_ref = base_target_smoothed(
        model, state, new_gait, params, feet_world, v_desired_world,
        yaw_rate_desired, dt,
    )
    new_gait = new_gait.replace(
        base_ref_pos=ref_pos, base_ref_vel=ref_vel, yaw_ref=yaw_ref
    )
    return new_gait, ph.support, (pos, vel, acc), target, normals
