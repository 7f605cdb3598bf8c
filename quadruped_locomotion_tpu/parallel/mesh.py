"""Device-mesh parallelism for batched scenario rollouts.

The reference is a single-robot ROS system; its concurrency is threads +
pub/sub (SURVEY.md §2.9). The TPU-native scaling axis is the *scenario
batch*: thousands of independent stance/terrain/velocity scenarios, data-
parallel over the mesh, with ICI collectives reducing per-scenario QP/KKT
metrics (the BASELINE "ICI-collective KKT reduction" workload).

Uses ``jax.sharding.Mesh`` + ``shard_map`` so the collective pattern is
explicit: each device advances its scenario shard through the full
control+physics tick inside ``lax.scan``, then cross-device metrics ride
``psum``/``pmax`` over the ICI.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXIS = "data"


def make_mesh(n_devices: int | None = None) -> Mesh:
    devs = jax.devices()
    if n_devices is not None:
        if len(devs) < n_devices:
            raise ValueError(
                f"need {n_devices} devices, have {len(devs)} "
                f"({[d.platform for d in devs[:1]]})"
            )
        devs = devs[:n_devices]
    return Mesh(np.asarray(devs), (DATA_AXIS,))


def shard_batch(mesh: Mesh, tree):
    """Place a pytree with leading batch axis onto the mesh (data-parallel)."""
    sharding = NamedSharding(mesh, P(DATA_AXIS))
    return jax.tree_util.tree_map(
        lambda x: jax.device_put(x, sharding), tree
    )


def replicate(mesh: Mesh, tree):
    sharding = NamedSharding(mesh, P())
    return jax.tree_util.tree_map(
        lambda x: jax.device_put(x, sharding), tree
    )


def make_sharded_rollout(mesh: Mesh, steps: int, dt: float = 0.0025,
                         qp_iters: int = 15):
    """Build a jitted, mesh-sharded closed-loop rollout:
    (batched SimState, batched BaseTarget) → (final states, global metrics).

    Global metrics (mean tracking error, max |KKT|, total QP iterations)
    are reduced across devices with ``psum``/``pmax`` — this is the
    cross-chip reduction path the BASELINE measures.
    """
    from ..control.balance_controller import balance_update
    from ..rollout import simulator as simlib
    from ..types import CfdParams, RobotModel, VmcGains

    model = RobotModel.simpledog()
    gains = VmcGains.gazebo_defaults()
    cfd = CfdParams.defaults()

    from jax import shard_map

    def local_rollout(sims, targets):
        def tick(s, _):
            tau, diag = jax.vmap(
                lambda st, tg: balance_update(
                    model, gains, cfd, st, tg, qp_iters=qp_iters
                )
            )(s.robot, targets)
            s2 = jax.vmap(lambda ss, tt: simlib.step(model, ss, tt, dt))(s, tau)
            kkt = diag.distribution.qp_solution.kkt_error
            return s2, kkt

        final, kkts = jax.lax.scan(tick, sims, None, length=steps)
        err = jnp.sum(
            jnp.linalg.norm(
                final.robot.base.position - targets.position, axis=-1
            )
        )
        # ICI collectives: global sums/maxima across the mesh.
        n = jax.lax.psum(jnp.float32(sims.time.shape[0]), DATA_AXIS)
        global_err = jax.lax.psum(err, DATA_AXIS) / n
        global_kkt = jax.lax.pmax(jnp.max(kkts), DATA_AXIS)
        return final, global_err, global_kkt

    sharded = shard_map(
        local_rollout,
        mesh=mesh,
        in_specs=(P(DATA_AXIS), P(DATA_AXIS)),
        out_specs=(P(DATA_AXIS), P(), P()),
        check_vma=False,
    )
    return jax.jit(sharded)


def make_sharded_locomotion_rollout(
    mesh: Mesh,
    ticks: int,
    qp_iters: int = 15,
    qp_backend: str = "auto",
):
    """Mesh-sharded FULL closed-loop rollout (gait engine + contact FSM
    + VMC + batched QP dispatch + torque map + articulated plant): the
    scenario batch is split over the mesh, each device runs the batched
    rollout on its shard with ONE QP solve per 400 Hz control substep
    (the Pallas kernel on TPU — the sharded twin of the product hot
    path), and global health metrics ride ``pmax``/``psum`` collectives.

    Returns a jitted fn: (batched LocomotionState, batched Command) →
    (final states (sharded), global max KKT, global upright fraction).
    """
    from ..control.locomotion import ControllerParams
    from ..gait.phase import GaitParams
    from ..rollout import closed_loop as cl
    from ..types import RobotModel
    from jax import shard_map

    model = RobotModel.simpledog()
    params = ControllerParams.defaults()
    gp = GaitParams.trot_defaults()
    if qp_backend == "auto":
        qp_backend = "pallas" if jax.default_backend() == "tpu" else "xla"

    def local(ls, cmds):
        ls2, tel = cl.rollout(
            model, params, gp, ls, cmds, ticks, qp_iters=qp_iters,
            batched=True, qp_backend=qp_backend,
        )
        kkt = jax.lax.pmax(jnp.max(tel["qp_kkt"]), DATA_AXIS)
        n = jax.lax.psum(
            jnp.float32(tel["base_position"].shape[1]), DATA_AXIS
        )
        upright = (
            jax.lax.psum(
                jnp.sum(
                    (tel["base_position"][-1, :, 2] > 0.25).astype(
                        jnp.float32
                    )
                ),
                DATA_AXIS,
            )
            / n
        )
        return ls2, kkt, upright

    sharded = shard_map(
        local,
        mesh=mesh,
        in_specs=(P(DATA_AXIS), P(DATA_AXIS)),
        out_specs=(P(DATA_AXIS), P(), P()),
        check_vma=False,
    )
    return jax.jit(sharded)


def shard_rollout_step(mesh: Mesh, batch: int, steps: int = 2) -> None:
    """Compile + execute one tiny sharded rollout (driver dry-run hook)."""
    from ..rollout import simulator as simlib
    from ..types import BaseTarget, RobotModel

    model = RobotModel.simpledog()
    sim = simlib.default_stance_state(model, height=0.4)
    target = BaseTarget.from_base(sim.robot.base)
    sims = jax.tree_util.tree_map(
        lambda x: jnp.broadcast_to(x, (batch,) + x.shape), sim
    )
    targets = jax.tree_util.tree_map(
        lambda x: jnp.broadcast_to(x, (batch,) + x.shape), target
    )
    sims = shard_batch(mesh, sims)
    targets = shard_batch(mesh, targets)
    rollout = make_sharded_rollout(mesh, steps=steps)
    final, err, kkt = rollout(sims, targets)
    jax.block_until_ready(final)
    assert jnp.isfinite(err), "sharded rollout produced non-finite metrics"
