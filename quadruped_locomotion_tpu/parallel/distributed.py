"""Multi-host scaling: pod meshes, collective-reduced QP sweeps,
scaling-efficiency measurement.

The reference's "distributed backend" is ROS1 TCP pub/sub between
processes on one robot (SURVEY.md §2.9). The TPU-native equivalent is a
single SPMD program: the scenario batch is sharded over every chip in a
(possibly multi-host) mesh, each chip solves its shard of
force-distribution QPs on-chip, and the global health metrics (KKT
maxima, wrench-error sums) ride ICI/DCN collectives — no host round
trips inside the loop.

Mesh layout: hosts on a ``dcn`` axis, local chips on an ``ici`` axis,
the scenario batch sharded over both (pure data parallelism — at these
model sizes no tensor/pipeline split is warranted; see SURVEY.md §5
"long-context" note). Collectives over the flattened ("dcn", "ici")
pair reduce within a host over ICI first, then across hosts over DCN —
XLA lowers a two-axis psum exactly that way.

BASELINE north-star: >85% scaling efficiency on ≥2 hosts, measured by
:func:`measure_scaling`.
"""

from __future__ import annotations

import os
import time
import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from .mesh import DATA_AXIS

DCN_AXIS = "dcn"  # across hosts
ICI_AXIS = "ici"  # across chips within a host


def initialize_multihost(
    coordinator_address: str | None = None,
    num_processes: int | None = None,
    process_id: int | None = None,
) -> bool:
    """Initialize ``jax.distributed`` for a multi-host run.

    Arguments default to the standard env vars
    (``JAX_COORDINATOR_ADDRESS``, ``JAX_NUM_PROCESSES``,
    ``JAX_PROCESS_ID``); on TPU pods JAX can also auto-detect all three.
    Returns True if a multi-process runtime was initialized, False for
    single-host (no-op). Safe to call twice.
    """
    coordinator_address = coordinator_address or os.environ.get(
        "JAX_COORDINATOR_ADDRESS"
    )
    workers = [
        w
        for w in os.environ.get("TPU_WORKER_HOSTNAMES", "").split(",")
        if w.strip()
    ]
    if coordinator_address is None and len(workers) <= 1:
        return False  # single host
    if jax.process_count() > 1:
        return True  # already initialized
    kwargs = {}
    if coordinator_address is not None:
        kwargs["coordinator_address"] = coordinator_address
    if num_processes is not None or "JAX_NUM_PROCESSES" in os.environ:
        kwargs["num_processes"] = num_processes or int(
            os.environ["JAX_NUM_PROCESSES"]
        )
    if process_id is not None or "JAX_PROCESS_ID" in os.environ:
        kwargs["process_id"] = (
            process_id
            if process_id is not None
            else int(os.environ["JAX_PROCESS_ID"])
        )
    jax.distributed.initialize(**kwargs)
    return jax.process_count() > 1


def make_pod_mesh(devices=None) -> Mesh:
    """2D (dcn, ici) mesh: hosts × local chips.

    Device order groups each process's local devices together so the
    ``ici`` axis really is intra-host ICI and ``dcn`` is the cross-host
    boundary. Single-host runs get shape (1, n_local).
    """
    devices = list(jax.devices()) if devices is None else list(devices)
    n_hosts = max(jax.process_count(), 1)
    if len(devices) % n_hosts != 0:
        raise ValueError(
            f"{len(devices)} devices not divisible by {n_hosts} hosts"
        )
    per_host = len(devices) // n_hosts
    devices.sort(key=lambda d: (d.process_index, d.id))
    grid = np.asarray(devices).reshape(n_hosts, per_host)
    return Mesh(grid, (DCN_AXIS, ICI_AXIS))


def _batch_axes(mesh: Mesh):
    """PartitionSpec sharding the leading batch axis over every mesh axis."""
    return P(mesh.axis_names)


def make_sharded_qp_sweep(
    mesh: Mesh, iters: int = 15, backend: str = "xla"
):
    """Jitted, mesh-sharded force-distribution QP sweep:
    (A, b, S, W, D, d) batched on the leading axis → (solutions,
    global max KKT, global mean wrench error).

    The reductions are the BASELINE's "per-scenario QP KKT blocks
    reduced via ICI collectives": ``pmax``/``psum`` over the flattened
    mesh axes (ICI within a host, DCN across hosts).

    ``backend``: per-shard solver — "xla" (default; runs anywhere),
    "pallas" (the lane-tiled TPU kernel inside shard_map — each device
    solves its whole shard in one kernel call), or "auto".
    """
    from ..control.force_distribution import solve_fd_qp_batched
    from jax import shard_map

    axes = mesh.axis_names
    spec = _batch_axes(mesh)

    def local(A, b, S, W, D, d):
        sol = solve_fd_qp_batched(
            A, b, S, W, D, d, iters=iters, backend=backend
        )
        realized = jnp.einsum("bij,bj->bi", A, sol.x)
        err = jnp.sum(jnp.max(jnp.abs(realized - b), axis=-1))
        n = jax.lax.psum(jnp.float32(A.shape[0]), axes)
        global_err = jax.lax.psum(err, axes) / n
        global_kkt = jax.lax.pmax(jnp.max(sol.kkt_error), axes)
        return sol, global_kkt, global_err

    sharded = shard_map(
        local,
        mesh=mesh,
        in_specs=(spec,) * 6,
        out_specs=(spec, P(), P()),
        check_vma=False,
    )
    return jax.jit(sharded)


def shard_problem(mesh: Mesh, tree):
    """Place a batched problem pytree onto the mesh (batch axis split)."""
    sharding = NamedSharding(mesh, _batch_axes(mesh))
    return jax.tree_util.tree_map(
        lambda x: jax.device_put(x, sharding), tree
    )


def _time_sweep(mesh, problem, iters, reps, backend="xla"):
    sweep = make_sharded_qp_sweep(mesh, iters=iters, backend=backend)
    problem = shard_problem(mesh, problem)
    sol, kkt, err = sweep(*problem)  # compile + warm
    jax.block_until_ready(sol.x)
    t0 = time.perf_counter()
    for _ in range(reps):
        sol, kkt, err = sweep(*problem)
    jax.block_until_ready(sol.x)
    dt = (time.perf_counter() - t0) / reps
    batch = problem[0].shape[0]
    return batch / dt, float(kkt), float(err)


def measure_sharding_overhead(
    problem,
    iters: int = 15,
    reps: int = 10,
    mesh: Mesh | None = None,
) -> dict:
    """Sharding + collective overhead on a FIXED device pool.

    The same total batch is solved (a) unsharded on one device and
    (b) sharded over the full mesh with the collective KKT/error
    reductions; efficiency = rate_sharded / rate_unsharded.

    This is the honest scalability metric on a virtual CPU mesh (the
    test harness): the 8 "devices" share the host's physical cores, so
    per-device weak scaling is bounded by core count no matter how good
    the program is — what the virtual mesh CAN measure is that
    partitioning + collectives cost ≈ nothing, which is exactly the
    property that makes weak scaling on real multi-chip hardware track
    the BASELINE's ≥85% bar. On real hardware use
    :func:`measure_scaling` (the BASELINE protocol) instead.
    """
    devs = jax.devices()
    mesh = mesh or Mesh(np.asarray(devs), (DATA_AXIS,))
    n = int(mesh.devices.size)
    prob_n = jax.tree_util.tree_map(
        lambda x: jnp.concatenate([x] * n, axis=0), problem
    )
    mesh1 = Mesh(np.asarray(devs[:1]), (DATA_AXIS,))
    rate1, _, _ = _time_sweep(mesh1, prob_n, iters, reps)
    rate_n, kkt, err = _time_sweep(mesh, prob_n, iters, reps)
    return {
        "devices": n,
        "rate_unsharded": rate1,
        "rate_sharded": rate_n,
        "efficiency": rate_n / rate1,
        "max_kkt": kkt,
        "mean_wrench_err": err,
    }


def measure_scaling(
    problem,
    iters: int = 15,
    reps: int = 10,
    device_counts: list[int] | None = None,
    backend: str = "xla",
) -> dict:
    """Weak-scaling measurement of the sharded QP sweep.

    ``problem`` is the single-device-sized (A, b, S, W, D, d) batch; each
    device count n solves n × that batch (weak scaling — the BASELINE's
    solves/s-efficiency protocol at 1 chip / 1 host / N hosts).
    Efficiency(n) = rate(n) / (n × rate(1)).
    """
    devs = jax.devices()
    if device_counts is None:
        device_counts = sorted(
            {1, 2, len(devs)} & set(range(1, len(devs) + 1))
        ) or [1]
        device_counts = [n for n in device_counts if n <= len(devs)]
    results = {}
    rate1 = None
    for n in device_counts:
        mesh = Mesh(np.asarray(devs[:n]), (DATA_AXIS,))
        prob_n = jax.tree_util.tree_map(
            lambda x: jnp.concatenate([x] * n, axis=0), problem
        )
        rate, kkt, err = _time_sweep(mesh, prob_n, iters, reps, backend)
        if rate1 is None:
            rate1 = rate / n  # n == device_counts[0]
        results[n] = {
            "devices": n,
            "solves_per_s": rate,
            "efficiency": rate / (n * rate1),
            "max_kkt": kkt,
            "mean_wrench_err": err,
        }
    return results
