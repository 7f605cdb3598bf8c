"""Benchmark: batched 4-contact force-distribution QP solves/s/chip.

North-star metric from BASELINE.md: >10,000 batched 4-contact QP
solves/s/chip (the reference solves ONE such QP per 2.5 ms control tick
via OOQP/MA27 on CPU → 400 solves/s equivalent; baseline target is the
driver's 10k/s/chip bar).

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}
Extra diagnostics go to stderr.
"""

from __future__ import annotations

import json
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

from quadruped_locomotion_tpu.utils import cache as _cache

_cache.enable()

BASELINE_SOLVES_PER_S = 10_000.0  # BASELINE.md north-star target


def build_batch(batch: int):
    """A batch of standing-balance QPs with varied wrenches/geometry."""
    from quadruped_locomotion_tpu.types import (
        BaseTarget,
        CfdParams,
        RobotModel,
        VmcGains,
    )
    from quadruped_locomotion_tpu.control.vmc import compute_virtual_wrench
    from quadruped_locomotion_tpu.control.force_distribution import build_qp
    from quadruped_locomotion_tpu.rollout import simulator as simlib

    model = RobotModel.simpledog()
    gains = VmcGains.gazebo_defaults()
    cfd = CfdParams.defaults()
    sim = simlib.default_stance_state(model, height=0.4)
    target = BaseTarget.from_base(sim.robot.base)

    rng = np.random.default_rng(0)
    pos_noise = jnp.asarray(
        rng.uniform(-0.03, 0.03, size=(batch, 3)), jnp.float32
    )

    def make(noise):
        st = sim.robot.replace(
            base=sim.robot.base.replace(
                position=sim.robot.base.position + noise
            )
        )
        vf, vt = compute_virtual_wrench(model, gains, st, target)
        return build_qp(model, cfd, st, vf, vt)

    A, b, S, W, D, d = jax.jit(jax.vmap(make))(pos_noise)
    return A, b, S, W, D, d


def tail_proof(A, b, S, W, D, d, x, wrench_err, max_oracle: int = 64):
    """Prove the wrench-error tail is CONSTRAINT-BOUND, not solver failure.

    Round-2 finding: p99 wrench error is ~177 N because ~1/4 of the
    sampled instances request infeasible wrenches (kp=10000 × ±3 cm noise
    swamps the friction cone / 10 N min-force floor). Evidence chain
    (≙ the solve-sanity spirit of ContactForceDistribution.cpp:496-511):

    1. Tail instances (wrench error > 1 N) with an active inequality
       (slack < 1e-3) are constraint-bound by direct slack evidence —
       the optimizer sits on the feasible-set boundary, pushing as hard
       as physics allows.
    2. Tail instances WITHOUT an active constraint (a threshold artifact
       can place the minimum slack just above 1e-3) are individually
       re-solved with a float64 scipy oracle: if the kernel's objective
       matches the true optimum and the oracle's wrench error is just as
       large, the error is inherent to the problem — proven, not merely
       near-threshold. (Round-4 fix: the old strict ``active_frac < 1.0``
       gate WARNED on exactly these instances without ever checking
       them.)
    3. The worst ``max_oracle`` instances by wrench error get the same
       oracle treatment, so the extreme tail is always cross-checked.

    Returns (tail_frac, active_frac, oracle_rel_gap_max | None, proven).
    """
    An, bn, Sn, Wn = (np.asarray(v, np.float64) for v in (A, b, S, W))
    Dn, dn, xn = (np.asarray(v, np.float64) for v in (D, d, x))
    tail = wrench_err > 1.0
    tail_frac = float(tail.mean())
    if not tail.any():
        return tail_frac, 1.0, None, True
    slack = np.einsum("bij,bj->bi", Dn, xn) - dn
    min_slack = slack.min(axis=-1)
    active_frac = float((min_slack[tail] < 1e-3).mean())
    # Tail instances NOT proven by slack evidence → oracle re-solve each.
    suspects = np.flatnonzero(tail & (min_slack >= 1e-3))

    try:
        from scipy import optimize
    except ImportError:  # pragma: no cover - scipy is present in CI/TPU envs
        return tail_frac, active_frac, None, False

    def oracle_check(i):
        """f64 re-solve of instance i → (objective gap, err ratio)."""
        G = 2.0 * An[i].T @ (Sn[i][:, None] * An[i]) + np.diag(Wn[i])
        g = -2.0 * An[i].T @ (Sn[i] * bn[i])
        scale = max(1.0, np.abs(g).max())
        res = optimize.minimize(
            lambda v: (0.5 * v @ G @ v + g @ v) / scale,
            xn[i],
            jac=lambda v: (G @ v + g) / scale,
            constraints=[
                {
                    "type": "ineq",
                    "fun": lambda v, i=i: Dn[i] @ v - dn[i],
                    "jac": lambda v, i=i: Dn[i],
                }
            ],
            method="SLSQP",
            options={"maxiter": 500, "ftol": 1e-14},
        )
        obj = lambda v: v @ G @ v * 0.5 + g @ v
        denom = 1.0 + abs(obj(res.x))
        gap = abs(obj(xn[i]) - obj(res.x)) / denom
        ratio = np.abs(An[i] @ res.x - bn[i]).max() / max(wrench_err[i], 1e-9)
        return gap, ratio

    # (2) per-suspect proof: every inactive-slack tail instance must be
    # at the true optimum with an equally-large oracle error.
    suspects_ok = True
    if suspects.size > max_oracle:  # pragma: no cover — pathological batch
        suspects_ok = False
        suspects = suspects[:max_oracle]
    sus_gaps, sus_ratios = [], []
    for i in suspects:
        gap, ratio = oracle_check(i)
        sus_gaps.append(gap)
        sus_ratios.append(ratio)
        if gap > 5e-3 or not 0.9 < ratio < 1.1:
            suspects_ok = False

    # (3) worst-by-error oracle cross-check.
    worst = np.argsort(wrench_err)[::-1][:max_oracle]
    gaps, oracle_errs = [], []
    for i in worst:
        gap, ratio = oracle_check(i)
        gaps.append(gap)
        oracle_errs.append(ratio)
    gap_max = float(np.max(gaps))
    err_ratio_med = float(np.median(oracle_errs))
    proven = bool(
        suspects_ok and gap_max <= 5e-3 and 0.9 < err_ratio_med < 1.1
    )
    print(
        f"tail proof: {tail.sum()}/{tail.size} instances >1N "
        f"({tail_frac:.1%}); active-constraint frac={active_frac:.3f}; "
        f"{suspects.size} inactive-slack suspects oracle-checked "
        f"(max gap {max(sus_gaps, default=0.0):.2e}); "
        f"oracle objective gap max={gap_max:.2e} over {len(worst)} worst; "
        f"oracle/kernel wrench-err ratio med={err_ratio_med:.3f}; "
        f"proven={proven}",
        file=sys.stderr,
    )
    if not proven:
        print(
            "WARNING: wrench-error tail NOT proven constraint-bound",
            file=sys.stderr,
        )
    return tail_frac, active_frac, gap_max, proven


def scaling_main(batch: int):
    """Weak-scaling mode (`bench.py --scaling [batch]`): shard the sweep
    over all local devices and report scaling efficiency vs 1 device.
    On multi-host slices run under `jax.distributed` this measures the
    BASELINE's N-host protocol; single-chip hosts report trivially."""
    from quadruped_locomotion_tpu.parallel import distributed as dist

    dist.initialize_multihost()
    problem = build_batch(batch)
    res = dist.measure_scaling(problem, iters=15, reps=10, backend="auto")
    for n, r in sorted(res.items()):
        print(
            f"devices={n} solves/s={r['solves_per_s']:.1f} "
            f"efficiency={r['efficiency']:.3f} max_kkt={r['max_kkt']:.2e}",
            file=sys.stderr,
        )
    top = res[max(res)]
    print(
        json.dumps(
            {
                "metric": "QP sweep weak-scaling efficiency "
                f"({max(res)} devices)",
                "value": round(top["efficiency"], 4),
                "unit": "fraction",
                "vs_baseline": round(top["efficiency"] / 0.85, 3),
            }
        )
    )


def _latency_measure(n_ticks: int = 400):
    """Device-resident 400 Hz control-tick latency.

    Returns (ctrl_p50, ctrl_p99, full_p50, full_p99, disp_p50), all ms
    per 400 Hz control tick:

    * ctrl_* — CONTROLLER-ONLY (gait + FSM + VMC + QP + torque map, no
      physics): the number comparable to the reference's 2.5 ms budget,
      which covers read→controller→write only — Gazebo/EtherCAT physics
      runs outside it (``balance_controller_manager.cpp:66-95``).
    * full_* — controller + on-device articulated plant (the extra work
      a self-contained simulation pays; no reference counterpart).
    * disp_p50 — one planner tick per jit dispatch incl. tunnel RTT
      (context only).
    """
    from quadruped_locomotion_tpu.control.locomotion import ControllerParams
    from quadruped_locomotion_tpu.gait.phase import GaitParams
    from quadruped_locomotion_tpu.rollout import closed_loop as cl
    from quadruped_locomotion_tpu.types import RobotModel

    model = RobotModel.simpledog()
    params = ControllerParams.defaults()
    gp = GaitParams.trot_defaults()
    ls0 = cl.init_locomotion(model, gp)
    cmd = cl.Command(
        linear_velocity=jnp.array([0.2, 0.0, 0.0]), yaw_rate=jnp.asarray(0.0)
    )
    chunk = 25  # planner ticks per dispatch = 100 control ticks

    # The deployment path on TPU is the batched rollout at B=1 with the
    # Pallas QP backend — measured 4.6x faster per controller tick than
    # the unbatched XLA-solver path (whose candidate-chain polish is an
    # op-soup at B=1; the kernel runs it as lane math).
    backend = "pallas" if jax.devices()[0].platform == "tpu" else "xla"
    ls_b = jax.tree_util.tree_map(
        lambda x: jnp.broadcast_to(x, (1,) + x.shape), ls0
    )
    cmd_b = cl.Command(
        linear_velocity=jnp.broadcast_to(cmd.linear_velocity, (1, 3)),
        yaw_rate=jnp.broadcast_to(cmd.yaw_rate, (1,)),
    )

    def timed(plant, ls):
        roll = jax.jit(
            lambda s: cl.rollout(
                model, params, gp, s, cmd_b, chunk, plant=plant,
                batched=True, qp_backend=backend,
            )[0]
        )
        ls = roll(ls)
        jax.block_until_ready(ls)
        n_chunks = max(n_ticks // chunk, 8)
        t_chunks = np.empty(n_chunks)
        for i in range(n_chunks):
            t0 = time.perf_counter()
            ls = roll(ls)
            jax.block_until_ready(ls)
            t_chunks[i] = time.perf_counter() - t0
        per_ctrl = t_chunks * 1e3 / (chunk * cl.CONTROL_SUBSTEPS)
        p50, p99 = np.percentile(per_ctrl, [50, 99])
        return float(p50), float(p99), ls

    ctrl_p50, ctrl_p99, _ = timed("none", ls_b)
    full_p50, full_p99, _ = timed("articulated", ls_b)
    ls = ls0

    tick = jax.jit(
        lambda s: cl.planner_tick(model, params, gp, s, cmd, qp_iters=15)
    )
    ls2, _ = tick(ls)
    jax.block_until_ready(ls2)
    t_disp = np.empty(50)
    for i in range(50):
        t0 = time.perf_counter()
        ls2, kkt = tick(ls2)
        jax.block_until_ready(kkt)
        t_disp[i] = time.perf_counter() - t0
    disp_p50 = float(np.percentile(t_disp, 50)) * 1e3 / cl.CONTROL_SUBSTEPS
    return ctrl_p50, ctrl_p99, full_p50, full_p99, disp_p50


def latency_main(n_ticks: int = 400):
    """Latency mode (`bench.py --latency`): single-scenario closed-loop
    400 Hz control-tick latency, p50/p99, vs the reference's 2.5 ms
    real-time budget (``balance_controller_manager.cpp:47-58``).

    Two numbers, honestly labeled:

    (a) HEADLINE — device-resident scan, THROUGHPUT-AMORTIZED: 25
        planner ticks (= 100 control ticks of full brain: gait engine +
        executor outputs + contact FSM + VMC + force-distribution QP +
        torque map + plant step) run on-chip per dispatch; wall time is
        divided by 100. This is the valid figure for on-device rollouts
        (training sweeps, preview, batched scenario serving), NOT for a
        sensor-in-the-loop deployment — a real 400 Hz controller cannot
        batch 25 planner ticks ahead of fresh sensor data.
    (b) CONTEXT — per-dispatch: ONE planner tick per jit call, including
        the host→device round trip every tick. This is the
        sensor-in-the-loop deployment path; on this sandbox the TPU is
        reached through a network tunnel, so the RTT dominates and the
        number mostly measures the tunnel."""
    budget_ms = 2.5  # 400 Hz reference loop (BASELINE.md)
    c50, c99, f50, f99, disp_p50 = _latency_measure(n_ticks)
    print(
        f"device-resident per-400Hz-control-tick: controller-only "
        f"p50={c50:.4f} p99={c99:.4f} ms (reference budget {budget_ms} "
        f"ms covers this scope); controller+articulated-plant "
        f"p50={f50:.4f} p99={f99:.4f} ms; per-dispatch (incl. tunnel "
        f"RTT) p50={disp_p50:.3f} ms/control-tick",
        file=sys.stderr,
    )
    print(
        json.dumps(
            {
                "metric": "closed-loop 400 Hz control-tick latency "
                "(controller-only, device-resident scan, p99)",
                "value": round(c99, 4),
                "unit": "ms",
                # >1 = beating the 2.5 ms budget
                "vs_baseline": round(budget_ms / c99, 3),
                "p50_ms": round(c50, 4),
                "with_plant_p50_ms": round(f50, 4),
                "with_plant_p99_ms": round(f99, 4),
                "per_dispatch_p50_ms": round(disp_p50, 4),
            }
        )
    )


def build_scenarios(batch: int, seed: int = 0):
    """BASELINE config-5 scenario batch: terrain × gait × velocity.

    * **gait** — 75% trot (reference 0.45/0.45 s timing), 25% pace
      (0.5/1.5 s, the reference's slow gait); per-scenario
      :class:`GaitParams` + init tables via ``init_locomotion_mixed``.
    * **terrain** — 75% random smooth heightfields (cubic-upsampled
      noise, ±3 cm bumps ramping in beyond a flat spawn zone so
      ``default_stance_state`` stays valid; footholds are snapped by the
      traversability search and surface normals tilt the friction
      pyramids), 25% flat maps.
    * **velocity** — vx ∈ [-0.1, 0.4] (trot) / [0, 0.15] (pace),
      vy ± 0.1 / ± 0.05, yaw rate ± 0.3 / ± 0.15 rad/s.

    Returns (ls0 batch, commands, per-scenario GaitParams, per-scenario
    Heightfield, axes description string).
    """
    from quadruped_locomotion_tpu.gait import phase as phase_mod
    from quadruped_locomotion_tpu.gait.phase import GaitParams
    from quadruped_locomotion_tpu.rollout import closed_loop as cl
    from quadruped_locomotion_tpu.terrain.heightfield import Heightfield
    from quadruped_locomotion_tpu.types import RobotModel

    model = RobotModel.simpledog()
    rng = np.random.default_rng(seed)

    # --- gait axis: deterministic 3:1 trot/pace interleave ------------
    is_pace = (np.arange(batch) % 4) == 3
    mask = jnp.asarray(is_pace)
    gp_trot = GaitParams.trot_defaults()
    gp_pace = GaitParams.pace_defaults()

    def sel(a, b):
        a = jnp.broadcast_to(a, (batch,) + a.shape)
        b = jnp.broadcast_to(b, (batch,) + b.shape)
        m = mask.reshape((batch,) + (1,) * (a.ndim - 1))
        return jnp.where(m, b, a)

    gp_b = jax.tree_util.tree_map(sel, gp_trot, gp_pace)
    gait_type = np.where(is_pace, phase_mod.PACE, phase_mod.TROT)
    ls0 = cl.init_locomotion_mixed(model, gp_b, gait_type)

    # --- velocity axis (pace capped to its slow-gait envelope) --------
    vx = np.where(
        is_pace,
        rng.uniform(0.0, 0.15, batch),
        rng.uniform(-0.1, 0.4, batch),
    )
    vy = np.where(
        is_pace,
        rng.uniform(-0.05, 0.05, batch),
        rng.uniform(-0.1, 0.1, batch),
    )
    wz = np.where(
        is_pace,
        rng.uniform(-0.15, 0.15, batch),
        rng.uniform(-0.3, 0.3, batch),
    )
    cmds = cl.Command(
        linear_velocity=jnp.asarray(
            np.stack([vx, vy, np.zeros(batch)], axis=1), jnp.float32
        ),
        yaw_rate=jnp.asarray(wz, jnp.float32),
    )

    # --- terrain axis: per-scenario heightfields ----------------------
    H = W = 48
    res, extent = 0.1, 2.4
    coarse = jnp.asarray(
        rng.normal(size=(batch, 8, 8)), jnp.float32
    )
    rough = jax.image.resize(coarse, (batch, H, W), method="cubic")
    amp = np.where(
        (np.arange(batch) % 4) == 2,  # 25% flat scenarios
        0.0,
        rng.uniform(0.01, 0.03, batch),
    ).astype(np.float32)
    # flat spawn zone (covers the stance feet at init) ramping to full
    # bumps within +0.25 m — scenarios walk onto the terrain
    xs = -extent + np.arange(W) * res
    gx, gy = np.meshgrid(xs, xs, indexing="xy")
    box = np.maximum(np.abs(gx) / 0.65, np.abs(gy) / 0.45)
    ramp = jnp.asarray(
        np.clip((box - 1.0) / 0.4, 0.0, 1.0), jnp.float32
    )
    height = rough * amp[:, None, None] * ramp[None, :, :]
    hf_b = jax.vmap(
        lambda h: Heightfield.from_height_array(
            h, origin=(-extent, -extent), resolution=res
        )
    )(height)
    axes = (
        "terrain(75% heightfields ±3cm, 25% flat) x "
        "gait(75% trot 0.45/0.45, 25% pace 0.5/1.5) x "
        "velocity(vx -0.1..0.4, vy ±0.1, yaw ±0.3)"
    )
    return ls0, cmds, gp_b, hf_b, axes


def _sweep_measure(
    batch: int, ticks: int, qp_backend: str, reps: int = 3, chunk: int = 10
):
    """Time the FULL closed loop (gait engine + executor outputs +
    contact FSM + VMC + QP + torque map + plant) over `batch` config-5
    scenarios (terrain × gait × velocity, see :func:`build_scenarios`)
    with the batched in-loop QP dispatch (`qp_backend` selects the
    solver that runs INSIDE each 400 Hz control substep — the product
    hot path, ≙ ContactForceDistribution.cpp:490).

    Dispatched in ``chunk``-tick segments: a single device execution of
    100 ticks × 4096 scenarios runs ~90 s, past the sandbox tunnel's
    RPC deadline; chunking keeps each dispatch bounded with the state
    resident on-device between segments (host sync only per segment, as
    in the latency bench)."""
    from quadruped_locomotion_tpu.control.locomotion import ControllerParams
    from quadruped_locomotion_tpu.rollout import closed_loop as cl
    from quadruped_locomotion_tpu.types import RobotModel

    model = RobotModel.simpledog()
    params = ControllerParams.defaults()
    ls_b, cmds, gp_b, hf_b, axes = build_scenarios(batch)

    n_chunks = max(ticks // chunk, 1)
    print(
        f"sweep[{qp_backend}] batch={batch} compiling...",
        file=sys.stderr, flush=True,
    )

    @jax.jit
    def sweep(ls):
        return cl.rollout(
            model, params, gp_b, ls, cmds, chunk,
            batched=True, qp_backend=qp_backend,
            terrain=hf_b, terrain_batched=True, gait_params_batched=True,
        )

    def run(ls):
        tel = None
        for _ in range(n_chunks):
            ls, tel = sweep(ls)
        return ls, tel

    out_b, tel = run(ls_b)
    jax.block_until_ready(out_b)
    t0 = time.perf_counter()
    for _ in range(reps):
        out_b, tel = run(out_b)
    jax.block_until_ready(out_b)
    dt_wall = (time.perf_counter() - t0) / reps

    sim_seconds = batch * n_chunks * chunk * 0.01
    rt_factor = sim_seconds / dt_wall
    base = np.asarray(tel["base_position"])  # (T, B, 3)
    finite = bool(np.isfinite(base).all())
    # upright relative to the LOCAL ground under the base (terrain
    # scenarios walk onto ±3 cm bumps)
    gz = np.asarray(
        jax.vmap(lambda hf, xy: hf.height_at(xy))(
            hf_b, jnp.asarray(base[-1, :, :2])
        )
    )
    upright = float((base[-1, :, 2] - gz > 0.25).mean())
    kkt = np.asarray(tel["qp_kkt"])
    return {
        "rt_factor": rt_factor,
        "wall_s": dt_wall,
        "finite": finite,
        "upright_frac": upright,
        "p99_kkt": float(np.percentile(kkt, 99)),
        "backend": qp_backend,
        "batch": batch,
        "ticks": n_chunks * chunk,
        "scenario_axes": axes,
    }


def sweep_main(batch: int = 1024, ticks: int = 100):
    """Scenario-sweep mode (`bench.py --sweep [batch]`): the BASELINE's
    "N parallel terrain/gait/velocity scenarios" workload end-to-end.
    Each 400 Hz control substep makes ONE batched QP dispatch — the
    Pallas kernel on TPU, the XLA IPM elsewhere — so this measures the
    kernel IN the product loop, not beside it.

    Reports scenario·sim-seconds per wall-second: how many robots' worth
    of real-time 100 Hz control streams one chip sustains. The reference
    runs exactly ONE robot in real time on a CPU (vs_baseline = that
    multiple). On TPU also measures the XLA-backend loop for the
    pallas-vs-xla in-loop speedup."""
    on_tpu = jax.devices()[0].platform == "tpu"
    backend = "pallas" if on_tpu and batch >= 1024 else "xla"
    res = _sweep_measure(batch, ticks, backend)
    speedup = None
    if backend == "pallas" and "--compare-xla" in sys.argv[1:]:
        # Opt-in XLA-backend comparison: the vmapped XLA IPM inside the
        # loop is impractical at production batch (batch-1024
        # compile+run did not complete in 10 min on this chip — the
        # exact "terrible occupancy" the Pallas kernel exists to fix),
        # so measure a small batch and compare per-scenario throughput.
        xb = min(batch, 64)
        res_xla = _sweep_measure(xb, min(ticks, 10), "xla", reps=1)
        per_scn_pallas = res["rt_factor"] / 1.0  # scenarios·sim-s/wall-s
        per_scn_xla = res_xla["rt_factor"]
        speedup = per_scn_pallas / max(per_scn_xla, 1e-9)
        print(
            f"in-loop backend speedup (pallas@{batch} vs xla@{xb}, "
            f"per-scenario-throughput ratio): {speedup:.2f}x "
            f"(xla rt_factor={per_scn_xla:.1f})",
            file=sys.stderr,
        )
    print(
        f"batch={batch} ticks={ticks} backend={res['backend']} "
        f"wall={res['wall_s']:.3f}s rt_factor={res['rt_factor']:.1f} "
        f"finite={res['finite']} upright_frac={res['upright_frac']:.3f} "
        f"p99_kkt={res['p99_kkt']:.2e}",
        file=sys.stderr,
    )
    if not res["finite"] or res["upright_frac"] < 0.9:
        print("WARNING: sweep health check failed", file=sys.stderr)
    print(
        json.dumps(
            {
                "metric": "closed-loop scenario sweep "
                "(robots simulated+controlled in real time per chip)",
                "value": round(res["rt_factor"], 1),
                "unit": "robots (scenario.sim-s/wall-s)",
                "vs_baseline": round(res["rt_factor"] / 1.0, 1),
                "upright_frac": res["upright_frac"],
                "qp_backend": res["backend"],
                "sweep_batch": res["batch"],
                "sweep_ticks": res["ticks"],
                "scenario_axes": res["scenario_axes"],
                "pallas_vs_xla_speedup": None
                if speedup is None
                else round(speedup, 2),
            }
        )
    )


def roofline_main(batch: int = 4096, iters: int = 15):
    """Speed-of-light accounting for the headline QP kernel
    (`bench.py --roofline [batch]`): exact FLOPs/solve from XLA's cost
    analysis of the identical-math XLA path, combined with the measured
    kernel throughput → achieved FLOP/s and % of the v5e VPU ceiling.

    The kernel is VPU work (per-instance scalar algebra vectorized over
    the batch in the (8,128) lanes — no matmuls, so the MXU ceiling is
    irrelevant). v5e VPU ceiling: 8·128 lanes × 4 ALUs × 2 (FMA)
    × ~1.5 GHz ≈ 12.3 TFLOP/s (≈6.1 TFLOP/s if the op mix has no FMA
    fusion); the kernel's mix is mostly madds, so we report against the
    FMA ceiling (conservative for utilization claims)."""
    from quadruped_locomotion_tpu.ops import qp, qp_pallas

    dev = jax.devices()[0]
    on_tpu = dev.platform == "tpu"
    prob = build_batch(batch)
    A, b, S, W, D, d = prob

    # exact FLOPs of the same math (fixed-iteration IPM + polish)
    xla_solver = jax.jit(
        jax.vmap(lambda A, b, S, W, D, d: qp.solve_weighted_ls_qp(
            A, S, b, W, D, d, iters=iters
        ))
    )
    ca = xla_solver.lower(*prob).compile().cost_analysis()
    ca = ca[0] if isinstance(ca, list) else ca
    flops_per_solve = float(ca["flops"]) / batch

    # measured kernel throughput (pallas on TPU, xla elsewhere)
    if on_tpu:
        @jax.jit
        def solve_all(A, b, S, W, D, d):
            x, s, z, kkt = qp_pallas.solve_weighted_ls_fd_qp(
                A, S, b, W, D, d, iters=iters
            )
            return x
    else:
        def solve_all(*p):
            return xla_solver(*p).x

    jax.block_until_ready(solve_all(*prob))
    reps = 20
    t0 = time.perf_counter()
    for _ in range(reps):
        x = solve_all(*prob)
    jax.block_until_ready(x)
    solves_per_s = batch * reps / (time.perf_counter() - t0)

    achieved = solves_per_s * flops_per_solve
    VPU_PEAK_FMA = 12.3e12
    frac = achieved / VPU_PEAK_FMA
    print(
        f"device={dev} backend={'pallas' if on_tpu else 'xla'} "
        f"flops/solve={flops_per_solve:.0f} solves/s={solves_per_s:.3e} "
        f"achieved={achieved/1e9:.1f} GFLOP/s "
        f"vpu_frac={100*frac:.2f}% (FMA ceiling 12.3 TF/s)",
        file=sys.stderr,
    )
    print(
        json.dumps(
            {
                "metric": "QP kernel roofline (fraction of v5e VPU FMA peak)",
                "value": round(100 * frac, 2),
                "unit": "% of 12.3 TFLOP/s",
                "vs_baseline": round(solves_per_s / 10_000, 1),
                "flops_per_solve": round(flops_per_solve),
                "solves_per_s": round(solves_per_s),
            }
        )
    )


def main():
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    batch = int(args[0]) if args else 4096
    if "--scaling" in sys.argv[1:]:
        return scaling_main(batch)
    if "--latency" in sys.argv[1:]:
        return latency_main(int(args[0]) if args else 400)
    if "--sweep" in sys.argv[1:]:
        return sweep_main(int(args[0]) if args else 1024)
    if "--roofline" in sys.argv[1:]:
        return roofline_main(batch)
    iters = 15
    for a in sys.argv[1:]:
        if a.startswith("--iters="):
            iters = int(a.split("=")[1])
    from quadruped_locomotion_tpu.ops import qp, qp_pallas

    dev = jax.devices()[0]
    on_tpu = dev.platform == "tpu"
    use_pallas = on_tpu and "--xla" not in sys.argv[1:]
    print(f"device: {dev} platform={dev.platform}", file=sys.stderr)

    A, b, S, W, D, d = build_batch(batch)

    if use_pallas:
        # Headline path: the Pallas TPU kernel (batch lives in the vector
        # lanes; one (8,128) tile per problem scalar → zero wasted lanes).
        @jax.jit
        def solve_all(A, b, S, W, D, d):
            x, s, z, kkt = qp_pallas.solve_weighted_ls_fd_qp(
                A, S, b, W, D, d, iters=iters
            )
            return x, kkt
    else:
        @jax.jit
        def solve_all(A, b, S, W, D, d):
            sol = jax.vmap(
                lambda *args: qp.solve_weighted_ls_qp(*args, iters=iters)
            )(A, S, b, W, D, d)
            return sol.x, sol.kkt_error

    # Warmup / compile.
    x, kkt_all = solve_all(A, b, S, W, D, d)
    jax.block_until_ready(x)

    reps = 20
    t0 = time.perf_counter()
    for _ in range(reps):
        out = solve_all(A, b, S, W, D, d)
    jax.block_until_ready(out[0])
    t1 = time.perf_counter()

    total_solves = batch * reps
    single_solves_per_s = total_solves / (t1 - t0)
    single_ms = (t1 - t0) / reps * 1e3

    # HEADLINE timing: CHAIN dependent solver invocations per dispatch,
    # problem data resident on device. At batch 4096 the kernel itself
    # runs ~0.5 ms but each dispatch carries ~1 ms of fixed launch
    # overhead (tunnel-RTT-inflated in this sandbox) that the
    # single-dispatch number cannot separate (the r4 finding: real
    # kernel-level gains were invisible under it). The chain is how the
    # product actually consumes the kernel — inside lax.scan in the
    # closed-loop rollout (closed_loop.py:241-249), one dispatch for
    # many control substeps — so the amortized figure is the deployed
    # throughput, measured the same way here: each step's wrench is
    # nudged by ≤1e-6 N by the previous solution (physically invisible,
    # defeats CSE/hoisting), every step is a full fresh solve.
    CHAIN = 10

    @jax.jit
    def solve_chain(A, b, S, W, D, d):
        def step(carry, _):
            b_i, _, _ = carry
            x_i, kkt_i = solve_all(A, b_i, S, W, D, d)
            b_next = b + 1e-6 * jnp.tanh(x_i[:, :1])
            return (b_next, x_i, kkt_i), None

        init = (b, jnp.zeros_like(x), jnp.zeros_like(kkt_all))
        (b_last, x_last, kkt_last), _ = jax.lax.scan(
            step, init, None, length=CHAIN
        )
        return x_last, kkt_last

    xc, kc = solve_chain(A, b, S, W, D, d)
    jax.block_until_ready(xc)
    chain_reps = max(reps // 2, 4)
    t0 = time.perf_counter()
    for _ in range(chain_reps):
        outc = solve_chain(A, b, S, W, D, d)
    jax.block_until_ready(outc[0])
    t1 = time.perf_counter()
    solves_per_s = batch * CHAIN * chain_reps / (t1 - t0)
    batch_ms = (t1 - t0) / (chain_reps * CHAIN) * 1e3

    # Health: KKT percentiles (honest point residuals incl. the active-set
    # polish) + wrench tracking. ~1/4 of instances request infeasible
    # wrenches (kp·3 cm noise swamps the friction cone) where the optimal
    # wrench error is legitimately large — tail_proof() below PROVES that
    # (active constraints + float64 oracle re-solve of the worst cases),
    # so wrench error is gated at the median, KKT at p99/max.
    kkt_np = np.asarray(kkt_all)
    kkt_p50, kkt_p99 = (
        float(np.percentile(kkt_np, 50)),
        float(np.percentile(kkt_np, 99)),
    )
    kkt_max = float(kkt_np.max())
    realized = jnp.einsum(
        "bij,bj->bi", A, x, precision=jax.lax.Precision.HIGHEST
    )
    wrench_err = np.asarray(jnp.max(jnp.abs(realized - b), axis=-1))
    med_err = float(np.median(wrench_err))
    p99_err = float(np.percentile(wrench_err, 99))
    print(
        f"batch={batch} iters={iters} backend="
        f"{'pallas' if use_pallas else 'xla'} "
        f"chained({CHAIN}/dispatch, {chain_reps} reps) "
        f"batch_time={batch_ms:.3f} ms; single-dispatch ({reps} reps) "
        f"{single_ms:.3f} ms ({single_solves_per_s:.3e} solves/s); "
        f"kkt p50={kkt_p50:.2e} "
        f"p99={kkt_p99:.2e} max={kkt_max:.2e} "
        f"wrench_err p50={med_err:.3e} p99={p99_err:.3e}",
        file=sys.stderr,
    )
    if not np.isfinite(kkt_max) or kkt_p99 > 1e-4 or med_err > 0.1:
        print(
            "WARNING: QP quality gate failed "
            f"(need p99 KKT < 1e-4, median wrench err < 0.1)",
            file=sys.stderr,
        )

    tail_frac, active_frac, oracle_gap, tail_proven = tail_proof(
        A, b, S, W, D, d, x, wrench_err
    )

    if use_pallas:
        # Cross-check the kernel against the generic XLA IPM on a
        # subsample: both must reach near-identical objective values.
        sub = min(batch, 512)
        sol = jax.jit(
            jax.vmap(lambda *a: qp.solve_weighted_ls_qp(*a, iters=iters))
        )(A[:sub], S[:sub], b[:sub], W[:sub], D[:sub], d[:sub])

        def objective(xs, As, Ss, bs, Ws):
            r = jnp.einsum("bij,bj->bi", As, xs) - bs
            return jnp.einsum("bi,bi->b", r * Ss, r) + jnp.einsum(
                "bi,bi->b", xs * Ws, xs
            )

        op = objective(x[:sub], A[:sub], S[:sub], b[:sub], W[:sub])
        ox = objective(sol.x, A[:sub], S[:sub], b[:sub], W[:sub])
        gap = np.asarray(jnp.abs(op - ox) / (1.0 + jnp.abs(ox)))
        rel = float(np.median(gap))
        rel_p99 = float(np.percentile(gap, 99))
        # p99 gate (round-2 fix: a median-only gate would pass a 1%
        # garbage tail). Both backends are fixed-iteration float32, so
        # the p99 bound is looser than the median one; the float64-oracle
        # tail gate above is the tight end-to-end check.
        print(
            f"pallas-vs-xla rel objective gap: median={rel:.2e} "
            f"p99={rel_p99:.2e}",
            file=sys.stderr,
        )
        if rel > 1e-4 or rel_p99 > 1e-3:
            print("WARNING: backend agreement check failed", file=sys.stderr)

    # --- whole-system extras in the same artifact (one JSON per round
    # must capture kernel + latency + sweep, not just the kernel) -------
    extras = {}
    if "--kernel-only" not in sys.argv[1:]:
        try:
            c50, c99, f50, f99, lat_disp = _latency_measure(100)
            extras["latency_ctrl_p50_ms"] = round(c50, 4)
            extras["latency_ctrl_p99_ms"] = round(c99, 4)
            extras["latency_with_plant_p99_ms"] = round(f99, 4)
            extras["latency_per_dispatch_p50_ms"] = round(lat_disp, 3)
            print(
                f"latency: controller-only p50={c50:.4f} p99={c99:.4f} ms "
                f"(budget 2.5 ms); with articulated plant p99={f99:.4f} ms",
                file=sys.stderr,
            )
        except Exception as e:  # pragma: no cover — keep the artifact
            print(f"latency extra failed: {e!r}", file=sys.stderr)
        try:
            sweep_backend = "pallas" if use_pallas else "xla"
            # small-footprint sweep for the per-round artifact: the
            # full-scale number comes from `bench.py --sweep 4096`
            # (compiling the 4096-wide loop twice would blow the
            # driver's wall-clock budget; batch 1024 compiles in ~3 min)
            sw = _sweep_measure(min(batch, 1024), 20, sweep_backend, reps=1)
            extras["sweep_robots_realtime"] = round(sw["rt_factor"], 1)
            extras["sweep_upright_frac"] = sw["upright_frac"]
            extras["sweep_qp_backend"] = sw["backend"]
            # self-describing artifact (r4 finding: the label printed the
            # KERNEL batch while the sweep measured min(batch, 1024))
            extras["sweep_batch"] = sw["batch"]
            extras["sweep_ticks"] = sw["ticks"]
            extras["sweep_scenario_axes"] = sw.get("scenario_axes")
            print(
                f"sweep: batch={sw['batch']} ticks={sw['ticks']} "
                f"backend={sw['backend']} "
                f"rt_factor={sw['rt_factor']:.1f} "
                f"upright={sw['upright_frac']:.3f}",
                file=sys.stderr,
            )
        except Exception as e:  # pragma: no cover — keep the artifact
            print(f"sweep extra failed: {e!r}", file=sys.stderr)

    print(
        json.dumps(
            {
                "metric": "4-contact force-distribution QP solves/s/chip",
                "value": round(solves_per_s, 1),
                "unit": "solves/s",
                "vs_baseline": round(solves_per_s / BASELINE_SOLVES_PER_S, 3),
                # headline = dispatch-amortized (CHAIN solves/dispatch,
                # the deployed in-scan pattern); single-dispatch kept for
                # cross-round comparability with BENCH_r01-r04
                "chain_per_dispatch": CHAIN,
                "batch_time_ms": round(batch_ms, 4),
                "single_dispatch_solves_per_s": round(single_solves_per_s, 1),
                "single_dispatch_ms": round(single_ms, 4),
                "kkt_p50": float(f"{kkt_p50:.3g}"),
                "kkt_p99": float(f"{kkt_p99:.3g}"),
                "wrench_err_p50": float(f"{med_err:.3g}"),
                "wrench_err_p99": float(f"{p99_err:.3g}"),
                "tail_frac_gt_1N": round(tail_frac, 4),
                "tail_active_constraint_frac": round(active_frac, 4),
                "tail_oracle_gap_max": None
                if oracle_gap is None
                else float(f"{oracle_gap:.3g}"),
                "tail_proven": tail_proven,
                **extras,
            }
        )
    )


if __name__ == "__main__":
    main()
