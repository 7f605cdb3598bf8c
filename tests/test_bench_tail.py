"""Bench wrench-error tail: prove it is constraint-bound (round-2 gap).

BENCH reports wrench_err p99 ≈ 177 N on the sampled force-distribution
batch. The explanation — those instances request infeasible wrenches
(kp=10000 × ±3 cm noise swamps the μ=0.6 friction cone and the 10 N
min-force floor), so a large *optimal* error is legitimate — was never
proven in round 2. These tests prove it on the XLA backend (same
problem construction as bench.build_batch):

* every instance with wrench error > 1 N sits on the feasible-set
  boundary (an active inequality constraint), and
* a float64 scipy oracle re-solve of the worst instances reaches the
  same objective and the SAME large wrench error — the error is
  inherent to the problem, not left on the table by the solver.

≙ the solve-sanity checks of ContactForceDistribution.cpp:496-511.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import bench
from quadruped_locomotion_tpu.ops import qp


@pytest.fixture(scope="module")
def solved_batch():
    A, b, S, W, D, d = bench.build_batch(512)
    sol = jax.jit(
        jax.vmap(lambda *a: qp.solve_weighted_ls_qp(*a, iters=15))
    )(A, S, b, W, D, d)
    realized = jnp.einsum(
        "bij,bj->bi", A, sol.x, precision=jax.lax.Precision.HIGHEST
    )
    wrench_err = np.asarray(jnp.max(jnp.abs(realized - b), axis=-1))
    return A, b, S, W, D, d, sol, wrench_err


def test_tail_exists_and_is_constraint_bound(solved_batch):
    A, b, S, W, D, d, sol, wrench_err = solved_batch
    tail = wrench_err > 1.0
    # the batch construction deliberately contains infeasible-wrench
    # instances; if this ever goes to zero the tail story is moot
    assert tail.any()
    slack = np.einsum(
        "bij,bj->bi", np.asarray(D, np.float64), np.asarray(sol.x, np.float64)
    ) - np.asarray(d, np.float64)
    # no meaningful constraint violations anywhere (primal feasibility;
    # forces are O(100 N), so 1e-2 N is float32 solver noise)
    assert slack.min() > -1e-2, slack.min()
    # every tail instance has an ACTIVE min-force/friction constraint
    min_slack_tail = slack[tail].min(axis=-1)
    assert (min_slack_tail < 1e-3).all(), min_slack_tail.max()
    # non-tail instances track well (the solver is fine when physics is)
    assert np.median(wrench_err[~tail]) < 0.1


def test_tail_matches_float64_oracle(solved_batch):
    A, b, S, W, D, d, sol, wrench_err = solved_batch
    _, active_frac, gap_max, proven = bench.tail_proof(
        A, b, S, W, D, d, sol.x, wrench_err, max_oracle=16
    )
    assert active_frac == 1.0
    assert gap_max is not None and gap_max < 5e-3, gap_max
    assert proven


def test_tail_proof_trips_on_seeded_suboptimal_tail(solved_batch):
    """Seeded regression (VERDICT r4 item 2): a truly suboptimal tail
    instance must still trip the proof. Scaling a near-optimal solution
    by 1.4 keeps it strictly feasible (every rhs entry is ≥ 0 for stance
    rows, ≤ -1 relaxed for swing rows with zeroed D, so D(λx) ≥ λd ≥ d)
    but leaves ~0.4·|b| of wrench error on the table — an inactive-slack
    tail instance that is NOT at the optimum. The oracle re-solve must
    find the gap and return proven=False."""
    A, b, S, W, D, d, sol, wrench_err = solved_batch
    x_bad = np.asarray(sol.x).copy()
    # pick a healthy (non-tail) instance and corrupt it
    i = int(np.argmin(wrench_err))
    x_bad[i] *= 1.4
    realized = np.einsum("bij,bj->bi", np.asarray(A, np.float64), x_bad)
    err_bad = np.abs(realized - np.asarray(b, np.float64)).max(axis=-1)
    assert err_bad[i] > 1.0, "seed failed to create a tail instance"
    slack_i = np.asarray(D, np.float64)[i] @ x_bad[i] - np.asarray(
        d, np.float64
    )[i]
    assert slack_i.min() >= 1e-3, "seed must be an inactive-slack suspect"
    _, _, _, proven = bench.tail_proof(
        A, b, S, W, D, d, x_bad, err_bad, max_oracle=8
    )
    assert not proven


def test_bench_json_gates_tail_fields():
    """The driver-facing JSON line must carry the tail-health fields so a
    regression is visible in BENCH_r{N}.json, not only in stderr."""
    import json
    import os
    import subprocess
    import sys

    # force the subprocess onto CPU the same way conftest does (env vars
    # alone are overridden by the sandbox's sitecustomize)
    prog = (
        "import os; os.environ['JAX_PLATFORMS']='cpu'; import jax; "
        "jax.config.update('jax_platforms','cpu'); import sys; "
        "sys.argv=['bench.py','64']; import bench; bench.main()"
    )
    out = subprocess.run(
        [sys.executable, "-c", prog],
        capture_output=True,
        text=True,
        timeout=900,
        check=True,
        cwd=os.path.dirname(os.path.abspath(bench.__file__)),
    )
    line = [l for l in out.stdout.splitlines() if l.startswith("{")][-1]
    payload = json.loads(line)
    for key in (
        "kkt_p99",
        "wrench_err_p99",
        "tail_frac_gt_1N",
        "tail_active_constraint_frac",
    ):
        assert key in payload, key
