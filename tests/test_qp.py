import jax
import jax.numpy as jnp
import numpy as np
import pytest
from scipy import optimize

from quadruped_locomotion_tpu.ops import qp


def scipy_qp(G, g, D, d, C=None, c=None):
    """Reference solve via SLSQP (tight tolerances)."""
    G, g, D, d = map(np.asarray, (G, g, D, d))
    cons = [
        {"type": "ineq", "fun": lambda x: D @ x - d, "jac": lambda x: D}
    ]
    if C is not None:
        C, c = np.asarray(C), np.asarray(c)
        cons.append({"type": "eq", "fun": lambda x: C @ x - c, "jac": lambda x: C})
    res = optimize.minimize(
        lambda x: 0.5 * x @ G @ x + g @ x,
        np.zeros(len(g)),
        jac=lambda x: G @ x + g,
        constraints=cons,
        method="SLSQP",
        options={"maxiter": 400, "ftol": 1e-12},
    )
    assert res.success, res.message
    return res.x


def test_quadprogpp_worked_example():
    """The reference's documented example (qp_solver/src/main.cc:6-21):
    G=[[4,-2],[-2,4]], g0=[6,0], x1+x2=3, x>=0, x1+x2>=2
    → x=[1,2], f(x)=12."""
    G = jnp.array([[4.0, -2.0], [-2.0, 4.0]])
    g = jnp.array([6.0, 0.0])
    C = jnp.array([[1.0, 1.0]])
    c = jnp.array([3.0])
    D = jnp.array([[1.0, 0.0], [0.0, 1.0], [1.0, 1.0]])
    d = jnp.array([0.0, 0.0, 2.0])
    sol = qp.solve_qp(G, g, D, d, C=C, c=c)
    np.testing.assert_allclose(np.asarray(sol.x), [1.0, 2.0], atol=1e-4)
    f = 0.5 * sol.x @ G @ sol.x + g @ sol.x
    np.testing.assert_allclose(float(f), 12.0, atol=1e-3)


def test_unconstrained_matches_linear_solve():
    rng = np.random.default_rng(0)
    A = rng.normal(size=(5, 5))
    G = jnp.asarray(A @ A.T + 5 * np.eye(5))
    g = jnp.asarray(rng.normal(size=5))
    # inactive constraints far away
    D = jnp.asarray(np.eye(5))
    d = jnp.full((5,), -1e3)
    sol = qp.solve_qp(G, g, D, d)
    np.testing.assert_allclose(
        np.asarray(sol.x), np.linalg.solve(np.asarray(G), -np.asarray(g)),
        atol=1e-4,
    )


@pytest.mark.parametrize("seed", range(6))
def test_random_inequality_qps_vs_scipy(seed):
    rng = np.random.default_rng(seed)
    n, mi = 6, 9
    A = rng.normal(size=(n, n))
    G = A @ A.T + n * np.eye(n)
    g = rng.normal(size=n) * 2
    D = rng.normal(size=(mi, n))
    d = rng.uniform(-1.0, 0.2, size=mi)  # 0 feasible
    x_ref = scipy_qp(G, g, D, d)
    sol = qp.solve_qp(
        jnp.asarray(G), jnp.asarray(g), jnp.asarray(D), jnp.asarray(d),
        iters=30,
    )
    np.testing.assert_allclose(np.asarray(sol.x), x_ref, atol=2e-3)


@pytest.mark.parametrize("seed", range(3))
def test_random_equality_qps_vs_scipy(seed):
    rng = np.random.default_rng(seed + 100)
    n, mi, me = 6, 8, 2
    A = rng.normal(size=(n, n))
    G = A @ A.T + n * np.eye(n)
    g = rng.normal(size=n)
    D = rng.normal(size=(mi, n))
    d = rng.uniform(-1.5, -0.5, size=mi)
    C = rng.normal(size=(me, n))
    c = C @ np.zeros(n)  # 0 is eq-feasible
    x_ref = scipy_qp(G, g, D, d, C, c)
    sol = qp.solve_qp(
        jnp.asarray(G), jnp.asarray(g), jnp.asarray(D), jnp.asarray(d),
        C=jnp.asarray(C), c=jnp.asarray(c), iters=30,
    )
    np.testing.assert_allclose(np.asarray(sol.x), x_ref, atol=2e-3)


def test_kkt_residuals_small():
    rng = np.random.default_rng(7)
    n, mi = 12, 20
    A = rng.normal(size=(n, n))
    G = jnp.asarray(A @ A.T + n * np.eye(n))
    g = jnp.asarray(rng.normal(size=n))
    D = jnp.asarray(rng.normal(size=(mi, n)))
    d = jnp.asarray(rng.uniform(-1.0, 0.0, size=mi))
    sol = qp.solve_qp(G, g, D, d, iters=30)
    res = qp.kkt_residuals(G, g, D, d, sol)
    for k, v in res.items():
        assert float(v) < 1e-3, f"{k} residual too large: {float(v)}"


def test_masked_disabled_rows():
    """Zeroed rows with d=-1 must not affect the solution."""
    rng = np.random.default_rng(8)
    n = 4
    A = rng.normal(size=(n, n))
    G = jnp.asarray(A @ A.T + n * np.eye(n))
    g = jnp.asarray(rng.normal(size=n))
    D1 = jnp.asarray(np.eye(n))
    d1 = jnp.full((n,), -10.0)
    sol1 = qp.solve_qp(G, g, D1, d1)
    # same problem with 6 disabled extra rows
    D2 = jnp.concatenate([D1, jnp.zeros((6, n))])
    d2 = jnp.concatenate([d1, jnp.full((6,), -1.0)])
    sol2 = qp.solve_qp(G, g, D2, d2)
    np.testing.assert_allclose(np.asarray(sol1.x), np.asarray(sol2.x), atol=1e-4)


def test_weighted_ls_formulation():
    """min (Ax-b)'S(Ax-b) + x'Wx unconstrained has closed form."""
    rng = np.random.default_rng(9)
    m, n = 6, 12
    A = rng.normal(size=(m, n))
    b = rng.normal(size=m)
    S = np.array([1.0, 5.0, 1.0, 10.0, 10.0, 5.0])
    W = np.full(n, 1e-4)
    D = np.zeros((8, n))
    d = np.full(8, -1.0)
    sol = qp.solve_weighted_ls_qp(
        *map(jnp.asarray, (A, S, b, W, D, d)), iters=30
    )
    H = 2 * A.T @ np.diag(S) @ A + np.diag(W)
    x_ref = np.linalg.solve(H, 2 * A.T @ np.diag(S) @ b)

    def obj(x):
        r = A @ x - b
        return r @ np.diag(S) @ r + x @ np.diag(W) @ x

    # H is nearly rank-deficient (rank 6 + 1e-4 reg): compare by objective,
    # which is what the force distribution cares about.
    assert obj(np.asarray(sol.x)) <= obj(x_ref) + 1e-3
    np.testing.assert_allclose(
        A @ np.asarray(sol.x), A @ x_ref, atol=1e-3
    )


def test_batched_vmap_qp():
    """4096-instance batch in one vmap — the BASELINE workload shape."""
    rng = np.random.default_rng(10)
    B, n, mi = 256, 12, 20
    A = rng.normal(size=(B, n, n)).astype(np.float32)
    G = jnp.asarray(np.einsum("bij,bkj->bik", A, A) + n * np.eye(n))
    g = jnp.asarray(rng.normal(size=(B, n)).astype(np.float32))
    D = jnp.asarray(rng.normal(size=(B, mi, n)).astype(np.float32))
    d = jnp.asarray(rng.uniform(-1.0, 0.0, size=(B, mi)).astype(np.float32))
    sols = jax.vmap(lambda *a: qp.solve_qp(*a, iters=25))(G, g, D, d)
    assert sols.x.shape == (B, n)
    # spot-check a few against scipy
    for i in [0, 100, 255]:
        x_ref = scipy_qp(G[i], g[i], D[i], d[i])
        np.testing.assert_allclose(
            np.asarray(sols.x[i]), x_ref, atol=5e-3,
            err_msg=f"batch element {i}",
        )
