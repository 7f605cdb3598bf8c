"""Independent validation of the swing-leg dynamics (≙ the reference's
Webots-trace validation of its RBDL leg models,
``single_leg_test/lib/model_test_header.cpp:148-273`` + DataFloder/*.txt).

No Webots here; instead the role of the external ground truth is played
by an INDEPENDENT oracle: the full leg dynamics re-derived in *torch*
(different framework) in *float64* via the *Lagrangian* formalism
(different algorithm) —

    τ_i = Σ_j ∂²T/∂q̇_i∂q̇_j q̈_j + Σ_j ∂²T/∂q̇_i∂q_j q̇_j
          − ∂T/∂q_i + ∂U/∂q_i

with the kinetic energy T = ½Σ_k m_k|v_ck|² + ½ω_kᵀI_kω_k assembled from
torch-autograd link velocities and angular rates unskewed from Ṙ Rᵀ.
The only shared ingredients are the model constants and the joint-frame
convention (those are the robot, not the algorithm); the mass matrix,
Coriolis terms, and gravity vector all arrive via a disjoint derivation
from `model/dynamics.py`'s CoM-Jacobian + Christoffel construction.
"""

import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax.numpy as jnp

from quadruped_locomotion_tpu.model.dynamics import (
    leg_forward_dynamics,
    leg_inverse_dynamics,
    leg_mass_matrix,
)
from quadruped_locomotion_tpu.types import RobotModel

MODEL = RobotModel.simpledog()


# --------------------------------------------------------------------------
# torch float64 re-implementation (Lagrangian)
# --------------------------------------------------------------------------


def _rotz(t):
    c, s = torch.cos(t), torch.sin(t)
    z = torch.zeros((), dtype=t.dtype)
    o = torch.ones((), dtype=t.dtype)
    return torch.stack(
        [
            torch.stack([c, -s, z]),
            torch.stack([s, c, z]),
            torch.stack([z, z, o]),
        ]
    )


_RX_NEG90 = torch.tensor(
    [[1.0, 0.0, 0.0], [0.0, 0.0, 1.0], [0.0, -1.0, 0.0]],
    dtype=torch.float64,
)


def _link_frames(q):
    """Link rotations + CoM positions in the hip frame (torch, f64).

    Mirrors the simpledog joint-frame convention of
    ``model/kinematics.py::leg_com_positions_hip`` — the convention is
    part of the robot description, shared by construction.
    """
    com = torch.tensor(np.asarray(MODEL.link_com), dtype=torch.float64)
    l1 = torch.tensor(float(MODEL.l1), dtype=torch.float64)
    d = torch.tensor(float(MODEL.d), dtype=torch.float64)
    r1j = _rotz(q[0])
    r1 = r1j @ _RX_NEG90
    r2 = r1 @ _rotz(q[1])
    r3 = r2 @ _rotz(q[2])
    o3 = r2 @ torch.stack([l1, torch.zeros((), dtype=q.dtype), d])
    rots = [r1j, r2, r3]
    coms = [r1j @ com[0], r2 @ com[1], o3 + r3 @ com[2]]
    return rots, coms


def _kinetic(q, qd):
    mass = torch.tensor(np.asarray(MODEL.link_mass), dtype=torch.float64)
    inertia = torch.tensor(
        np.asarray(MODEL.link_inertia), dtype=torch.float64
    )
    rots, coms = _link_frames(q)
    T = torch.zeros((), dtype=torch.float64)
    for k in range(3):
        # linear CoM velocity via autograd JVP: v = (∂c/∂q) q̇
        _, v = torch.autograd.functional.jvp(
            lambda qq, k=k: _link_frames(qq)[1][k], (q,), (qd,),
            create_graph=True,
        )
        # angular rate from Ṙ Rᵀ = [ω]×
        _, rdot = torch.autograd.functional.jvp(
            lambda qq, k=k: _link_frames(qq)[0][k], (q,), (qd,),
            create_graph=True,
        )
        wx = rdot @ rots[k].T
        w = torch.stack([wx[2, 1], wx[0, 2], wx[1, 0]])
        T = T + 0.5 * mass[k] * (v @ v) + 0.5 * w @ (
            rots[k] @ inertia[k] @ rots[k].T
        ) @ w
    return T


def _potential(q, g_hip):
    mass = torch.tensor(np.asarray(MODEL.link_mass), dtype=torch.float64)
    _, coms = _link_frames(q)
    return -sum(mass[k] * (coms[k] @ g_hip) for k in range(3))


def torch_inverse_dynamics(q, qd, qdd, g_hip):
    """τ from the Euler–Lagrange equations, all derivatives by autograd."""
    q = torch.tensor(q, dtype=torch.float64, requires_grad=True)
    qd = torch.tensor(qd, dtype=torch.float64, requires_grad=True)
    qdd_t = torch.tensor(qdd, dtype=torch.float64)
    g_hip = torch.tensor(g_hip, dtype=torch.float64)

    # M = ∂²T/∂q̇∂q̇ ; C-term = (∂²T/∂q̇∂q) q̇ ; −∂T/∂q ; +∂U/∂q
    dT_dqd = torch.autograd.grad(_kinetic(q, qd), qd, create_graph=True)[0]
    M_rows, mixed_rows = [], []
    for i in range(3):
        gq_d, gq = torch.autograd.grad(
            dT_dqd[i], (qd, q), retain_graph=True, create_graph=False
        )
        M_rows.append(gq_d)
        mixed_rows.append(gq)
    M = torch.stack(M_rows)
    mixed = torch.stack(mixed_rows)
    dT_dq = torch.autograd.grad(
        _kinetic(q, qd), q, retain_graph=True
    )[0]
    qU = q.detach().clone().requires_grad_(True)
    dU_dq = torch.autograd.grad(_potential(qU, g_hip), qU)[0]
    tau = (
        M @ qdd_t
        + mixed @ qd.detach()
        - dT_dq
        + dU_dq
    )
    return M.detach().numpy(), tau.detach().numpy()


# --------------------------------------------------------------------------
# the tests
# --------------------------------------------------------------------------


def _rand_states(n, seed=0):
    rng = np.random.default_rng(seed)
    q = rng.uniform([-0.5, -1.2, -2.4], [0.5, 1.2, -0.3], size=(n, 3))
    qd = rng.uniform(-6.0, 6.0, size=(n, 3))
    qdd = rng.uniform(-40.0, 40.0, size=(n, 3))
    return q, qd, qdd


def test_mass_matrix_matches_torch_lagrangian_oracle():
    q, _, _ = _rand_states(20)
    for i in range(len(q)):
        m_ours = np.asarray(
            leg_mass_matrix(MODEL, jnp.asarray(q[i], jnp.float32))
        )
        m_ref, _ = torch_inverse_dynamics(
            q[i], np.zeros(3), np.zeros(3), np.zeros(3)
        )
        np.testing.assert_allclose(m_ours, m_ref, rtol=2e-4, atol=2e-5)
        # physical sanity the oracle provides for free
        assert np.linalg.eigvalsh(m_ref).min() > 0


def test_inverse_dynamics_matches_torch_lagrangian_oracle():
    """Full ID (M q̈ + C q̇ + G) vs the Euler–Lagrange oracle, all legs,
    random states at swing-leg velocity/acceleration scales."""
    q, qd, qdd = _rand_states(20, seed=1)
    g_base = np.array([0.0, 0.0, -9.8])
    for leg in range(4):
        g_hip = np.asarray(MODEL.hip_rot)[leg].T @ g_base
        for i in range(len(q)):
            tau_ours = np.asarray(
                leg_inverse_dynamics(
                    MODEL,
                    jnp.asarray(q[i], jnp.float32),
                    jnp.asarray(qd[i], jnp.float32),
                    jnp.asarray(qdd[i], jnp.float32),
                    jnp.asarray(g_base, jnp.float32),
                    leg,
                )
            )
            _, tau_ref = torch_inverse_dynamics(q[i], qd[i], qdd[i], g_hip)
            scale = 1.0 + np.abs(tau_ref).max()
            assert np.abs(tau_ours - tau_ref).max() / scale < 5e-4, (
                leg, i, tau_ours, tau_ref,
            )


def test_forward_dynamics_consistent_with_oracle():
    """q̈ = FD(q, q̇, τ) must invert the oracle's ID exactly."""
    q, qd, qdd = _rand_states(8, seed=2)
    g_base = np.array([0.0, 0.0, -9.8])
    leg = 0
    g_hip = np.asarray(MODEL.hip_rot)[leg].T @ g_base
    for i in range(len(q)):
        _, tau = torch_inverse_dynamics(q[i], qd[i], qdd[i], g_hip)
        qdd_back = np.asarray(
            leg_forward_dynamics(
                MODEL,
                jnp.asarray(q[i], jnp.float32),
                jnp.asarray(qd[i], jnp.float32),
                jnp.asarray(tau, jnp.float32),
                jnp.asarray(g_base, jnp.float32),
                leg,
            )
        )
        np.testing.assert_allclose(qdd_back, qdd[i], rtol=2e-3, atol=2e-3)
