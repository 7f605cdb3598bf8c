"""Terrain layer tests: heightfield queries, foothold optimization
(≙ FootstepOptimization.cpp semantics), rough-terrain closed loop."""

import jax
import jax.numpy as jnp
import numpy as np

from quadruped_locomotion_tpu.control.locomotion import ControllerParams
from quadruped_locomotion_tpu.gait.phase import GaitParams
from quadruped_locomotion_tpu.rollout import closed_loop as cl
from quadruped_locomotion_tpu.terrain.heightfield import (
    Heightfield,
    optimize_foothold,
)
from quadruped_locomotion_tpu.types import RobotModel


def bumpy(amp=0.03, ext=4.0, res=0.04):
    n = int(2 * ext / res)
    xs = -ext + np.arange(n) * res  # exact cell centers (matches the map)
    X, Y = np.meshgrid(xs, xs)
    H = amp * np.sin(2 * np.pi * X / 0.9) * np.cos(2 * np.pi * Y / 1.1)
    return Heightfield.from_height_array(
        jnp.asarray(H, jnp.float32), origin=(-ext, -ext), resolution=res
    )


def test_height_interpolation():
    hf = bumpy()
    # at the origin the analytic height is amp·sin(0)·cos(0) = 0
    assert abs(float(hf.height_at(jnp.array([0.0, 0.0])))) < 1e-3
    # quarter wavelength in x: close to the crest
    z = float(hf.height_at(jnp.array([0.225, 0.0])))
    assert abs(z - 0.03) < 5e-3


def test_flat_traversability_everywhere():
    hf = Heightfield.flat()
    fh, n, found = optimize_foothold(hf, jnp.array([0.3, -0.2]))
    assert bool(found)
    np.testing.assert_allclose(np.asarray(fh), [0.3, -0.2, 0.0], atol=0.03)
    np.testing.assert_allclose(np.asarray(n), [0, 0, 1], atol=1e-5)


def test_foothold_avoids_untraversable_hole():
    """A steep-walled pit near the nominal foothold → the search picks
    the nearest traversable cell outside it."""
    ext, res = 1.0, 0.02
    n = int(2 * ext / res)
    H = np.zeros((n, n), np.float32)
    # pit centered at (0.3, 0.0), radius 6 cm, 20 cm deep (steep walls)
    xs = -ext + np.arange(n) * res
    X, Y = np.meshgrid(xs, xs)
    H[(X - 0.3) ** 2 + Y**2 < 0.06**2] = -0.2
    hf = Heightfield.from_height_array(
        jnp.asarray(H), origin=(-ext, -ext), resolution=res
    )
    fh, _, found = optimize_foothold(
        hf, jnp.array([0.3, 0.0]), hip_world=jnp.array([0.3, 0.0, 0.4]),
        window=13,
    )
    assert bool(found)
    d = np.hypot(float(fh[0]) - 0.3, float(fh[1]))
    assert d > 0.05  # moved off the pit
    assert abs(float(fh[2])) < 0.02  # onto the surrounding flat


def test_rough_terrain_trot():
    """BASELINE config-4 style: trot over ±3 cm bumps stays upright and
    makes forward progress with the height tracking the surface."""
    model = RobotModel.simpledog()
    params = ControllerParams.defaults()
    gp = GaitParams.trot_defaults()
    hf = bumpy()
    ls0 = cl.init_locomotion(model, gp)
    cmd = cl.Command(
        linear_velocity=jnp.array([0.2, 0.0, 0.0]), yaw_rate=jnp.asarray(0.0)
    )
    lsf, tel = jax.jit(
        lambda ls: cl.rollout(model, params, gp, ls, cmd, 600, terrain=hf)
    )(ls0)
    bp = np.asarray(tel["base_position"])
    assert np.isfinite(bp).all()
    assert (bp[:, 2] > 0.25).all()
    assert bp[-1, 0] > 0.7  # ≥ ~60% of commanded progress over 6 s
