"""Terrain as arrays: heightfield + traversability + foothold search.

≙ the reference's grid_map-based terrain pipeline: elevation /
``elevation_inpainted`` / ``normal_vectors_{x,y,z}`` / traversability
layers consumed by ``FootstepOptimization``
(``free_gait_ros/test/FootstepOptimization.cpp:25-160``), which
spiral-searches cells around the nominal foothold for traversability
> 0.9, reads the surface height and normal, and checks kinematic
reachability.

TPU-native re-design: the map is a dense array pytree; the spiral
becomes a fixed K×K masked window reduction around the nominal foothold
(scored by distance, exactly the spiral's nearest-first semantics), so
the search vmaps over legs and scenario batches and runs inside
``lax.scan``.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from flax import struct

TRAVERSABILITY_THRESHOLD = 0.9  # FootstepOptimization.cpp:~90
SEARCH_WINDOW = 9  # cells per side (odd); ≙ the bounded spiral radius


@struct.dataclass
class Heightfield:
    """Dense terrain map (row-major y-x indexing: height[iy, ix])."""

    origin: jax.Array  # (2,) world xy of cell (0,0) center
    resolution: jax.Array  # scalar, meters per cell
    height: jax.Array  # (H,W)
    traversability: jax.Array  # (H,W) in [0,1]
    normals: jax.Array  # (H,W,3) unit surface normals

    @classmethod
    def flat(
        cls,
        extent: float = 4.0,
        resolution: float = 0.04,
        height: float = 0.0,
        dtype=jnp.float32,
    ) -> "Heightfield":
        n = int(round(2 * extent / resolution))
        h = jnp.full((n, n), height, dtype)
        t = jnp.ones((n, n), dtype)
        nrm = jnp.zeros((n, n, 3), dtype).at[..., 2].set(1.0)
        return cls(
            origin=jnp.array([-extent, -extent], dtype),
            resolution=jnp.asarray(resolution, dtype),
            height=h,
            traversability=t,
            normals=nrm,
        )

    @classmethod
    def from_height_array(
        cls,
        height: jax.Array,
        origin=(-2.0, -2.0),
        resolution: float = 0.04,
        traversability: jax.Array | None = None,
        dtype=jnp.float32,
    ) -> "Heightfield":
        h = jnp.asarray(height, dtype)
        if traversability is None:
            traversability = _traversability_from_slope(h, resolution)
        nrm = _normals_from_height(h, resolution)
        return cls(
            origin=jnp.asarray(origin, dtype),
            resolution=jnp.asarray(resolution, dtype),
            height=h,
            traversability=jnp.asarray(traversability, dtype),
            normals=nrm,
        )

    def cell_index(self, xy: jax.Array):
        """(ix, iy) of the cell containing world xy (clamped to the map)."""
        rel = (xy - self.origin) / self.resolution
        ix = jnp.clip(jnp.round(rel[0]).astype(jnp.int32), 0,
                      self.height.shape[1] - 1)
        iy = jnp.clip(jnp.round(rel[1]).astype(jnp.int32), 0,
                      self.height.shape[0] - 1)
        return ix, iy

    def height_at(self, xy: jax.Array) -> jax.Array:
        """Bilinear height interpolation at world xy (clamped)."""
        rel = (xy - self.origin) / self.resolution
        x = jnp.clip(rel[0], 0.0, self.height.shape[1] - 1.001)
        y = jnp.clip(rel[1], 0.0, self.height.shape[0] - 1.001)
        x0 = jnp.floor(x).astype(jnp.int32)
        y0 = jnp.floor(y).astype(jnp.int32)
        fx, fy = x - x0, y - y0
        h = self.height
        h00 = h[y0, x0]
        h01 = h[y0, x0 + 1]
        h10 = h[y0 + 1, x0]
        h11 = h[y0 + 1, x0 + 1]
        return (
            h00 * (1 - fx) * (1 - fy)
            + h01 * fx * (1 - fy)
            + h10 * (1 - fx) * fy
            + h11 * fx * fy
        )

    def normal_at(self, xy: jax.Array) -> jax.Array:
        ix, iy = self.cell_index(xy)
        return self.normals[iy, ix]

    def traversability_at(self, xy: jax.Array) -> jax.Array:
        ix, iy = self.cell_index(xy)
        return self.traversability[iy, ix]


def _normals_from_height(h: jax.Array, resolution: float) -> jax.Array:
    dzdx = (jnp.roll(h, -1, axis=1) - jnp.roll(h, 1, axis=1)) / (2 * resolution)
    dzdy = (jnp.roll(h, -1, axis=0) - jnp.roll(h, 1, axis=0)) / (2 * resolution)
    n = jnp.stack([-dzdx, -dzdy, jnp.ones_like(h)], axis=-1)
    return n / jnp.linalg.norm(n, axis=-1, keepdims=True)


def _traversability_from_slope(
    h: jax.Array,
    resolution: float,
    critical_slope: float = 0.3,
    falloff: float = 0.25,
) -> jax.Array:
    """Full traversability below ``critical_slope`` (rad), linear falloff
    to zero over ``falloff`` rad beyond it. Walkable inclines must score
    above the 0.9 selection threshold or the foothold search abandons
    every gentle slope for distant flat cells."""
    n = _normals_from_height(h, resolution)
    slope = jnp.arccos(jnp.clip(n[..., 2], -1.0, 1.0))
    t_slope = jnp.clip(
        1.0 - jnp.maximum(slope - critical_slope, 0.0) / falloff, 0.0, 1.0
    )
    # Step filter (≙ the reference's traversability filter chain beyond
    # pure slope): cells far below/above their neighborhood mean — pit
    # floors, ledge tops — are not steppable even if locally flat.
    k = 5
    kernel = jnp.ones((k, k), h.dtype) / (k * k)
    padded = jnp.pad(h, k // 2, mode="edge")
    mean = jax.scipy.signal.convolve2d(padded, kernel, mode="valid")
    step = jnp.abs(h - mean)
    t_step = jnp.clip(1.0 - jnp.maximum(step - 0.02, 0.0) / 0.03, 0.0, 1.0)
    return t_slope * t_step


def optimize_foothold(
    hf: Heightfield,
    nominal_xy: jax.Array,  # (2,) desired foothold (e.g. Raibert target)
    hip_world: jax.Array | None = None,  # (3,) kinematic hip (reach check)
    max_reach: float = 0.55,  # ~l1+l2+d margin: 3-D leg reach
    window: int = SEARCH_WINDOW,
    threshold: float = TRAVERSABILITY_THRESHOLD,
):
    """Nearest traversable cell to the nominal foothold
    (≙ FootstepOptimization::getOptimizedFoothold).

    Returns (foothold_world (3,), normal (3,), found bool). If no cell in
    the window qualifies, the nominal foothold (with map height) is
    returned with found=False — the caller decides the fallback, like the
    reference keeping the unoptimized foothold.
    """
    dtype = nominal_xy.dtype
    k = window // 2
    ix, iy = hf.cell_index(nominal_xy)

    offs = jnp.arange(-k, k + 1)
    oy, ox = jnp.meshgrid(offs, offs, indexing="ij")
    cx = jnp.clip(ix + ox, 0, hf.height.shape[1] - 1)
    cy = jnp.clip(iy + oy, 0, hf.height.shape[0] - 1)

    cell_xy = (
        hf.origin[None, None, :]
        + jnp.stack([cx, cy], axis=-1).astype(dtype) * hf.resolution
    )
    trav = hf.traversability[cy, cx]
    cell_z = hf.height[cy, cx]
    d2 = jnp.sum((cell_xy - nominal_xy[None, None, :]) ** 2, axis=-1)

    ok = trav >= threshold
    if hip_world is not None:
        # 3-D kinematic reachability (≙ the reference's checkKinematic-
        # Constraints): a cell on a pit floor or ledge can be locally
        # flat yet outside the leg's reach sphere from the hip.
        cell_xyz = jnp.concatenate([cell_xy, cell_z[..., None]], axis=-1)
        reach2 = jnp.sum(
            (cell_xyz - hip_world[None, None, :]) ** 2, axis=-1
        )
        ok = ok & (reach2 <= max_reach**2)

    score = jnp.where(ok, d2, jnp.inf)
    flat = jnp.argmin(score.reshape(-1))
    found = jnp.isfinite(score.reshape(-1)[flat])

    best_xy = jnp.where(
        found, cell_xy.reshape(-1, 2)[flat], nominal_xy
    )
    z = hf.height_at(best_xy)
    bx, by = hf.cell_index(best_xy)
    normal = hf.normals[by, bx]
    foothold = jnp.concatenate([best_xy, z[None]])
    return foothold, normal, found


def optimize_footholds(
    hf: Heightfield,
    nominal: jax.Array,  # (4,3) nominal footholds (world)
    hips_world: jax.Array | None = None,  # (4,3)
    **kwargs,
):
    """All-legs foothold optimization: (footholds (4,3), normals (4,3),
    found (4,))."""
    if hips_world is None:
        return jax.vmap(
            lambda n: optimize_foothold(hf, n[:2], None, **kwargs)
        )(nominal)
    return jax.vmap(
        lambda n, h: optimize_foothold(hf, n[:2], h, **kwargs)
    )(nominal, hips_world)
