"""Support-region geometry: masked footholds → halfspace constraints.

≙ grid_map::Polygon usage in the reference's pose optimization
(``free_gait_core/src/base_motion/BaseAuto.cpp:109-124`` — support
polygon with margin, 2-leg thickened line;
``PoseOptimizationQP.cpp:78-86`` — ``convertToInequalityConstraints``).

Everything is fixed-shape and mask-driven so it vmaps over scenario
batches and runs inside ``lax.scan``:

* 3-4 support legs → the convex polygon through the supported feet in
  counter-clockwise leg order (LF, LH, RH, RF — TypeDefs.hpp foothold
  ordering), shrunk inward by ``margin``;
* 2 support legs → the connecting segment thickened into a thin
  rectangle (``BaseAuto.cpp:119-122``);
* ≤1 support leg → a small box around the single foot (or the origin).

Constraints are returned as (normals (MAX_EDGES,2), offsets (MAX_EDGES,))
with padded rows satisfied everywhere: a point x is inside iff
``normals @ x ≥ offsets`` row-wise.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

MAX_EDGES = 6
# Counter-clockwise traversal of the legs seen from above
# (+x forward, +y left): LF → LH → RH → RF.
CCW_ORDER = jnp.array([0, 3, 2, 1], jnp.int32)
LINE_THICKNESS = 0.001  # BaseAuto.cpp:119-122
DEFAULT_MARGIN = 0.04  # StepParameters.hpp support margin


def support_halfspaces(
    feet_xy: jax.Array,  # (4,2) foot positions (world or footprint frame)
    support: jax.Array,  # (4,) bool
    margin: float | jax.Array = DEFAULT_MARGIN,
):
    """Inward halfspaces of the support region: (normals, offsets).

    ``normals @ x >= offsets`` (all rows) ⇔ x inside the shrunk region.
    Padded rows are (0,0) ≥ -1: always true.
    """
    dtype = feet_xy.dtype
    m = jnp.asarray(margin, dtype)
    sup = support[CCW_ORDER]
    pts = feet_xy[CCW_ORDER]
    n_sup = jnp.sum(sup.astype(jnp.int32))

    # Compact the supported points to the front, preserving ccw order:
    # order by (not supported, ccw position) — stable.
    key = jnp.where(sup, 0, 1) * 8 + jnp.arange(4)
    perm = jnp.argsort(key)
    cpts = pts[perm]  # first n_sup rows are the ccw-ordered support feet

    idx = jnp.arange(4)
    nxt = jnp.where(idx + 1 >= n_sup, 0, idx + 1)

    # --- polygon case (n_sup >= 3): edge i = cpts[i] -> cpts[nxt[i]] ----
    a = cpts
    b = cpts[nxt]
    e = b - a
    # inward normal of a ccw polygon edge: rotate edge by +90°
    nrm = jnp.stack([-e[:, 1], e[:, 0]], axis=1)
    nlen = jnp.maximum(jnp.linalg.norm(nrm, axis=1, keepdims=True), 1e-9)
    nrm = nrm / nlen
    off = jnp.sum(nrm * a, axis=1) + m
    edge_valid = idx < n_sup
    poly_n = jnp.where(edge_valid[:, None], nrm, 0.0)
    poly_o = jnp.where(edge_valid, off, -1.0)
    poly_n = jnp.concatenate([poly_n, jnp.zeros((2, 2), dtype)], axis=0)
    poly_o = jnp.concatenate([poly_o, jnp.full((2,), -1.0, dtype)], axis=0)

    # --- 2-leg case: thickened segment (rectangle) ----------------------
    p0, p1 = cpts[0], cpts[1]
    d = p1 - p0
    dlen = jnp.maximum(jnp.linalg.norm(d), 1e-9)
    t = d / dlen  # along the segment
    q = jnp.stack([-t[1], t[0]])  # perpendicular
    h = jnp.asarray(LINE_THICKNESS, dtype)
    # inside: |q·(x − p0)| ≤ h and 0 ≤ t·(x − p0) ≤ |d|  (margin shrinks
    # the along-segment extent; the thickness is NOT shrunk, matching the
    # reference which thickens after adding the margin-free line).
    line_n = jnp.stack([q, -q, t, -t])
    line_o = jnp.stack(
        [
            q @ p0 - h,
            -(q @ p0) - h,
            t @ p0 + m,
            -(t @ p1) + m,
        ]
    )
    line_n = jnp.concatenate([line_n, jnp.zeros((2, 2), dtype)], axis=0)
    line_o = jnp.concatenate([line_o, jnp.full((2,), -1.0, dtype)], axis=0)

    # --- ≤1-leg case: small box around the foot (or origin) -------------
    c = jnp.where(n_sup >= 1, cpts[0], jnp.zeros(2, dtype))
    box = jnp.asarray(0.02, dtype)
    box_n = jnp.array([[1.0, 0.0], [-1.0, 0.0], [0.0, 1.0], [0.0, -1.0]], dtype)
    box_o = jnp.stack([c[0] - box, -c[0] - box, c[1] - box, -c[1] - box])
    box_n = jnp.concatenate([box_n, jnp.zeros((2, 2), dtype)], axis=0)
    box_o = jnp.concatenate([box_o, jnp.full((2,), -1.0, dtype)], axis=0)

    normals = jnp.where(
        n_sup >= 3, poly_n, jnp.where(n_sup == 2, line_n, box_n)
    )
    offsets = jnp.where(
        n_sup >= 3, poly_o, jnp.where(n_sup == 2, line_o, box_o)
    )
    return normals, offsets


def point_inside(normals, offsets, x, tol: float = 0.0):
    """True if x satisfies every halfspace (with tolerance)."""
    return jnp.all(normals @ x >= offsets - tol)


def violation(normals, offsets, x):
    """Max constraint violation at x (≤ 0 ⇒ inside)."""
    return jnp.max(offsets - normals @ x)
