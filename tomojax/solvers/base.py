"""Shared solver infrastructure: operator closures and precomputed weights.

The reference holds solver state inside C++ engine objects and
re-initializes ASTRA algorithm objects per algorithm
(tomofusion/gpu/utils/tomoengine.cpp:151-254 `initialize_*`). Here the
equivalent is a frozen `System` pytree of precomputed weight arrays
(SIRT/SART row+column sums, Lipschitz constant) plus pure projector
closures; solvers are pure `state -> state` functions jitted as whole
iterations.
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from tomojax.geometry import Geometry
from tomojax.projector.joseph import fp, bp

_WEIGHT_EPS = 1e-6


def _safe_inv(w):
    return jnp.where(w > _WEIGHT_EPS, 1.0 / jnp.maximum(w, _WEIGHT_EPS), 0.0)


@jax.tree_util.register_pytree_node_class
@dataclasses.dataclass(frozen=True)
class System:
    """Geometry + precomputed per-geometry weights (single 2D problem,
    broadcast over the slice batch — the reference likewise computes one
    Lipschitz/weight set for the shared 2D geometry, tomoengine.cpp:370)."""

    geom: Geometry  # static
    row_sum: jnp.ndarray  # (1, Na, Nt)  = A 1  (ray lengths)
    col_sum: jnp.ndarray  # (1, N, N)    = A^T 1
    lipschitz: jnp.ndarray  # scalar: max(A^T A 1) (tomoengine.cpp:370-371)

    def tree_flatten(self):
        return (self.row_sum, self.col_sum, self.lipschitz), self.geom

    @classmethod
    def tree_unflatten(cls, geom, leaves):
        return cls(geom, *leaves)

    @property
    def inv_row(self):
        return _safe_inv(self.row_sum)

    @property
    def inv_col(self):
        return _safe_inv(self.col_sum)


def make_system(geom: Geometry) -> System:
    """Precompute SIRT weights and the Lipschitz estimate (one FP+BP)."""

    @jax.jit
    def _build():
        ones_img = jnp.ones((1, geom.n, geom.n), jnp.float32)
        row = fp(ones_img, geom)
        ones_sino = jnp.ones((1, geom.nproj, geom.nray), jnp.float32)
        col = bp(ones_sino, geom)
        lip = jnp.max(bp(row, geom))
        return row, col, lip

    row, col, lip = _build()
    return System(geom, row, col, lip)


def row_norms_sq(geom: Geometry) -> jnp.ndarray:
    """Per-ray squared operator-row norms ||a_r||^2 = sum of squared
    Joseph weights — the Cimmino weighting matrix M = diag(1/||a_r||^2)
    (reference ctvlib.cpp cimminos_method / row_inner_product).

    Computed analytically from the interpolation weights (no image data):
    for each angle/detector, sum (w0^2 + w1^2) * scale^2 over the steps.
    Returns (1, Na, Nt)."""
    n, nt = geom.n, geom.nray
    out = np.zeros((geom.nproj, nt), np.float32)
    tj = np.arange(nt) - (nt - 1) / 2.0
    ctr = (n - 1) / 2.0
    steps = np.arange(n, dtype=np.float64)
    for a in range(geom.nproj):
        c, s = geom.cos[a], geom.sin[a]
        if geom.row_driven[a]:
            denom, shear = c, -s / c
            coord = ctr - steps
            pos = tj[:, None] / denom + coord[None, :] * shear + ctr
        else:
            denom, shear = s, c / s
            coord = steps - ctr
            pos = ctr - tj[:, None] / denom + coord[None, :] * shear
        f = np.floor(pos)
        frac = pos - f
        i0 = f.astype(np.int64)
        i1 = i0 + 1
        w0 = np.where((i0 >= 0) & (i0 < n), 1.0 - frac, 0.0)
        w1 = np.where((i1 >= 0) & (i1 < n), frac, 0.0)
        out[a] = ((w0**2 + w1**2).sum(1) / denom**2).astype(np.float32)
    return jnp.asarray(out[None])


def bp_single_angle(y, cosv, sinv, n: int):
    """Backproject ONE angle with traced trig values (branch-free, see
    joseph.py) — used to build SART's per-angle column weights
    (iterative.make_sart_weights). (Ns, Nt) -> (Ns, N, N)."""
    nt = y.shape[-1]
    xc = jnp.arange(n, dtype=jnp.float32) - (n - 1) / 2.0
    yr = (n - 1) / 2.0 - jnp.arange(n, dtype=jnp.float32)
    d = jnp.maximum(jnp.abs(cosv), jnp.abs(sinv))
    jstar = cosv * xc[None, :] + sinv * yr[:, None] + (nt - 1) / 2.0
    j0 = jnp.floor(jstar).astype(jnp.int32)
    j1 = j0 + 1
    invd = 1.0 / d
    w0 = jnp.maximum(0.0, 1.0 - jnp.abs(j0 - jstar) * invd) * invd
    w1 = jnp.maximum(0.0, 1.0 - jnp.abs(j1 - jstar) * invd) * invd
    w0 = jnp.where((j0 >= 0) & (j0 < nt), w0, 0.0)
    w1 = jnp.where((j1 >= 0) & (j1 < nt), w1, 0.0)
    j0 = jnp.clip(j0, 0, nt - 1)
    j1 = jnp.clip(j1, 0, nt - 1)
    yb = y[:, None, None, :]
    g0 = jnp.take_along_axis(yb, j0[None, :, :, None], axis=-1)[..., 0]
    g1 = jnp.take_along_axis(yb, j1[None, :, :, None], axis=-1)[..., 0]
    return g0 * w0[None] + g1 * w1[None]
