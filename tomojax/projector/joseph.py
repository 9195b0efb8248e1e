"""Batched Joseph (driving-axis, linearly-interpolated) projector pair.

This is the TPU-native replacement for ASTRA's 2D parallel-beam CUDA
forward/back projectors that power every algorithm in the reference
(reference tomofusion/gpu/utils/tomoengine.cpp:109-127 forward,
:279-291 backward, consumed per-slice from a host loop). Here the whole
``(Nslice, N, N)`` volume is projected in one XLA program; the slice axis is
a pure batch axis, so it shards trivially over a device mesh (z-slab
data-parallelism, the TPU analog of the reference's MPI slab split,
mpi_astra_ctvlib.cpp:53-58).

Math
----
For angle ``theta`` the Joseph forward projector steps along the dominant
axis of the ray direction and linearly interpolates along the other:

* row-driven (``|cos| >= |sin|``): for each image row ``r`` interpolate the
  row at column coordinate ``c_pos = (t_j - y_r sin)/cos + (N-1)/2``, sum
  over rows and scale by ``1/|cos|``.
* col-driven: transpose roles (interpolate rows for each column, scale by
  ``1/|sin|``).

Writing the weight of pixel ``(r, c)`` for detector bin ``j`` in both
branches gives the *same* closed form

    ``W[a, j, r, c] = hat((j - J*)/D_a) / D_a``,
    ``J*[a, r, c]  = x_c cos_a + y_r sin_a + (Nray-1)/2``,
    ``D_a = max(|cos_a|, |sin_a|)``,

with ``hat(u) = max(0, 1-|u|)``. Since the window ``|j - J*| < D_a <= 1``
contains at most the two integers ``floor(J*)`` and ``floor(J*)+1``, the
backprojector is a branch-free 2-point *gather* from the sinogram — no
scatter — and is the **exact transpose** of the forward projector by
construction. Adjoint consistency (``<Ax, y> == <x, A^T y>``) is enforced
by tests (reference has this only implicitly via ASTRA; SURVEY.md §7.3
flags it as the determinant of iterative convergence parity).

Both operators are wrapped in ``jax.custom_vjp`` so autodiff through
``fp``/``bp`` uses the matched partner instead of differentiating the
gather graph.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from tomojax.geometry import Geometry

# Step-axis chunk for the forward projector scan: bounds the transient
# gather buffer to (Nslice, Nangles, Nray, FP_CHUNK) elements.
FP_CHUNK = 8
# Angle chunk for the backprojector scan: transient buffer
# (Nslice, BP_CHUNK, N, N).
BP_CHUNK = 4


def _hat_weights(pos, n_valid):
    """Linear-interpolation indices and weights with out-of-range masking.

    Returns (i0, i1, w0, w1) where contributions at indices outside
    [0, n_valid) get zero weight. Indices are clipped so they are always
    safe to gather with.
    """
    f = jnp.floor(pos)
    frac = pos - f
    i0 = f.astype(jnp.int32)
    i1 = i0 + 1
    w0 = jnp.where((i0 >= 0) & (i0 < n_valid), 1.0 - frac, 0.0)
    w1 = jnp.where((i1 >= 0) & (i1 < n_valid), frac, 0.0)
    i0 = jnp.clip(i0, 0, n_valid - 1)
    i1 = jnp.clip(i1, 0, n_valid - 1)
    return i0, i1, w0, w1


def _fp_branch(img, cosv, sinv, row_driven: bool, nray: int, chunk: int):
    """Forward-project one driving-axis branch.

    img: (Ns, N, N) volume slices.
    cosv/sinv: (Na,) trig of the angles in this branch (numpy constants).
    Returns (Ns, Na, Nray).
    """
    ns, n, _ = img.shape
    na = cosv.shape[0]
    if na == 0:
        return jnp.zeros((ns, 0, nray), img.dtype)

    if row_driven:
        # step over rows r, interpolate along columns:
        #   c_pos(a, j, r) = (t_j - y_r sin_a) / cos_a + (N-1)/2
        steps = img  # (Ns, step=r, interp=c)
        denom = cosv
        shear = -sinv / cosv  # coefficient of y_r
    else:
        # step over columns c, interpolate along rows:
        #   r_pos(a, j, c) = (N-1)/2 - (t_j - x_c cos_a) / sin_a
        steps = img.transpose(0, 2, 1)  # (Ns, step=c, interp=r)
        denom = sinv
        shear = cosv / sinv  # coefficient of x_c (see pos formula below)

    scale = jnp.asarray(1.0 / np.abs(denom), img.dtype)  # (Na,)
    inv_d = jnp.asarray(1.0 / denom, jnp.float32)
    shear = jnp.asarray(shear, jnp.float32)

    tj = jnp.arange(nray, dtype=jnp.float32) - (nray - 1) / 2.0  # (Nt,)
    ctr = (n - 1) / 2.0

    # Pad the step axis to a multiple of the chunk size.
    nsteps = n
    pad = (-nsteps) % chunk
    if pad:
        steps = jnp.pad(steps, ((0, 0), (0, pad), (0, 0)))
    nchunks = (nsteps + pad) // chunk
    steps = steps.reshape(ns, nchunks, chunk, n).transpose(1, 0, 2, 3)

    step_idx = jnp.arange(nchunks * chunk, dtype=jnp.float32).reshape(
        nchunks, chunk
    )

    def body(acc, args):
        img_k, s_idx = args  # (Ns, chunk, N), (chunk,)
        if row_driven:
            # y_r = (N-1)/2 - r ; pos = t_j/cos + y_r * (-sin/cos) + ctr
            coord = ctr - s_idx  # y_r
        else:
            # x_c = c - (N-1)/2 ; pos = ... (mirrored row coordinate)
            coord = s_idx - ctr  # x_c
        # pos: (Na, Nt, chunk)
        if row_driven:
            pos = (
                tj[None, :, None] * inv_d[:, None, None]
                + coord[None, None, :] * shear[:, None, None]
                + ctr
            )
        else:
            pos = (
                ctr
                - tj[None, :, None] * inv_d[:, None, None]
                + coord[None, None, :] * shear[:, None, None]
            )
        i0, i1, w0, w1 = _hat_weights(pos, n)
        # gather: out[s, a, j, m] = img_k[s, m, i(a, j, m)]
        img_b = img_k[:, None, None, :, :]  # (Ns, 1, 1, chunk, N)
        g0 = jnp.take_along_axis(
            img_b, i0[None, :, :, :, None].astype(jnp.int32), axis=-1
        )[..., 0]
        g1 = jnp.take_along_axis(
            img_b, i1[None, :, :, :, None].astype(jnp.int32), axis=-1
        )[..., 0]
        contrib = (g0 * w0[None] + g1 * w1[None]).sum(axis=-1)
        return acc + contrib, None

    acc0 = jnp.zeros((ns, na, nray), img.dtype)
    acc, _ = jax.lax.scan(body, acc0, (steps, step_idx))
    return acc * scale[None, :, None]


def _fp_impl(x, geom: Geometry, chunk: int = FP_CHUNK):
    """Forward projection: (Ns, N, N) -> (Ns, Nproj, Nray)."""
    rd = geom.row_driven
    p_row = _fp_branch(
        x, geom.cos[rd], geom.sin[rd], True, geom.nray, chunk
    )
    p_col = _fp_branch(
        x, geom.cos[~rd], geom.sin[~rd], False, geom.nray, chunk
    )
    p = jnp.concatenate([p_row, p_col], axis=1)
    inv = jnp.asarray(geom.inv_perm)
    return p[:, inv, :]


def _bp_impl(y, geom: Geometry, chunk: int = BP_CHUNK):
    """Exact-adjoint backprojection: (Ns, Nproj, Nray) -> (Ns, N, N).

    Branch-free gather formulation (see module docstring): for each pixel
    the detector coordinate J* is affine in (r, c); only bins floor(J*)
    and floor(J*)+1 have nonzero Joseph weight.
    """
    ns, na, nt = y.shape
    n = geom.n
    assert na == geom.nproj and nt == geom.nray

    cosv = jnp.asarray(geom.cos, jnp.float32)
    sinv = jnp.asarray(geom.sin, jnp.float32)
    dv = jnp.asarray(geom.driving, jnp.float32)

    xc = jnp.arange(n, dtype=jnp.float32) - (n - 1) / 2.0  # x_c
    yr = (n - 1) / 2.0 - jnp.arange(n, dtype=jnp.float32)  # y_r
    off = (nt - 1) / 2.0

    pad = (-na) % chunk
    ypad = jnp.pad(y, ((0, 0), (0, pad), (0, 0)))
    cpad = jnp.pad(cosv, (0, pad))
    spad = jnp.pad(sinv, (0, pad))
    dpad = jnp.pad(dv, (0, pad), constant_values=1.0)
    nchunks = (na + pad) // chunk

    ych = ypad.reshape(ns, nchunks, chunk, nt).transpose(1, 0, 2, 3)
    cch = cpad.reshape(nchunks, chunk)
    sch = spad.reshape(nchunks, chunk)
    dch = dpad.reshape(nchunks, chunk)

    def body(acc, args):
        yk, ck, sk, dk = args  # (Ns, chunk, Nt), (chunk,) x3
        # J*: (chunk, N, N)
        jstar = (
            ck[:, None, None] * xc[None, None, :]
            + sk[:, None, None] * yr[None, :, None]
            + off
        )
        j0 = jnp.floor(jstar).astype(jnp.int32)
        j1 = j0 + 1
        invd = 1.0 / dk[:, None, None]
        w0 = jnp.maximum(0.0, 1.0 - jnp.abs(j0 - jstar) * invd) * invd
        w1 = jnp.maximum(0.0, 1.0 - jnp.abs(j1 - jstar) * invd) * invd
        w0 = jnp.where((j0 >= 0) & (j0 < nt), w0, 0.0)
        w1 = jnp.where((j1 >= 0) & (j1 < nt), w1, 0.0)
        j0 = jnp.clip(j0, 0, nt - 1)
        j1 = jnp.clip(j1, 0, nt - 1)
        # gather: val[s, ai, r, c] = yk[s, ai, j(ai, r, c)]
        yb = yk[:, :, None, None, :]  # (Ns, chunk, 1, 1, Nt)
        g0 = jnp.take_along_axis(yb, j0[None, :, :, :, None], axis=-1)[..., 0]
        g1 = jnp.take_along_axis(yb, j1[None, :, :, :, None], axis=-1)[..., 0]
        contrib = (g0 * w0[None] + g1 * w1[None]).sum(axis=1)
        return acc + contrib, None

    acc0 = jnp.zeros((ns, n, n), y.dtype)
    acc, _ = jax.lax.scan(body, acc0, (ych, cch, sch, dch))
    return acc


# ---------------------------------------------------------------------------
# Public API: custom-vjp wrapped pair (A and A^T are each other's vjp).
# ---------------------------------------------------------------------------


def fp(x, geom: Geometry):
    """Forward projection A x : (Ns, N, N) -> (Ns, Nproj, Nray)."""
    return _fp_impl(x, geom)


def bp(y, geom: Geometry):
    """Matched backprojection A^T y : (Ns, Nproj, Nray) -> (Ns, N, N)."""
    return _bp_impl(y, geom)


@partial(jax.custom_vjp, nondiff_argnums=(1,))
def fp_adjointable(x, geom: Geometry):
    return _fp_impl(x, geom)


def _fp_fwd(x, geom):
    return _fp_impl(x, geom), None


def _fp_bwd(geom, _res, g):
    return (_bp_impl(g, geom),)


fp_adjointable.defvjp(_fp_fwd, _fp_bwd)


@partial(jax.custom_vjp, nondiff_argnums=(1,))
def bp_adjointable(y, geom: Geometry):
    return _bp_impl(y, geom)


def _bp_fwd(y, geom):
    return _bp_impl(y, geom), None


def _bp_bwd(geom, _res, g):
    return (_fp_impl(g, geom),)


bp_adjointable.defvjp(_bp_fwd, _bp_bwd)
