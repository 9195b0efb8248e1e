"""One-off experiment: projector kernel variants (round 3 follow-up).

Measures, on the real TPU at 256^3 x 90 (and optionally 512-class):

  * FP dense a_blk = 16 vs 32 (a_blk=32 halves the program count at the
    same total work — 8->16 was measured in round 2, 32 never was).
  * The 4-op hat build: w = max(0, invd - |q_j - q_star|) with
    q_j = invd^2 * jj, q_star = invd^2 * jstar — algebraically equal to
    the 6-op invd * max(0, 1 - invd*|jj - jstar|) (one fewer rounding),
    but 4 full-tensor VPU ops instead of 6. The speed-of-light table in
    docs/ARCHITECTURE.md names the VPU hat build as the projector
    limiter.
  * BP dense rb=32 with the same 4-op build.

Slope-timed (axon caches identical calls): v' = v*(1 + 0*sum(op(v)))
chains keep each step's input fresh; the extra elementwise+reduction is
identical across variants.
"""

import sys
import time
from functools import partial

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

sys.path.insert(0, "/root/repo")
from tomojax.geometry import Geometry  # noqa: E402
from tomojax.projector.pallas_joseph import (  # noqa: E402
    _angle_tables, _compiler_params, _pad_axis, _round_up, _slice_block,
)

PREC = jax.lax.Precision.DEFAULT


def _dot(w, v):
    return jax.lax.dot_general(
        w, v, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32, precision=PREC,
    )


def _fp_kernel(n, nray, w4, cos_ref, sin_ref, invd_ref, img_ref, out_ref):
    k = pl.program_id(2)

    @pl.when(k == 0)
    def _():
        out_ref[:] = jnp.zeros_like(out_ref)

    a_blk, _, s_blk = out_ref.shape
    yr = (n - 1) / 2.0 - k.astype(jnp.float32)
    xc = jax.lax.broadcasted_iota(jnp.int32, (1, n), 1).astype(jnp.float32) - (n - 1) / 2.0
    off = (nray - 1) / 2.0
    jstar = cos_ref[:] * xc + (sin_ref[:] * yr + off)  # (A_BLK, N)
    iota_j = jax.lax.broadcasted_iota(jnp.int32, (1, nray, 1), 1).astype(jnp.float32)
    invd = invd_ref[:][:, :, None]  # (A_BLK, 1, 1)
    if w4:
        inv2 = invd * invd
        qj = iota_j * inv2            # (A_BLK, Nt, 1)
        qs = (inv2[:, :, 0] * jstar)[:, None, :]  # (A_BLK, 1, N)
        w = jnp.maximum(0.0, invd - jnp.abs(qj - qs))
    else:
        w = (
            jnp.maximum(0.0, 1.0 - jnp.abs(iota_j - jstar[:, None, :]) * invd)
            * invd
        )
    contrib = _dot(w.reshape(a_blk * nray, n), img_ref[0])
    out_ref[:] += contrib.reshape(a_blk, nray, s_blk)


def make_fp(geom, ns, a_blk, w4):
    n, nray, na = geom.n, geom.nray, geom.nproj
    s_blk = _slice_block(ns)
    ns_pad = _round_up(ns, s_blk)
    na_pad = _round_up(na, a_blk)
    cos, sin, invd = _angle_tables(geom, na_pad)
    ang_spec = pl.BlockSpec((a_blk, 1), lambda a, s, k: (a, 0))
    img_spec = pl.BlockSpec((1, n, s_blk), lambda a, s, k: (k, 0, s))
    out_spec = pl.BlockSpec((a_blk, nray, s_blk), lambda a, s, k: (a, 0, s))
    out_shape = jax.ShapeDtypeStruct((na_pad, nray, ns_pad), jnp.float32)
    grid = (na_pad // a_blk, ns_pad // s_blk, n)

    def fp(img):
        img = _pad_axis(img, 2, ns_pad)
        out = pl.pallas_call(
            partial(_fp_kernel, n, nray, w4),
            grid=grid,
            in_specs=[ang_spec, ang_spec, ang_spec, img_spec],
            out_specs=out_spec,
            out_shape=out_shape,
            compiler_params=_compiler_params(),
        )(cos, sin, invd, img)
        return out[:na, :, :ns]

    return fp


def _bp_kernel(n, nray, rb, w4, cos_ref, sin_ref, invd_ref, y_ref, out_ref):
    r = pl.program_id(0)
    k = pl.program_id(2)

    @pl.when(k == 0)
    def _():
        out_ref[:] = jnp.zeros_like(out_ref)

    _, _, s_blk = out_ref.shape
    ck = cos_ref[0, k]
    sk = sin_ref[0, k]
    invd = invd_ref[0, k]
    rows = (r * rb + jax.lax.broadcasted_iota(jnp.int32, (rb, 1), 0)).astype(jnp.float32)
    yr = (n - 1) / 2.0 - rows
    xc = jax.lax.broadcasted_iota(jnp.int32, (1, n), 1).astype(jnp.float32) - (n - 1) / 2.0
    off = (nray - 1) / 2.0
    jstar = ck * xc + (sk * yr + off)  # (RB, N)
    iota_j = jax.lax.broadcasted_iota(jnp.int32, (1, 1, nray), 2).astype(jnp.float32)
    if w4:
        inv2 = invd * invd
        qj = iota_j * inv2
        qs = (inv2 * jstar)[:, :, None]
        w = jnp.maximum(0.0, invd - jnp.abs(qj - qs))
    else:
        w = (
            jnp.maximum(0.0, 1.0 - jnp.abs(iota_j - jstar[:, :, None]) * invd)
            * invd
        )
    contrib = _dot(w.reshape(rb * n, nray), y_ref[0])
    out_ref[:] += contrib.reshape(rb, n, s_blk)


def make_bp(geom, ns, rb, w4):
    n, nray, na = geom.n, geom.nray, geom.nproj
    s_blk = _slice_block(ns)
    ns_pad = _round_up(ns, s_blk)
    cos, sin, invd = _angle_tables(geom, na)
    cos, sin, invd = (t.reshape(1, na) for t in (cos, sin, invd))
    n_pad = _round_up(n, rb)
    ang_spec = pl.BlockSpec((1, na), lambda r, s, k: (0, 0),
                            memory_space=pltpu.SMEM)
    sino_spec = pl.BlockSpec((1, nray, s_blk), lambda r, s, k: (k, 0, s))
    out_spec = pl.BlockSpec((rb, n, s_blk), lambda r, s, k: (r, 0, s))
    out_shape = jax.ShapeDtypeStruct((n_pad, n, ns_pad), jnp.float32)
    grid = (n_pad // rb, ns_pad // s_blk, na)

    def bp(yt):
        yt = _pad_axis(yt, 2, ns_pad)
        out = pl.pallas_call(
            partial(_bp_kernel, n, nray, rb, w4),
            grid=grid,
            in_specs=[ang_spec, ang_spec, ang_spec, sino_spec],
            out_specs=out_spec,
            out_shape=out_shape,
            compiler_params=_compiler_params(),
        )(cos, sin, invd, yt)
        return out[:n, :, :ns]

    return bp


def slope_time(op, x, x2, iters=8):
    def chain(v, k):
        for _ in range(k):
            v = v * (1.0 + 0.0 * jnp.sum(op(v)))
        return jnp.sum(v)

    c1 = jax.jit(lambda v: chain(v, 1))
    ck = jax.jit(lambda v: chain(v, 1 + iters))
    float(c1(x)), float(ck(x))
    best = np.inf
    for _ in range(3):
        t0 = time.perf_counter(); float(c1(x2)); t1 = time.perf_counter() - t0
        t0 = time.perf_counter(); float(ck(x2)); tk = time.perf_counter() - t0
        best = min(best, (tk - t1) / iters * 1e3)
    return best


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 256
    ns = int(sys.argv[2]) if len(sys.argv) > 2 else n
    geom = Geometry.make(n, np.deg2rad(np.linspace(-76, 76, 90)))
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.random((n, n, ns), np.float32))
    x2 = jnp.asarray(rng.random((n, n, ns), np.float32))
    y = jnp.asarray(rng.random((geom.nproj, geom.nray, ns), np.float32))
    y2 = jnp.asarray(rng.random((geom.nproj, geom.nray, ns), np.float32))
    print(f"device: {jax.devices()[0].device_kind}  {n}^2x{ns}, 90 angles")

    ref = None
    for a_blk in (16, 32):
        for w4 in (False, True):
            fp = make_fp(geom, ns, a_blk, w4)
            ms = slope_time(fp, x, x2)
            out = fp(x2)
            if ref is None:
                ref = out
            err = float(jnp.max(jnp.abs(out - ref)))
            print(f"FP dense a_blk={a_blk:2d} w4={int(w4)}: {ms:7.2f} ms  max|d|={err:.2e}")

    refb = None
    for rb in (32,):
        for w4 in (False, True):
            bp = make_bp(geom, ns, rb, w4)
            ms = slope_time(bp, y, y2)
            out = bp(y2)
            if refb is None:
                refb = out
            err = float(jnp.max(jnp.abs(out - refb)))
            print(f"BP dense rb={rb:2d}    w4={int(w4)}: {ms:7.2f} ms  max|d|={err:.2e}")


if __name__ == "__main__":
    main()
