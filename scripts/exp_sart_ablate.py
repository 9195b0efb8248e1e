"""Ablation of the fused Pallas SART kernel (scripts companion to
solvers/pallas_sart.py): where do the milliseconds go?

Variants at 256^3 x 90 on v5e:
  full   — production kernel
  nohat  — W chunks replaced by constant broadcasts (both passes)
  nofp   — FP pass skipped (resid = b): isolates the update pass
  noupd  — update pass skipped: isolates the FP pass
  na30   — full kernel, 30 angles (linearity in Na => per-angle compute
           bound, not volume-HBM bound)
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
    _angle_tables, _pad_axis, _round_up,
)
from tomojax.solvers.pallas_sart import (  # noqa: E402
    _sart_chunk, _sart_params, _sart_slice_block,
)

PREC = jax.lax.Precision.DEFAULT


def _kernel(n, nt, ch, variant, cos_ref, sin_ref, invd_ref, beta_ref,
            x_ref, b_ref, invrow_ref, invc_ref, out_ref, sem):
    beta = beta_ref[0, 0]
    k = pl.program_id(1)
    s = pl.program_id(0)
    s_blk = out_ref.shape[-1]

    @pl.when(k == 0)
    def _():
        cp = pltpu.make_async_copy(
            x_ref.at[:, :, pl.ds(s * s_blk, s_blk)], out_ref, sem
        )
        cp.start()
        cp.wait()

    ck = cos_ref[0, k]
    sk = sin_ref[0, k]
    invd = invd_ref[0, k]
    off = (nt - 1) / 2.0
    ctr = (n - 1) / 2.0
    xc = jax.lax.broadcasted_iota(jnp.int32, (1, n), 1).astype(jnp.float32) - ctr
    iota_r = jax.lax.broadcasted_iota(jnp.int32, (ch, 1), 0).astype(jnp.float32)
    iota_j = jax.lax.broadcasted_iota(jnp.int32, (1, 1, nt), 2).astype(jnp.float32)
    nch = n // ch

    def wchunk(i):
        if variant == "nohat":
            return jnp.full((ch * n, nt), 0.01, jnp.float32) * invd
        yr = ctr - (i * ch + iota_r)
        jstar = ck * xc + (sk * yr + off)
        w = (
            jnp.maximum(
                0.0, 1.0 - jnp.abs(iota_j - jstar[:, :, None]) * invd
            )
            * invd
        )
        return w.reshape(ch * n, nt)

    if variant == "nofp":
        proj = jnp.zeros((nt, s_blk), jnp.float32)
    elif variant == "rot":
        # manually rotated pipeline: the hat build of chunk i+1 carries
        # through the loop so it has no data dependence on the dot of
        # chunk i — giving the scheduler a chance to overlap VPU (hat)
        # with MXU (dot) that the naive build-then-dot chain forbids
        def fp_body(i, carry):
            acc, w = carry
            w_next = wchunk(jnp.minimum(i + 1, nch - 1))
            xb = out_ref[pl.ds(i * ch, ch), :, :].reshape(ch * n, s_blk)
            acc = acc + jax.lax.dot_general(
                w, xb, (((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32, precision=PREC,
            )
            return acc, w_next

        proj, _ = jax.lax.fori_loop(
            0, nch, fp_body,
            (jnp.zeros((nt, s_blk), jnp.float32), wchunk(0)),
        )
    else:
        def fp_body(i, acc):
            w = wchunk(i)
            xb = out_ref[pl.ds(i * ch, ch), :, :].reshape(ch * n, s_blk)
            return acc + jax.lax.dot_general(
                w, xb, (((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32, precision=PREC,
            )

        proj = jax.lax.fori_loop(
            0, nch, fp_body, jnp.zeros((nt, s_blk), jnp.float32)
        )
    resid = b_ref[0] - proj

    if variant == "rot":
        def upd_body(i, w):
            w_next = wchunk(jnp.minimum(i + 1, nch - 1)) * invrow_ref[0]
            upd = jax.lax.dot_general(
                w, resid, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32, precision=PREC,
            ).reshape(ch, n, s_blk)
            idx = (pl.ds(i * ch, ch), slice(None), slice(None))
            invc = invc_ref[0, pl.ds(i * ch, ch), :]
            out_ref[idx] = jnp.maximum(
                out_ref[idx] + beta * invc[:, :, None] * upd, 0.0
            )
            return w_next

        jax.lax.fori_loop(0, nch, upd_body, wchunk(0) * invrow_ref[0])
    elif variant != "noupd":
        def upd_body(i, _):
            w = wchunk(i) * invrow_ref[0]
            upd = jax.lax.dot_general(
                w, resid, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32, precision=PREC,
            ).reshape(ch, n, s_blk)
            idx = (pl.ds(i * ch, ch), slice(None), slice(None))
            invc = invc_ref[0, pl.ds(i * ch, ch), :]
            out_ref[idx] = jnp.maximum(
                out_ref[idx] + beta * invc[:, :, None] * upd, 0.0
            )
            return 0

        jax.lax.fori_loop(0, nch, upd_body, 0)


def _phase_kernel(n, nt, ch, cos_ref, sin_ref, invd_ref, beta_ref,
                  x_ref, b_ref, invrow_ref, invc_ref, out_ref, proj_ref,
                  sem):
    """Grid-phase variant: the chunk loop is the innermost GRID axis
    (2*nch steps per angle: nch FP-accumulate steps, then nch update
    steps), so Mosaic pipelines hat builds and dots across steps instead
    of serializing them inside a fori."""
    beta = beta_ref[0, 0]
    k = pl.program_id(1)
    p = pl.program_id(2)
    s = pl.program_id(0)
    s_blk = out_ref.shape[-1]
    nch = n // ch

    @pl.when((k == 0) & (p == 0))
    def _():
        cp = pltpu.make_async_copy(
            x_ref.at[:, :, pl.ds(s * s_blk, s_blk)], out_ref, sem
        )
        cp.start()
        cp.wait()

    ck = cos_ref[0, k]
    sk = sin_ref[0, k]
    invd = invd_ref[0, k]
    off = (nt - 1) / 2.0
    ctr = (n - 1) / 2.0
    xc = jax.lax.broadcasted_iota(jnp.int32, (1, n), 1).astype(jnp.float32) - ctr
    iota_r = jax.lax.broadcasted_iota(jnp.int32, (ch, 1), 0).astype(jnp.float32)
    iota_j = jax.lax.broadcasted_iota(jnp.int32, (1, 1, nt), 2).astype(jnp.float32)

    def wchunk(i):
        yr = ctr - (i * ch + iota_r)
        jstar = ck * xc + (sk * yr + off)
        u = (iota_j - jstar[:, :, None]) * invd
        w = jnp.maximum(0.0, jnp.minimum(1.0 - u, 1.0 + u))
        return w.reshape(ch * n, nt)

    @pl.when(p < nch)
    def _fp():
        i = p
        w = wchunk(i)
        xb = out_ref[pl.ds(i * ch, ch), :, :].reshape(ch * n, s_blk)
        contrib = jax.lax.dot_general(
            w, xb, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32, precision=PREC,
        )
        proj_ref[:] = jnp.where(i == 0, contrib, proj_ref[:] + contrib)

    @pl.when(p >= nch)
    def _upd():
        i = p - nch

        @pl.when(p == nch)
        def _():
            proj_ref[:] = b_ref[0] - invd * proj_ref[:]

        w = wchunk(i) * invrow_ref[0]
        upd = jax.lax.dot_general(
            w, proj_ref[:], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32, precision=PREC,
        ).reshape(ch, n, s_blk)
        idx = (pl.ds(i * ch, ch), slice(None), slice(None))
        invc = invc_ref[0, pl.ds(i * ch, ch), :]
        out_ref[idx] = jnp.maximum(
            out_ref[idx] + (beta * invd) * invc[:, :, None] * upd, 0.0
        )


def make_phase(geom, ns):
    n, nt, na = geom.n, geom.nray, geom.nproj
    s_blk = _sart_slice_block(n, ns)
    ch = _sart_chunk(n, nt, s_blk, 32)
    nch = n // ch
    ns_pad = _round_up(ns, s_blk)
    cos, sin, invd = _angle_tables(geom, na)
    cos, sin, invd = (t.reshape(1, na) for t in (cos, sin, invd))
    rng = np.random.default_rng(1)
    invrow = jnp.asarray(rng.random((na, 1, nt)).astype(np.float32))
    invc = jnp.asarray(rng.random((na, n, n)).astype(np.float32))
    beta_arr = jnp.ones((1, 1), jnp.float32)
    ang = pl.BlockSpec((1, na), lambda s, k, p: (0, 0),
                       memory_space=pltpu.SMEM)
    beta_spec = pl.BlockSpec((1, 1), lambda s, k, p: (0, 0),
                             memory_space=pltpu.SMEM)
    vol = pl.BlockSpec((n, n, s_blk), lambda s, k, p: (0, 0, s))
    xs = pl.BlockSpec(memory_space=pl.ANY)
    bs = pl.BlockSpec((1, nt, s_blk), lambda s, k, p: (k, 0, s))
    irs = pl.BlockSpec((1, 1, nt), lambda s, k, p: (k, 0, 0))
    ics = pl.BlockSpec((1, n, n), lambda s, k, p: (k, 0, 0))
    try:
        params = pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary", "arbitrary"),
            vmem_limit_bytes=100 * 1024 * 1024,
        )
    except TypeError:
        params = None

    def run(x, b):
        x = _pad_axis(x, 2, ns_pad)
        b = _pad_axis(b, 2, ns_pad)
        return pl.pallas_call(
            partial(_phase_kernel, n, nt, ch),
            grid=(ns_pad // s_blk, na, 2 * nch),
            in_specs=[ang, ang, ang, beta_spec, xs, bs, irs, ics],
            out_specs=vol,
            out_shape=jax.ShapeDtypeStruct((n, n, ns_pad), jnp.float32),
            scratch_shapes=[
                pltpu.VMEM((nt, s_blk), jnp.float32),
                pltpu.SemaphoreType.DMA,
            ],
            compiler_params=params,
        )(cos, sin, invd, beta_arr, x, b, invrow, invc)[:, :, :ns]

    return run


def make(geom, ns, variant):
    n, nt, na = geom.n, geom.nray, geom.nproj
    ch = _sart_chunk(n, nt, _sart_slice_block(n, ns), 32)
    s_blk = _sart_slice_block(n, ns)
    ns_pad = _round_up(ns, s_blk)
    cos, sin, invd = _angle_tables(geom, na)
    cos, sin, invd = (t.reshape(1, na) for t in (cos, sin, invd))
    rng = np.random.default_rng(1)
    invrow = jnp.asarray(rng.random((na, 1, nt)).astype(np.float32))
    invc = jnp.asarray(rng.random((na, n, n)).astype(np.float32))
    beta_arr = jnp.ones((1, 1), jnp.float32)
    ang = pl.BlockSpec((1, na), lambda s, k: (0, 0), memory_space=pltpu.SMEM)
    beta_spec = pl.BlockSpec((1, 1), lambda s, k: (0, 0),
                             memory_space=pltpu.SMEM)
    vol = pl.BlockSpec((n, n, s_blk), lambda s, k: (0, 0, s))
    xs = pl.BlockSpec(memory_space=pl.ANY)
    bs = pl.BlockSpec((1, nt, s_blk), lambda s, k: (k, 0, s))
    irs = pl.BlockSpec((1, 1, nt), lambda s, k: (k, 0, 0))
    ics = pl.BlockSpec((1, n, n), lambda s, k: (k, 0, 0))

    def run(x, b):
        x = _pad_axis(x, 2, ns_pad)
        b = _pad_axis(b, 2, ns_pad)
        return pl.pallas_call(
            partial(_kernel, n, nt, ch, variant),
            grid=(ns_pad // s_blk, na),
            in_specs=[ang, ang, ang, beta_spec, xs, bs, irs, ics],
            out_specs=vol,
            out_shape=jax.ShapeDtypeStruct((n, n, ns_pad), jnp.float32),
            scratch_shapes=[pltpu.SemaphoreType.DMA],
            compiler_params=_sart_params(),
        )(cos, sin, invd, beta_arr, x, b, invrow, invc)[:, :, :ns]

    return run


def slope(f, x, iters=4):
    c1 = jax.jit(lambda v: jnp.sum(f(v)))

    def chain(v):
        for _ in range(1 + iters):
            v = f(v)
        return jnp.sum(v)

    ck = jax.jit(chain)
    float(c1(x)); float(ck(x))
    best = np.inf
    for _ in range(3):
        t0 = time.perf_counter(); float(c1(x)); t1 = time.perf_counter() - t0
        t0 = time.perf_counter(); float(ck(x)); tk = time.perf_counter() - t0
        best = min(best, (tk - t1) / iters * 1e3)
    return best


def main():
    n = ns = 256
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.random((n, n, ns)).astype(np.float32))
    print("device:", jax.devices()[0].device_kind)
    for na, variants in ((90, ("phase",)),):
        geom = Geometry.make(n, np.deg2rad(np.linspace(-76, 76, na)))
        b = jnp.asarray(rng.random((na, n, ns)).astype(np.float32))
        ref = None
        for v in variants:
            f = make_phase(geom, ns) if v == "phase" else make(geom, ns, v)
            out = f(x, b)
            if ref is None:
                ref = out
            err = float(jnp.max(jnp.abs(out - ref))) / float(
                jnp.max(jnp.abs(ref))
            )
            ms = slope(lambda vv: f(vv, b), x)
            print(f"na={na} {v:6s}: {ms:7.2f} ms  rel|d|={err:.2e}")


if __name__ == "__main__":
    main()
