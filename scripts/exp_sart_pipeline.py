"""Round-5 SART kernel structure experiments (round-4 VERDICT #1).

The fused Pallas SART sweep (solvers/pallas_sart.py) measures 22.2 ms at
256^3 x 90 on v5e vs a ~9 ms floor: the hat (W) build sits exposed on
the in-kernel fori critical path (scripts/exp_sart_ablate.py: 13.4 ms
marginal vs a 4.6 ms VPU-peak op-count model — i.e. mostly
serialization, not arithmetic). Two NEW structures that take the build
off the critical path, per the verdict:

  dbuf  — software-pipelined hat build: the fori is unrolled by two
          with TWO explicit VMEM W scratch buffers; the build of chunk
          i+1 is issued between the (independent) MXU dots of chunks
          i-1/i, giving Mosaic's scheduler a dependence-free window to
          overlap VPU and MXU. (The round-4 "loop rotation" carried W
          through the fori carry — refuted at 1.35x slower; this keeps
          W out of the carry entirely.)

  wvmem — the W build runs ONCE per angle: during the FP pass each
          chunk's W is built (VPU), cast to bf16, stored to a
          whole-angle VMEM scratch, and dotted; the update pass reuses
          the stored chunks (no second build). Halves the hat work and
          removes it from the update pass's critical path. The bf16
          store is measurement-exact for the production DEFAULT
          precision (the MXU truncates f32 operands to bf16 passes
          anyway).

  whbm  — the W build leaves the sweep entirely (two-kernel split):
          per-angle W tiles are precomputed ONCE PER GEOMETRY into an
          HBM tensor (na, nch, ch*n, nt) bf16 (~2.9 GB at 256^3 x 90)
          by a plain XLA program, and the sweep kernel streams them in
          with explicit chunked make_async_copy DMA — all of an angle's
          chunk copies are issued at angle start, each dot waits only
          on its own chunk, and the update pass reuses the
          VMEM-resident angle. The sweep kernel contains NO hat
          arithmetic; its floor is max(DMA 32 MB/angle, MXU dots) +
          epilogue. SART/ASD-POCS run many sweeps per geometry, so the
          one-time build amortizes like make_sart_weights.

Run on the chip:
  PYTHONPATH=/root/repo:/root/.axon_site python scripts/exp_sart_pipeline.py [variants...]
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


def _wchunk_builder(n, nt, ch, ck, sk, invd):
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

    return wchunk


# --------------------------------------------------------------- dbuf ----


def _dbuf_kernel(n, nt, ch, cos_ref, sin_ref, invd_ref, beta_ref,
                 x_ref, b_ref, invrow_ref, invc_ref, out_ref,
                 w0_ref, w1_ref, sem):
    beta = beta_ref[0, 0]
    k = pl.program_id(1)
    s = pl.program_id(0)
    s_blk = out_ref.shape[-1]

    @pl.when(k == 0)
    def _():
        src = (
            x_ref if x_ref.shape[-1] == s_blk
            else x_ref.at[:, :, pl.ds(s * s_blk, s_blk)]
        )
        cp = pltpu.make_async_copy(src, out_ref, sem)
        cp.start()
        cp.wait()

    invd = invd_ref[0, k]
    wchunk = _wchunk_builder(n, nt, ch, cos_ref[0, k], sin_ref[0, k], invd)
    nch = n // ch
    npair = nch // 2

    def xb(i):
        return out_ref[pl.ds(i * ch, ch), :, :].reshape(ch * n, s_blk)

    # FP pass, unrolled by two with explicit double-buffered W: while the
    # MXU contracts the W in one buffer, the VPU builds the next W into
    # the other — no fori carry, no aliasing between the two scratches.
    w0_ref[:] = wchunk(0)

    def fp_body(p, acc):
        i = 2 * p
        w1_ref[:] = wchunk(i + 1)          # VPU: build odd chunk
        acc = acc + jax.lax.dot_general(   # MXU: dot even chunk (ready)
            w0_ref[:], xb(i), (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32, precision=PREC,
        )

        @pl.when(p + 1 < npair)
        def _():
            w0_ref[:] = wchunk(i + 2)      # VPU: build next even chunk

        return acc + jax.lax.dot_general(  # MXU: dot odd chunk
            w1_ref[:], xb(i + 1), (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32, precision=PREC,
        )

    proj = jax.lax.fori_loop(
        0, npair, fp_body, jnp.zeros((nt, s_blk), jnp.float32)
    )
    resid = b_ref[0] - invd * proj

    w0_ref[:] = wchunk(0) * invrow_ref[0]

    def upd_one(i, w_ref):
        upd = jax.lax.dot_general(
            w_ref[:], resid, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32, precision=PREC,
        ).reshape(ch, n, s_blk)
        idx = (pl.ds(i * ch, ch), slice(None), slice(None))
        invc = invc_ref[0, pl.ds(i * ch, ch), :]
        out_ref[idx] = jnp.maximum(
            out_ref[idx] + (beta * invd) * invc[:, :, None] * upd, 0.0
        )

    def upd_body(p, _):
        i = 2 * p
        w1_ref[:] = wchunk(i + 1) * invrow_ref[0]
        upd_one(i, w0_ref)

        @pl.when(p + 1 < npair)
        def _():
            w0_ref[:] = wchunk(i + 2) * invrow_ref[0]

        upd_one(i + 1, w1_ref)
        return 0

    jax.lax.fori_loop(0, npair, upd_body, 0)


# -------------------------------------------------------------- wvmem ----


def _wvmem_kernel(n, nt, ch, mode, cos_ref, sin_ref, invd_ref, beta_ref,
                  x_ref, b_ref, invrow_ref, invc_ref, out_ref,
                  w_ref, sem):
    beta = beta_ref[0, 0]
    k = pl.program_id(1)
    s = pl.program_id(0)
    s_blk = out_ref.shape[-1]

    @pl.when(k == 0)
    def _():
        src = (
            x_ref if x_ref.shape[-1] == s_blk
            else x_ref.at[:, :, pl.ds(s * s_blk, s_blk)]
        )
        cp = pltpu.make_async_copy(src, out_ref, sem)
        cp.start()
        cp.wait()

    invd = invd_ref[0, k]
    wchunk = _wchunk_builder(n, nt, ch, cos_ref[0, k], sin_ref[0, k], invd)
    nch = n // ch

    bf16 = mode not in ("f32",)

    def cast(v):
        return v.astype(jnp.bfloat16) if bf16 else v

    # TRANSPOSED-residual formulation: proj accumulates as (s_blk, nt)
    # with the ray axis on LANES, b arrives pre-transposed (1, s_blk,
    # nt), and the (1, nt) invrow lane vector broadcasts in the
    # production-proven direction. The first formulation kept proj as
    # (nt, s_blk) and scaled it with a (1, nt, 1) windowed sublane
    # vector — which is exact in a standalone repro but silently
    # produced wrong values inside this kernel at nt=256 (rel ~0.9,
    # uniform across the volume; wv_f32 isolated it with bf16 and the
    # scratch store both eliminated). Root cause not pinned; the
    # transposed orientation avoids the construct entirely.
    def fp_body(i, acc):
        w = cast(wchunk(i))
        if mode in ("store", "reread"):
            w_ref[i] = w                    # store for the update pass
        xb = out_ref[pl.ds(i * ch, ch), :, :].reshape(ch * n, s_blk)
        return acc + jax.lax.dot_general(
            cast(xb), w, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32, precision=PREC,
        )  # (s_blk, nt)

    proj = jax.lax.fori_loop(
        0, nch, fp_body, jnp.zeros((s_blk, nt), jnp.float32)
    )
    if mode == "fold":  # production-style: R folded into the update W
        resid = b_ref[0] - invd * proj
    else:
        resid = (b_ref[0] - invd * proj) * invrow_ref[0]

    def upd_body(i, _):
        if mode == "fold":
            w = cast(wchunk(i) * invrow_ref[0])
        elif mode == "store":
            w = w_ref[i]
        else:
            w = cast(wchunk(i))
        upd = jax.lax.dot_general(
            w, cast(resid), (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32, precision=PREC,
        ).reshape(ch, n, s_blk)
        idx = (pl.ds(i * ch, ch), slice(None), slice(None))
        invc = invc_ref[0, pl.ds(i * ch, ch), :]
        out_ref[idx] = jnp.maximum(
            out_ref[idx] + (beta * invd) * invc[:, :, None] * upd, 0.0
        )
        return 0

    jax.lax.fori_loop(0, nch, upd_body, 0)


# --------------------------------------------------------------- whbm ----


def _whbm_kernel(n, nt, ch, cos_ref, sin_ref, invd_ref, beta_ref,
                 x_ref, w_hbm_ref, b_ref, invrow_ref, invc_ref, out_ref,
                 w_ref, sem, wsem):
    beta = beta_ref[0, 0]
    k = pl.program_id(1)
    s = pl.program_id(0)
    s_blk = out_ref.shape[-1]
    nch = n // ch

    @pl.when(k == 0)
    def _():
        src = (
            x_ref if x_ref.shape[-1] == s_blk
            else x_ref.at[:, :, pl.ds(s * s_blk, s_blk)]
        )
        cp = pltpu.make_async_copy(src, out_ref, sem)
        cp.start()
        cp.wait()

    # Issue ALL of this angle's W-chunk copies up front: the DMA engine
    # streams them while the MXU works; each FP dot waits only on its
    # own chunk's semaphore.
    def start_body(i, _):
        pltpu.make_async_copy(
            w_hbm_ref.at[k, i], w_ref.at[i], wsem.at[i]
        ).start()
        return 0

    jax.lax.fori_loop(0, nch, start_body, 0, unroll=True)

    invd = invd_ref[0, k]

    # transposed-residual formulation — see _wvmem_kernel's note
    def fp_body(i, acc):
        pltpu.make_async_copy(
            w_hbm_ref.at[k, i], w_ref.at[i], wsem.at[i]
        ).wait()
        xb = out_ref[pl.ds(i * ch, ch), :, :].reshape(ch * n, s_blk)
        return acc + jax.lax.dot_general(
            xb.astype(jnp.bfloat16), w_ref[i], (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32, precision=PREC,
        )  # (s_blk, nt)

    proj = jax.lax.fori_loop(
        0, nch, fp_body, jnp.zeros((s_blk, nt), jnp.float32)
    )
    resid = (b_ref[0] - invd * proj) * invrow_ref[0]

    def upd_body(i, _):
        upd = jax.lax.dot_general(
            w_ref[i], resid.astype(jnp.bfloat16), (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32, precision=PREC,
        ).reshape(ch, n, s_blk)
        idx = (pl.ds(i * ch, ch), slice(None), slice(None))
        invc = invc_ref[0, pl.ds(i * ch, ch), :]
        out_ref[idx] = jnp.maximum(
            out_ref[idx] + (beta * invd) * invc[:, :, None] * upd, 0.0
        )
        return 0

    jax.lax.fori_loop(0, nch, upd_body, 0)


# ----------------------------------------------------------- resident ----


def _resident_kernel(n, nt, ch, ns_pad, hbm_w, cos_ref, sin_ref, invd_ref,
                     beta_ref, x_ref, *rest):
    """Whole-volume-resident SART: at 256^3 the ENTIRE volume (64 MB)
    fits VMEM as ONE manually-managed scratch, so the grid collapses to
    (na,) — no slice blocks, hence W is built (hbm_w=False) or DMA'd
    (hbm_w=True) exactly ONCE per angle per sweep instead of once per
    (angle, slice-block). The production kernel's windowed out_ref
    costs 2x32 MB double-buffered for s_blk=128 and re-materializes W
    per slice block; this removes both."""
    if hbm_w:
        w_hbm_ref, b_ref, invrow_ref, invc_ref, out_ref, \
            vol_ref, w_ref, sem, osem, wsem = rest
    else:
        b_ref, invrow_ref, invc_ref, out_ref, \
            vol_ref, w_ref, sem, osem = rest
    beta = beta_ref[0, 0]
    k = pl.program_id(0)
    na = pl.num_programs(0)
    nch = n // ch

    @pl.when(k == 0)
    def _():
        cp = pltpu.make_async_copy(x_ref, vol_ref, sem)
        cp.start()
        cp.wait()

    if hbm_w:
        def st(i, _):
            pltpu.make_async_copy(
                w_hbm_ref.at[k, i], w_ref.at[i], wsem.at[i]
            ).start()
            return 0

        jax.lax.fori_loop(0, nch, st, 0, unroll=True)

    invd = invd_ref[0, k]
    if not hbm_w:
        wchunk = _wchunk_builder(n, nt, ch, cos_ref[0, k], sin_ref[0, k],
                                 invd)

    def fp_body(i, acc):
        if hbm_w:
            pltpu.make_async_copy(
                w_hbm_ref.at[k, i], w_ref.at[i], wsem.at[i]
            ).wait()
            w = w_ref[i]
        else:
            w = wchunk(i).astype(jnp.bfloat16)
            w_ref[i] = w
        xb = vol_ref[pl.ds(i * ch, ch), :, :].reshape(ch * n, ns_pad)
        return acc + jax.lax.dot_general(
            xb.astype(jnp.bfloat16), w, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32, precision=PREC,
        )  # (ns_pad, nt)

    proj = jax.lax.fori_loop(
        0, nch, fp_body, jnp.zeros((ns_pad, nt), jnp.float32)
    )
    resid = (b_ref[0] - invd * proj) * invrow_ref[0]

    def upd_body(i, _):
        upd = jax.lax.dot_general(
            w_ref[i], resid.astype(jnp.bfloat16), (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32, precision=PREC,
        ).reshape(ch, n, ns_pad)
        idx = (pl.ds(i * ch, ch), slice(None), slice(None))
        invc = invc_ref[0, pl.ds(i * ch, ch), :]
        vol_ref[idx] = jnp.maximum(
            vol_ref[idx] + (beta * invd) * invc[:, :, None] * upd, 0.0
        )
        return 0

    jax.lax.fori_loop(0, nch, upd_body, 0)

    @pl.when(k == na - 1)
    def _():
        cp = pltpu.make_async_copy(vol_ref, out_ref, osem)
        cp.start()
        cp.wait()


def build_w_hbm(geom, ch):
    """Per-angle unscaled hat tiles, bf16, (na, nch, ch*n, nt) — one XLA
    program per geometry (amortized across sweeps like make_sart_weights)."""
    n, nt, na = geom.n, geom.nray, geom.nproj
    nch = n // ch
    cos, sin, invd = _angle_tables(geom, na)
    off = (nt - 1) / 2.0
    ctr = (n - 1) / 2.0
    xc = jnp.arange(n, dtype=jnp.float32) - ctr
    yr = ctr - jnp.arange(n, dtype=jnp.float32)

    def one_angle(args):
        c, s, idv = args
        jstar = c * xc[None, :] + s * yr[:, None] + off  # (n, n) rows x cols
        u = (jnp.arange(nt, dtype=jnp.float32)[None, None, :]
             - jstar[:, :, None]) * idv
        w = jnp.maximum(0.0, jnp.minimum(1.0 - u, 1.0 + u))
        return w.reshape(nch, ch * n, nt).astype(jnp.bfloat16)

    return jax.lax.map(one_angle, (cos, sin, invd))


# ------------------------------------------------------------ harness ----


def make(geom, ns, variant, interpret=False, weights=None):
    n, nt, na = geom.n, geom.nray, geom.nproj
    s_blk = _sart_slice_block(n, ns)
    ch = _sart_chunk(n, nt, s_blk, 32)
    nch = n // ch
    ns_pad = _round_up(ns, s_blk)
    cos, sin, invd = _angle_tables(geom, na)
    cos, sin, invd = (t.reshape(1, na) for t in (cos, sin, invd))
    if weights is None:
        rng = np.random.default_rng(1)
        invrow = jnp.asarray(rng.random((na, 1, nt)).astype(np.float32))
        invc = jnp.asarray(rng.random((na, n, n)).astype(np.float32))
    else:
        invrow2d, invc = weights
        invrow = jnp.asarray(invrow2d).reshape(na, 1, nt)
        invc = jnp.asarray(invc)
    beta_arr = jnp.ones((1, 1), jnp.float32)
    ang = pl.BlockSpec((1, na), lambda s, k: (0, 0), memory_space=pltpu.SMEM)
    beta_spec = pl.BlockSpec((1, 1), lambda s, k: (0, 0),
                             memory_space=pltpu.SMEM)
    vol = pl.BlockSpec((n, n, s_blk), lambda s, k: (0, 0, s))
    xs = pl.BlockSpec(memory_space=pl.ANY)
    bs = pl.BlockSpec((1, nt, s_blk), lambda s, k: (k, 0, s))
    # transposed sinogram (na, ns_pad, nt) for the wv/whbm kernels
    bs_t = pl.BlockSpec((1, s_blk, nt), lambda s, k: (k, s, 0))
    irs = pl.BlockSpec((1, 1, nt), lambda s, k: (k, 0, 0))
    ics = pl.BlockSpec((1, n, n), lambda s, k: (k, 0, 0))

    def params(vmem_mb):
        try:
            return pltpu.CompilerParams(
                dimension_semantics=("parallel", "arbitrary"),
                vmem_limit_bytes=vmem_mb * 1024 * 1024,
            )
        except TypeError:
            return None

    if variant == "dbuf":
        kern = partial(_dbuf_kernel, n, nt, ch)
        scratch = [
            pltpu.VMEM((ch * n, nt), jnp.float32),
            pltpu.VMEM((ch * n, nt), jnp.float32),
            pltpu.SemaphoreType.DMA,
        ]
        in_specs = [ang, ang, ang, beta_spec, xs, bs, irs, ics]
        cp = params(110)
        extra = ()
    elif variant.startswith("wv"):
        mode = {"wvmem": "store", "wv_rebuild": "rebuild",
                "wv_reread": "reread", "wv_f32": "f32",
                "wv_fold": "fold"}[variant]
        kern = partial(_wvmem_kernel, n, nt, ch, mode)
        scratch = [
            pltpu.VMEM((nch if mode in ("store", "reread") else 1,
                        ch * n, nt), jnp.bfloat16),
            pltpu.SemaphoreType.DMA,
        ]
        in_specs = [ang, ang, ang, beta_spec, xs, bs_t, irs, ics]
        cp = params(112)
        extra = ()
    elif variant == "whbm":
        kern = partial(_whbm_kernel, n, nt, ch)
        scratch = [
            pltpu.VMEM((nch, ch * n, nt), jnp.bfloat16),
            pltpu.SemaphoreType.DMA,
            pltpu.SemaphoreType.DMA((nch,)),
        ]
        ws = pl.BlockSpec(memory_space=pl.ANY)
        in_specs = [ang, ang, ang, beta_spec, xs, ws, bs_t, irs, ics]
        cp = params(112)
        # W must be an ARGUMENT of the jitted caller, not a closure
        # constant: a captured 2.9 GB constant is shipped inside the
        # compile request, which the remote compile service rejects
        # (HTTP 413) — measured round 5.
        extra = (jax.block_until_ready(build_w_hbm(geom, ch)),)
    elif variant in ("res", "reshbm"):
        # whole-volume-resident: grid (na,), ONE manual VMEM volume
        hbm_w = variant == "reshbm"
        ns_pad = _round_up(ns, 128)
        assert (n * n * ns_pad * 4 + nch * ch * n * nt * 2
                <= 100 * 1024 * 1024), "resident variant needs <=100MB"
        kern = partial(_resident_kernel, n, nt, ch, ns_pad, hbm_w)
        ang1 = pl.BlockSpec((1, na), lambda k: (0, 0),
                            memory_space=pltpu.SMEM)
        beta1 = pl.BlockSpec((1, 1), lambda k: (0, 0),
                             memory_space=pltpu.SMEM)
        xs1 = pl.BlockSpec(memory_space=pl.ANY)
        bs1 = pl.BlockSpec((1, ns_pad, nt), lambda k: (k, 0, 0))
        irs1 = pl.BlockSpec((1, 1, nt), lambda k: (k, 0, 0))
        ics1 = pl.BlockSpec((1, n, n), lambda k: (k, 0, 0))
        out1 = pl.BlockSpec(memory_space=pl.ANY)
        scratch = [
            pltpu.VMEM((n, n, ns_pad), jnp.float32),
            pltpu.VMEM((nch, ch * n, nt), jnp.bfloat16),
            pltpu.SemaphoreType.DMA,
            pltpu.SemaphoreType.DMA,
        ]
        in_specs = [ang1, ang1, ang1, beta1, xs1, bs1, irs1, ics1]
        extra = ()
        if hbm_w:
            scratch.append(pltpu.SemaphoreType.DMA((nch,)))
            in_specs.insert(5, pl.BlockSpec(memory_space=pl.ANY))
            extra = (jax.block_until_ready(build_w_hbm(geom, ch)),)
        try:
            cp = pltpu.CompilerParams(
                dimension_semantics=("arbitrary",),
                vmem_limit_bytes=118 * 1024 * 1024,
            )
        except TypeError:
            cp = None

        def run_res(x, b, *ops):
            x = _pad_axis(x, 2, ns_pad)
            b = jnp.transpose(_pad_axis(b, 2, ns_pad), (0, 2, 1))
            args = [cos, sin, invd, beta_arr, x]
            args += list(ops)
            args += [b, invrow, invc]
            return pl.pallas_call(
                kern,
                grid=(na,),
                in_specs=in_specs,
                out_specs=out1,
                out_shape=jax.ShapeDtypeStruct((n, n, ns_pad), jnp.float32),
                scratch_shapes=scratch,
                compiler_params=cp,
                interpret=interpret,
            )(*args)[:, :, :ns]

        return run_res, extra
    else:
        raise ValueError(variant)

    def run(x, b, *ops):
        x = _pad_axis(x, 2, ns_pad)
        b = _pad_axis(b, 2, ns_pad)
        if variant != "dbuf":  # transposed-residual kernels
            b = jnp.transpose(b, (0, 2, 1))
        args = [cos, sin, invd, beta_arr, x]
        args += list(ops)
        args += [b, invrow, invc]
        return pl.pallas_call(
            kern,
            grid=(ns_pad // s_blk, na),
            in_specs=in_specs,
            out_specs=vol,
            out_shape=jax.ShapeDtypeStruct((n, n, ns_pad), jnp.float32),
            scratch_shapes=scratch,
            compiler_params=cp,
            interpret=interpret,
        )(*args)[:, :, :ns]

    return run, extra


def make_base(geom, ns, interpret=False, weights=None):
    """Production kernel through the same harness (same operands)."""
    from tomojax.solvers import pallas_sart as ps

    n, nt, na = geom.n, geom.nray, geom.nproj
    if weights is None:
        rng = np.random.default_rng(1)
        invrow2d = jnp.asarray(rng.random((na, nt)).astype(np.float32))
        invc = jnp.asarray(rng.random((na, n, n)).astype(np.float32))
    else:
        invrow2d, invc = (jnp.asarray(w) for w in weights)

    def run(x, b):
        return ps.sart_sweep_pallas_sl(x, b, geom, invrow2d, invc, 1.0,
                                       interpret=interpret)

    return run


def slope(f, x, extra=(), iters=4):
    c1 = jax.jit(lambda v, *e: jnp.sum(f(v, *e)))

    def chain(v, *e):
        for _ in range(1 + iters):
            v = f(v, *e)
        return jnp.sum(v)

    ck = jax.jit(chain)
    float(c1(x, *extra)); float(ck(x, *extra))
    best = np.inf
    for _ in range(3):
        t0 = time.perf_counter(); float(c1(x, *extra))
        t1 = time.perf_counter() - t0
        t0 = time.perf_counter(); float(ck(x, *extra))
        tk = time.perf_counter() - t0
        best = min(best, (tk - t1) / iters * 1e3)
    return best


def main():
    """Timing: min-of-3 slope on a random volume (as before).
    Correctness: 10 SART sweeps on a CONSISTENT problem (nanocube
    phantom, b = A vol, real SART weights) comparing final RMSE —
    single-sweep max-|d| on random data is MEANINGLESS for this
    kernel: 90 sequential clamped updates with bf16 dots diverge
    chaotically on inconsistent data (measured: even the production
    kernel vs the XLA sweep at HIGH differs by rel ~1.0 there, while
    converging to identical reconstructions on real data — the
    round-4 docstring's rmse 0.0470809-vs-0.0470812 equivalence)."""
    variants = sys.argv[1:] or ["dbuf", "wvmem", "whbm", "res", "reshbm"]
    n = ns = 256
    na = 90
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.random((n, n, ns)).astype(np.float32))
    geom = Geometry.make(n, np.deg2rad(np.linspace(-76, 76, na)))
    b = jnp.asarray(rng.random((na, n, ns)).astype(np.float32))
    print("device:", jax.devices()[0].device_kind, flush=True)

    # consistent problem with real weights for the convergence check
    from tomojax.solvers import make_system, make_sart_weights
    from tomojax.sim import nanocube_phantom
    from tomojax.projector.joseph import fp as fp_pub

    sysd = make_system(geom)
    weights = (np.asarray(sysd.inv_row[0]),
               np.asarray(make_sart_weights(sysd)))
    vol_ph = jnp.asarray(nanocube_phantom(ns, n))  # (Ns, N, N)
    b_real = jax.jit(lambda v: jnp.transpose(fp_pub(v, geom), (1, 2, 0)))(
        vol_ph
    )  # slice-last (Na, Nt, Ns)
    x0 = jnp.zeros((n, n, ns), jnp.float32)

    def rmse10(f, extra):
        @jax.jit
        def run10(v, *e):
            def body(i, vv):
                return f(vv, b_real, *e)

            return jax.lax.fori_loop(0, 10, body, v)

        out = run10(x0, *extra)
        d = jnp.transpose(out, (2, 0, 1)) - vol_ph
        return float(jnp.sqrt(jnp.mean(d * d)))

    base = make_base(geom, ns)
    ref = jax.jit(base)(x, b)
    jax.block_until_ready(ref)
    ms0 = slope(lambda v: base(v, b), x)
    base_r = make_base(geom, ns, weights=weights)
    r0 = rmse10(lambda v, bb: base_r(v, bb), ())
    print(f"base  : {ms0:7.2f} ms  rmse@10={r0:.5f}", flush=True)
    for v in variants:
        try:
            f, extra = make(geom, ns, v)
            out = jax.jit(f)(x, b, *extra)
            err = float(jnp.max(jnp.abs(out - ref))) / float(
                jnp.max(jnp.abs(ref))
            )
            ms = slope(lambda vv, *e: f(vv, b, *e), x, extra)
            fr, extra_r = make(geom, ns, v, weights=weights)
            rv = rmse10(fr, extra_r)
            print(f"{v:6s}: {ms:7.2f} ms  rmse@10={rv:.5f} "
                  f"(d={abs(rv - r0):.2e})  1-sweep rel|d|={err:.2e}",
                  flush=True)
        except Exception as e:
            print(f"{v:6s}: FAILED {type(e).__name__}: {str(e)[:300]}",
                  flush=True)


if __name__ == "__main__":
    main()
