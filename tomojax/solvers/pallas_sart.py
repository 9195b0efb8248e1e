"""Fused Pallas SART sweep: the volume tile stays resident in VMEM
across the entire ordered angle loop.

Round-3 VERDICT #3: the XLA `sart_sweep` (solvers/iterative.py) runs at
27.6 ms per 90-angle sweep at 256^3 on v5e — ~2x its HBM floor —
because each angle's FP pass and update pass stream the full volume
through HBM (3 x 64 MB x 90 angles ~ 17 GB/sweep). ASTRA's CUDA SART
has the same structure per slice (reference tomoengine.cpp:162-179 runs
Nproj ordered sub-iterations, each a full FP + correction).

The kernel here exploits that SART's angle loop is *sequential by
construction* (block-Kaczmarz): grid = (slice-blocks, angles) with the
angle axis innermost and 'arbitrary', and the volume OUTPUT block index
constant along the angle axis — so Mosaic keeps the (n, n, s_blk)
volume tile in VMEM for all Na angle steps, reading HBM once and
writing once per slice block. Per angle step, entirely in VMEM:

    proj  = sum_chunks W_chunk^T @ x_chunk          (MXU)
    resid = (b_a - proj) * R_a                      (VPU, (nt, s_blk))
    x_chunk = max(x_chunk + beta * C_a * W_chunk @ resid, 0)

with the interpolation W rebuilt per chunk from the closed form (same
unified Joseph weights as projector/pallas_joseph.py, so FP and update
use the exact same W — the per-block adjoint pairing ASTRA guarantees).
HBM traffic per sweep: volume read+write once (128 MB at 256^3) +
sinogram + per-angle C_a tables (~50 MB) instead of ~17 GB.

Ordered/random visiting order is handled by pre-permuting the per-angle
operands (b, R_a, C_a, angle tables) outside the kernel — O(Na) cheap
gathers; the kernel always walks its operands 0..Na-1.

Measured (v5e, 256^3 x 90, min-of-3 slope): 22.2 ms/sweep for this
windowed kernel vs 27.6 for the XLA sweep (1.24x). The HBM win is
complete (time is linear in Na), but the hat build sits exposed on the
in-kernel fori critical path (ablation, scripts/exp_sart_ablate.py:
hat 13.4 ms of 22.3 vs a 4.6 ms VPU-peak model). Measured-out levers:
5-op fma/min hat with deferred 1/D (neutral), manual loop rotation
carrying W across iterations (1.35x SLOWER), a grid-phase restructure
(compile pathological on this toolchain), and — round 5 — an explicit
double-buffered W scratch with pair-unrolled phase logic (21.7 ms,
Mosaic still serializes VPU and MXU inside the fori body).

Round 5 closed the gap with the WHOLE-VOLUME-RESIDENT kernel further
down (design note mid-module): grid (na,), the full volume in one
manual VMEM scratch, W precomputed per geometry in HBM and DMA-
streamed — **7.73 ms/sweep** (2.9x; 10.49 with the in-kernel W build,
tomojax.config.sart_w_hbm='off') at identical convergence. It
dispatches whenever `fits_resident` holds (the whole 256 class); the
windowed kernel below remains the fallback for volumes whose slices
exceed VMEM (e.g. n=256, ns>=384).

Dispatched from solvers.iterative.sart_sweep on single-device TPU
('pallas' resolved mode); interpret-mode on CPU is test-only.
"""

from __future__ import annotations

import functools
from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from tomojax.geometry import Geometry
from tomojax import config as tjconfig
from tomojax.projector.pallas_joseph import (
    _angle_tables,
    _kernel_precision,
    _pad_axis,
    _round_up,
)


def _sart_params():
    dims = ("parallel", "arbitrary")
    try:
        return pltpu.CompilerParams(
            dimension_semantics=dims, vmem_limit_bytes=100 * 1024 * 1024
        )
    except TypeError:
        try:
            return pltpu.CompilerParams(dimension_semantics=dims)
        except TypeError:
            return None


def _sart_kernel(n, nt, ch, prec, cos_ref, sin_ref, invd_ref, beta_ref,
                 x_ref, b_ref, invrow_ref, invc_ref, out_ref, sem):
    beta = beta_ref[0, 0]  # traced relaxation (ASD-POCS decays it per iter)
    k = pl.program_id(1)
    s = pl.program_id(0)
    s_blk = out_ref.shape[-1]

    @pl.when(k == 0)
    def _():
        # Seed the resident volume tile straight from HBM. x stays in
        # ANY/HBM (no block window): a windowed x input would cost a
        # double-buffered (n, n, s_blk) VMEM allocation — 64 MB at 256³,
        # which together with the out window's 64 MB OOM'd the chip
        # (measured 130/128 MB) — for data the kernel reads exactly once.
        # With a single slice block (s_blk < 128 happens only then) the
        # whole ref is copied unsliced: a sub-128 slice of the minormost
        # dim violates Mosaic's (1, 128) tiling ("Slice shape along
        # dimension 2 must be aligned to tiling").
        src = (
            x_ref if x_ref.shape[-1] == s_blk
            else x_ref.at[:, :, pl.ds(s * s_blk, s_blk)]
        )
        cp = pltpu.make_async_copy(src, out_ref, sem)
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
        """(ch*n, nt) UNSCALED hat weights for rows [i*ch, (i+1)*ch).

        Unlike the grid-pipelined FP/BP kernels — where the ablation
        (scripts/exp_hat_model.py) measured the hat chain as free — the
        in-kernel fori here exposes the hat on the critical path
        (scripts/exp_sart_ablate.py: 13.4 of 22.3 ms at 256^3 x 90), so
        op-count reductions pay directly: the fma/min form drops the
        abs, and the outer *1/D is deferred into per-angle SCALARS
        (resid scale in the FP pass, beta*1/D in the update), leaving a
        5-op chain instead of the naive 7 (6 + the R fold)."""
        yr = ctr - (i * ch + iota_r)  # (ch, 1)
        jstar = ck * xc + (sk * yr + off)  # (ch, n)
        u = (iota_j - jstar[:, :, None]) * invd  # (ch, n, nt)
        w = jnp.maximum(0.0, jnp.minimum(1.0 - u, 1.0 + u))
        return w.reshape(ch * n, nt)

    def fp_body(i, acc):
        w = wchunk(i)
        xb = out_ref[pl.ds(i * ch, ch), :, :].reshape(ch * n, s_blk)
        return acc + jax.lax.dot_general(
            w, xb, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32, precision=prec,
        )

    proj = jax.lax.fori_loop(
        0, nch, fp_body, jnp.zeros((nt, s_blk), jnp.float32)
    )
    resid = b_ref[0] - invd * proj  # deferred W scale: A x = invd hat^T x

    def upd_body(i, _):
        # R is folded into the update weights (W^T diag(R) resid):
        # invrow arrives as a (1, nt) lane vector, which broadcasts over
        # the (ch*n, nt) W directly — reshaping it to (nt, 1) to scale
        # `resid` would be a lane->sublane transpose Mosaic can't do.
        w = wchunk(i) * invrow_ref[0]
        upd = jax.lax.dot_general(
            w, resid, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32, precision=prec,
        ).reshape(ch, n, s_blk)
        idx = (pl.ds(i * ch, ch), slice(None), slice(None))
        invc = invc_ref[0, pl.ds(i * ch, ch), :]
        # beta * invd carries the update pass's deferred W scale
        out_ref[idx] = jnp.maximum(
            out_ref[idx] + (beta * invd) * invc[:, :, None] * upd, 0.0
        )
        return 0

    jax.lax.fori_loop(0, nch, upd_body, 0)


# ------------------------------------------------------------------------
# Whole-volume-resident sweep (round 5, VERDICT #1). At the 256 class
# the ENTIRE slice-last volume (n^2 * ns_pad * 4 = 64 MB at 256^3) fits
# VMEM as ONE manually-managed scratch, so the grid collapses to (na,):
# no slice blocks, no double-buffered windowed out (2 x 32 MB saved),
# and the interpolation tiles W are needed exactly ONCE per angle per
# sweep instead of once per (angle, slice block). Two W sources:
#
#   * 'hbm' — W is precomputed per GEOMETRY into an (na, nch, ch*n, nt)
#     bfloat16 HBM tensor (~2.9 GB at 256^3 x 90; cached like
#     make_sart_weights) and streamed into a VMEM ring by explicit
#     chunked make_async_copy DMA: all of an angle's chunk copies are
#     issued at angle start, each FP dot waits only on its own chunk,
#     and the update pass reuses the VMEM-resident angle. The sweep
#     kernel contains NO hat arithmetic. Measured (v5e, 256^3 x 90,
#     min-of-3 slope): 7.73 ms/sweep vs 22.2 for the windowed kernel
#     (2.9x) — BELOW the round-4 ~9 ms "nohat floor" estimate, because
#     residency also removes the floor's per-slice-block W
#     re-materialization.
#   * 'build' — W built in-kernel once per angle (FP pass), stored
#     bf16, reused by the update pass: 10.49 ms/sweep, no HBM cost;
#     used when the W tensor would exceed the HBM budget.
#
# Numerics: W and the dot operands are bfloat16 — identical class to
# the production DEFAULT precision (the MXU truncates f32 operands to
# bf16 passes); convergence measured IDENTICAL (rmse@10 on the
# 256^3 x 90 nanocube problem: 0.04019 for both, |d| < 7e-7 vs the
# f32-operand kernel). NOTE single-sweep max-|d| comparisons on random
# inconsistent data are meaningless for SART: 90 sequential clamped
# updates amplify bf16-vs-f32 rounding chaotically (measured rel ~1.0
# even between the f32 kernel and the XLA sweep at HIGH) while real
# reconstructions agree — scripts/exp_sart_pipeline.py.
#
# The residual is computed TRANSPOSED, (ns_pad, nt) with the ray axis
# on lanes, so the (1, nt) inv_row lane vector broadcasts directly and
# the per-chunk W*R fold of the windowed kernel disappears; the update
# contracts dot_general(W, resid, (((1,), (1,)), ...)).
# ------------------------------------------------------------------------

SART_W_HBM_BUDGET = 4 << 30  # max bytes of precomputed W ('hbm' mode)


def _sart_resident_kernel(n, nt, ch, ns_pad, hbm_w, order_ref, cos_ref,
                          sin_ref, invd_ref, beta_ref, x_ref, *rest):
    if hbm_w:
        (w_hbm_ref, b_ref, invrow_ref, invc_ref, out_ref,
         vol_ref, w_ref, sem, osem, wsem) = rest
    else:
        (b_ref, invrow_ref, invc_ref, out_ref,
         vol_ref, w_ref, sem, osem) = rest
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
        # The angle VISITING order indexes the HBM W tensor in-kernel
        # (order_ref, SMEM): permuting the 2.9 GB tensor outside would
        # cost a full-tensor gather per call, which random-order
        # ASD-POCS would pay every iteration. The small per-angle
        # operands (b, tables, weights) are pre-permuted outside.
        ka = order_ref[0, k]

        def st(i, _):
            pltpu.make_async_copy(
                w_hbm_ref.at[ka, i], w_ref.at[i], wsem.at[i]
            ).start()
            return 0

        jax.lax.fori_loop(0, nch, st, 0, unroll=True)

    invd = invd_ref[0, k]
    off = (nt - 1) / 2.0
    ctr = (n - 1) / 2.0
    if not hbm_w:
        ck = cos_ref[0, k]
        sk = sin_ref[0, k]
        xc = jax.lax.broadcasted_iota(
            jnp.int32, (1, n), 1).astype(jnp.float32) - ctr
        iota_r = jax.lax.broadcasted_iota(
            jnp.int32, (ch, 1), 0).astype(jnp.float32)
        iota_j = jax.lax.broadcasted_iota(
            jnp.int32, (1, 1, nt), 2).astype(jnp.float32)

        def wchunk(i):
            yr = ctr - (i * ch + iota_r)
            jstar = ck * xc + (sk * yr + off)
            u = (iota_j - jstar[:, :, None]) * invd
            w = jnp.maximum(0.0, jnp.minimum(1.0 - u, 1.0 + u))
            return w.reshape(ch * n, nt)

    def fp_body(i, acc):
        if hbm_w:
            pltpu.make_async_copy(
                w_hbm_ref.at[ka, i], w_ref.at[i], wsem.at[i]
            ).wait()
        else:
            w_ref[i] = wchunk(i).astype(jnp.bfloat16)
        xb = vol_ref[pl.ds(i * ch, ch), :, :].reshape(ch * n, ns_pad)
        return acc + jax.lax.dot_general(
            xb.astype(jnp.bfloat16), w_ref[i], (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32, precision=jax.lax.Precision.DEFAULT,
        )  # (ns_pad, nt): ray axis on lanes

    proj = jax.lax.fori_loop(
        0, nch, fp_body, jnp.zeros((ns_pad, nt), jnp.float32)
    )
    resid = (b_ref[0] - invd * proj) * invrow_ref[0]

    def upd_body(i, _):
        upd = jax.lax.dot_general(
            w_ref[i], resid.astype(jnp.bfloat16), (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32, precision=jax.lax.Precision.DEFAULT,
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


def fits_resident(n: int, ns: int, nt: int) -> bool:
    """Resident-sweep VMEM gate: full volume (f32) + whole-angle bf16 W
    (n^2 x nt tiles) must fit ~100 MB of the v5e's 128 MB VMEM (the
    kernel raises the scoped limit to 118). nt must be a multiple of
    128: a sub-128-lane bf16 scratch DMA crashes the Mosaic backend
    (minimal repro, round 5); interpret mode (CPU tests) has no such
    limit but keeps the same gate for dispatch parity. The slice axis
    (the kernel's lane dim) pads to 128 — slabs thinner than 64 slices
    would waste >2x of every op on padding (e.g. a 2-slice shard_map
    slab would pad 64x), so those keep the windowed kernel, whose
    sub-128 full-extent lane blocks are legal."""
    ns_pad = _round_up(ns, 128)
    vol = n * n * ns_pad * 4
    w = n * n * nt * 2
    return (
        nt % 128 == 0
        and ns_pad <= 2 * ns
        and vol + w <= 100 * 1024 * 1024
    )


@functools.lru_cache(maxsize=2)
def _w_hbm_cached(geom: Geometry, ch: int):
    """Per-geometry precomputed W tiles, (na, nch, ch*n, nt) bf16 — the
    'hbm' resident mode's operand, built once per geometry by a plain
    XLA program and cached (same lifecycle as make_sart_weights).
    ~2.9 GB at 256^3 x 90 (gated by SART_W_HBM_BUDGET)."""
    n, nt, na = geom.n, geom.nray, geom.nproj
    nch = n // ch
    cos, sin, invd = _angle_tables(geom, na)
    off = (nt - 1) / 2.0
    ctr = (n - 1) / 2.0
    xc = jnp.arange(n, dtype=jnp.float32) - ctr
    yr = ctr - jnp.arange(n, dtype=jnp.float32)

    def one_angle(args):
        c, s, idv = args
        jstar = c * xc[None, :] + s * yr[:, None] + off
        u = (jnp.arange(nt, dtype=jnp.float32)[None, None, :]
             - jstar[:, :, None]) * idv
        w = jnp.maximum(0.0, jnp.minimum(1.0 - u, 1.0 + u))
        return w.reshape(nch, ch * n, nt).astype(jnp.bfloat16)

    return jax.block_until_ready(jax.lax.map(one_angle, (cos, sin, invd)))


def _resident_chunk(n: int, nt: int) -> int:
    ch = _sart_chunk(n, nt, 128, 32)
    while n % ch:
        ch //= 2
    return ch


def sart_w_operand(geom: Geometry, ns: int):
    """The precomputed HBM W tensor for (geom, ns) — or None when the
    resident 'hbm' mode would not engage. Jit-building drivers (ASD-POCS
    iterations, bench chains) call this EAGERLY and pass the result as
    an ARGUMENT of their jitted step: a W captured as a closure constant
    is baked into the lowering (3 GB) and the remote compile service
    rejects the request (HTTP 413, measured round 5); a W built inside
    the trace is worse — it leaks the cached tracer. Inside a trace
    with no operand the kernel falls back to the in-kernel build
    (10.49 vs 7.73 ms — still 2.1x the windowed kernel)."""
    n, nt, na = geom.n, geom.nray, geom.nproj
    if (
        tjconfig.sart_w_hbm == "off"
        or not fits_resident(n, ns, nt)
        or na * n * n * nt * 2 > SART_W_HBM_BUDGET
        or tjconfig.resolve_projector_mode(None) != "pallas"
    ):
        return None
    return _w_hbm_cached(geom, _resident_chunk(n, nt))


def _sart_resident_call(x_sl, b_sl, geom: Geometry, inv_row2d, inv_col_a,
                        beta, order, interpret: bool, w_hbm=None):
    """Dispatch the resident sweep (see module-top design note)."""
    n, _, ns = x_sl.shape
    na, nt = geom.nproj, geom.nray
    ch = _resident_chunk(n, nt)
    nch = n // ch
    ns_pad = _round_up(ns, 128)
    w_bytes = na * n * n * nt * 2
    if (
        w_hbm is None
        and not isinstance(x_sl, jax.core.Tracer)  # eager call: safe to
        # build + cache the per-geometry W now (see sart_w_operand)
        and tjconfig.sart_w_hbm != "off"
        and w_bytes <= SART_W_HBM_BUDGET
    ):
        w_hbm = _w_hbm_cached(geom, ch)
    hbm_w = w_hbm is not None
    if hbm_w:
        assert w_hbm.shape == (na, nch, ch * n, nt), (w_hbm.shape, ch)
    cos, sin, invd = _angle_tables(geom, na)
    cos, sin, invd = (t.reshape(1, na) for t in (cos, sin, invd))
    if order is not None:
        cos = jnp.take(cos, order, axis=1)
        sin = jnp.take(sin, order, axis=1)
        invd = jnp.take(invd, order, axis=1)
        b_sl = jnp.take(b_sl, order, axis=0)
        inv_row2d = jnp.take(inv_row2d, order, axis=0)
        inv_col_a = jnp.take(inv_col_a, order, axis=0)
        order_arr = jnp.asarray(order, jnp.int32).reshape(1, na)
    else:
        order_arr = jnp.arange(na, dtype=jnp.int32).reshape(1, na)

    x_sl = _pad_axis(x_sl, 2, ns_pad)
    b_t = jnp.transpose(_pad_axis(b_sl, 2, ns_pad), (0, 2, 1))

    ang = pl.BlockSpec((1, na), lambda k: (0, 0), memory_space=pltpu.SMEM)
    beta_spec = pl.BlockSpec((1, 1), lambda k: (0, 0),
                             memory_space=pltpu.SMEM)
    xs = pl.BlockSpec(memory_space=pl.ANY)
    bs = pl.BlockSpec((1, ns_pad, nt), lambda k: (k, 0, 0))
    irs = pl.BlockSpec((1, 1, nt), lambda k: (k, 0, 0))
    ics = pl.BlockSpec((1, n, n), lambda k: (k, 0, 0))
    out = pl.BlockSpec(memory_space=pl.ANY)
    scratch = [
        pltpu.VMEM((n, n, ns_pad), jnp.float32),
        pltpu.VMEM((nch, ch * n, nt), jnp.bfloat16),
        pltpu.SemaphoreType.DMA,
        pltpu.SemaphoreType.DMA,
    ]
    in_specs = [ang, ang, ang, ang, beta_spec, xs]
    args = [order_arr, cos, sin, invd,
            jnp.reshape(jnp.asarray(beta, jnp.float32), (1, 1)), x_sl]
    if hbm_w:
        scratch.append(pltpu.SemaphoreType.DMA((nch,)))
        in_specs.append(pl.BlockSpec(memory_space=pl.ANY))
        args.append(w_hbm)
    in_specs += [bs, irs, ics]
    args += [b_t, inv_row2d.reshape(na, 1, nt), inv_col_a]
    try:
        cp = pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
            vmem_limit_bytes=118 * 1024 * 1024,
        )
    except TypeError:
        cp = None
    res = pl.pallas_call(
        partial(_sart_resident_kernel, n, nt, ch, ns_pad, hbm_w),
        grid=(na,),
        in_specs=in_specs,
        out_specs=out,
        out_shape=jax.ShapeDtypeStruct((n, n, ns_pad), jnp.float32),
        scratch_shapes=scratch,
        compiler_params=cp,
        interpret=interpret,
    )(*args)
    return res[:, :, :ns]


def fits_vmem(n: int, ns: int) -> bool:
    """Whether the resident set fits the chip: the (n, n, s_blk) out
    window costs 2 (buffer levels) x n^2 x PADDED-lane x 4 bytes —
    VMEM tiles are (8, 128), so a lane block below 128 still occupies
    full 128-lane tiles (measured: a f32[512,512,8] window allocates
    128 MB, OOMing the chip) — and the lane block cannot shrink below
    128 anyway. n=512 would need 268 MB and can never compile; the
    dispatch (iterative.sart_sweep) falls back to the XLA sweep."""
    s_eff = max(_sart_slice_block(n, ns), 128)
    return 2 * n * n * s_eff * 4 <= 72 * 1024 * 1024


def _sart_slice_block(n: int, ns: int) -> int:
    """Slice block: the lane dim must be a multiple of 128 or the full
    (8-padded) extent; the VMEM fit is controlled by `_sart_chunk` and
    the `fits_vmem` dispatch gate instead (shrinking the lane block
    below 128 is illegal, shrinking the row chunk is free)."""
    if ns < 128:
        return _round_up(ns, 8)
    return 128


def _sart_chunk(n: int, nt: int, s_blk: int, ch: int) -> int:
    """Rows per W chunk: largest power of two whose resident estimate —
    double-buffered out window (2 n² s_blk f32) + ~3 live (ch, n, nt)
    W/hat temporaries — fits a ~96 MB budget."""
    vol = 2 * n * n * s_blk * 4
    while ch > 8 and vol + 3 * ch * n * nt * 4 > 96 * 1024 * 1024:
        ch //= 2
    return ch


def sart_sweep_pallas_sl(x_sl, b_sl, geom: Geometry, inv_row2d, inv_col_a,
                         beta=1.0, order=None, precision=None, ch: int = 32,
                         interpret: bool = False, w_hbm=None):
    """One ordered SART pass, slice-last. x_sl: (n, n, ns); b_sl:
    (na, nt, ns); inv_row2d: (na, nt) = System.inv_row[0]; inv_col_a:
    (na, n, n) per-angle column weights (solvers.make_sart_weights).
    Returns the updated (n, n, ns) volume.

    Dispatch: the whole-volume-resident kernel (2.9x, see the round-5
    design note above) whenever the volume + per-angle W fit VMEM
    (`fits_resident` — covers the whole 256 class); the round-4
    slice-block-windowed kernel below otherwise."""
    n, _, ns = x_sl.shape
    na, nt = geom.nproj, geom.nray
    assert b_sl.shape[:2] == (na, nt), b_sl.shape
    if fits_resident(n, ns, nt):
        return _sart_resident_call(
            x_sl, b_sl, geom, inv_row2d, inv_col_a, beta, order,
            interpret=interpret, w_hbm=w_hbm,
        )
    prec = _kernel_precision(
        precision if precision is not None else tjconfig.pallas_precision
    )
    if prec == "split":  # HIGH emulation needs 3 dots; use HIGHEST here
        prec = jax.lax.Precision.HIGHEST
    while n % ch:
        ch //= 2
    s_blk = _sart_slice_block(n, ns)
    ch = _sart_chunk(n, nt, s_blk, ch)
    ns_pad = _round_up(ns, s_blk)
    cos, sin, invd = _angle_tables(geom, na)
    cos, sin, invd = (t.reshape(1, na) for t in (cos, sin, invd))
    if order is not None:
        cos = jnp.take(cos, order, axis=1)
        sin = jnp.take(sin, order, axis=1)
        invd = jnp.take(invd, order, axis=1)
        b_sl = jnp.take(b_sl, order, axis=0)
        inv_row2d = jnp.take(inv_row2d, order, axis=0)
        inv_col_a = jnp.take(inv_col_a, order, axis=0)

    x_sl = _pad_axis(x_sl, 2, ns_pad)
    b_sl = _pad_axis(b_sl, 2, ns_pad)

    ang_spec = pl.BlockSpec((1, na), lambda s, k: (0, 0),
                            memory_space=pltpu.SMEM)
    beta_spec = pl.BlockSpec((1, 1), lambda s, k: (0, 0),
                             memory_space=pltpu.SMEM)
    vol_spec = pl.BlockSpec((n, n, s_blk), lambda s, k: (0, 0, s))
    x_spec = pl.BlockSpec(memory_space=pl.ANY)  # manual DMA at k==0
    b_spec = pl.BlockSpec((1, nt, s_blk), lambda s, k: (k, 0, s))
    # (na, 1, nt) layout: a (1, 1, nt) block's trailing dims equal the
    # array's, satisfying the TPU block-shape rule (a (1, nt) block of a
    # (na, nt) array would put a size-1 block on the sublane dim)
    ir_spec = pl.BlockSpec((1, 1, nt), lambda s, k: (k, 0, 0))
    ic_spec = pl.BlockSpec((1, n, n), lambda s, k: (k, 0, 0))
    beta_arr = jnp.reshape(jnp.asarray(beta, jnp.float32), (1, 1))
    out = pl.pallas_call(
        partial(_sart_kernel, n, nt, ch, prec),
        grid=(ns_pad // s_blk, na),
        in_specs=[ang_spec, ang_spec, ang_spec, beta_spec, x_spec,
                  b_spec, ir_spec, ic_spec],
        out_specs=vol_spec,
        out_shape=jax.ShapeDtypeStruct((n, n, ns_pad), x_sl.dtype),
        scratch_shapes=[pltpu.SemaphoreType.DMA],
        compiler_params=_sart_params(),
        interpret=interpret,
    )(cos, sin, invd, beta_arr, x_sl, b_sl,
      inv_row2d.reshape(na, 1, nt), inv_col_a)
    return out[:, :, :ns]


def sart_sweep_pallas(x, b, geom: Geometry, inv_row2d, inv_col_a, beta=1.0,
                      order=None, precision=None, interpret: bool = False,
                      w_hbm=None):
    """Public-layout wrapper: x (Ns, N, N), b (Ns, Na, Nt)."""
    out = sart_sweep_pallas_sl(
        x.transpose(1, 2, 0), b.transpose(1, 2, 0), geom, inv_row2d,
        inv_col_a, beta, order, precision, interpret=interpret,
        w_hbm=w_hbm,
    )
    return out.transpose(2, 0, 1)


def sart_sweep_pallas_sharded(x, b, geom: Geometry, inv_row2d, inv_col_a,
                              beta=1.0, order=None, precision=None,
                              mesh=None):
    """Per-shard fused SART for z-slab-sharded volumes via shard_map —
    legal exactly like the sharded projector (projector/sharded.py):
    SART's block-Kaczmarz updates couple only within a slice, so each
    device sweeps its own slab with zero cross-device traffic (the
    reference's MPI slabs run per-slice ASTRA SART the same way,
    mpi_astra_ctvlib.cpp:211-231). Slice count must divide the mesh."""
    from jax.sharding import PartitionSpec as P

    from tomojax.dist import SLAB_AXIS

    interp = jax.default_backend() == "cpu"
    spec3 = P(SLAB_AXIS, None, None)

    def local(xl, bl):
        return sart_sweep_pallas(
            xl, bl, geom, inv_row2d, inv_col_a, beta, order, precision,
            interpret=interp,
        )

    fn = jax.shard_map(
        local, mesh=mesh, in_specs=(spec3, spec3), out_specs=spec3,
        check_vma=False,  # pallas_call out_shape carries no vma info
    )
    return fn(x, b)
