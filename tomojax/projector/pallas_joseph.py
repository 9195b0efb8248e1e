"""Fused Pallas TPU kernels for the Joseph projector pair.

Same math as tomojax/projector/joseph.py (the TPU-native replacement for
ASTRA's CUDA parallel-beam projectors, reference
tomofusion/gpu/utils/tomoengine.cpp:109-127/:279-291), expressed in the
unified closed form of the module docstring there:

    W[a, j, r, c] = hat((j - J*)/D_a) / D_a,
    J*[a, r, c]   = x_c cos_a + y_r sin_a + (Nray-1)/2,
    D_a           = max(|cos_a|, |sin_a|),   hat(u) = max(0, 1-|u|).

Why a kernel at all: the XLA formulations scan over image rows (FP) or
angles (BP) carrying the full accumulator — (Na, Nt, Ns) resp.
(N, N, Ns), ~24-64 MB — through HBM on *every* step, which costs more
HBM traffic than the actual input data. Here the accumulator tile lives
in VMEM across the contraction grid dimension:

  * FP: grid (angle-blocks, slice-blocks, rows). Each program builds the
    2-banded interpolation matrix W_r[a, j, c] for its 8-angle block in
    registers and contracts it with the row plane on the MXU
    ((A_BLK*Nt, N) @ (N, S_BLK)); the (A_BLK, Nt, S_BLK) sinogram tile
    accumulates in VMEM, written back once.
  * BP: grid (row-blocks, slice-blocks, angles), dual matrix
    W[(r, c), j], volume tile (RB, N, S_BLK) accumulates in VMEM.

The volume (FP) / sinogram (BP) streams through VMEM once per
angle-block / row-block — ~0.8 GB total at 256^3 x 90 instead of the
~12 GB the scan accumulator costs. The MXU contraction runs at
``tomojax.config.pallas_precision`` (DEFAULT bf16 — see config.py for
the measured convergence-parity argument; HIGH is emulated as a bf16
split since Mosaic only lowers DEFAULT/HIGHEST).

Measured (v5e, 256^3 x 90, f32): FP 4.7 ms / BP 3.9 ms at DEFAULT with
the tuned block defaults (a_blk=16, rb=32 — an A/B on the full FISTA
step reads 18.1 vs 18.8 ms/iter against the round-1 a_blk=8/rb=8),
13.1 ms at HIGH-split, 25.2 ms at HIGHEST vs the XLA 'mxu' scan's
8.3 / 16.2 / 26.8 ms; rmse@20iter equal to 2e-6. Cost decomposition and
the banded-sparsity bound are recorded in docs/ARCHITECTURE.md
("Banded-projector roofline experiment").

Angle/slice counts are padded to block multiples; padded angles get
1/D = 0 so every padded weight is exactly zero (no masking needed), and
padded slices are zero-filled.

Single-device only (the slice axis must be fully local); dispatched via
``tomojax.config.projector_mode == 'pallas'`` or 'auto' gating in
joseph.py. Falls back to interpret mode off-TPU for tests.

Adjointness note: FP and BP compute the identical weight expression in
the same operation order, but as two separately compiled kernels the
compiler may fuse/FMA them differently, so the pair is adjoint to ~1e-6
relative (f32 rounding), not bitwise like the XLA 'gather' mode. Use
'gather' where strict adjointness matters; tests enforce the tolerance.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from tomojax.geometry import Geometry
from tomojax import config as tjconfig


def _round_up(x: int, m: int) -> int:
    return -(-x // m) * m


def _pad_axis(arr, axis: int, size: int):
    if arr.shape[axis] == size:
        return arr
    pad = [(0, 0)] * arr.ndim
    pad[axis] = (0, size - arr.shape[axis])
    return jnp.pad(arr, pad)


def _angle_tables(geom: Geometry, na_pad: int):
    """(na_pad, 1) f32 cos / sin / 1/D tables; padded rows get 1/D = 0 so
    their Joseph weights vanish identically."""
    cos = np.zeros((na_pad, 1), np.float32)
    sin = np.zeros((na_pad, 1), np.float32)
    invd = np.zeros((na_pad, 1), np.float32)
    cos[: geom.nproj, 0] = geom.cos
    sin[: geom.nproj, 0] = geom.sin
    invd[: geom.nproj, 0] = 1.0 / geom.driving
    return jnp.asarray(cos), jnp.asarray(sin), jnp.asarray(invd)


def _slice_block(ns: int) -> int:
    if ns >= 128:
        return 256 if ns % 256 == 0 else 128
    return _round_up(ns, 8)


def _kernel_precision(prec):
    """Mosaic's dot lowering accepts only DEFAULT / HIGHEST; HIGH (bf16x3)
    is emulated in the kernels by a 2-term bf16 split of the weight
    operand (the image/sinogram operand stays bf16-rounded — its low bits
    are below the interpolation discretization error)."""
    if prec in (jax.lax.Precision.DEFAULT, jax.lax.Precision.HIGHEST):
        return prec
    return "split"


def _dot(w, v, prec):
    if prec != "split":
        return jax.lax.dot_general(
            w, v, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32, precision=prec,
        )
    wh = w.astype(jnp.bfloat16)
    wl = (w - wh.astype(jnp.float32)).astype(jnp.bfloat16)
    vh = v.astype(jnp.bfloat16)
    vl = (v - vh.astype(jnp.float32)).astype(jnp.bfloat16)
    dn = (((1,), (0,)), ((), ()))
    kw = dict(preferred_element_type=jnp.float32,
              precision=jax.lax.Precision.DEFAULT)
    return (
        jax.lax.dot_general(wh, vh, dn, **kw)
        + jax.lax.dot_general(wh, vl, dn, **kw)
        + jax.lax.dot_general(wl, vh, dn, **kw)
    )


def _compiler_params():
    # Contraction dim is the innermost grid axis ('arbitrary' = sequential,
    # required for VMEM accumulation); the outer two are parallel.
    # vmem_limit_bytes: the BP kernel's scoped stack at the tuned rb=32
    # sits at ~16.5 MB in some surrounding layouts (e.g. when the
    # sinogram operand arrives untransposed from a preceding op), just
    # over Mosaic's 16 MB default — raise the cap so the kernel compiles
    # in every composition instead of only the layouts the bench happens
    # to produce.
    dims = ("parallel", "parallel", "arbitrary")
    try:
        return pltpu.CompilerParams(
            dimension_semantics=dims,
            # 96 MB of the v5e's 128: the 1024-class banded BP layout
            # measured 65 MB of scoped stack (the old 64 MB cap missed
            # by 1 MB); still leaves headroom for Mosaic's own buffers.
            vmem_limit_bytes=96 * 1024 * 1024,
        )
    except TypeError:
        # Param-set drift: a JAX whose CompilerParams lacks
        # vmem_limit_bytes must still get the dimension semantics (the
        # two 'parallel' dims matter for performance) rather than
        # dropping every param.
        try:
            return pltpu.CompilerParams(dimension_semantics=dims)
        except TypeError:  # fully unknown param set
            return None


# ---------------------------------------------------------------------------
# Banded tiling (round-2 roofline follow-up, docs/ARCHITECTURE.md): the
# interpolation matrix W[a, j, c] for one image row is a diagonal band of
# slope cos_a and vertical thickness 2 D_a <= 2 in the (j, c) plane, so over
# a 128-wide c-tile the nonzero j-window is at most |cos|*128 + 2 plus the
# angle-block spread — bounded by ~(128 + spread + 2) INDEPENDENT of n.
# The dense kernels build and contract the full (.., nt, n) W; the banded
# kernels loop over c-tiles and touch only the j-window: FLOP ratio
# (nct * JW * 128)/(n * nt) ~ JW/n — ~2x at n=512, ~4x at 1024.
# Window offsets are precomputed host-side into SMEM tables (multiples of
# 8 for sublane-aligned dynamic slices); JW is the static max window.
# ---------------------------------------------------------------------------

_BAND_CT = 128  # c-tile width (one MXU tile of the contraction dim)
# Static tile unroll, A/B'd on v5e (min-of-3): fori wins for FP a_blk=16
# (4.20/11.70 ms at 256/512 vs 4.26/14.16 unrolled); unroll only helped
# the 512 FP a_blk=8 corner (11.04) and BP marginally (13.32 vs 13.86).
# Keep the loop form; the flag preserves the measured alternative.
_BAND_UNROLL = False


def _fp_row_group(n: int) -> int:
    """Rows per FP window-table entry. Per-row tables are tightest, but
    SMEM is 1 MB and the (1, n, nct) double-buffered block overflows it
    at n=1024 (measured: exceeded by 1.1K with everything else resident);
    grouping rows widens JW by at most rg*|sin| <= rg bins."""
    return 1 if n <= 512 else 8


def _band_windows_fp(geom: Geometry, a_blk: int, na_pad: int, n: int):
    """j-window table for the FP kernel: j0[ab, r // rg, t] (int32,
    multiples of 8) and the static window width JW covering every
    (angle-in-block, row-in-group, c-in-tile) triple with the +-1 hat
    support."""
    ct = _BAND_CT
    nct = n // ct
    rg = _fp_row_group(n)
    nab = na_pad // a_blk
    off = (geom.nray - 1) / 2.0
    cos = np.zeros(na_pad)
    sin = np.zeros(na_pad)
    cos[: geom.nproj] = geom.cos
    sin[: geom.nproj] = geom.sin
    # use each block's REAL angles only (padded angles have zero weight)
    yr = (n - 1) / 2.0 - np.arange(n)  # (n,)
    xe = np.stack(
        [np.arange(nct) * ct, np.arange(nct) * ct + ct - 1]
    ) - (n - 1) / 2.0  # (2, nct) tile corner columns
    j0 = np.zeros((nab, n // rg, nct), np.int32)
    need = 0
    for ab in range(nab):
        lo_a = ab * a_blk
        hi_a = min(lo_a + a_blk, geom.nproj)
        if hi_a <= lo_a:  # block entirely padded
            continue
        c = cos[lo_a:hi_a]  # (A,)
        s = sin[lo_a:hi_a]
        base = c[:, None, None] * xe[None] + off  # (A, 2, nct)
        rowterm = s[:, None] * yr[None, :]  # (A, n)
        # jstar corners over (angle, tile-edge, row, tile): (A, 2, n, nct)
        js = base[:, :, None, :] + rowterm[:, None, :, None]
        # reduce rows into groups of rg (SMEM budget; see _fp_row_group)
        js = js.reshape(js.shape[0], 2, n // rg, rg, nct)
        lo = js.min(axis=(0, 1, 3)) - 1.0  # (n//rg, nct)
        hi = js.max(axis=(0, 1, 3)) + 1.0
        j0_raw = (np.floor(lo).astype(np.int64) // 8) * 8
        need = max(need, int((np.ceil(hi) - j0_raw + 1).max()))
        j0[ab] = j0_raw
    jw = min(-(-max(need, 8) // 8) * 8, _round_up(geom.nray, 8))
    np.clip(j0, 0, max(geom.nray - jw, 0), out=j0)
    return jnp.asarray(j0), jw, nct


def _band_windows_bp(geom: Geometry, rb: int, n_pad: int, n: int):
    """j-window table for the BP kernel: j0[a, rblock, t]."""
    ct = _BAND_CT
    nct = n // ct
    nrb = n_pad // rb
    off = (geom.nray - 1) / 2.0
    yr = (n - 1) / 2.0 - np.arange(n_pad)  # padded rows clamp below
    yre = np.stack(
        [yr[np.arange(nrb) * rb], yr[np.arange(nrb) * rb + rb - 1]]
    )  # (2, nrb)
    xe = np.stack(
        [np.arange(nct) * ct, np.arange(nct) * ct + ct - 1]
    ) - (n - 1) / 2.0  # (2, nct)
    c = geom.cos[:, None, None, None, None]  # (na, 1, 1, 1, 1)
    s = geom.sin[:, None, None, None, None]
    js = c * xe[None, None, None] + s * yre[None, :, :, None, None] + off
    # (na, 2, nrb, 2, nct): corners over rows x cols
    lo = js.min(axis=(1, 3)) - 1.0  # (na, nrb, nct)
    hi = js.max(axis=(1, 3)) + 1.0
    j0 = (np.floor(lo).astype(np.int64) // 8) * 8
    need = int((np.ceil(hi) - j0 + 1).max())
    jw = min(-(-max(need, 8) // 8) * 8, _round_up(geom.nray, 8))
    # Measured-out (round 5): rounding jw up to a 128-lane multiple
    # (144->256 at 512/1024) is output-IDENTICAL and perf-neutral —
    # one probe read 9.55 ms for the 512 BP (vs 13.5) but did not
    # reproduce (13.35-13.9 across reruns, same config); the BP's
    # exposed-hat headroom at 512/1024 (results/sol_512_1024.json) is
    # not a window-alignment effect.
    j0 = np.clip(j0, 0, max(geom.nray - jw, 0)).astype(np.int32)
    return jnp.asarray(j0), jw, nct


def _use_banded(n: int, nray: int) -> bool:
    """Structural preconditions for the banded kernels (the payoff
    check is _band_enabled, after the window width is known)."""
    if tjconfig.banded_projector == "off":
        return False
    return n % _BAND_CT == 0 and nray % 8 == 0


def _band_enabled(jw: int, nct: int, nray: int, kind: str) -> bool:
    """Measured payoff thresholds (v5e, min-of-3 slope timing; see
    docs/ARCHITECTURE.md): FP banded wins from window ratio ~0.75
    (1.23x at 256: 4.20 vs 5.15 ms; 1.49x at 512: 11.70 vs 17.43);
    BP only from ~0.5 (neutral at 256 where jw/nt=0.56; 1.19x at 512
    where 0.28) — BP's per-program cost is dominated by the hat build
    over the full (rb, n) rows, which banding thins less."""
    if jw > nray:
        return False
    if tjconfig.banded_projector == "on":
        return True
    if nct < 2:
        return False
    if kind == "fp":
        return jw * 4 <= 3 * nray
    return jw * 2 <= nray


def _fp_banded_kernel(n, nray, jw, nct, rg, unroll, prec, j0_ref, cos_ref,
                      sin_ref, invd_ref, img_ref, out_ref):
    k = pl.program_id(2)

    @pl.when(k == 0)
    def _():
        out_ref[:] = jnp.zeros_like(out_ref)

    a_blk, _, s_blk = out_ref.shape
    ct = _BAND_CT
    yr = (n - 1) / 2.0 - k.astype(jnp.float32)
    off = (nray - 1) / 2.0
    base = sin_ref[:] * yr + off  # (A_BLK, 1)
    invd = invd_ref[:][:, :, None]  # (A_BLK, 1, 1)
    iota_c = jax.lax.broadcasted_iota(jnp.int32, (1, ct), 1).astype(jnp.float32)
    iota_j = jax.lax.broadcasted_iota(jnp.int32, (1, jw, 1), 1).astype(jnp.float32)

    def tile(t, _):
        j0 = pl.multiple_of(j0_ref[0, k // rg, t], 8)
        tc = float(t * ct) if isinstance(t, int) else (t * ct).astype(jnp.float32)
        xc = iota_c + tc - (n - 1) / 2.0
        jstar = cos_ref[:] * xc + base  # (A_BLK, CT)
        jj = iota_j + j0.astype(jnp.float32)
        w = (
            jnp.maximum(0.0, 1.0 - jnp.abs(jj - jstar[:, None, :]) * invd)
            * invd
        )  # (A_BLK, JW, CT)
        img_t = img_ref[0, pl.ds(t * ct, ct), :]  # (CT, S_BLK)
        contrib = _dot(w.reshape(a_blk * jw, ct), img_t, prec)
        idx = (slice(None), pl.ds(j0, jw), slice(None))
        out_ref[idx] += contrib.reshape(a_blk, jw, s_blk)
        return 0

    if unroll:  # static tiles: only j0 stays dynamic
        for t in range(nct):
            tile(t, None)
    else:
        jax.lax.fori_loop(0, nct, tile, 0)


def _bp_banded_kernel(n, nray, jw, nct, rb, fused, unroll, prec, j0_ref,
                      cos_ref, sin_ref, invd_ref, y_ref, *rest):
    if fused:
        yv_ref, ic_ref, out_ref = rest
    else:
        (out_ref,) = rest
    k = pl.program_id(2)

    @pl.when(k == 0)
    def _():
        out_ref[:] = jnp.zeros_like(out_ref)

    _, _, s_blk = out_ref.shape
    ct = _BAND_CT
    r = pl.program_id(0)
    ck = cos_ref[0, k]
    sk = sin_ref[0, k]
    invd = invd_ref[0, k]
    rows = (r * rb + jax.lax.broadcasted_iota(jnp.int32, (rb, 1), 0)).astype(jnp.float32)
    yr = (n - 1) / 2.0 - rows  # (RB, 1)
    off = (nray - 1) / 2.0
    iota_c = jax.lax.broadcasted_iota(jnp.int32, (1, ct), 1).astype(jnp.float32)
    iota_j = jax.lax.broadcasted_iota(jnp.int32, (1, 1, jw), 2).astype(jnp.float32)

    def tile(t, _):
        j0 = pl.multiple_of(j0_ref[0, k, t], 8)
        tc = float(t * ct) if isinstance(t, int) else (t * ct).astype(jnp.float32)
        xc = iota_c + tc - (n - 1) / 2.0
        jstar = ck * xc + (sk * yr + off)  # (RB, CT)
        jj = iota_j + j0.astype(jnp.float32)
        w = (
            jnp.maximum(0.0, 1.0 - jnp.abs(jj - jstar[:, :, None]) * invd)
            * invd
        )  # (RB, CT, JW)
        y_sub = y_ref[0, pl.ds(j0, jw), :]  # (JW, S_BLK)
        contrib = _dot(w.reshape(rb * ct, jw), y_sub, prec)
        idx = (slice(None), pl.ds(t * ct, ct), slice(None))
        out_ref[idx] += contrib.reshape(rb, ct, s_blk)
        return 0

    if unroll:  # static tiles: only j0 stays dynamic
        for t in range(nct):
            tile(t, None)
    else:
        jax.lax.fori_loop(0, nct, tile, 0)

    if fused:
        @pl.when(k == pl.num_programs(2) - 1)
        def _():
            out_ref[:] = jnp.maximum(
                yv_ref[:] + ic_ref[:][:, :, None] * out_ref[:], 0.0
            )


def _fp_kernel(n, nray, prec, cos_ref, sin_ref, invd_ref, img_ref, out_ref):
    k = pl.program_id(2)

    @pl.when(k == 0)
    def _():
        out_ref[:] = jnp.zeros_like(out_ref)

    a_blk, _, s_blk = out_ref.shape
    yr = (n - 1) / 2.0 - k.astype(jnp.float32)
    xc = jax.lax.broadcasted_iota(jnp.int32, (1, n), 1).astype(jnp.float32) - (n - 1) / 2.0
    off = (nray - 1) / 2.0
    # J*[a, c] for this image row
    jstar = cos_ref[:] * xc + (sin_ref[:] * yr + off)  # (A_BLK, N)
    iota_j = jax.lax.broadcasted_iota(jnp.int32, (1, nray, 1), 1).astype(jnp.float32)
    invd = invd_ref[:][:, :, None]  # (A_BLK, 1, 1)
    w = (
        jnp.maximum(0.0, 1.0 - jnp.abs(iota_j - jstar[:, None, :]) * invd)
        * invd
    )  # (A_BLK, Nt, N)
    contrib = _dot(w.reshape(a_blk * nray, n), img_ref[0], prec)
    out_ref[:] += contrib.reshape(a_blk, nray, s_blk)


def fp_pallas_sl(img, geom: Geometry, precision=None, a_blk: int = 16,
                 interpret: bool = False):
    """Slice-LAST forward projection: (N, N, Ns) -> (Nproj, Nray, Ns).

    The kernel's native layout — `fp_pallas` is this plus the two public
    layout transposes. Drivers that keep their whole state slice-last
    (solvers/fista.py fista_run_sl) call this directly and skip ~4 full
    volume/sinogram HBM transposes per iteration."""
    n, _, ns = img.shape
    nray, na = geom.nray, geom.nproj
    prec = _kernel_precision(
        precision if precision is not None else tjconfig.pallas_precision
    )
    s_blk = _slice_block(ns)
    ns_pad = _round_up(ns, s_blk)
    na_pad = _round_up(na, a_blk)
    cos, sin, invd = _angle_tables(geom, na_pad)

    img = _pad_axis(img, 2, ns_pad)  # (r, c, s)
    ang_spec = pl.BlockSpec((a_blk, 1), lambda a, s, k: (a, 0))
    img_spec = pl.BlockSpec((1, n, s_blk), lambda a, s, k: (k, 0, s))
    out_spec = pl.BlockSpec((a_blk, nray, s_blk), lambda a, s, k: (a, 0, s))
    out_shape = jax.ShapeDtypeStruct((na_pad, nray, ns_pad), img.dtype)
    grid = (na_pad // a_blk, ns_pad // s_blk, n)
    if _use_banded(n, nray):
        j0, jw, nct = _band_windows_fp(geom, a_blk, na_pad, n)
        if _band_enabled(jw, nct, nray, "fp"):
            # SMEM blocks must span the trailing dims on TPU: ship the
            # whole (rows x tiles) table for the angle block (n*nct i32,
            # ~2 KB) and index by the row program id in-kernel.
            j0_spec = pl.BlockSpec(
                (1, n // _fp_row_group(n), nct), lambda a, s, k: (a, 0, 0),
                memory_space=pltpu.SMEM,
            )
            out = pl.pallas_call(
                partial(_fp_banded_kernel, n, nray, jw, nct,
                        _fp_row_group(n), _BAND_UNROLL, prec),
                grid=grid,
                in_specs=[j0_spec, ang_spec, ang_spec, ang_spec, img_spec],
                out_specs=out_spec,
                out_shape=out_shape,
                compiler_params=_compiler_params(),
                interpret=interpret,
            )(j0, cos, sin, invd, img)
            return out[:na, :, :ns]
    out = pl.pallas_call(
        partial(_fp_kernel, n, nray, prec),
        grid=grid,
        in_specs=[ang_spec, ang_spec, ang_spec, img_spec],
        out_specs=out_spec,
        out_shape=out_shape,
        compiler_params=_compiler_params(),
        interpret=interpret,
    )(cos, sin, invd, img)
    return out[:na, :, :ns]


def fp_pallas(x, geom: Geometry, precision=None, a_blk: int = 16,
              interpret: bool = False):
    """Forward projection A x : (Ns, N, N) -> (Ns, Nproj, Nray)."""
    out = fp_pallas_sl(x.transpose(1, 2, 0), geom, precision, a_blk,
                       interpret)
    return out.transpose(2, 0, 1)


def _fp_resid_epilogue(b_ref, axold_ref, invrow_ref, beta_ref,
                       ax_ref, resid_ref, ddsq_ref):
    """ax accumulated; emit resid = (b - (ax + beta (ax - ax_old))) R —
    the NEXT iteration's weighted residual of the momentum variable
    (FISTA projection-reuse identity: A y = A x + beta (A x - A x_old)) —
    and this block's partial sum of (ax - b)^2 (the data-distance metric
    ||A x - b||^2; summing the (a, s)-block partials outside the kernel
    replaces a separate full-sinogram XLA reduction per iteration)."""
    ax = ax_ref[:]
    b = b_ref[:]
    beta = beta_ref[0, 0]
    ay = ax + beta * (ax - axold_ref[:])
    resid_ref[:] = (b - ay) * invrow_ref[:][:, :, None]
    r = ax - b  # padded rows are 0 in both
    # One (8, 128) VMEM tile per (a, s) block, partial sum in its [0, 0]
    # cell, zeros elsewhere (SMEM scalar outputs need full-array blocks
    # and dynamic program-id stores break the CPU interpreter; a padded
    # VMEM tile per block sidesteps both — the caller just sums).
    ii = jax.lax.broadcasted_iota(jnp.int32, (8, 128), 0)
    jj = jax.lax.broadcasted_iota(jnp.int32, (8, 128), 1)
    ddsq_ref[:] = jnp.where((ii == 0) & (jj == 0), jnp.sum(r * r), 0.0)


def _fp_resid_kernel(n, nray, prec, cos_ref, sin_ref, invd_ref, img_ref,
                     b_ref, axold_ref, invrow_ref, beta_ref,
                     ax_ref, resid_ref, ddsq_ref):
    _fp_kernel(n, nray, prec, cos_ref, sin_ref, invd_ref, img_ref, ax_ref)

    @pl.when(pl.program_id(2) == 0)
    def _():
        ddsq_ref[:] = jnp.zeros_like(ddsq_ref)

    @pl.when(pl.program_id(2) == pl.num_programs(2) - 1)
    def _():
        _fp_resid_epilogue(b_ref, axold_ref, invrow_ref, beta_ref,
                           ax_ref, resid_ref, ddsq_ref)


def _fp_resid_banded_kernel(n, nray, jw, nct, rg, unroll, prec, j0_ref,
                            cos_ref, sin_ref, invd_ref, img_ref,
                            b_ref, axold_ref, invrow_ref, beta_ref,
                            ax_ref, resid_ref, ddsq_ref):
    _fp_banded_kernel(n, nray, jw, nct, rg, unroll, prec, j0_ref, cos_ref,
                      sin_ref, invd_ref, img_ref, ax_ref)

    @pl.when(pl.program_id(2) == 0)
    def _():
        ddsq_ref[:] = jnp.zeros_like(ddsq_ref)

    @pl.when(pl.program_id(2) == pl.num_programs(2) - 1)
    def _():
        _fp_resid_epilogue(b_ref, axold_ref, invrow_ref, beta_ref,
                           ax_ref, resid_ref, ddsq_ref)


def fp_resid_pallas_sl(x, geom: Geometry, b_pad, ax_old_pad, inv_row_pad,
                       beta, precision=None, a_blk: int = 16,
                       interpret: bool = False):
    """FP with the FISTA residual fused as an epilogue. All sinogram
    operands and BOTH outputs use the PADDED (na_pad, nray, ns_pad)
    layout (na_pad = round_up(nproj, a_blk)) so the scan carries no
    per-iteration pad/slice copies; padded rows of `inv_row_pad` must be
    zero (making padded resid rows zero — weightless in BP anyway).

    Returns (ax_pad, resid_pad, ddsq):
        ax    = A x                       (padded rows = 0)
        resid = (b - (ax + beta (ax - ax_old))) * inv_row
        ddsq  = per-(a, s)-block partial sums of (ax - b)^2, one padded
                (8, 128) tile per block with the partial in its [0, 0]
                cell; the caller's ||A x - b||^2 is ddsq.sum() — replaces
                a separate full-sinogram XLA reduction in the scanned
                FISTA driver
    """
    n, _, ns = x.shape
    nray, na = geom.nray, geom.nproj
    prec = _kernel_precision(
        precision if precision is not None else tjconfig.pallas_precision
    )
    s_blk = _slice_block(ns)
    ns_pad = _round_up(ns, s_blk)
    na_pad = _round_up(na, a_blk)
    assert b_pad.shape == (na_pad, nray, ns_pad), (b_pad.shape, na_pad)
    assert ax_old_pad.shape == b_pad.shape
    assert inv_row_pad.shape == (na_pad, nray)
    cos, sin, invd = _angle_tables(geom, na_pad)
    img = _pad_axis(x, 2, ns_pad)
    beta_arr = jnp.reshape(jnp.asarray(beta, jnp.float32), (1, 1))

    ang_spec = pl.BlockSpec((a_blk, 1), lambda a, s, k: (a, 0))
    img_spec = pl.BlockSpec((1, n, s_blk), lambda a, s, k: (k, 0, s))
    sino_spec = pl.BlockSpec((a_blk, nray, s_blk), lambda a, s, k: (a, 0, s))
    ir_spec = pl.BlockSpec((a_blk, nray), lambda a, s, k: (a, 0))
    beta_spec = pl.BlockSpec(
        (1, 1), lambda a, s, k: (0, 0), memory_space=pltpu.SMEM
    )
    ddsq_spec = pl.BlockSpec((8, 128), lambda a, s, k: (a, s))
    out_shape = (
        jax.ShapeDtypeStruct((na_pad, nray, ns_pad), x.dtype),
        jax.ShapeDtypeStruct((na_pad, nray, ns_pad), x.dtype),
        jax.ShapeDtypeStruct((na_pad // a_blk * 8, ns_pad // s_blk * 128),
                             jnp.float32),
    )
    grid = (na_pad // a_blk, ns_pad // s_blk, n)
    if _use_banded(n, nray):
        j0, jw, nct = _band_windows_fp(geom, a_blk, na_pad, n)
        if _band_enabled(jw, nct, nray, "fp"):
            j0_spec = pl.BlockSpec(
                (1, n // _fp_row_group(n), nct), lambda a, s, k: (a, 0, 0),
                memory_space=pltpu.SMEM,
            )
            return pl.pallas_call(
                partial(_fp_resid_banded_kernel, n, nray, jw, nct,
                        _fp_row_group(n), _BAND_UNROLL, prec),
                grid=grid,
                in_specs=[j0_spec, ang_spec, ang_spec, ang_spec, img_spec,
                          sino_spec, sino_spec, ir_spec, beta_spec],
                out_specs=(sino_spec, sino_spec, ddsq_spec),
                out_shape=out_shape,
                compiler_params=_compiler_params(),
                interpret=interpret,
            )(j0, cos, sin, invd, img, b_pad, ax_old_pad, inv_row_pad,
              beta_arr)
    return pl.pallas_call(
        partial(_fp_resid_kernel, n, nray, prec),
        grid=grid,
        in_specs=[ang_spec, ang_spec, ang_spec, img_spec,
                  sino_spec, sino_spec, ir_spec, beta_spec],
        out_specs=(sino_spec, sino_spec, ddsq_spec),
        out_shape=out_shape,
        compiler_params=_compiler_params(),
        interpret=interpret,
    )(cos, sin, invd, img, b_pad, ax_old_pad, inv_row_pad, beta_arr)


def _bp_kernel_ab(n, nray, rb, ab, fused, prec, cos_ref, sin_ref, invd_ref,
                  y_ref, *rest):
    """Angle-blocked dense BP: each grid step accumulates `ab` angles,
    amortizing per-program overhead. MEASURED SLOWER on v5e (min-of-3
    slope, 90 angles): 4.85 -> 6.8/6.6/6.3 ms at 256^3 for ab=3/6/10,
    16.3 -> 21.3/20.6/20.6 ms at 512^2x128 — the in-kernel fori over
    angles serializes what Mosaic otherwise overlaps across grid steps
    (sinogram block prefetch + W build + MXU). Kept opt-in (ab>1) so the
    negative result is reproducible; default dispatch never uses it."""
    if fused:
        yv_ref, ic_ref, out_ref = rest
    else:
        (out_ref,) = rest
    r = pl.program_id(0)
    k = pl.program_id(2)

    @pl.when(k == 0)
    def _():
        out_ref[:] = jnp.zeros_like(out_ref)

    _, _, s_blk = out_ref.shape
    rows = (r * rb + jax.lax.broadcasted_iota(jnp.int32, (rb, 1), 0)).astype(jnp.float32)
    yr = (n - 1) / 2.0 - rows
    xc = jax.lax.broadcasted_iota(jnp.int32, (1, n), 1).astype(jnp.float32) - (n - 1) / 2.0
    off = (nray - 1) / 2.0
    iota_j = jax.lax.broadcasted_iota(jnp.int32, (1, 1, nray), 2).astype(jnp.float32)

    def body(a, acc):
        idx = k * ab + a
        ck = cos_ref[0, idx]
        sk = sin_ref[0, idx]
        invd = invd_ref[0, idx]
        jstar = ck * xc + (sk * yr + off)
        w = (
            jnp.maximum(
                0.0, 1.0 - jnp.abs(iota_j - jstar[:, :, None]) * invd
            )
            * invd
        )
        return acc + _dot(w.reshape(rb * n, nray), y_ref[a], prec)

    acc = jax.lax.fori_loop(
        0, ab, body, jnp.zeros((rb * n, s_blk), jnp.float32)
    )
    out_ref[:] += acc.reshape(rb, n, s_blk)

    if fused:
        @pl.when(k == pl.num_programs(2) - 1)
        def _():
            out_ref[:] = jnp.maximum(
                yv_ref[:] + ic_ref[:][:, :, None] * out_ref[:], 0.0
            )


def _bp_kernel(n, nray, rb, fused, prec, cos_ref, sin_ref, invd_ref,
               y_ref, *rest):
    """Dense BP; with `fused`, the ASTRA-SIRT update
    max(y_vol + inv_col * A^T y, 0) runs as an epilogue on the VMEM
    accumulator tile — the separate XLA elementwise pass costs ~1.5 ms
    of HBM round-trips at 256^3 on v5e (the BP output volume is written,
    re-read, combined, re-written). Same fused/rest-args pattern as
    _bp_banded_kernel / _bp_kernel_ab so the W-build body exists once."""
    if fused:
        yv_ref, ic_ref, out_ref = rest
    else:
        (out_ref,) = rest
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
    yr = (n - 1) / 2.0 - rows  # (RB, 1)
    xc = jax.lax.broadcasted_iota(jnp.int32, (1, n), 1).astype(jnp.float32) - (n - 1) / 2.0
    off = (nray - 1) / 2.0
    jstar = ck * xc + (sk * yr + off)  # (RB, N)
    iota_j = jax.lax.broadcasted_iota(jnp.int32, (1, 1, nray), 2).astype(jnp.float32)
    w = (
        jnp.maximum(
            0.0, 1.0 - jnp.abs(iota_j - jstar[:, :, None]) * invd
        )
        * invd
    )  # (RB, N, Nt)
    contrib = _dot(w.reshape(rb * n, nray), y_ref[0], prec)
    out_ref[:] += contrib.reshape(rb, n, s_blk)

    if fused:
        @pl.when(k == pl.num_programs(2) - 1)
        def _():
            out_ref[:] = jnp.maximum(
                yv_ref[:] + ic_ref[:][:, :, None] * out_ref[:], 0.0
            )


def bp_pallas_sl(yt, geom: Geometry, precision=None, rb: int = 32,
                 interpret: bool = False, y_vol=None, inv_col2d=None,
                 ab: int = 1):
    """Slice-LAST matched backprojection: (Nproj, Nray, Ns) -> (N, N, Ns).

    With `y_vol` ((N, N, Ns)) and `inv_col2d` ((N, N), the SIRT column
    weights shared across slices — System.inv_col[0]) the ASTRA-SIRT
    update `max(y_vol + inv_col * A^T y, 0)` is fused into the kernel
    epilogue on the VMEM accumulator tile (_bp_kernel fused=True).

    ab > 1 accumulates `ab` angles per grid step (dense kernel only)."""
    na, nray, ns = yt.shape
    n = geom.n
    assert na == geom.nproj and nray == geom.nray
    fused = y_vol is not None
    assert fused == (inv_col2d is not None)
    prec = _kernel_precision(
        precision if precision is not None else tjconfig.pallas_precision
    )
    s_blk = _slice_block(ns)
    ns_pad = _round_up(ns, s_blk)
    na_pad = _round_up(na, ab)
    cos, sin, invd = _angle_tables(geom, na_pad)

    yt = _pad_axis(_pad_axis(yt, 2, ns_pad), 0, na_pad)
    n_pad = _round_up(n, rb)
    # full (1, Na) tables in SMEM, indexed by the angle grid position
    cos, sin, invd = (t.reshape(1, na_pad) for t in (cos, sin, invd))
    ang_spec = pl.BlockSpec(
        (1, na_pad), lambda r, s, k: (0, 0), memory_space=pltpu.SMEM
    )
    sino_spec = pl.BlockSpec((1, nray, s_blk), lambda r, s, k: (k, 0, s))
    if ab > 1:
        sino_ab_spec = pl.BlockSpec(
            (ab, nray, s_blk), lambda r, s, k: (k, 0, s)
        )
        yv = None
        if fused:
            # pad the epilogue operands' ROW axis too: padded rows
            # compute garbage that the [:n] output slice discards
            yv = _pad_axis(_pad_axis(y_vol, 2, ns_pad), 0, n_pad)
            inv_col2d = _pad_axis(inv_col2d, 0, n_pad)
        out_shape = jax.ShapeDtypeStruct((n_pad, n, ns_pad), yt.dtype)
        out_spec = pl.BlockSpec((rb, n, s_blk), lambda r, s, k: (r, 0, s))
        vol_spec = pl.BlockSpec((rb, n, s_blk), lambda r, s, k: (r, 0, s))
        ic_spec = pl.BlockSpec((rb, n), lambda r, s, k: (r, 0))
        kern = partial(_bp_kernel_ab, n, nray, rb, ab, fused, prec)
        args = [cos, sin, invd, yt] + ([yv, inv_col2d] if fused else [])
        specs = [ang_spec, ang_spec, ang_spec, sino_ab_spec] + (
            [vol_spec, ic_spec] if fused else []
        )
        out = pl.pallas_call(
            kern, grid=(n_pad // rb, ns_pad // s_blk, na_pad // ab),
            in_specs=specs, out_specs=out_spec, out_shape=out_shape,
            compiler_params=_compiler_params(), interpret=interpret,
        )(*args)
        return out[:n, :, :ns]
    out_spec = pl.BlockSpec((rb, n, s_blk), lambda r, s, k: (r, 0, s))
    out_shape = jax.ShapeDtypeStruct((n_pad, n, ns_pad), yt.dtype)
    grid = (n_pad // rb, ns_pad // s_blk, na_pad)
    vol_spec = pl.BlockSpec((rb, n, s_blk), lambda r, s, k: (r, 0, s))
    ic_spec = pl.BlockSpec((rb, n), lambda r, s, k: (r, 0))
    extra_args, extra_specs = [], []
    if fused:
        # pad the epilogue operands' row axis along with the output grid:
        # padded rows produce values the [:n] output slice discards
        yv = _pad_axis(_pad_axis(y_vol, 2, ns_pad), 0, n_pad)
        extra_args = [yv, _pad_axis(inv_col2d, 0, n_pad)]
        extra_specs = [vol_spec, ic_spec]
    if _use_banded(n, nray):
        j0, jw, nct = _band_windows_bp(geom, rb, n_pad, n)
        if _band_enabled(jw, nct, nray, "bp"):
            j0 = jnp.transpose(j0, (1, 0, 2))  # (nrb, na, nct): SMEM
            # blocks must span the trailing dims; index by angle in-kernel
            j0_spec = pl.BlockSpec(
                (1, na_pad, nct), lambda r, s, k: (r, 0, 0),
                memory_space=pltpu.SMEM,
            )
            out = pl.pallas_call(
                partial(_bp_banded_kernel, n, nray, jw, nct, rb, fused,
                        _BAND_UNROLL, prec),
                grid=grid,
                in_specs=[j0_spec, ang_spec, ang_spec, ang_spec,
                          sino_spec] + extra_specs,
                out_specs=out_spec, out_shape=out_shape,
                compiler_params=_compiler_params(),
                interpret=interpret,
            )(j0, cos, sin, invd, yt, *extra_args)
            return out[:n, :, :ns]
    out = pl.pallas_call(
        partial(_bp_kernel, n, nray, rb, fused, prec),
        grid=grid,
        in_specs=[ang_spec, ang_spec, ang_spec, sino_spec] + extra_specs,
        out_specs=out_spec,
        out_shape=out_shape,
        compiler_params=_compiler_params(),
        interpret=interpret,
    )(cos, sin, invd, yt, *extra_args)
    return out[:n, :, :ns]


def bp_pallas(y, geom: Geometry, precision=None, rb: int = 32,
              interpret: bool = False):
    """Matched backprojection A^T y : (Ns, Nproj, Nray) -> (Ns, N, N)."""
    out = bp_pallas_sl(y.transpose(1, 2, 0), geom, precision, rb, interpret)
    return out.transpose(2, 0, 1)
