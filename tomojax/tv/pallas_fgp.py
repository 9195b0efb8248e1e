"""Pallas TPU kernels for the FGP TV prox (reference-faithful semantics).

The XLA stencil formulation of one FGP iteration (tv/__init__.py) moves
~2.6 GB of HBM traffic per iteration at 256^3 because every difference
field and the dual updates materialize. These kernels fuse each iteration
into two plane-wise passes:

  * obj kernel  : d = max(x - lam * div(P), 0)         (one output plane)
  * grad kernel : P += (1/(26 lam)) grad(d); project   (three planes)

Each grid program owns one z-plane; the z-neighbor planes arrive through
*shifted BlockSpec index maps* (program i additionally receives plane
i-1 of p1 / plane i+1 of d), so no manual DMA is needed. Boundary
conditions match tv_fgp.cu exactly: zero divergence contribution below
the low boundary, zero forward-difference at the far boundary, nonneg
clamp, isotropic dual-ball projection.

Used automatically on TPU backends via tv_fgp dispatch
(tomojax.config.tv_impl); falls back to the XLA stencils on CPU and for
sharded volumes (the kernel assumes the full z-extent is local — the
sharded path keeps the XLA formulation whose rolls become halo
collectives).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu




def _tv_compiler_params(nx: int = 128, plane_bytes: int = 0):
    """Scoped-VMEM cap for the TV kernels, keyed on the LANE dimension:
    planes whose trailing dim is below the 128-lane tile get padded to
    128 in VMEM, which pushed the fused FGP kernel to 19 MB of scoped
    stack at 1024-class slice-last layouts (nx = Ns = 64) — over
    Mosaic's 16 MB default. Only those layouts get the raised cap: a
    blanket raise measured a 13% HEADLINE REGRESSION at 256^3 (1018M vs
    1176M voxel-iters/s — the larger budget changes Mosaic's buffering
    choices for kernels that fit fine under the default). Big planes
    (the transposed 1024-class layout) need 96 MB: 48/64 MB crash the
    Mosaic backend at (64, 1024, 1024) with pb=1 (round 5)."""
    if plane_bytes >= _TRANSPOSE_PLANE_BYTES:
        try:
            return pltpu.CompilerParams(
                vmem_limit_bytes=96 * 1024 * 1024
            )
        except TypeError:
            return None
    if nx >= 128:
        return None  # default cap; measured-best for unpadded lanes
    try:
        return pltpu.CompilerParams(vmem_limit_bytes=32 * 1024 * 1024)
    except TypeError:  # older param sets
        return None


def _obj_kernel(lam, x_ref, p1_ref, p1m_ref, p2_ref, p3_ref, d_ref):
    # grid (nel, nz): axis 0 = element batch (TV never couples elements,
    # chemistry/utils/regularizers/tv_fgp.cu:192-287), axis 1 = z-plane.
    i = pl.program_id(1)
    f32 = jnp.float32
    p1 = p1_ref[0, 0].astype(f32)
    p2 = p2_ref[0, 0].astype(f32)
    p3 = p3_ref[0, 0].astype(f32)
    n_r, n_c = p2.shape
    # z: p1[i] - p1[i-1] (zero below the low boundary)
    prev = jnp.where(i == 0, jnp.zeros_like(p1), p1m_ref[0, 0].astype(f32))
    div = p1 - prev
    # y: p2 - p2 shifted down one row
    div += p2 - jnp.concatenate(
        [jnp.zeros((1, n_c), p2.dtype), p2[:-1, :]], axis=0
    )
    # x: p3 - p3 shifted right one column
    div += p3 - jnp.concatenate(
        [jnp.zeros((n_r, 1), p3.dtype), p3[:, :-1]], axis=1
    )
    d_ref[0, 0] = jnp.maximum(x_ref[0, 0] - lam * div, 0.0)


def _obj_mom_kernel(lam, x_ref, p1_ref, p1m_ref, p2_ref, p3_ref,
                    xold_ref, beta_ref, d_ref, y_ref):
    """Final obj pass with the FISTA Nesterov extrapolation fused as an
    epilogue: y = d + beta (d - x_old) emitted from the same plane block
    (the separate XLA elementwise pass costs an extra read of d and
    x_old plus a dispatch inside the scanned FISTA driver)."""
    _obj_kernel(lam, x_ref, p1_ref, p1m_ref, p2_ref, p3_ref, d_ref)
    d = d_ref[0, 0]
    beta = beta_ref[0, 0]
    y_ref[0, 0] = d + beta * (d - xold_ref[0, 0])


def _grad_kernel(multip, d_ref, dn_ref, p1_ref, p2_ref, p3_ref,
                 o1_ref, o2_ref, o3_ref):
    i = pl.program_id(1)
    nz = pl.num_programs(1)
    d = d_ref[0, 0]
    n_r, n_c = d.shape
    # z forward difference, zero at the far boundary
    g1 = jnp.where(i == nz - 1, jnp.zeros_like(d), d - dn_ref[0, 0])
    # y forward difference
    g2 = jnp.concatenate(
        [d[:-1, :] - d[1:, :], jnp.zeros((1, n_c), d.dtype)], axis=0
    )
    # x forward difference
    g3 = jnp.concatenate(
        [d[:, :-1] - d[:, 1:], jnp.zeros((n_r, 1), d.dtype)], axis=1
    )
    p1 = p1_ref[0, 0] + multip * g1
    p2 = p2_ref[0, 0] + multip * g2
    p3 = p3_ref[0, 0] + multip * g3
    denom = p1 * p1 + p2 * p2 + p3 * p3
    scale = jnp.where(denom > 1.0, jax.lax.rsqrt(denom), 1.0)
    o1_ref[0, 0] = p1 * scale
    o2_ref[0, 0] = p2 * scale
    o3_ref[0, 0] = p3 * scale


def _fused_kernel(lam, multip, pb, nz, x_ref, xn_ref, p1_ref, p1p_ref,
                  p1n_ref, p2_ref, p2n_ref, p3_ref, p3n_ref,
                  o1_ref, o2_ref, o3_ref):
    """One full FGP iteration (obj + grad + projection) for a PB-plane
    block, with the obj field d recomputed in registers — halves the HBM
    traffic vs the two-pass formulation (d never round-trips).

    Grid (nel, nblk): the element axis is a pure batch axis folded into
    the kernel grid (the reference's 4D TV runs the 3D kernels per
    element, chemistry tv_fgp.cu:192-287). MEASURED: multi-element
    grids run 2.0x slower than lax.map-ed per-element chains (0.79 vs
    0.39 ms/iter at Nel=3 x 128x256^2 on v5e — the nel>1 grid defeats
    Mosaic's block pipelining), so the tv_fgp dispatch maps over
    elements; the 4D capability remains for callers that want a single
    launch."""
    i = pl.program_id(1)
    nblk = pl.num_programs(1)
    f32 = jnp.float32
    xx = jnp.concatenate([x_ref[0], xn_ref[0]], axis=0)  # planes gz..gz+PB
    p2 = jnp.concatenate([p2_ref[0], p2n_ref[0]], axis=0).astype(f32)
    p3 = jnp.concatenate([p3_ref[0], p3n_ref[0]], axis=0).astype(f32)
    # p1 planes i*PB-1 .. i*PB+PB; the gz=-1 plane (clamped copy) is zeroed
    # to give the reference's zero-divergence low boundary.
    p1f = jnp.concatenate(
        [p1p_ref[0], p1_ref[0], p1n_ref[0]], axis=0
    ).astype(f32)
    zidx = jax.lax.broadcasted_iota(jnp.int32, (pb + 2, 1, 1), 0)
    p1f = jnp.where((i == 0) & (zidx == 0), 0.0, p1f)

    _, n_r, n_c = xx.shape
    div = p1f[1:] - p1f[:-1]  # (PB+1, ny, nx)
    div += p2 - jnp.concatenate(
        [jnp.zeros((pb + 1, 1, n_c), p2.dtype), p2[:, :-1, :]], axis=1
    )
    div += p3 - jnp.concatenate(
        [jnp.zeros((pb + 1, n_r, 1), p3.dtype), p3[:, :, :-1]], axis=2
    )
    d = jnp.maximum(xx - lam * div, 0.0)  # planes gz..gz+PB

    # forward differences at planes gz..gz+PB-1
    g1 = d[:-1] - d[1:]
    # zero z-gradient at the global far boundary (last plane of last block)
    zloc = jax.lax.broadcasted_iota(jnp.int32, (pb, 1, 1), 0)
    g1 = jnp.where((i == nblk - 1) & (zloc == pb - 1), 0.0, g1)
    db = d[:-1]
    g2 = jnp.concatenate(
        [db[:, :-1, :] - db[:, 1:, :], jnp.zeros((pb, 1, n_c), d.dtype)],
        axis=1,
    )
    g3 = jnp.concatenate(
        [db[:, :, :-1] - db[:, :, 1:], jnp.zeros((pb, n_r, 1), d.dtype)],
        axis=2,
    )
    p1 = p1f[1:-1] + multip * g1
    p2 = p2[:-1] + multip * g2
    p3 = p3[:-1] + multip * g3
    denom = p1 * p1 + p2 * p2 + p3 * p3
    scale = jnp.where(denom > 1.0, jax.lax.rsqrt(denom), 1.0)
    o1_ref[0] = (p1 * scale).astype(o1_ref.dtype)
    o2_ref[0] = (p2 * scale).astype(o2_ref.dtype)
    o3_ref[0] = (p3 * scale).astype(o3_ref.dtype)


def _bdiff_y(p):
    """In-plane backward difference along rows, zero row below the low
    boundary (tv_fgp.cu:56-62). p: (planes, ny, nx)."""
    return p - jnp.concatenate(
        [jnp.zeros((p.shape[0], 1, p.shape[2]), p.dtype), p[:, :-1, :]],
        axis=1,
    )


def _bdiff_x(p):
    return p - jnp.concatenate(
        [jnp.zeros((p.shape[0], p.shape[1], 1), p.dtype), p[:, :, :-1]],
        axis=2,
    )


def _fdiff_y(d):
    return jnp.concatenate(
        [d[:, :-1, :] - d[:, 1:, :],
         jnp.zeros((d.shape[0], 1, d.shape[2]), d.dtype)], axis=1,
    )


def _fdiff_x(d):
    return jnp.concatenate(
        [d[:, :, :-1] - d[:, :, 1:],
         jnp.zeros((d.shape[0], d.shape[1], 1), d.dtype)], axis=2,
    )


def _fused2_kernel(lam, multip, pb, nz,
                   xp_ref, xb_ref, xn_ref, xn2_ref,
                   p1p2_ref, p1p_ref, p1b_ref, p1n_ref, p1n2_ref,
                   p2p_ref, p2b_ref, p2n_ref, p2n2_ref,
                   p3p_ref, p3b_ref, p3n_ref, p3n2_ref,
                   o1_ref, o2_ref, o3_ref):
    """TWO full FGP iterations per HBM pass. The intermediate duals P^1
    live only in registers (f32, never quantized or written back), so
    vs two single-iteration passes this halves the dual-field HBM
    round-trips at the cost of 2-deep z-halos. Boundary semantics are
    the reference's exactly (zero divergence below z=0, zero forward
    difference at z=nz-1, nonneg clamp, isotropic dual projection) at
    BOTH iterations."""
    i = pl.program_id(1)
    nblk = pl.num_programs(1)
    f32 = jnp.float32
    gz = i * pb

    def glue(*refs):
        return jnp.concatenate([r[0] for r in refs], axis=0)

    # x planes [gz-1 .. gz+pb+1]  (pb+3)
    xf = glue(xp_ref, xb_ref, xn_ref, xn2_ref)
    # P planes: p1 [gz-2 .. gz+pb+1] (pb+4); p2/p3 [gz-1 .. gz+pb+1] (pb+3)
    p1f = glue(p1p2_ref, p1p_ref, p1b_ref, p1n_ref, p1n2_ref).astype(f32)
    p2f = glue(p2p_ref, p2b_ref, p2n_ref, p2n2_ref).astype(f32)
    p3f = glue(p3p_ref, p3b_ref, p3n_ref, p3n2_ref).astype(f32)

    # zero the clamped below-domain copies (global plane index < 0)
    z1 = jax.lax.broadcasted_iota(jnp.int32, (pb + 4, 1, 1), 0) + (gz - 2)
    p1f = jnp.where(z1 < 0, 0.0, p1f)

    # ---- iteration 1: d1 on [gz-1 .. gz+pb+1] ---------------------------
    div1 = (p1f[1:] - p1f[:-1]) + _bdiff_y(p2f) + _bdiff_x(p3f)
    d1 = jnp.maximum(xf - lam * div1, 0.0)  # (pb+3, ny, nx)

    # P^1 on [gz-1 .. gz+pb]  (pb+2 planes)
    g1z = d1[:-1] - d1[1:]
    zg = jax.lax.broadcasted_iota(jnp.int32, (pb + 2, 1, 1), 0) + (gz - 1)
    g1z = jnp.where(zg == nz - 1, 0.0, g1z)
    db = d1[:-1]  # planes [gz-1 .. gz+pb]
    p1n = p1f[1:-1] + multip * g1z
    p2n = p2f[:-1] + multip * _fdiff_y(db)
    p3n = p3f[:-1] + multip * _fdiff_x(db)
    den = p1n * p1n + p2n * p2n + p3n * p3n
    sc = jnp.where(den > 1.0, jax.lax.rsqrt(den), 1.0)
    p1n, p2n, p3n = p1n * sc, p2n * sc, p3n * sc
    # boundary for iteration 2's divergence: P^1 below z=0 is zero
    p1n = jnp.where(zg < 0, 0.0, p1n)

    # ---- iteration 2: d2 on [gz .. gz+pb]  (pb+1 planes) ----------------
    div2 = (p1n[1:] - p1n[:-1]) + _bdiff_y(p2n[1:]) + _bdiff_x(p3n[1:])
    d2 = jnp.maximum(xf[1:pb + 2] - lam * div2, 0.0)

    # P^2 on [gz .. gz+pb)  (pb output planes)
    g2z = d2[:-1] - d2[1:]
    zo = jax.lax.broadcasted_iota(jnp.int32, (pb, 1, 1), 0) + gz
    g2z = jnp.where(zo == nz - 1, 0.0, g2z)
    db2 = d2[:-1]
    q1 = p1n[1:-1] + multip * g2z
    q2 = p2n[1:-1] + multip * _fdiff_y(db2)
    q3 = p3n[1:-1] + multip * _fdiff_x(db2)
    den = q1 * q1 + q2 * q2 + q3 * q3
    sc = jnp.where(den > 1.0, jax.lax.rsqrt(den), 1.0)
    o1_ref[0] = (q1 * sc).astype(o1_ref.dtype)
    o2_ref[0] = (q2 * sc).astype(o2_ref.dtype)
    o3_ref[0] = (q3 * sc).astype(o3_ref.dtype)


_TRANSPOSE_PLANE_BYTES = 4 * 1024 * 1024  # 1024-class planes


def _fused_plane_block(nz: int, plane_bytes: int = 256 * 256 * 4) -> int:
    # 4 planes/block fits the 16 MB scoped-VMEM budget at 256^2 planes
    # (8 planes exceeds it: 16.5M > 16M on v5e). Big planes (the
    # transposed 1024-class layout, 4 MB each) take pb=1 with the 96 MB
    # cap from _tv_compiler_params — pb=2 at that size crashes the
    # Mosaic backend (round 5).
    if plane_bytes >= _TRANSPOSE_PLANE_BYTES:
        return 1
    for pb in (4, 2):
        if nz % pb == 0 and nz > pb:
            return pb
    return 1


def tv_fgp_pallas_fused(x, n_iter: int, lam, interpret: bool | None = None,
                        dual_dtype=None, fuse_pairs: bool = False,
                        mom=None):
    """FGP with the obj+grad passes fused into one kernel per iteration.

    Exact reformulation of `tv_fgp_pallas` (equal to f32 rounding;
    1.21 vs 1.71 ms/iter at 256^3 on v5e): iterations 1..n-1 run
    the fused kernel (P update only, d in registers); the final obj pass
    materializes d = obj(x, P_{n-1}) exactly like the reference's return
    value (tv_fgp.cu:272). The fused kernel's trailing P_n is never formed
    — the reference discards it too.

    dual_dtype (default tomojax.config.fgp_dual_dtype): HBM storage type
    of the dual fields P1..P3 between iterations. The projection keeps
    |P| <= 1, so bfloat16 storage loses ~2^-9 relative per P component;
    the divergence sums six such quantized terms and P is re-quantized
    every iteration, so the worst-case error on the returned d is
    ~lam*1e-2 absolute (see tests/test_pallas_tv.py::
    test_fused_bf16_duals_close), while cutting the kernel's HBM
    traffic ~40% (all arithmetic stays f32 in-register). The reference
    kernels are f32 throughout (tv_fgp.cu:44-115); this deviation is a
    TPU perf knob, measured convergence-equivalent on the BASELINE
    FISTA-TV problem (see config.py).

    mom: optional (x_old, beta) — fuse the FISTA Nesterov extrapolation
    y = d + beta (d - x_old) into the final obj kernel (beta may be a
    traced scalar); the return becomes (d, y, tv_of_input). 3D input
    only (the FISTA fast path, solvers/fista.py fista_step_sl).

    Accepts (nz, ny, nx) or (nel, nz, ny, nx): the element axis folds
    into the kernel grid as a pure batch dimension. For 4D input tv0 is
    the summed per-element TV (the reference's 4D return, chemistry
    tv_fgp.cu:278-287). NOTE the measured caveat in _fused_kernel's
    docstring: nel>1 grids are 2x slower than lax.map-ed per-element
    calls on v5e, so the default tv_fgp dispatch maps over elements.
    """
    from tomojax import tv as tvmod
    from tomojax import config as tjconfig

    if interpret is None:
        interpret = jax.default_backend() == "cpu"
    # Lane-padded big-plane layouts run TRANSPOSED (round 5): the
    # slice-last 1024-class volume (1024, 1024, 64) pads every block's
    # 64-wide lane dim to 128 and measures 6.28 ms/iter vs a ~1.5 HBM
    # model; FGP is axis-permutation invariant (same zero-gradient BC
    # on every axis), so the (nx, nz, ny) orientation restores full
    # lanes — measured 3.68 ms/iter (1.7x) with pb=1 plane blocks and a
    # 96 MB scoped cap (pb=2/48-64 MB crash the Mosaic backend at this
    # shape; minimal configs recorded round 5). Gated to 3D planes
    # >= _TRANSPOSE_PLANE_BYTES so the 256/512 classes (already at
    # their rooflines) keep their measured-best configuration; the two
    # volume transposes amortize over the whole n_iter prox.
    if (
        x.ndim == 3
        and x.shape[2] < 128 <= x.shape[1]
        and x.shape[0] * x.shape[1] * 4 >= _TRANSPOSE_PLANE_BYTES
    ):
        xt = jnp.transpose(x, (2, 0, 1))
        if mom is not None:
            mt = (jnp.transpose(mom[0], (2, 0, 1)), mom[1])
            d, y, tv0 = tv_fgp_pallas_fused(
                xt, n_iter, lam, interpret, dual_dtype, fuse_pairs, mt
            )
            return (jnp.transpose(d, (1, 2, 0)),
                    jnp.transpose(y, (1, 2, 0)), tv0)
        d, tv0 = tv_fgp_pallas_fused(
            xt, n_iter, lam, interpret, dual_dtype, fuse_pairs
        )
        return jnp.transpose(d, (1, 2, 0)), tv0
    squeeze = x.ndim == 3
    x4 = x[None] if squeeze else x
    nel, nz, ny, nx = x4.shape
    pb = _fused_plane_block(nz, ny * nx * 4)
    tv0 = tvmod.tv(x)
    lam = float(lam)
    multip = 1.0 / (26.0 * lam)
    if dual_dtype is None:
        dual_dtype = tjconfig.fgp_dual_dtype
    dual_dtype = jnp.dtype(dual_dtype)
    shape = jax.ShapeDtypeStruct(x4.shape, x4.dtype)
    dshape = jax.ShapeDtypeStruct(x4.shape, dual_dtype)
    nblk = nz // pb

    blk = pl.BlockSpec((1, pb, ny, nx), lambda e, i: (e, i, 0, 0))
    plane_prev = pl.BlockSpec(
        (1, 1, ny, nx), lambda e, i: (e, jnp.maximum(i * pb - 1, 0), 0, 0)
    )
    plane_next = pl.BlockSpec(
        (1, 1, ny, nx),
        lambda e, i: (e, jnp.minimum(i * pb + pb, nz - 1), 0, 0),
    )
    fused = pl.pallas_call(
        partial(_fused_kernel, lam, multip, pb, nz),
        grid=(nel, nblk),
        in_specs=[blk, plane_next, blk, plane_prev, plane_next, blk,
                  plane_next, blk, plane_next],
        out_specs=(blk, blk, blk),
        out_shape=(dshape, dshape, dshape),
        compiler_params=_tv_compiler_params(nx, ny * nx * 4),
        interpret=interpret,
    )

    spec = pl.BlockSpec((1, 1, ny, nx), lambda e, i: (e, i, 0, 0))
    spec_prev = pl.BlockSpec(
        (1, 1, ny, nx), lambda e, i: (e, jnp.maximum(i - 1, 0), 0, 0)
    )
    if mom is None:
        obj = pl.pallas_call(
            partial(_obj_kernel, lam),
            grid=(nel, nz),
            in_specs=[spec, spec, spec_prev, spec, spec],
            out_specs=spec,
            out_shape=shape,
            compiler_params=_tv_compiler_params(nx, ny * nx * 4),
            interpret=interpret,
        )
    else:
        assert squeeze, "mom epilogue is 3D-only (FISTA fast path)"
        beta_spec = pl.BlockSpec(
            (1, 1), lambda e, i: (0, 0), memory_space=pltpu.SMEM
        )
        obj_mom = pl.pallas_call(
            partial(_obj_mom_kernel, lam),
            grid=(nel, nz),
            in_specs=[spec, spec, spec_prev, spec, spec, spec, beta_spec],
            out_specs=(spec, spec),
            out_shape=(shape, shape),
            compiler_params=_tv_compiler_params(nx, ny * nx * 4),
            interpret=interpret,
        )

    def body(_, carry):
        p1, p2, p3 = carry
        return fused(x4, x4, p1, p1, p1, p2, p2, p3, p3)

    # two-iterations-per-pass kernel: halves the dual-field HBM traffic
    # (the intermediate duals stay f32 in registers) at the cost of
    # 2-deep z-halos. MEASURED SLOWER on v5e at 256^3 bf16 duals
    # (0.449 vs 0.379 ms/iter): the 17 separate block-input pipelines
    # cost more than the halved dual traffic saves — the single-iteration
    # kernel is already at the HBM roofline. Kept opt-in (fuse_pairs=True)
    # so the measured attempt is reproducible; gated by a VMEM estimate
    # (inputs + outputs, double-buffered) against the 16 MB budget.
    plane = ny * nx
    vmem2 = 2 * plane * (
        (pb + 3) * 4 + (3 * pb + 10) * dual_dtype.itemsize
        + 3 * pb * dual_dtype.itemsize
    )
    m = n_iter - 1
    use2 = fuse_pairs and m >= 2 and vmem2 < 12 * 2**20
    if use2:
        plane_prev2 = pl.BlockSpec(
            (1, 1, ny, nx),
            lambda e, i: (e, jnp.maximum(i * pb - 2, 0), 0, 0),
        )
        plane_next2 = pl.BlockSpec(
            (1, 1, ny, nx),
            lambda e, i: (e, jnp.minimum(i * pb + pb + 1, nz - 1), 0, 0),
        )
        fused2 = pl.pallas_call(
            partial(_fused2_kernel, lam, multip, pb, nz),
            grid=(nel, nblk),
            in_specs=[
                plane_prev, blk, plane_next, plane_next2,  # x
                plane_prev2, plane_prev, blk, plane_next, plane_next2,  # p1
                plane_prev, blk, plane_next, plane_next2,  # p2
                plane_prev, blk, plane_next, plane_next2,  # p3
            ],
            out_specs=(blk, blk, blk),
            out_shape=(dshape, dshape, dshape),
            compiler_params=_tv_compiler_params(nx, ny * nx * 4),
            interpret=interpret,
        )

        def body2(_, carry):
            p1, p2, p3 = carry
            return fused2(
                x4, x4, x4, x4,
                p1, p1, p1, p1, p1,
                p2, p2, p2, p2,
                p3, p3, p3, p3,
            )

        z = jnp.zeros(x4.shape, dual_dtype)
        p1, p2, p3 = jax.lax.fori_loop(0, m // 2, body2, (z, z, z))
        if m % 2:
            p1, p2, p3 = fused(x4, x4, p1, p1, p1, p2, p2, p3, p3)
    else:
        z = jnp.zeros(x4.shape, dual_dtype)
        p1, p2, p3 = jax.lax.fori_loop(0, m, body, (z, z, z))
    if mom is not None:
        x_old, beta = mom
        beta_arr = jnp.reshape(jnp.asarray(beta, x4.dtype), (1, 1))
        d, y = obj_mom(x4, p1, p1, p2, p3, x_old[None], beta_arr)
        return d[0], y[0], tv0
    d = obj(x4, p1, p1, p2, p3)
    return (d[0] if squeeze else d), tv0


def tv_fgp_pallas(x, n_iter: int, lam, interpret: bool | None = None):
    """Reference-faithful FGP via fused Pallas kernels.

    x: (nz, ny, nx). Returns (denoised, tv_of_input). Matches
    tomojax.tv.tv_fgp bit-for-bit up to f32 rounding."""
    from tomojax import tv as tvmod

    if interpret is None:
        interpret = jax.default_backend() == "cpu"
    nz, ny, nx = x.shape
    x4 = x[None]  # kernels are written for the (nel, nz, ny, nx) grid
    tv0 = tvmod.tv(x)
    lam = float(lam)
    multip = 1.0 / (26.0 * lam)
    spec = pl.BlockSpec((1, 1, ny, nx), lambda e, i: (e, i, 0, 0))
    spec_prev = pl.BlockSpec(
        (1, 1, ny, nx), lambda e, i: (e, jnp.maximum(i - 1, 0), 0, 0)
    )
    spec_next = pl.BlockSpec(
        (1, 1, ny, nx), lambda e, i: (e, jnp.minimum(i + 1, nz - 1), 0, 0)
    )
    shape = jax.ShapeDtypeStruct(x4.shape, x4.dtype)

    obj = pl.pallas_call(
        partial(_obj_kernel, lam),
        grid=(1, nz),
        in_specs=[spec, spec, spec_prev, spec, spec],
        out_specs=spec,
        out_shape=shape,
        compiler_params=_tv_compiler_params(nx),
        interpret=interpret,
    )
    grad = pl.pallas_call(
        partial(_grad_kernel, multip),
        grid=(1, nz),
        in_specs=[spec, spec_next, spec, spec, spec],
        out_specs=(spec, spec, spec),
        out_shape=(shape, shape, shape),
        compiler_params=_tv_compiler_params(nx),
        interpret=interpret,
    )

    def body(_, carry):
        d, p1, p2, p3 = carry
        d = obj(x4, p1, p1, p2, p3)
        p1, p2, p3 = grad(d, d, p1, p2, p3)
        return d, p1, p2, p3

    z = jnp.zeros_like(x4)
    d, p1, p2, p3 = jax.lax.fori_loop(0, n_iter, body, (z, z, z, z))
    d = d[0]
    # d is the output of the last iteration's Obj+clamp pass, which is what
    # the reference returns (tv_fgp.cu:272 — the trailing grad/projection
    # only modifies P).
    return d, tv0
