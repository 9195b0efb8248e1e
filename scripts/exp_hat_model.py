"""Round-4 experiment: VPU op-count model of the projector hat build
(round-3 VERDICT #2) — decomposition variants + the two named levers.

The speed-of-light table blamed the projector gap on "the VPU hat
build" without a quantified bound. This script measures, on the real
TPU at the production 256-class config (banded FP a_blk=16, dense BP
rb=32, Precision.DEFAULT):

  * full    — the production kernel (baseline).
  * nohat   — W replaced by a constant broadcast: floor + dot (removes
              the whole hat chain incl. the jstar build).
  * nodot   — MXU contraction replaced by a 1-op full-tensor reduction:
              floor + hat (+1 op).
  * hat5    — FP lever: min/fma hat form with the final *invd DEFERRED
              to a per-(a,s)-block epilogue (legal for FP only: invd is
              constant along FP's row-contraction axis; BP contracts
              over angles, where invd varies, so the multiply cannot be
              deferred there): w = max(0, min(1 - d*invd, 1 + d*invd)),
              4 full-tensor ops (2 fma) vs the production 6.
  * hatbf16 — VERDICT lever "bf16 hat arithmetic": the 3D chain after
              the f32 distance runs in bf16 and feeds the bf16 dot
              directly (halves W register/VMEM bytes; accuracy cost is
              the same 2^-9 class as the DEFAULT bf16 dot rounding).

The jstar "row-recurrence" lever (VERDICT's other named candidate) is
resolved by op counting, not a variant: jstar is a 2D (a_blk, n) /
(rb, n) build of 2 ops, vs the 3D hat chain's 6 ops on (a_blk, jw, ct)
resp. (rb, n, nray) — at 256 that is 2*16*256 = 8K ops vs
6*16*192*256 = 4.7M per FP program (0.2%), so no recurrence over it
can move the kernel; the `nohat` variant bounds the whole build
(jstar included) empirically.

Op-count model printed at the end: measured hat-time vs
elements * ops / VPU-rate (v5e VPU ~= 8x128 lanes x 4 ALUs x 0.94 GHz
~= 3.9e12 f32 ops/s), and the corrected per-op bound = nohat_floor +
max(hat_model, measured-hat-at-min-ops).

Slope-timed like exp_projector_variants.py (axon caches identical
calls). Results recorded in docs/ARCHITECTURE.md.
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
    _angle_tables, _band_windows_fp, _compiler_params, _fp_row_group,
    _pad_axis, _round_up, _slice_block, _BAND_CT,
)

PREC = jax.lax.Precision.DEFAULT


def _dot(w, v):
    return jax.lax.dot_general(
        w, v, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32, precision=PREC,
    )


# ------------------------------------------------------- FP (banded) ------


def _fp_banded_kernel(n, nray, jw, nct, rg, variant, j0_ref, cos_ref,
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
        tc = (t * ct).astype(jnp.float32)
        xc = iota_c + tc - (n - 1) / 2.0
        jstar = cos_ref[:] * xc + base  # (A_BLK, CT)
        jj = iota_j + j0.astype(jnp.float32)
        if variant == "nohat":
            w = jnp.broadcast_to(invd * 0.5, (a_blk, jw, ct))
        elif variant == "hat5":
            # min/fma form, final *invd deferred to the epilogue
            d = jj - jstar[:, None, :]
            u = d * invd
            w = jnp.maximum(0.0, jnp.minimum(1.0 - u, 1.0 + u))
        elif variant == "hatbf16":
            # distance+scale in f32 (Mosaic cannot broadcast bf16 over
            # both sublanes and lanes, so invd stays f32), the rest of
            # the chain in bf16 feeding the bf16 dot directly; final
            # *invd deferred to the epilogue like hat5
            u = (jj - jstar[:, None, :]) * invd
            ub = u.astype(jnp.bfloat16)
            w = jnp.maximum(
                jnp.bfloat16(0.0), jnp.bfloat16(1.0) - jnp.abs(ub)
            )
        else:  # production 6-op chain
            w = (
                jnp.maximum(
                    0.0, 1.0 - jnp.abs(jj - jstar[:, None, :]) * invd
                )
                * invd
            )
        idx = (slice(None), pl.ds(j0, jw), slice(None))
        if variant == "nodot":
            out_ref[idx] += jnp.broadcast_to(
                jnp.sum(w, axis=2, keepdims=True), (a_blk, jw, s_blk)
            )
        else:
            img_t = img_ref[0, pl.ds(t * ct, ct), :]  # (CT, S_BLK)
            contrib = _dot(w.reshape(a_blk * jw, ct), img_t)
            out_ref[idx] += contrib.reshape(a_blk, jw, s_blk)
        return 0

    jax.lax.fori_loop(0, nct, tile, 0)

    if variant in ("hat5", "hatbf16"):
        @pl.when(k == pl.num_programs(2) - 1)
        def _():
            out_ref[:] = out_ref[:] * invd


def make_fp(geom, ns, variant, a_blk=16):
    n, nray, na = geom.n, geom.nray, geom.nproj
    s_blk = _slice_block(ns)
    ns_pad = _round_up(ns, s_blk)
    na_pad = _round_up(na, a_blk)
    cos, sin, invd = _angle_tables(geom, na_pad)
    j0, jw, nct = _band_windows_fp(geom, a_blk, na_pad, n)
    rg = _fp_row_group(n)
    j0_spec = pl.BlockSpec((1, n // rg, nct), lambda a, s, k: (a, 0, 0),
                           memory_space=pltpu.SMEM)
    ang_spec = pl.BlockSpec((a_blk, 1), lambda a, s, k: (a, 0))
    img_spec = pl.BlockSpec((1, n, s_blk), lambda a, s, k: (k, 0, s))
    out_spec = pl.BlockSpec((a_blk, nray, s_blk), lambda a, s, k: (a, 0, s))
    out_shape = jax.ShapeDtypeStruct((na_pad, nray, ns_pad), jnp.float32)
    grid = (na_pad // a_blk, ns_pad // s_blk, n)

    def fp(img):
        img = _pad_axis(img, 2, ns_pad)
        out = pl.pallas_call(
            partial(_fp_banded_kernel, n, nray, jw, nct, rg, variant),
            grid=grid,
            in_specs=[j0_spec, ang_spec, ang_spec, ang_spec, img_spec],
            out_specs=out_spec,
            out_shape=out_shape,
            compiler_params=_compiler_params(),
        )(j0, cos, sin, invd, img)
        return out[:na, :, :ns]

    return fp, jw, nct


# -------------------------------------------------------- BP (dense) ------


def _bp_kernel(n, nray, rb, variant, cos_ref, sin_ref, invd_ref, y_ref,
               out_ref):
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
    if variant == "nohat":
        w = jnp.broadcast_to(invd * 0.5, (rb, n, nray))
    elif variant == "hatbf16":
        # f32 distance+scale (bf16 two-axis broadcasts unsupported),
        # bf16 tail; BP's per-angle invd is folded into the (tiny)
        # sinogram operand instead of W (invd varies along the BP
        # contraction axis, so an output epilogue cannot carry it)
        u = (iota_j - jstar[:, :, None]) * invd
        ub = u.astype(jnp.bfloat16)
        w = jnp.maximum(
            jnp.bfloat16(0.0), jnp.bfloat16(1.0) - jnp.abs(ub)
        )
    else:
        w = (
            jnp.maximum(
                0.0, 1.0 - jnp.abs(iota_j - jstar[:, :, None]) * invd
            )
            * invd
        )
    if variant == "nodot":
        out_ref[:] += jnp.broadcast_to(
            jnp.sum(w, axis=2, keepdims=True), (rb, n, s_blk)
        )
    else:
        y_blk = y_ref[0]
        if variant == "hatbf16":
            y_blk = y_blk * invd  # (nray, s_blk): 2D op per angle
        contrib = _dot(w.reshape(rb * n, nray), y_blk)
        out_ref[:] += contrib.reshape(rb, n, s_blk)


def make_bp(geom, ns, variant, rb=32):
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
            partial(_bp_kernel, n, nray, rb, variant),
            grid=grid,
            in_specs=[ang_spec, ang_spec, ang_spec, sino_spec],
            out_specs=out_spec,
            out_shape=out_shape,
            compiler_params=_compiler_params(),
        )(cos, sin, invd, yt)
        return out[:n, :, :ns]

    return bp


# ------------------------------------------------- BP (banded) ------
# Round-5 (VERDICT #3): above the 256 class the production BP dispatch
# is the BANDED kernel (window ratio 0.28 at 512, smaller at 1024 —
# the dense (rb, n, nray) W cannot even be built at 1024: 134 MB/tile),
# so the 512/1024 speed-of-light decomposition needs ablations of the
# banded kernel, mirroring projector/pallas_joseph.py::_bp_banded_kernel.


def _bp_banded_kernel_v(n, nray, jw, nct, rb, variant, j0_ref, cos_ref,
                        sin_ref, invd_ref, y_ref, out_ref):
    from tomojax.projector.pallas_joseph import _BAND_CT as ct

    k = pl.program_id(2)

    @pl.when(k == 0)
    def _():
        out_ref[:] = jnp.zeros_like(out_ref)

    _, _, s_blk = out_ref.shape
    r = pl.program_id(0)
    ck = cos_ref[0, k]
    sk = sin_ref[0, k]
    invd = invd_ref[0, k]
    rows = (r * rb + jax.lax.broadcasted_iota(jnp.int32, (rb, 1), 0)).astype(jnp.float32)
    yr = (n - 1) / 2.0 - rows
    off = (nray - 1) / 2.0
    iota_c = jax.lax.broadcasted_iota(jnp.int32, (1, ct), 1).astype(jnp.float32)
    iota_j = jax.lax.broadcasted_iota(jnp.int32, (1, 1, jw), 2).astype(jnp.float32)

    def tile(t, _):
        j0 = pl.multiple_of(j0_ref[0, k, t], 8)
        tc = (t * ct).astype(jnp.float32)
        xc = iota_c + tc - (n - 1) / 2.0
        jstar = ck * xc + (sk * yr + off)
        jj = iota_j + j0.astype(jnp.float32)
        if variant == "nohat":
            w = jnp.broadcast_to(invd * 0.5, (rb, ct, jw))
        else:
            w = (
                jnp.maximum(
                    0.0, 1.0 - jnp.abs(jj - jstar[:, :, None]) * invd
                )
                * invd
            )
        idx = (slice(None), pl.ds(t * ct, ct), slice(None))
        if variant == "nodot":
            out_ref[idx] += jnp.broadcast_to(
                jnp.sum(w, axis=2, keepdims=True), (rb, ct, s_blk)
            )
        else:
            y_sub = y_ref[0, pl.ds(j0, jw), :]
            contrib = _dot(w.reshape(rb * ct, jw), y_sub)
            out_ref[idx] += contrib.reshape(rb, ct, s_blk)
        return 0

    jax.lax.fori_loop(0, nct, tile, 0)


def make_bp_banded(geom, ns, variant, rb=32):
    from tomojax.projector.pallas_joseph import _band_windows_bp

    n, nray, na = geom.n, geom.nray, geom.nproj
    s_blk = _slice_block(ns)
    ns_pad = _round_up(ns, s_blk)
    cos, sin, invd = _angle_tables(geom, na)
    cos, sin, invd = (t.reshape(1, na) for t in (cos, sin, invd))
    n_pad = _round_up(n, rb)
    j0, jw, nct = _band_windows_bp(geom, rb, n_pad, n)
    j0 = jnp.transpose(j0, (1, 0, 2))  # (nrb, na, nct): SMEM blocks
    # must span the trailing dims; index by angle in-kernel
    j0_spec = pl.BlockSpec((1, na, nct), lambda r, s, k: (r, 0, 0),
                           memory_space=pltpu.SMEM)
    ang_spec = pl.BlockSpec((1, na), lambda r, s, k: (0, 0),
                            memory_space=pltpu.SMEM)
    sino_spec = pl.BlockSpec((1, nray, s_blk), lambda r, s, k: (k, 0, s))
    out_spec = pl.BlockSpec((rb, n, s_blk), lambda r, s, k: (r, 0, s))
    out_shape = jax.ShapeDtypeStruct((n_pad, n, ns_pad), jnp.float32)
    grid = (n_pad // rb, ns_pad // s_blk, na)

    def bp(yt):
        yt = _pad_axis(yt, 2, ns_pad)
        out = pl.pallas_call(
            partial(_bp_banded_kernel_v, n, nray, jw, nct, rb, variant),
            grid=grid,
            in_specs=[j0_spec, ang_spec, ang_spec, ang_spec, sino_spec],
            out_specs=out_spec,
            out_shape=out_shape,
            compiler_params=_compiler_params(),
        )(j0, cos, sin, invd, yt)
        return out[:n, :, :ns]

    return bp, jw, nct


def production_rows(geom, ns):
    """Production-dispatch FP/BP (whatever kernel form the shape
    engages) + Pallas FGP per-iteration — the components of the full
    FISTA iteration bound at this shape."""
    from tomojax.projector.pallas_joseph import bp_pallas_sl, fp_pallas_sl
    from tomojax.tv.pallas_fgp import tv_fgp_pallas_fused

    n, nray, na = geom.n, geom.nray, geom.nproj
    rng = np.random.default_rng(3)
    x = jnp.asarray(rng.random((n, n, ns), np.float32))
    x2 = jnp.asarray(rng.random((n, n, ns), np.float32))
    y = jnp.asarray(rng.random((na, nray, ns), np.float32))
    y2 = jnp.asarray(rng.random((na, nray, ns), np.float32))
    rows = {}
    rows["fp_prod"] = slope_time(lambda v: fp_pallas_sl(v, geom), x, x2)
    rows["bp_prod"] = slope_time(
        lambda v: bp_pallas_sl(v, geom), y, y2, iters=4
    )
    # FGP prox: per-iteration cost from the 1- vs 11-iteration chain of
    # the fused kernel (HBM-bound; the shape's volume bytes set it)
    f1 = jax.jit(lambda v: tv_fgp_pallas_fused(v, 1, 0.1)[0])
    f11 = jax.jit(lambda v: tv_fgp_pallas_fused(v, 11, 0.1)[0])
    jax.block_until_ready(f1(x)); jax.block_until_ready(f11(x))
    best = np.inf
    for _ in range(3):
        t0 = time.perf_counter(); jax.block_until_ready(f1(x2))
        t1 = time.perf_counter() - t0
        t0 = time.perf_counter(); jax.block_until_ready(f11(x2))
        tk = time.perf_counter() - t0
        best = min(best, (tk - t1) / 10 * 1e3)
    rows["fgp_iter"] = best
    return rows


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


VPU_RATE = 3.9e12  # v5e: ~8x128 lanes x 4 ALUs x 0.94 GHz, f32 ops/s


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 256
    ns = int(sys.argv[2]) if len(sys.argv) > 2 else n
    na = 90
    geom = Geometry.make(n, np.deg2rad(np.linspace(-76, 76, na)))
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.random((n, n, ns), np.float32))
    x2 = jnp.asarray(rng.random((n, n, ns), np.float32))
    y = jnp.asarray(rng.random((na, geom.nray, ns), np.float32))
    y2 = jnp.asarray(rng.random((na, geom.nray, ns), np.float32))
    print(f"device: {jax.devices()[0].device_kind}  {n}^2x{ns}, {na} angles")

    fp_variants = (
        ("full", "nohat", "nodot", "hat5", "hatbf16")
        if n <= 256 else ("full", "nohat", "nodot")
    )
    results = {}
    ref = None
    for variant in fp_variants:
        fp, jw, nct = make_fp(geom, ns, variant)
        ms = slope_time(fp, x, x2)
        out = fp(x2)
        if variant == "full":
            ref = out
        err = float(jnp.max(jnp.abs(out - ref))) / float(jnp.max(jnp.abs(ref)))
        results[f"fp_{variant}"] = ms
        print(f"FP banded jw={jw} {variant:8s}: {ms:7.2f} ms  "
              f"rel|d|={err:.2e}", flush=True)

    # BP ablations on the kernel form the PRODUCTION dispatch engages at
    # this shape: dense at 256 (band payoff threshold not met), banded
    # at 512/1024 (the dense (rb, n, nray) W tile cannot exist at 1024).
    from tomojax.projector.pallas_joseph import (
        _band_enabled, _band_windows_bp,
    )

    _, bjw, bnct = _band_windows_bp(geom, 32, _round_up(n, 32), n)
    bp_banded = _band_enabled(bjw, bnct, geom.nray, "bp")
    refb = None
    for variant in ("full", "nohat", "nodot"):
        if bp_banded:
            bp, jw, _ = make_bp_banded(geom, ns, variant)
            tag = f"BP banded jw={jw}"
        else:
            bp = make_bp(geom, ns, variant)
            tag = "BP dense rb=32"
        ms = slope_time(bp, y, y2, iters=4)
        out = bp(y2)
        if variant == "full":
            refb = out
        err = float(jnp.max(jnp.abs(out - refb))) / float(
            jnp.max(jnp.abs(refb))
        )
        results[f"bp_{variant}"] = ms
        print(f"{tag} {variant:8s}: {ms:7.2f} ms  rel|d|={err:.2e}",
              flush=True)
    if not bp_banded:
        for variant in ("hatbf16",):
            bp = make_bp(geom, ns, variant)
            ms = slope_time(bp, y, y2, iters=4)
            results[f"bp_{variant}"] = ms
            print(f"BP dense rb=32 {variant:8s}: {ms:7.2f} ms", flush=True)

    prod = production_rows(geom, ns)
    results.update(prod)
    print(f"production dispatch: FP {prod['fp_prod']:.2f} ms  "
          f"BP {prod['bp_prod']:.2f} ms  FGP/iter {prod['fgp_iter']:.3f} ms",
          flush=True)
    import json as _json
    print("JSON", _json.dumps({k: round(v, 3) for k, v in results.items()}),
          flush=True)

    # ----- op-count model -----
    _, jw, nct = make_fp(geom, ns, "full")
    na_pad = _round_up(na, 16)
    fp_elems = (na_pad // 16) * ns * n // _slice_block(ns) * 16 * jw * _BAND_CT * nct / _slice_block(ns) * _slice_block(ns)
    fp_elems = (na_pad // 16) * (ns // _slice_block(ns)) * n * 16 * jw * _BAND_CT * nct
    bp_w_cols = bjw if bp_banded else geom.nray  # banded thins W to jw
    bp_elems = _round_up(n, 32) // 32 * (ns // _slice_block(ns)) * na * 32 * n * bp_w_cols
    for name, elems, ops in (
        ("fp", fp_elems, 6), ("bp", bp_elems, 6)
    ):
        hat_meas = results[f"{name}_full"] - results[f"{name}_nohat"]
        hat_model = elems * ops / VPU_RATE * 1e3
        print(f"{name}: W elements/call {elems/1e6:.0f}M, "
              f"model {ops}-op hat = {hat_model:.2f} ms, "
              f"measured (full - nohat) = {hat_meas:.2f} ms, "
              f"floor (nohat) = {results[f'{name}_nohat']:.2f} ms")


if __name__ == "__main__":
    main()
