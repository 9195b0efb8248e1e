"""Round-5 stretch experiment (round-4 VERDICT #7): angle-pair W reuse —
a different factorization of the projector, exploiting the reflection
symmetry of symmetric tilt series.

For a tilt series with angles in ±pairs (every linspace(-a, a, even)
series, incl. the BASELINE 90-angle geometry):

    jstar(-t, row r) = cos(t) x_c - sin(t) y_r + off = jstar(t, row n-1-r)

so the forward projection at -t equals the forward projection at +t of
the ROW-FLIPPED volume, with identical interpolation weights W. Stacking
the flipped volume along the SLICE axis — fp_pair: run the unchanged
banded FP kernel over (n, n, 2*ns) with only the Na/2 positive angles
and a DOUBLED slice block — halves the number of W tiles materialized
per unit of MXU work: each built W tile feeds a (ct, 2*s_blk) operand
instead of (ct, s_blk). The FP roofline at 256^3 is the W/accumulator
VMEM pipeline (2.63 ms nodot floor, docs/ARCHITECTURE.md), of which W
materialization is the candidate half — the experiment bounds how much
of it this factorization recovers. The BP analog works the same way
(BP(-t) = row-flip of BP(+t) on the per-angle sinogram).

Costs charged to the variant: the flip+concat prologue (one extra
volume-sized HBM round trip) is included in the timed op; the
epilogue interleave of the two angle halves is NOT needed for FISTA
(the residual/weights can live in paired order) but its cost is the
same class (~sinogram-sized copy).

Measured on v5e (this script, 256^3 x 90, min-of-3 slope): REFUTED —
paired 45-angle/s_blk=512 = 4.16 ms vs baseline 90-angle/s_blk=256 =
3.99/3.78 ms (repeat spread), outputs exact to ~1e-6; the
no-sharing control (45 angles, s_blk=256) = 4.61 ms. Halving the
number of W tiles materialized while doubling each dot's width does
NOT move the kernel: the pipeline floor is per-W-ELEMENT handling
feeding the MXU (total W-elements x dot-columns is invariant under
the pairing), not per-tile setup — consistent with exp_hat_model's
finding that the hat ALU chain has ~zero marginal cost. Recorded in
docs/ARCHITECTURE.md; the 256-class projector floor stands.
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
    _BAND_CT, _BAND_UNROLL, _angle_tables, _band_windows_fp,
    _compiler_params, _fp_banded_kernel, _fp_row_group, _pad_axis,
    _round_up,
)

PREC = jax.lax.Precision.DEFAULT


def make_fp_sblk(geom, ns, s_blk, a_blk=16):
    """The production banded FP kernel with an explicit slice block
    (fp_pallas_sl fixes s_blk=_slice_block(ns); the pair variant needs
    2x that so the paired slices share one grid step's W tiles)."""
    n, nray, na = geom.n, geom.nray, geom.nproj
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
            partial(_fp_banded_kernel, n, nray, jw, nct, rg,
                    _BAND_UNROLL, PREC),
            grid=grid,
            in_specs=[j0_spec, ang_spec, ang_spec, ang_spec, img_spec],
            out_specs=out_spec,
            out_shape=out_shape,
            compiler_params=_compiler_params(),
        )(j0, cos, sin, invd, img)
        return out[:na, :, :ns]

    return fp, jw


def slope_time(op, x, x2, iters=6):
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
    n = ns = 256
    na = 90
    angles = np.linspace(-76, 76, na)
    geom = Geometry.make(n, np.deg2rad(angles))
    # positive-half geometry: angles[na//2:] are the + partners of the
    # reversed negative half (linspace symmetry: angles[i] = -angles[na-1-i])
    pos = angles[na // 2:]
    geom_h = Geometry.make(n, np.deg2rad(pos))
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.random((n, n, ns), np.float32))
    x2 = jnp.asarray(rng.random((n, n, ns), np.float32))
    print("device:", jax.devices()[0].device_kind, flush=True)

    # baseline: production config (s_blk = 256 at ns=256)
    fp_base, jw = make_fp_sblk(geom, ns, 256)
    ms_base = slope_time(fp_base, x, x2)
    ref = fp_base(x2)
    print(f"baseline 90 angles, s_blk=256, jw={jw}: {ms_base:7.2f} ms",
          flush=True)

    # paired: 45 angles over the (n, n, 2*ns) [orig | row-flipped] stack
    fp_half, jwh = make_fp_sblk(geom_h, 2 * ns, 512)

    def fp_pair(v):
        stack = jnp.concatenate([v, v[::-1, :, :]], axis=2)
        return fp_half(stack)

    msp = slope_time(fp_pair, x, x2)
    out = fp_pair(x2)
    # first half = FP at +angles; second half = FP at -angles (reversed)
    plus = out[:, :, :ns]
    minus = out[:, :, ns:]
    ref_plus = ref[na // 2:]
    ref_minus = ref[: na // 2][::-1]
    ep = float(jnp.max(jnp.abs(plus - ref_plus))) / float(jnp.max(jnp.abs(ref)))
    em = float(jnp.max(jnp.abs(minus - ref_minus))) / float(jnp.max(jnp.abs(ref)))
    print(f"paired 45 angles, s_blk=512, jw={jwh}: {msp:7.2f} ms  "
          f"rel|d| +:{ep:.2e} -:{em:.2e}", flush=True)

    # controls: separates the W-reuse effect from the s_blk-width effect
    fp_w512, _ = make_fp_sblk(geom, ns, 256)  # base again for drift check
    ms2 = slope_time(fp_w512, x, x2)
    print(f"baseline repeat: {ms2:7.2f} ms", flush=True)
    fp_half256, _ = make_fp_sblk(geom_h, 2 * ns, 256)

    def fp_pair_narrow(v):
        stack = jnp.concatenate([v, v[::-1, :, :]], axis=2)
        return fp_half256(stack)

    ms_nw = slope_time(fp_pair_narrow, x, x2)
    print(f"paired 45 angles, s_blk=256 (no W sharing, control): "
          f"{ms_nw:7.2f} ms", flush=True)


if __name__ == "__main__":
    main()
