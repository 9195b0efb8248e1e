"""Round-3 follow-up experiment 2: FP a_blk sweep (dense/banded, 256 and
512-class) through the real library dispatch, plus a BP
two-angles-per-single-dot variant (NOT the refuted in-kernel fori over
angles — one bigger MXU contraction per grid step, halving the program
count at constant total FLOPs).

Usage: python scripts/exp_projector_variants2.py [256|512]
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
from tomojax import config as tjconfig  # noqa: E402
from tomojax.projector.pallas_joseph import (  # noqa: E402
    _angle_tables, _compiler_params, _pad_axis, _round_up, _slice_block,
    fp_pallas_sl, bp_pallas_sl,
)

PREC = jax.lax.Precision.DEFAULT


def _dot(w, v):
    return jax.lax.dot_general(
        w, v, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32, precision=PREC,
    )


def _bp2_kernel(n, nray, rb, cos_ref, sin_ref, invd_ref, y_ref, out_ref):
    """Dense BP, TWO angles per grid step via one stacked contraction:
    W[(r,c), (pair, j)] @ y[(pair, j), s]."""
    r = pl.program_id(0)
    k = pl.program_id(2)

    @pl.when(k == 0)
    def _():
        out_ref[:] = jnp.zeros_like(out_ref)

    _, _, s_blk = out_ref.shape
    rows = (r * rb + jax.lax.broadcasted_iota(jnp.int32, (rb, 1), 0)).astype(jnp.float32)
    yr = (n - 1) / 2.0 - rows  # (RB, 1)
    xc = jax.lax.broadcasted_iota(jnp.int32, (1, n), 1).astype(jnp.float32) - (n - 1) / 2.0
    off = (nray - 1) / 2.0
    iota_j = jax.lax.broadcasted_iota(jnp.int32, (1, 1, nray), 2).astype(jnp.float32)

    def wang(a):
        ck = cos_ref[0, a]
        sk = sin_ref[0, a]
        ivd = invd_ref[0, a]
        jstar = ck * xc + (sk * yr + off)  # (RB, N)
        return (
            jnp.maximum(0.0, 1.0 - jnp.abs(iota_j - jstar[:, :, None]) * ivd)
            * ivd
        )  # (RB, N, Nt)

    w = jnp.concatenate([wang(2 * k), wang(2 * k + 1)], axis=2)
    contrib = _dot(w.reshape(rb * n, 2 * nray), y_ref[0].reshape(2 * nray, s_blk))
    out_ref[:] += contrib.reshape(rb, n, s_blk)


def make_bp2(geom, ns, rb):
    n, nray, na = geom.n, geom.nray, geom.nproj
    s_blk = _slice_block(ns)
    ns_pad = _round_up(ns, s_blk)
    na_pad = _round_up(na, 2)
    cos, sin, invd = _angle_tables(geom, na_pad)
    cos, sin, invd = (t.reshape(1, na_pad) for t in (cos, sin, invd))
    n_pad = _round_up(n, rb)
    ang_spec = pl.BlockSpec((1, na_pad), lambda r, s, k: (0, 0),
                            memory_space=pltpu.SMEM)
    sino_spec = pl.BlockSpec((1, 2, nray, s_blk), lambda r, s, k: (k, 0, 0, s))
    out_spec = pl.BlockSpec((rb, n, s_blk), lambda r, s, k: (r, 0, s))
    out_shape = jax.ShapeDtypeStruct((n_pad, n, ns_pad), jnp.float32)
    grid = (n_pad // rb, ns_pad // s_blk, na_pad // 2)

    def bp(yt):
        yt = _pad_axis(_pad_axis(yt, 2, ns_pad), 0, na_pad)
        yt = yt.reshape(na_pad // 2, 2, nray, ns_pad)
        out = pl.pallas_call(
            partial(_bp2_kernel, n, nray, rb),
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
    ns = 128 if n >= 512 else n
    geom = Geometry.make(n, np.deg2rad(np.linspace(-76, 76, 90)))
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.random((n, n, ns), np.float32))
    x2 = jnp.asarray(rng.random((n, n, ns), np.float32))
    y = jnp.asarray(rng.random((geom.nproj, geom.nray, ns), np.float32))
    y2 = jnp.asarray(rng.random((geom.nproj, geom.nray, ns), np.float32))
    print(f"device: {jax.devices()[0].device_kind}  {n}^2x{ns}, 90 angles")

    ref = None
    for banded in ("off", "on"):
        for ab in (16, 32, 48):
            if banded == "on" and ab == 48:
                continue
            tjconfig.set_banded_projector(banded)
            try:
                fp = lambda v: fp_pallas_sl(v, geom, a_blk=ab)
                ms = slope_time(fp, x, x2)
                out = fp(x2)
                if ref is None:
                    ref = out
                err = float(jnp.max(jnp.abs(out - ref)))
                print(f"FP {banded:>3} a_blk={ab:2d}: {ms:7.2f} ms  max|d|={err:.2e}")
            except Exception as e:  # noqa: BLE001
                print(f"FP {banded:>3} a_blk={ab:2d}: FAILED {type(e).__name__}: {str(e)[:120]}")
    tjconfig.set_banded_projector("auto")

    refb = None
    tjconfig.set_banded_projector("off")
    bp = lambda v: bp_pallas_sl(v, geom, rb=32)
    ms = slope_time(bp, y, y2)
    refb = bp(y2)
    print(f"BP dense  rb=32 : {ms:7.2f} ms  (baseline)")
    tjconfig.set_banded_projector("auto")
    try:
        bp2 = make_bp2(geom, ns, 32)
        ms = slope_time(bp2, y, y2)
        out = bp2(y2)
        err = float(jnp.max(jnp.abs(out - refb)))
        print(f"BP pair2  rb=32 : {ms:7.2f} ms  max|d|={err:.2e}")
    except Exception as e:  # noqa: BLE001
        print(f"BP pair2  rb=32 : FAILED {type(e).__name__}: {str(e)[:160]}")


if __name__ == "__main__":
    main()
