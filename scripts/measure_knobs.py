"""Measure the perf-knob tradeoffs documented in docs/ARCHITECTURE.md.

Run on a TPU chip: `python scripts/measure_knobs.py`. Prints, for each
knob setting, the kernel time and the convergence-relevant error so the
numbers in docs/ARCHITECTURE.md can be regenerated instead of trusted.

Knobs covered:
  * config.fgp_dual_dtype (bfloat16 vs float32 dual storage in the fused
    Pallas FGP kernel): ms/iter at 256^3 and max |d_bf16 - d_f32| after
    10 iterations at the BASELINE lambda, plus end-to-end FISTA-TV rmse
    at 20 iterations under each setting.
  * config.pallas_precision (DEFAULT bf16 vs HIGH bf16x3 projector
    contractions): FP kernel ms and FISTA-TV rmse at 20 iterations.
"""

import sys
import time

import numpy as np


def timed(fn, x, x2, iters=5):
    """Slope-time a self-chained fn. The axon server caches identical
    (executable, inputs) calls and block_until_ready alone does not
    materialize remote arrays, so: chain (feed outputs back), time on a
    DIFFERENT input than the warm-up, materialize with a scalar sum."""
    import jax
    import jax.numpy as jnp

    def chain(v, k):
        for _ in range(k):
            v = fn(v)
        return jnp.sum(v)

    c1 = jax.jit(lambda v: chain(v, 1))
    ck = jax.jit(lambda v: chain(v, 1 + iters))
    float(c1(x)), float(ck(x))  # compile
    t0 = time.perf_counter()
    float(c1(x2))
    t1 = time.perf_counter() - t0
    t0 = time.perf_counter()
    float(ck(x2))
    tk = time.perf_counter() - t0
    return (tk - t1) / iters * 1e3, fn(x2)


def fista_rmse(ns, n, na, iters=20):
    import jax
    import jax.numpy as jnp
    from tomojax.geometry import Geometry
    from tomojax.solvers import make_system, fista_init, fista_step
    from tomojax.sim import nanocube_phantom
    from tomojax.projector.joseph import fp
    from tomojax import ops

    geom = Geometry.make(n, np.deg2rad(np.linspace(-76, 76, na)))
    sysd = make_system(geom)
    vol = jnp.asarray(nanocube_phantom(ns, n))
    b = jax.jit(lambda v: fp(v, geom))(vol)
    st = fista_init(jnp.zeros((ns, n, n), jnp.float32), sysd)
    step = jax.jit(lambda s, bb: fista_step(s, bb, sysd, 0.1, 10, True))
    st, _ = step(st, b)
    jax.block_until_ready(st.x)
    t0 = time.perf_counter()
    for _ in range(iters - 1):
        st, _ = step(st, b)
    jax.block_until_ready(st.x)
    ms = (time.perf_counter() - t0) / (iters - 1) * 1e3
    return float(ops.rmse(st.x, vol)), ms


def main():
    import jax
    import jax.numpy as jnp
    from tomojax import config as tjconfig
    from tomojax.tv.pallas_fgp import tv_fgp_pallas_fused

    n = int(sys.argv[1]) if len(sys.argv) > 1 else 256
    print(f"device: {jax.devices()[0].device_kind}, size {n}^3")

    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.random((n, n, n), np.float32))
    x2 = jnp.asarray(rng.random((n, n, n), np.float32))
    lam = 0.1

    # --- fgp_dual_dtype -----------------------------------------------
    f32 = lambda v: tv_fgp_pallas_fused(v, 10, lam, dual_dtype=jnp.float32)[0]
    bf16 = lambda v: tv_fgp_pallas_fused(v, 10, lam, dual_dtype=jnp.bfloat16)[0]
    ms32, d32 = timed(f32, x, x2)
    ms16, d16 = timed(bf16, x, x2)
    err = float(jnp.max(jnp.abs(d32 - d16)))
    print(
        f"fgp_dual_dtype: f32 {ms32/10:.3f} ms/iter, bf16 {ms16/10:.3f} "
        f"ms/iter ({ms32/ms16:.2f}x); max|d_bf16-d_f32| = {err:.2e} "
        f"(= lam*{err/lam:.1e}) after 10 iters, lam={lam}"
    )

    for dt in ("float32", "bfloat16"):
        tjconfig.set_tv_impl("auto", dual_dtype=dt)
        r, ms = fista_rmse(n, n, 90)
        print(f"  FISTA-TV 20-iter rmse with {dt} duals: {r:.6f} ({ms:.1f} ms/iter)")
    tjconfig.set_tv_impl("auto", dual_dtype="bfloat16")

    # --- pallas_precision ---------------------------------------------
    from jax.lax import Precision

    for prec in (Precision.DEFAULT, Precision.HIGH):
        tjconfig.set_projector_mode("auto", precision=prec)
        r, ms = fista_rmse(n, n, 90)
        print(f"pallas_precision {prec}: FISTA-TV 20-iter rmse {r:.6f} ({ms:.1f} ms/iter)")
    tjconfig.set_projector_mode("auto", precision=Precision.DEFAULT)


if __name__ == "__main__":
    main()
