"""Benchmark: FISTA-TV reconstruction throughput on the BASELINE 256-class
problem (256^3 volume, 90-angle tilt series — BASELINE.md configs).

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
The reference repo publishes no numbers (BASELINE.json "published": {}),
so vs_baseline is reported as 1.0 by convention; the absolute voxels/s
number is the tracked quantity.

Run on whatever jax.devices() provides (real TPU under the driver).
"""

import json
import sys
import time

import numpy as np


def main():
    import jax
    import jax.numpy as jnp
    from tomojax.geometry import Geometry
    from tomojax.solvers import make_system, fista_init, fista_step
    from tomojax.sim import nanocube_phantom
    from tomojax.projector.joseph import fp

    ns = int(sys.argv[1]) if len(sys.argv) > 1 else 256
    n = int(sys.argv[2]) if len(sys.argv) > 2 else 256
    na = int(sys.argv[3]) if len(sys.argv) > 3 else 90
    iters = int(sys.argv[4]) if len(sys.argv) > 4 else 10

    geom = Geometry.make(n, np.deg2rad(np.linspace(-76, 76, na)))
    sysd = make_system(geom)
    vol = jnp.asarray(nanocube_phantom(ns, n))
    b = jax.jit(lambda v: fp(v, geom))(vol)
    jax.block_until_ready(b)

    state = fista_init(jnp.zeros((ns, n, n), jnp.float32))
    step = jax.jit(lambda st, b: fista_step(st, b, sysd, 0.1, 10, True))

    # warmup/compile
    state, m = step(state, b)
    jax.block_until_ready(state.x)

    t0 = time.perf_counter()
    for _ in range(iters):
        state, m = step(state, b)
    jax.block_until_ready(state.x)
    dt = time.perf_counter() - t0

    voxel_iters_per_s = ns * n * n * iters / dt
    print(
        json.dumps(
            {
                "metric": f"fista_tv_voxel_iters_per_s_{ns}x{n}x{n}_{na}ang",
                "value": round(voxel_iters_per_s, 1),
                "unit": "voxel-iters/s",
                "vs_baseline": 1.0,
            }
        )
    )


if __name__ == "__main__":
    main()
