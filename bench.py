"""Benchmark: FISTA-TV reconstruction throughput on the BASELINE 256-class
problem (256^3 volume, 90-angle tilt series — BASELINE.md configs).

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
The reference repo publishes no numbers (BASELINE.json "published": {}),
so vs_baseline is reported as 1.0 by convention; the absolute voxels/s
number is the tracked quantity.

Run on whatever jax.devices() provides (real TPU under the driver).
"""

import glob
import json
import os
import re
import sys
import time

import numpy as np


def _prev_round_value(metric: str):
    """Latest recorded driver value for this metric (BENCH_r{N}.json),
    so the printed line carries a self-evident regression ratio. The
    reference publishes no numbers (vs_baseline stays 1.0 by convention);
    vs_prev_round is the tracked comparison."""
    here = os.path.dirname(os.path.abspath(__file__))
    best = None
    for path in glob.glob(os.path.join(here, "BENCH_r*.json")):
        m = re.search(r"BENCH_r(\d+)\.json$", path)
        if not m:
            continue
        try:
            rec = json.load(open(path))
        except Exception:
            continue
        if rec.get("parsed", {}).get("metric") == metric:
            rnd = int(m.group(1))
            if best is None or rnd > best[0]:
                best = (rnd, float(rec["parsed"]["value"]))
    return None if best is None else best[1]


def _flagship_rows():
    """Non-headline flagship measurements for the driver artifact
    (round-4 VERDICT #4: a regression in SART / ASD-POCS / fusion or in
    the production path's NUMERICS previously could not move the one
    number the round process tracks). Returns a dict merged into the
    headline JSON line:
      * sart_sweep / asd_pocs_iter / fusion_outer rows (same shapes and
        machinery as `bench.py --asd/--fusion`, so the numbers are
        comparable with results/bench_asd.json / bench_fusion.json),
      * golden_trace_ok — replay of the recorded production-config
        convergence trace (tests/golden/fista_tpu_256.json) on the chip
        with the same tolerances as
        tests/test_golden_traces.py::test_fista_tpu_production_trace.
    Each part degrades to an "...error" field rather than killing the
    headline line. Skipped wholesale on CPU (the driver benches on TPU;
    CPU smoke runs stay fast)."""
    import jax
    import jax.numpy as jnp
    from tomojax.geometry import Geometry
    from tomojax.solvers import make_system, make_sart_weights
    from tomojax.solvers.iterative import sart_sweep
    from tomojax.solvers.asd_pocs import make_asd_pocs_iteration

    out = {}
    ns = n = 256
    na = 90
    try:
        geom = Geometry.make(n, np.deg2rad(np.linspace(-76, 76, na)))
        sysd = make_system(geom)
        w = make_sart_weights(sysd)
        rng = np.random.default_rng(0)
        x = jnp.asarray(rng.random((ns, n, n)).astype(np.float32))
        b = jnp.asarray(rng.random((ns, na, n)).astype(np.float32))
        from tomojax.solvers.pallas_sart import sart_w_operand

        w_op = sart_w_operand(geom, ns)
        ops_w = (w_op,) if w_op is not None else ()
        sweep_ms = _slope(
            lambda v, *e: sart_sweep(v, b, sysd, w, 0.8,
                                     w_hbm=e[0] if e else None),
            x, extra=ops_w,
        )
        it = make_asd_pocs_iteration(sysd, w, 10)
        order = jnp.arange(na, dtype=jnp.int32)
        iter_ms = _slope(
            lambda v, *e: it(v, b, 0.25, 0.1, order, False, 0.2,
                             e[0] if e else None)[0],
            x, extra=ops_w,
        )
        for name, ms in (("sart_sweep", sweep_ms),
                         ("asd_pocs_iter", iter_ms)):
            out[name] = {
                "metric": f"{name}_voxel_iters_per_s_{ns}x{n}x{n}_{na}ang",
                "value": round(ns * n * n / (ms / 1e3), 1),
                "unit": "voxel-iters/s",
                "ms": round(ms, 2),
            }
    except Exception as e:  # pragma: no cover - hardware dependent
        out["asd_error"] = f"{type(e).__name__}: {e}"

    try:
        from tomojax.fusion import make_fusion_system, data_fusion_step
        from tomojax.fusion.multimodal import tv_fgp_4d

        nel, fns, fna, fnac = 3, 128, 90, 45
        fsys = make_fusion_system(
            n, np.deg2rad(np.linspace(-76, 76, fna)),
            np.deg2rad(np.linspace(-76, 76, fnac)),
            np.ones(nel, np.float32), 1.6,
        )
        rng = np.random.default_rng(0)
        xf = jnp.asarray(rng.random((nel, fns, n, n)).astype(np.float32))
        bh = jnp.asarray(rng.random((fns, fna, n)).astype(np.float32))
        bc = jnp.asarray(
            rng.random((nel, fns, fnac, n)).astype(np.float32)
        )

        def outer(v):
            v, _, _ = data_fusion_step(v, bh, bc, fsys, 10.0, 0.05, 5)
            v, _ = tv_fgp_4d(v, 5, 1e-4)
            return v

        ms = _slope(outer, xf, iters=4)
        out["fusion_outer"] = {
            "metric":
                f"fusion_outer_iter_voxel_iters_per_s_{nel}el_{fns}x{n}x{n}",
            "value": round(nel * fns * n * n / (ms / 1e3), 1),
            "unit": "voxel-iters/s",
            "ms": round(ms, 2),
        }
    except Exception as e:  # pragma: no cover - hardware dependent
        out["fusion_error"] = f"{type(e).__name__}: {e}"

    try:
        out["golden_trace_ok"] = _golden_trace_ok()
    except Exception as e:  # pragma: no cover - hardware dependent
        out["golden_trace_ok"] = False
        out["golden_trace_error"] = f"{type(e).__name__}: {e}"
    return out


def _golden_trace_ok() -> bool:
    """Replay the production-config golden trace on the chip; True iff
    dd/tv/rmse match the committed trace within the test tolerances."""
    import sys as _sys

    here = os.path.dirname(os.path.abspath(__file__))
    with open(os.path.join(here, "tests", "golden",
                           "fista_tpu_256.json")) as f:
        golden = json.load(f)
    _sys.path.insert(0, os.path.join(here, "scripts"))
    import record_golden_tpu as rec

    geom, sysd, vol, b_sl = rec.build_problem()
    m, rmse = rec.run_production(sysd, vol, b_sl)
    ok = (
        np.allclose(m[:, 1], golden["dd"], rtol=5e-3)
        and np.allclose(m[:, 2], golden["tv"], rtol=5e-3)
        and abs(rmse - golden["rmse_final"]) < 1e-3
    )
    return bool(ok)


def main(markdown: bool = False):
    import jax
    import jax.numpy as jnp
    from tomojax.geometry import Geometry
    from tomojax.solvers import make_system, fista_init_sl, fista_run_sl, to_sl
    from tomojax.sim import nanocube_phantom
    from tomojax.projector.joseph import fp

    ns = int(sys.argv[1]) if len(sys.argv) > 1 else 256
    n = int(sys.argv[2]) if len(sys.argv) > 2 else 256
    na = int(sys.argv[3]) if len(sys.argv) > 3 else 90
    iters = int(sys.argv[4]) if len(sys.argv) > 4 else 10

    geom = Geometry.make(n, np.deg2rad(np.linspace(-76, 76, na)))
    sysd = make_system(geom)
    vol = jnp.asarray(nanocube_phantom(ns, n))
    b = jax.jit(lambda v: to_sl(fp(v, geom)))(vol)
    jax.block_until_ready(b)

    state = fista_init_sl(jnp.zeros((ns, n, n), jnp.float32), sysd, b)
    # All `iters` iterations in one scanned program, in the slice-LAST
    # layout (solvers.fista_run_sl): the kernels' native layout, so the
    # loop carries zero HBM transposes and the SIRT update is fused into
    # the BP kernel epilogue (15.2 vs 15.8 ms/iter slice-first scan vs
    # 18.7 for the per-call host loop on v5e). The large one-time compile
    # is absorbed by the persistent cache.
    run = jax.jit(
        lambda st, b: fista_run_sl(st, b, sysd, 0.1, iters, 10, True)
    )

    # warmup/compile
    state, m = run(state, b)
    jax.block_until_ready(state.x)

    # time 4 chained program calls (4*iters iterations) for a stable
    # window (~0.6 s); state feeds forward so no two calls are identical
    # (the remote backend caches identical (executable, inputs) pairs).
    reps = 4
    t0 = time.perf_counter()
    for _ in range(reps):
        state, m = run(state, b)
    jax.block_until_ready(state.x)
    dt = time.perf_counter() - t0

    voxel_iters_per_s = ns * n * n * iters * reps / dt
    metric = f"fista_tv_voxel_iters_per_s_{ns}x{n}x{n}_{na}ang"
    rec = {
        "metric": metric,
        "value": round(voxel_iters_per_s, 1),
        "unit": "voxel-iters/s",
        "vs_baseline": 1.0,
    }
    prev = _prev_round_value(metric)
    if prev:
        rec["vs_prev_round"] = round(voxel_iters_per_s / prev, 3)
    # Round-4 VERDICT #4: the one driver-tracked line carries ALL
    # flagships + the production numerics gate, not just the headline.
    if jax.default_backend() != "cpu":
        rec["flagships"] = _flagship_rows()
    print(json.dumps(rec))
    if markdown:
        # README/ARCHITECTURE perf snippet — regenerate instead of
        # hand-editing so the docs can't drift from the measured number.
        dev = jax.devices()[0].device_kind
        ms = dt / (iters * reps) * 1e3
        print(
            f"\n**{voxel_iters_per_s/1e6:.1f}M voxel-iters/s** full "
            f"FISTA-TV at {ns}³ x {na} angles "
            f"(≈{ms:.1f} ms per iteration incl. FP + BP + 10 FGP "
            f"iterations + momentum + metrics) on one {dev}."
        )


def _slope(f, x, iters=6, reps=3, extra=()):
    """Per-call ms by slope timing (the remote backend caches identical
    (executable, input) pairs; chaining v = f(v) keeps inputs fresh).
    `extra` operands ride as jit ARGUMENTS (a multi-GB operand captured
    in the closure would be baked into the compile request — the remote
    compile service rejects it)."""
    import jax
    import jax.numpy as jnp

    def chain(v, k, *e):
        for _ in range(k):
            v = f(v, *e)
        return jnp.sum(v)

    c1 = jax.jit(lambda v, *e: chain(v, 1, *e))
    ck = jax.jit(lambda v, *e: chain(v, 1 + iters, *e))
    float(c1(x, *extra)), float(ck(x, *extra))
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter(); float(c1(x, *extra))
        t1 = time.perf_counter() - t0
        t0 = time.perf_counter(); float(ck(x, *extra))
        tk = time.perf_counter() - t0
        best = min(best, (tk - t1) / iters * 1e3)
    return best


def asd(ns=256, n=256, na=90):
    """ASD-POCS workload rows (round-3 VERDICT #3): the SART sweep (the
    reference's canonical distributed workload, examples/sim_ASD.py:67-94)
    and the full ASD-POCS iteration (SART + ng=10 TV-GD + metrics).
    Emits one JSON line per row and rewrites results/bench_asd.json."""
    import jax
    import jax.numpy as jnp
    from tomojax.geometry import Geometry
    from tomojax.solvers import make_system, make_sart_weights
    from tomojax.solvers.iterative import sart_sweep
    from tomojax.solvers.asd_pocs import make_asd_pocs_iteration

    geom = Geometry.make(n, np.deg2rad(np.linspace(-76, 76, na)))
    sysd = make_system(geom)
    w = make_sart_weights(sysd)
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.random((ns, n, n)).astype(np.float32))
    b = jnp.asarray(rng.random((ns, na, n)).astype(np.float32))

    from tomojax.solvers.pallas_sart import sart_w_operand

    w_op = sart_w_operand(geom, ns)
    ops_w = (w_op,) if w_op is not None else ()
    sweep_ms = _slope(
        lambda v, *e: sart_sweep(v, b, sysd, w, 0.8,
                                 w_hbm=e[0] if e else None),
        x, extra=ops_w,
    )
    it = make_asd_pocs_iteration(sysd, w, 10)
    order = jnp.arange(na, dtype=jnp.int32)
    iter_ms = _slope(
        lambda v, *e: it(v, b, 0.25, 0.1, order, False, 0.2,
                         e[0] if e else None)[0],
        x, extra=ops_w,
    )
    rows = []
    for name, ms in (("sart_sweep", sweep_ms), ("asd_pocs_iter", iter_ms)):
        rec = {
            "metric": f"{name}_voxel_iters_per_s_{ns}x{n}x{n}_{na}ang",
            "value": round(ns * n * n / (ms / 1e3), 1),
            "unit": "voxel-iters/s",
            "ms": round(ms, 2),
            "vs_baseline": 1.0,
        }
        rows.append(rec)
        print(json.dumps(rec))
    if jax.default_backend() == "cpu":
        return  # don't clobber the TPU artifact with CPU smoke numbers
    here = os.path.dirname(os.path.abspath(__file__))
    with open(os.path.join(here, "results", "bench_asd.json"), "w") as f:
        json.dump({
            "description": "ASD-POCS workload rows (bench.py --asd): "
                           "SART sweep + full adaptive iteration "
                           "(SART + 10 TV-GD steps + dp/dd/dg metrics) "
                           "on one chip.",
            "device": jax.devices()[0].device_kind,
            "rows": rows,
        }, f, indent=1)


def fusion_bench(nel=3, ns=128, n=256, na=90, nac=45):
    """Fusion outer-iteration row (round-3 VERDICT #3): one
    data_fusion_step (HAADF SIRT-fused update + chem Poisson grad) +
    tvIter=5 4D FGP — the reference chemistry flagship loop
    (chemistry/reconstructor.py:182-225). Rewrites
    results/bench_fusion.json."""
    import jax
    import jax.numpy as jnp
    from tomojax.fusion import make_fusion_system, data_fusion_step
    from tomojax.fusion.multimodal import tv_fgp_4d

    w = np.ones(nel, np.float32)
    fsys = make_fusion_system(
        n, np.deg2rad(np.linspace(-76, 76, na)),
        np.deg2rad(np.linspace(-76, 76, nac)), w, 1.6,
    )
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.random((nel, ns, n, n)).astype(np.float32))
    bh = jnp.asarray(rng.random((ns, na, n)).astype(np.float32))
    bc = jnp.asarray(rng.random((nel, ns, nac, n)).astype(np.float32))

    def outer(v):
        v, _, _ = data_fusion_step(v, bh, bc, fsys, 10.0, 0.05, 5)
        v, _ = tv_fgp_4d(v, 5, 1e-4)
        return v

    ms = _slope(outer, x, iters=4)
    rec = {
        "metric": f"fusion_outer_iter_voxel_iters_per_s_{nel}el_{ns}x{n}x{n}",
        "value": round(nel * ns * n * n / (ms / 1e3), 1),
        "unit": "voxel-iters/s",
        "ms": round(ms, 2),
        "vs_baseline": 1.0,
    }
    print(json.dumps(rec))
    if jax.default_backend() == "cpu":
        return  # don't clobber the TPU artifact with CPU smoke numbers
    here = os.path.dirname(os.path.abspath(__file__))
    with open(os.path.join(here, "results", "bench_fusion.json"), "w") as f:
        json.dump({
            "description": "Fusion outer iteration (bench.py --fusion): "
                           "data_fusion_step (iterSIRT=5) + 4D FGP "
                           "(tvIter=5) at the chemistry flagship shape.",
            "device": jax.devices()[0].device_kind,
            "rows": [rec],
        }, f, indent=1)


def scaling(max_devices=None, ns=64, n=128, na=45, iters=10):
    """Strong-scaling study (BASELINE.md target: voxels/s at 1 chip ->
    N devices, >=80% linear). Shards the FISTA-TV step as z-slabs over
    1, 2, 4, ... device meshes and reports parallel efficiency.

    On this container the multi-device mesh is the 8-device virtual CPU
    mesh (JAX_PLATFORMS=cpu XLA_FLAGS=--xla_force_host_platform_device_count=8
    python bench.py --scaling); on a pod it measures real ICI/DCN scaling
    unchanged."""
    import jax
    import jax.numpy as jnp
    from jax.sharding import NamedSharding, PartitionSpec as P
    from tomojax import dist
    from tomojax.geometry import Geometry
    from tomojax.solvers import make_system, fista_init, fista_step
    from tomojax.sim import shepp_logan
    from tomojax.projector.joseph import fp

    ndev_all = jax.device_count() if max_devices is None else max_devices
    geom = Geometry.make(n, np.deg2rad(np.linspace(-76, 76, na)))
    sysd = make_system(geom)
    ph = jnp.asarray(np.stack([shepp_logan(n)] * ns))
    results = []
    sizes = [d for d in (1, 2, 4, 8, 16, 32, 64) if d <= ndev_all]
    for ndev in sizes:
        mesh = dist.make_mesh(ndev)
        slab3 = NamedSharding(mesh, P(dist.SLAB_AXIS, None, None))
        b = jax.jit(lambda v: fp(v, geom), out_shardings=slab3)(
            jax.device_put(ph, slab3)
        )
        st = fista_init(
            jax.device_put(jnp.zeros((ns, n, n), jnp.float32), slab3), sysd
        )
        step = jax.jit(lambda s, bb: fista_step(s, bb, sysd, 0.1, 10, True))
        st, _ = step(st, b)
        jax.block_until_ready(st.x)
        t0 = time.perf_counter()
        for _ in range(iters):
            st, _ = step(st, b)
        jax.block_until_ready(st.x)
        dt = time.perf_counter() - t0
        v = ns * n * n * iters / dt
        results.append((ndev, v))
        eff = v / (results[0][1] * ndev)
        print(json.dumps({
            "metric": f"fista_tv_scaling_{ns}x{n}x{n}_{na}ang",
            "devices": ndev,
            "value": round(v, 1),
            "unit": "voxel-iters/s",
            "parallel_efficiency": round(eff, 3),
        }))


if __name__ == "__main__":
    if "--cpu" in sys.argv:
        # The axon sitecustomize forces JAX_PLATFORMS=axon, so the env
        # var alone cannot select CPU — the config update can (it must
        # run before first backend use). Pair with
        # XLA_FLAGS=--xla_force_host_platform_device_count=N for a
        # virtual mesh.
        sys.argv.remove("--cpu")
        import jax

        jax.config.update("jax_platforms", "cpu")
    if "--scaling" in sys.argv:
        sys.argv.remove("--scaling")
        scaling(*(int(a) for a in sys.argv[1:5]) if len(sys.argv) > 1 else ())
    elif "--asd" in sys.argv:
        sys.argv.remove("--asd")
        asd(*(int(a) for a in sys.argv[1:4]))
    elif "--fusion" in sys.argv:
        sys.argv.remove("--fusion")
        fusion_bench(*(int(a) for a in sys.argv[1:5]))
    else:
        markdown = "--markdown" in sys.argv
        sys.argv = [a for a in sys.argv if a != "--markdown"]
        main(markdown=markdown)
