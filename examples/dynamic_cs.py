"""Dynamic compressed-sensing reconstruction (reference cpu/dynamicCS.py):
streaming acquisition with ASD-POCS-style TV-regularized rounds and a live
dashboard.

Self-contained: simulates the acquisition into the watched directory.
"""

import argparse
import os

import numpy as np

from tomojax.geometry import Geometry
from tomojax.stream import TiltWatcher, DynamicReconstructor
from tomojax.sim import nanocube_phantom
from tomojax import viz


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--dir", default="stream_cs")
    ap.add_argument("--nslice", type=int, default=32)
    ap.add_argument("--n", type=int, default=128)
    ap.add_argument("--nproj", type=int, default=40)
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--iters-per-round", type=int, default=15)
    ap.add_argument("--ng", type=int, default=10)
    ap.add_argument("--monitor", default="results/dynamic_cs/live.png")
    args = ap.parse_args()

    os.makedirs(args.dir, exist_ok=True)
    os.makedirs(os.path.dirname(args.monitor), exist_ok=True)

    import jax.numpy as jnp
    from tomojax.projector.joseph import fp

    angles = np.linspace(-76, 76, args.nproj)
    vol = nanocube_phantom(args.nslice, args.n)
    geom = Geometry.make(args.n, np.deg2rad(angles))
    b = np.asarray(fp(jnp.asarray(vol), geom))

    watcher = TiltWatcher(args.dir, preprocess=False)
    rec = DynamicReconstructor(nray=args.n, max_angles=args.nproj,
                               angle_bucket=args.batch)
    monitor = viz.LiveMonitor(args.monitor)

    written = 0
    tv_hist = []
    while written < args.nproj:
        for k in range(written, min(written + args.batch, args.nproj)):
            np.save(os.path.join(args.dir, f"proj_{angles[k]:.2f}.npy"),
                    b[:, k, :])
        written = min(written + args.batch, args.nproj)
        new = watcher.poll()
        if new:
            rec.add_projections(new)
            print(f"+{len(new)} projections ({len(rec.angles)}/{args.nproj})")
        dd = rec.iterate_cs(args.iters_per_round, ng=args.ng)
        from tomojax import tv as tvmod

        tv_hist.append(float(tvmod.tv(rec.x)))
        print(f"  dd={dd:.4f} tv={tv_hist[-1]:.1f}")
        monitor.update(np.asarray(rec.x), rec.dd_history,
                       sinogram=np.asarray(rec.projections[0]),
                       tv_history=tv_hist)
    x = np.asarray(rec.x)
    print("final RMSE:", float(np.sqrt(np.mean((x - vol) ** 2))))
    print(f"dashboard: {args.monitor}")


if __name__ == "__main__":
    main()
