"""Dynamic (streaming) reconstruction recipe (reference cpu/dynamicTomo.py):
reconstruct while projections arrive in a watched directory.

For a self-contained demo this script also *simulates* the acquisition by
writing projection files into the watched directory from a phantom, a few
per round (use --watch-only with a real acquisition feeding the dir).
"""

import argparse
import os

import numpy as np

from tomojax.geometry import Geometry
from tomojax.stream import TiltWatcher, DynamicReconstructor
from tomojax.sim import nanocube_phantom


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--dir", default="stream_data")
    ap.add_argument("--nslice", type=int, default=32)
    ap.add_argument("--n", type=int, default=128)
    ap.add_argument("--nproj", type=int, default=40)
    ap.add_argument("--batch", type=int, default=8, help="projections per arrival")
    ap.add_argument("--iters-per-round", type=int, default=15)
    ap.add_argument("--watch-only", action="store_true",
                    help="don't simulate; just watch --dir")
    ap.add_argument("--ckpt", default="results/dynamic/ckpt.h5")
    ap.add_argument("--mesh", action="store_true",
                    help="shard the streaming reconstruction as z-slabs "
                         "over all devices (the reference's distributed "
                         "dynamic driver, examples/dynamicTomo.py:38-88; "
                         "with jax.distributed initialized this spans "
                         "processes: rank-0 watches + broadcasts, "
                         "checkpoints write per-host shards)")
    ap.add_argument("--alg", default="sirt", choices=["sirt", "cs"],
                    help="per-round solver (cs = ASD-POCS-style rounds)")
    args = ap.parse_args()

    os.makedirs(args.dir, exist_ok=True)
    ckpt_dir = os.path.dirname(args.ckpt)
    if ckpt_dir:
        os.makedirs(ckpt_dir, exist_ok=True)

    angles = np.linspace(-76, 76, args.nproj)
    vol = None
    if not args.watch_only:
        import jax.numpy as jnp
        from tomojax.projector.joseph import fp

        vol = nanocube_phantom(args.nslice, args.n)
        geom = Geometry.make(args.n, np.deg2rad(angles))
        b = np.asarray(fp(jnp.asarray(vol), geom))

    mesh = None
    if args.mesh:
        from tomojax import dist

        mesh = dist.make_mesh()
        print(f"mesh: {mesh.devices.size} devices")

    watcher = TiltWatcher(args.dir, preprocess=False)
    rec = DynamicReconstructor(
        nray=args.n, max_angles=args.nproj, angle_bucket=args.batch,
        checkpoint_path=args.ckpt, mesh=mesh, alg=args.alg,
    )
    rec.resume()

    written = 0
    round_no = 0
    while written < args.nproj or args.watch_only:
        if not args.watch_only:
            # simulate an acquisition batch landing on disk
            for k in range(written, min(written + args.batch, args.nproj)):
                np.save(os.path.join(args.dir, f"proj_{angles[k]:.2f}.npy"),
                        b[:, k, :])
            written = min(written + args.batch, args.nproj)
        new = watcher.poll()
        if new:
            rec.checkpoint()
            rec.add_projections(new)
            print(f"round {round_no}: +{len(new)} projections "
                  f"({len(rec.angles)}/{args.nproj})")
        if rec.projections:
            do_iter = rec.iterate_cs if args.alg == "cs" else rec.iterate
            dd = do_iter(args.iters_per_round)
            print(f"  dd = {dd:.4f}")
        round_no += 1
        if args.watch_only and round_no > 1000:
            break
    do_iter = rec.iterate_cs if args.alg == "cs" else rec.iterate
    do_iter(args.iters_per_round)
    rec.checkpoint()
    if vol is not None:
        x = rec.get_recon()
        print("final RMSE vs ground truth:",
              float(np.sqrt(np.mean((x - vol) ** 2))))
    print(f"checkpoint saved to {args.ckpt}")


if __name__ == "__main__":
    main()
