"""Simulated-tilt-series reconstruction recipe.

tomojax equivalent of the reference driver scripts
tomofusion/cpu/sim_tomo.py and tomofusion/examples/sim_tomo.py: simulate
projections of a phantom, reconstruct with SIRT (or ART/SART), track
per-iteration RMSE/DD, save reference-layout results.

Run:  python examples/sim_tomo.py [--nslice 64 --n 256 --alg sirt]
"""

import argparse
import time

import numpy as np

from tomojax.api import Simulator
from tomojax import io
from tomojax.sim import nanocube_phantom


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--nslice", type=int, default=64)
    ap.add_argument("--n", type=int, default=256)
    ap.add_argument("--nproj", type=int, default=77)
    ap.add_argument("--alg", default="sirt", choices=["sirt", "sart", "cgls", "wbp"])
    ap.add_argument("--niter", type=int, default=100)
    ap.add_argument("--snr", type=int, default=0, help="Poisson count level (0 = noiseless)")
    ap.add_argument("--save", action="store_true")
    args = ap.parse_args()

    # Config block mirrors the reference's module-level constants
    # (cpu/sim_tomo.py:10-35).
    angles = np.linspace(-76, 76, args.nproj)
    vol = nanocube_phantom(args.nslice, args.n)

    sim = Simulator(vol, angles, snr=args.snr)
    t0 = time.time()
    if args.alg == "sirt":
        sim.sirt(Niter=args.niter, show_convergence=True)
    elif args.alg == "sart":
        sim.sart(Niter=args.niter, show_convergence=True)
    elif args.alg == "cgls":
        sim.cgls(Niter=args.niter, show_convergence=True)
    else:
        sim.wbp()
    dt = time.time() - t0
    rmse = sim.rmse()
    vox = args.nslice * args.n * args.n
    print(f"{args.alg}: {args.niter} iters in {dt:.1f}s "
          f"({vox * args.niter / dt / 1e6:.1f} Mvoxel-iters/s), RMSE {rmse:.4f}")

    if args.save:
        meta = dict(alg=args.alg, Niter=args.niter, SNR=args.snr,
                    Nproj=args.nproj)
        io.save_results(
            f"results/sim_tomo/{args.alg}.h5",
            meta, {"dd": sim.cost, "rmse": np.asarray([rmse])},
            sim.get_recon(),
        )
        print(f"saved results/sim_tomo/{args.alg}.h5")


if __name__ == "__main__":
    main()
