"""End-to-end walkthrough — the tomojax equivalent of the reference's
demo.ipynb (the reference's de-facto integration test, SURVEY.md §4):
simulate projections of a nanocube phantom, then run the full algorithm
matrix — WBP, SIRT, CGLS, KL-divergence, FISTA-TV, ASD-POCS — and report
per-algorithm RMSE + timing. Saves convergence plots and slice views.

Run: python examples/demo.py [--n 256 --nslice 64 --outdir results/demo]
"""

import argparse
import os
import time

import numpy as np

from tomojax.api import Simulator
from tomojax import viz
from tomojax.sim import nanocube_phantom


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=256)
    ap.add_argument("--nslice", type=int, default=64)
    ap.add_argument("--nproj", type=int, default=77)
    ap.add_argument("--snr", type=int, default=200)
    ap.add_argument("--outdir", default="results/demo")
    args = ap.parse_args()
    os.makedirs(args.outdir, exist_ok=True)

    angles = np.linspace(-76, 76, args.nproj)  # missing-wedge tilt range
    vol = nanocube_phantom(args.nslice, args.n)
    sim = Simulator(vol, angles, snr=args.snr)
    print(f"simulated {sim.get_projections().shape} noisy tilt series")

    report = []

    def run(name, fn, **kw):
        t0 = time.time()
        fn(**kw)
        dt = time.time() - t0
        r = sim.rmse()
        report.append((name, r, dt))
        print(f"{name:10s} RMSE {r:.4f}  ({dt:.1f}s)")
        viz.show_volume(sim.get_recon(),
                        path=os.path.join(args.outdir, f"{name}.png"))
        if sim.cost is not None and np.ndim(sim.cost) and len(sim.cost) > 1:
            viz.plot_convergence(
                sim.cost, name,
                path=os.path.join(args.outdir, f"{name}_conv.png"))

    run("wbp", sim.wbp, filter="ram-lak")
    run("sirt", sim.sirt, Niter=100, show_convergence=True)
    run("cgls", sim.cgls, Niter=30)
    run("kl", sim.kl_divergence, Niter=100, lambda_param=0.25)
    run("fista_tv", sim.fista, Niter=50, lambda_param=0.1, nTViter=10)
    run("asd_pocs", sim.asd_pocs, Niter=50)

    print("\n=== summary ===")
    for name, r, dt in report:
        print(f"{name:10s} RMSE {r:.4f}  wall {dt:6.1f}s")
    print(f"plots in {args.outdir}/")


if __name__ == "__main__":
    main()
