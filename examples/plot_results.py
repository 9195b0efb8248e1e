"""Plot saved reconstruction results (reference cpu/utils/plot_results.py):
reads the reference-layout results HDF5 (parameters / results /
Reconstruction groups) and renders convergence curves + slice views.

Run: python examples/plot_results.py results/sim_tomo/sirt.h5 [--outdir X]
"""

import argparse
import os

import numpy as np

from tomojax import io, viz


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("files", nargs="+")
    ap.add_argument("--outdir", default=None)
    args = ap.parse_args()

    for path in args.files:
        recon, results, params = io.load_results(path)
        name = os.path.splitext(os.path.basename(path))[0]
        outdir = args.outdir or os.path.dirname(path)
        print(f"{path}: params={params} curves={list(results)}")
        for key, curve in results.items():
            if np.ndim(curve) == 1 and len(curve) > 1:
                viz.plot_convergence(
                    curve, f"{name} {key}",
                    path=os.path.join(outdir, f"{name}_{key}.png"))
        if recon is not None:
            viz.show_volume(
                recon, path=os.path.join(outdir, f"{name}_slices.png"))
            print(f"  recon {recon.shape} -> {name}_slices.png")


if __name__ == "__main__":
    main()
