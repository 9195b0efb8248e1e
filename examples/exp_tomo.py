"""Experimental-data reconstruction recipe (reference cpu/exp_tomo.py /
examples/exp_tomo.py): load a measured tilt series from HDF5, reconstruct,
save results.

Expects an h5 file with `tiltSeries` (Nslice, Nray, Nangles) and
`tiltAngles` (degrees) — the reference data convention (README.md:36).
"""

import argparse

import numpy as np

from tomojax import TomoTPU, io


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("data", help="path to tilt-series .h5")
    ap.add_argument("--alg", default="fista",
                    choices=["sirt", "sart", "cgls", "wbp", "fista", "asd_pocs"])
    ap.add_argument("--niter", type=int, default=100)
    ap.add_argument("--lambda-tv", type=float, default=0.1, dest="lam")
    ap.add_argument("--out", default="results/exp_tomo/recon.h5")
    args = ap.parse_args()

    series, angles = io.load_h5_data(args.data)
    print(f"loaded {series.shape} tilt series, {len(angles)} angles")
    tomo = TomoTPU(angles, series)

    if args.alg == "fista":
        tomo.fista(Niter=args.niter, lambda_param=args.lam)
    elif args.alg == "asd_pocs":
        tomo.asd_pocs(Niter=args.niter)
    elif args.alg == "wbp":
        tomo.wbp()
    else:
        getattr(tomo, args.alg)(Niter=args.niter)

    io.save_results(
        args.out,
        dict(alg=args.alg, Niter=args.niter, source=args.data),
        {"cost": np.asarray(tomo.cost if tomo.cost is not None else [])},
        tomo.get_recon(),
    )
    print(f"saved {args.out}")


if __name__ == "__main__":
    main()
