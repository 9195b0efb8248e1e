"""ASD-POCS simulation recipe (reference cpu/sim_ASD.py / examples/sim_ASD.py).

The full adaptive loop (dPOCS/dp/dg logic) lives in TomoTPU.asd_pocs,
matching the reference's working driver (cpu/sim_ASD.py:65-96).
"""

import argparse

import numpy as np

from tomojax.api import Simulator
from tomojax import io
from tomojax.sim import nanocube_phantom


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--nslice", type=int, default=64)
    ap.add_argument("--n", type=int, default=256)
    ap.add_argument("--nproj", type=int, default=47)
    ap.add_argument("--niter", type=int, default=100)
    ap.add_argument("--snr", type=int, default=200)
    ap.add_argument("--save", action="store_true")
    ap.add_argument("--fused", action="store_true",
                    help="scan the whole adaptive loop into ONE program "
                         "(solvers.make_asd_pocs_run; pod-production "
                         "shape — one large compile, then fastest)")
    args = ap.parse_args()

    # reference defaults (examples/sim_ASD.py:19-31)
    params = dict(
        eps=0.025, beta0=0.25, beta_reduce=0.9985, r_max=0.95,
        nTViter=10, alpha=0.2, alpha_reduce=0.95,
    )

    angles = np.linspace(-76, 76, args.nproj)
    vol = nanocube_phantom(args.nslice, args.n)
    sim = Simulator(vol, angles, snr=args.snr)
    sim.asd_pocs(Niter=args.niter, fused=args.fused, **params)
    print(f"ASD-POCS: dd {sim.dd_vec[0]:.3f} -> {sim.dd_vec[-1]:.3f}, "
          f"tv {sim.tv_vec[0]:.1f} -> {sim.tv_vec[-1]:.1f}, "
          f"RMSE {sim.rmse():.4f}")

    if args.save:
        io.save_results(
            "results/sim_ASD/asd_pocs.h5",
            dict(alg="asd-pocs", Niter=args.niter, SNR=args.snr, **params),
            {"dd": sim.dd_vec, "tv": sim.tv_vec},
            sim.get_recon(),
        )


if __name__ == "__main__":
    main()
