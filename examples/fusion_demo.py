"""Multi-modal chemical tomography recipe (reference chemistry quickstart,
README.md:48-53): fuse a dense HAADF tilt series with sparse per-element
chemical maps. Self-contained: simulates both modalities from a two-element
phantom.
"""

import argparse

import numpy as np

from tomojax import ChemicalTomo
from tomojax.fusion import (
    make_fusion_system,
    weights_for_elements,
    fp4d,
    model_haadf,
)
from tomojax.projector.joseph import fp


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--nslice", type=int, default=16)
    ap.add_argument("--n", type=int, default=128)
    ap.add_argument("--niter", type=int, default=30)
    ap.add_argument("--normalize-haadf", action="store_true")
    args = ap.parse_args()

    import jax.numpy as jnp

    n, ns = args.n, args.nslice
    yy, xx = np.mgrid[0:n, 0:n]
    core = (((xx - n / 3) ** 2 + (yy - n / 2) ** 2) < (n / 6) ** 2)
    shell = (((xx - 2 * n / 3) ** 2 + (yy - n / 2) ** 2) < (n / 7) ** 2)
    gt = np.zeros((2, ns, n, n), np.float32)
    gt[0, :, core] = 1.0  # carbon
    gt[1, :, shell] = 1.0  # zinc
    gt = np.transpose(gt, (0, 1, 2, 3))

    haadf_angles = np.linspace(-76, 76, 77)  # dense HAADF
    chem_angles = np.linspace(-60, 60, 9)  # sparse chemistry

    w = weights_for_elements(["c", "zn"], 1.6, 3)
    fsys = make_fusion_system(
        n, np.deg2rad(haadf_angles), np.deg2rad(chem_angles), w, 1.6
    )
    b_chem = np.asarray(fp4d(jnp.asarray(gt), fsys.chem))
    b_haadf = np.asarray(fp(model_haadf(jnp.asarray(gt), fsys), fsys.haadf.geom))

    ct = ChemicalTomo(
        np.transpose(b_haadf, (0, 2, 1)),
        haadf_angles,
        {
            "C": np.transpose(b_chem[0], (0, 2, 1)),
            "Zn": np.transpose(b_chem[1], (0, 2, 1)),
        },
        chem_angles,
    )
    ct.chemical_tomography(Niter=50, lambdaCHEM=0.05, show_convergence=False)

    def nrmse(x):
        x = x / max(x.max(), 1e-9)
        return float(np.sqrt(np.mean((x - gt / gt.max()) ** 2)))

    print("chemistry-only NRMSE:", nrmse(ct.get_recon()))
    ct.data_fusion(
        Niter=args.niter, show_convergence=False,
        normalize_haadf=args.normalize_haadf,
    )
    print("fused NRMSE:        ", nrmse(ct.get_recon()))
    print("per-element RMSE:", ct.rmse_per_element(gt))


if __name__ == "__main__":
    main()
