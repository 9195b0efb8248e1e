"""Multi-modal fusion tests: sigma operator math, 4D projections,
Poisson-ML, and a small end-to-end data-fusion run that must improve the
chemistry reconstruction using the HAADF signal (the whole point of the
reference's fused multi-modal method, chemistry/reconstructor.py:182-225).
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from tomojax.fusion import (
    element_weights,
    weights_for_elements,
    sigma_apply,
    sigma_t_apply,
    make_fusion_system,
    fp4d,
    bp4d,
    model_haadf,
    poisson_ml_step_4d,
    data_fusion_step,
    chemical_sirt_sweep,
    data_distance_chem,
)
from tomojax import ops

N, NS, NEL = 32, 4, 2


def _phantoms():
    """Two disjoint element phantoms."""
    yy, xx = np.mgrid[0:N, 0:N]
    e1 = ((xx - 10) ** 2 + (yy - 16) ** 2 < 36).astype(np.float32)
    e2 = ((xx - 22) ** 2 + (yy - 16) ** 2 < 25).astype(np.float32)
    x = np.zeros((NEL, NS, N, N), np.float32)
    x[0, :] = e1
    x[1, :] = e2
    return x


@pytest.fixture(scope="module")
def setup():
    gt = _phantoms()
    w = weights_for_elements(["c", "zn"], 1.6, 3)
    fsys = make_fusion_system(
        N,
        np.deg2rad(np.linspace(-70, 70, 40)),  # rich HAADF tilt set
        np.deg2rad(np.linspace(-60, 60, 9)),  # sparse chem tilt set
        w,
        gamma=1.6,
    )
    b_chem = fp4d(jnp.asarray(gt), fsys.chem)
    bh = jnp.asarray(np.asarray(
        jax.jit(lambda x: model_haadf(x, fsys))(jnp.asarray(gt))
    ))
    from tomojax.projector.joseph import fp

    b_haadf = fp(bh, fsys.haadf.geom)
    return gt, fsys, b_chem, b_haadf


def test_weight_methods():
    z = [6, 30]
    assert np.allclose(element_weights(z, 1.6, 0), [1, 1])
    assert np.allclose(element_weights(z, 1.6, 1), np.array(z) / 18.0)
    assert np.allclose(element_weights(z, 1.6, 3), np.array(z) / 36.0)
    w2 = element_weights(z, 1.6, 2)
    zz = np.array(z, np.float64) ** 1.6
    assert np.allclose(w2, zz / zz.mean(), rtol=1e-6)
    with pytest.raises(ValueError):
        element_weights(z, 1.6, 9)


def test_sigma_adjoint():
    rng = np.random.default_rng(0)
    w = jnp.asarray([0.3, 0.7])
    x = jnp.asarray(rng.standard_normal((2, 3, 8, 8)), jnp.float32)
    v = jnp.asarray(rng.standard_normal((3, 8, 8)), jnp.float32)
    lhs = float(jnp.vdot(sigma_apply(w, x), v))
    rhs = float(jnp.vdot(x, sigma_t_apply(w, v, 2)))
    assert np.isclose(lhs, rhs, rtol=1e-5)


def test_fp4d_bp4d_adjoint(setup):
    gt, fsys, b_chem, b_haadf = setup
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.standard_normal(gt.shape), jnp.float32)
    y = jnp.asarray(rng.standard_normal(b_chem.shape), jnp.float32)
    lhs = float(jnp.vdot(fp4d(x, fsys.chem), y))
    rhs = float(jnp.vdot(x, bp4d(y, fsys.chem, N)))
    assert abs(lhs - rhs) / abs(lhs) < 1e-3


def test_poisson_4d_converges(setup):
    gt, fsys, b_chem, b_haadf = setup
    bn = b_chem / jnp.max(b_chem)
    x = jnp.zeros_like(jnp.asarray(gt))
    step = jax.jit(lambda x: poisson_ml_step_4d(x, bn, fsys, 0.5))
    costs = []
    for _ in range(40):
        x, c = step(x)
        costs.append(float(c))
    assert costs[-1] < costs[0]
    corr = np.corrcoef(np.asarray(x).ravel(), gt.ravel())[0, 1]
    assert corr > 0.8, corr


def test_chemical_sirt(setup):
    gt, fsys, b_chem, b_haadf = setup
    x = jnp.zeros_like(jnp.asarray(gt))
    x = chemical_sirt_sweep(x, b_chem, fsys, 20)
    assert float(ops.rmse(x, jnp.asarray(gt))) < 0.35
    assert float(data_distance_chem(x, b_chem, fsys)) < float(
        data_distance_chem(jnp.zeros_like(x), b_chem, fsys)
    )


def test_data_fusion_improves_chemistry(setup):
    """Sparse-angle chemistry alone vs fused with dense HAADF: fusion must
    reduce RMSE vs ground truth (the multi-modal paper's core claim)."""
    gt, fsys, b_chem, b_haadf = setup
    gt_j = jnp.asarray(gt)
    bn = b_chem / jnp.max(b_chem)
    scale = float(jnp.max(b_chem))

    # chemistry-only baseline
    x = jnp.zeros_like(gt_j)
    step = jax.jit(lambda x: poisson_ml_step_4d(x, bn, fsys, 0.2))
    for _ in range(60):
        x, _ = step(x)
    x = x * scale  # undo normalization scale for comparison
    base_rmse = float(ops.rmse(x / jnp.max(x), gt_j))

    # fused
    fuse = jax.jit(
        lambda x, lc: data_fusion_step(
            x, b_haadf, bn * scale, fsys, 0.5, lc, iter_sirt=3
        )
    )
    costs_h = []
    lam_chem = 0.05
    for i in range(30):
        x, ch, cc = fuse(x, lam_chem)
        costs_h.append(float(ch))
        if i > 0 and costs_h[-1] > costs_h[-2]:
            lam_chem *= 0.95
    fused_rmse = float(ops.rmse(x / jnp.max(x), gt_j))
    assert fused_rmse < base_rmse, (fused_rmse, base_rmse)
    assert np.isfinite(costs_h).all()


def test_chemical_sart(setup):
    """chemical_SART parity feature (multimodal.cpp:416-423): ordered
    per-angle SART passes on the chem geometry converge and match a
    manual per-batch sart_sweep."""
    from tomojax.fusion import chemical_sart_sweep
    from tomojax.solvers import make_sart_weights, sart_sweep

    gt, fsys, b_chem, b_haadf = setup
    x = jnp.zeros_like(jnp.asarray(gt))
    x = chemical_sart_sweep(x, b_chem, fsys, 3)
    assert float(ops.rmse(x, jnp.asarray(gt))) < 0.35
    # equivalence with the flat-batch sart_sweep it wraps
    w = make_sart_weights(fsys.chem)
    xx = jnp.zeros((NEL * NS, N, N), jnp.float32)
    bb = b_chem.reshape(NEL * NS, fsys.chem.geom.nproj, fsys.chem.geom.nray)
    for _ in range(3):
        xx = sart_sweep(xx, bb, fsys.chem, w)
    np.testing.assert_allclose(
        np.asarray(x), np.asarray(xx.reshape(x.shape)), atol=1e-6
    )


def test_data_fusion_sart_method(setup):
    """data_fusion_step(method='sart') (call_sart_data_fusion,
    multimodal.hpp:149): behaves like the SIRT path — improves the
    chemistry-only baseline, finite costs, and differs from SIRT (the
    inner solvers are genuinely different)."""
    from tomojax.solvers import make_sart_weights

    gt, fsys, b_chem, b_haadf = setup
    gt_j = jnp.asarray(gt)
    bn = b_chem / jnp.max(b_chem)
    scale = float(jnp.max(b_chem))

    x0 = jnp.zeros_like(gt_j)
    step = jax.jit(lambda x: poisson_ml_step_4d(x, bn, fsys, 0.2))
    for _ in range(60):
        x0, _ = step(x0)
    x0 = x0 * scale
    base_rmse = float(ops.rmse(x0 / jnp.max(x0), gt_j))

    w = make_sart_weights(fsys.haadf)
    fuse = jax.jit(
        lambda x, lc: data_fusion_step(
            x, b_haadf, bn * scale, fsys, 0.5, lc, 1,
            method="sart", sart_weights=w,
        )
    )
    fuse_sirt = jax.jit(
        lambda x, lc: data_fusion_step(
            x, b_haadf, bn * scale, fsys, 0.5, lc, 1
        )
    )
    x = x0
    lam_chem = 0.05
    costs_h = []
    for i in range(30):
        x, ch, cc = fuse(x, lam_chem)
        costs_h.append(float(ch))
        if i > 0 and costs_h[-1] > costs_h[-2]:
            lam_chem *= 0.95
    fused_rmse = float(ops.rmse(x / jnp.max(x), gt_j))
    assert fused_rmse < base_rmse, (fused_rmse, base_rmse)
    assert np.isfinite(costs_h).all()
    # one SART step != one SIRT step (different inner solver, same API)
    xa, _, _ = fuse(x0, 0.05)
    xb, _, _ = fuse_sirt(x0, 0.05)
    assert not np.allclose(np.asarray(xa), np.asarray(xb))


def test_data_fusion_run_matches_host_loop(setup):
    """data_fusion_run (one scanned program incl. the adaptive
    lambdaCHEM decay carried through the scan) == the host loop."""
    from tomojax.fusion import data_fusion_run
    from tomojax.fusion.multimodal import tv_fgp_4d

    gt, fsys, b_chem, b_haadf = setup
    x0 = jnp.ones((NEL, NS, N, N), jnp.float32) * 0.1
    lam_h, lam_c0, it_s, it_tv, lam_tv = 0.2, 0.1, 2, 3, 1e-3

    x = x0
    lam_c = lam_c0
    chs = []
    for i in range(5):
        x, ch, cc = data_fusion_step(x, b_haadf, b_chem, fsys, lam_h, lam_c, it_s)
        x, tv0 = tv_fgp_4d(x, it_tv, lam_tv)
        chs.append(float(ch))
        if i > 0 and chs[-1] > chs[-2]:
            lam_c *= 0.95

    xr, metrics = jax.jit(
        lambda x, bh, bc: data_fusion_run(
            x, bh, bc, fsys, lam_h, lam_c0, 5, it_s, it_tv, lam_tv
        )
    )(x0, b_haadf, b_chem)
    np.testing.assert_allclose(np.asarray(xr), np.asarray(x),
                               rtol=1e-4, atol=1e-6)
    np.testing.assert_allclose(np.asarray(metrics)[:, 0], chs, rtol=1e-4)
