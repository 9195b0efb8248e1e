"""De-circularized convergence parity vs the reference's own operator.

The golden traces (tests/test_golden_traces.py) are recorded FROM tomojax,
so they catch regressions but not a day-1 deviation from the reference's
math. Here the oracle is `native.CpuEngine` — an exact-matrix engine built
from the reference's own operator definition (the Siddon ray matrix of
cpu/utils/pytvlib.py:8-121 `parallelRay`) running the reference ctvlib
update rules (ART ctvlib.cpp:137-191, Landweber/Cimmino SIRT :205-251,
TV-GD :406-462, the ASTRA R/C-weighted SIRT of tomoengine.cpp:181-205),
plus an independent NumPy FGP oracle for the TV prox (tv_fgp.cu:192-281).

Protocol: both engines simulate measurements with their OWN operator from
the same ground truth and reconstruct from zero; we compare per-iteration
convergence curves. This pins algorithm dynamics (weightings, step sizes,
clamps, momentum, adaptation logic) while tolerating the Joseph-vs-Siddon
operator discretization gap (~1-2e-2 relative on operator outputs).

Tolerances (all ~2-3x the measured gap at this problem size, recorded in
comments per test): normalized-dd curves match to a few percent for the
fixed-step solvers; ASD-POCS's adaptive dPOCS feedback amplifies operator
differences into the dd curve (~0.11 measured) but the reconstruction
quality (rmse) still matches to < 1e-3.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from tomojax.geometry import Geometry
from tomojax.solvers import make_system, fista_init, fista_step
from tomojax.solvers.iterative import sirt_sweep, art_sweep
from tomojax.solvers.base import row_norms_sq
from tomojax.projector.joseph import fp
from tomojax.sim import shepp_logan
from tomojax import ops
from tomojax import tv as tvmod

pytest.importorskip("scipy")
native = pytest.importorskip("tomojax.native")

NS, N, NA = 4, 32, 20
ANGLES = np.linspace(-60, 60, NA)


@pytest.fixture(scope="module")
def setup():
    gt = np.stack([shepp_logan(N)] * NS).astype(np.float32)
    geom = Geometry.make(N, np.deg2rad(ANGLES))
    sysd = make_system(geom)
    b_jax = jax.jit(lambda v: fp(v, geom))(jnp.asarray(gt))
    eng = native.CpuEngine(NS, N, ANGLES)
    eng.set_recon(gt)
    b_nat = eng.fp()
    return gt, geom, sysd, b_jax, b_nat


def _fresh_native(b_nat):
    e = native.CpuEngine(NS, N, ANGLES)
    e.b = b_nat.copy()
    return e


def _jax_sirt_curves(variant, n_iter, geom, sysd, b_jax, gt, **kw):
    x = jnp.zeros((NS, N, N), jnp.float32)
    step = jax.jit(lambda x: sirt_sweep(x, b_jax, sysd, 1, variant=variant, **kw))
    dd, rm = [], []
    for _ in range(n_iter):
        x = step(x)
        dd.append(float(ops.data_distance(fp(x, geom), b_jax)))
        rm.append(float(ops.rmse(x, jnp.asarray(gt))))
    return np.array(dd), np.array(rm)


def _native_curves(e, method, n_iter, gt, **kw):
    dd, rm = [], []
    for _ in range(n_iter):
        getattr(e, method)(**kw)
        dd.append(e.data_distance())
        rm.append(e.rmse(gt))
    return np.array(dd), np.array(rm)


def _assert_curves(dj, rj, dn, rn, dd_tol, rmse_tol):
    # normalized dd curves (each engine vs its own b) + absolute rmse
    assert np.max(np.abs(dj / dj[0] - dn / dn[0])) < dd_tol
    assert np.max(np.abs(rj - rn)) < rmse_tol
    # both must actually converge (guards against trivially-flat curves)
    assert dj[-1] < 0.9 * dj[0] and dn[-1] < 0.9 * dn[0]


def test_sirt_landweber_parity(setup):
    """beta = 1/L Landweber (ctvlib.cpp:205-221). Measured gap at this
    size: dd 0.014, rmse 0.0035."""
    gt, geom, sysd, b_jax, b_nat = setup
    dj, rj = _jax_sirt_curves("landweber", 12, geom, sysd, b_jax, gt)
    dn, rn = _native_curves(_fresh_native(b_nat), "sirt", 12, gt)
    _assert_curves(dj, rj, dn, rn, dd_tol=0.03, rmse_tol=0.01)


def test_sirt_cimmino_parity(setup):
    """Cimmino x += (1/Nrow) A^T M (b-Ax) (ctvlib.cpp:245-251). The
    per-row 1/||a_r||^2 weighting amplifies the Joseph-vs-Siddon row-norm
    difference (Joseph hat-interpolated rows have systematically smaller
    norms than Siddon segment-length rows: mean 22.9 vs 28.2 here), so
    the measured dd gap is larger: 0.053, rmse 0.0042."""
    gt, geom, sysd, b_jax, b_nat = setup
    dj, rj = _jax_sirt_curves(
        "cimmino", 12, geom, sysd, b_jax, gt, row_nsq=row_norms_sq(geom)
    )
    dn, rn = _native_curves(
        _fresh_native(b_nat), "sirt", 12, gt, cimmino=True
    )
    # cimmino converges slowly at 12 iters; relax the convergence guard
    assert np.max(np.abs(dj / dj[0] - dn / dn[0])) < 0.12
    assert np.max(np.abs(rj - rn)) < 0.012
    assert dj[-1] < dj[0] and dn[-1] < dn[0]


def test_sirt_astra_parity(setup):
    """ASTRA R/C-weighted SIRT with per-iteration nonneg clamp — the
    flavor the reference GPU engine runs and the FISTA gradient step
    (tomoengine.cpp:181-205). Measured gap: dd 0.013, rmse 0.0048."""
    gt, geom, sysd, b_jax, b_nat = setup
    dj, rj = _jax_sirt_curves("astra", 12, geom, sysd, b_jax, gt)
    dn, rn = _native_curves(_fresh_native(b_nat), "sirt_astra", 12, gt)
    _assert_curves(dj, rj, dn, rn, dd_tol=0.03, rmse_tol=0.012)


def test_art_parity(setup):
    """Sequential Kaczmarz sweeps, beta=0.5 (ctvlib.cpp:137-163; rays
    visited angle-major in both engines). Measured gap: dd 0.016,
    rmse 0.0037."""
    gt, geom, sysd, b_jax, b_nat = setup
    order = jnp.arange(NA * N, dtype=jnp.int32)
    step = jax.jit(lambda x: art_sweep(x, b_jax, sysd, 0.5, order))
    x = jnp.zeros((NS, N, N), jnp.float32)
    dj, rj = [], []
    for _ in range(8):
        x = step(x)
        dj.append(float(ops.data_distance(fp(x, geom), b_jax)))
        rj.append(float(ops.rmse(x, jnp.asarray(gt))))
    dn, rn = _native_curves(_fresh_native(b_nat), "art", 8, gt, beta=0.5)
    _assert_curves(np.array(dj), np.array(rj), dn, rn,
                   dd_tol=0.04, rmse_tol=0.01)


# --------------------------------------------------------------------------
# NumPy FGP oracle (independent implementation of tv_fgp.cu:192-281: dual
# step 1/(26 lam), no dual momentum, zero-gradient BCs, nonneg clamp,
# isotropic dual-ball projection).
# --------------------------------------------------------------------------


def fgp_np(x, n_iter, lam):
    multip = 1.0 / (26.0 * lam)
    p1, p2, p3 = (np.zeros_like(x) for _ in range(3))
    d = np.zeros_like(x)

    def bdiff(p, ax):
        out = p.copy()
        sl = [slice(None)] * 3
        sl[ax] = slice(1, None)
        slp = [slice(None)] * 3
        slp[ax] = slice(0, -1)
        out[tuple(sl)] = p[tuple(sl)] - p[tuple(slp)]
        return out

    def fdiff(d, ax):
        out = np.zeros_like(d)
        sl = [slice(None)] * 3
        sl[ax] = slice(0, -1)
        sln = [slice(None)] * 3
        sln[ax] = slice(1, None)
        out[tuple(sl)] = d[tuple(sl)] - d[tuple(sln)]
        return out

    for _ in range(n_iter):
        div = bdiff(p1, 0) + bdiff(p2, 1) + bdiff(p3, 2)
        d = np.maximum(x - lam * div, 0.0)
        p1 = p1 + multip * fdiff(d, 0)
        p2 = p2 + multip * fdiff(d, 1)
        p3 = p3 + multip * fdiff(d, 2)
        denom = p1 * p1 + p2 * p2 + p3 * p3
        with np.errstate(divide="ignore"):  # where() evaluates both arms
            scale = np.where(denom > 1.0, 1.0 / np.sqrt(denom), 1.0)
        p1 *= scale
        p2 *= scale
        p3 *= scale
    return d


def test_fgp_numpy_oracle_matches_jax():
    """The JAX FGP and the independent NumPy FGP agree to f32 rounding
    (measured 6e-8) — this de-circularizes the TV prox itself."""
    rng = np.random.default_rng(1)
    z = rng.random((8, 16, 16)).astype(np.float32)
    dj = np.asarray(tvmod.tv_fgp(jnp.asarray(z), 10, 0.1)[0])
    dn = fgp_np(z, 10, 0.1)
    assert np.abs(dj - dn).max() < 1e-5


def test_native_tv_matches_stencil():
    """Native TV value (eps=1e-8 periodic, ctvlib.cpp:336-367) vs direct
    numpy stencil."""
    rng = np.random.default_rng(2)
    vol = rng.random((NS, N, N)).astype(np.float32)
    e = native.CpuEngine(NS, N, ANGLES)
    e.set_recon(vol)
    x = vol.astype(np.float64)
    ref = np.sqrt(
        1e-8
        + (x - np.roll(x, -1, 0)) ** 2
        + (x - np.roll(x, -1, 1)) ** 2
        + (x - np.roll(x, -1, 2)) ** 2
    ).sum()
    assert abs(e.tv() - ref) / ref < 1e-5


def test_fista_tv_parity(setup):
    """FISTA-TV: astra-SIRT gradient step on yk + FGP prox + Nesterov
    momentum (reconstructor.py:121-155 with the correct prox-kept
    variant). Native trace = CpuEngine astra sweep + NumPy FGP + the same
    momentum recursion. Measured gap: dd 0.029, rmse 0.0006."""
    gt, geom, sysd, b_jax, b_nat = setup
    LAM, NTV, NIT = 0.05, 10, 10

    st = fista_init(jnp.zeros((NS, N, N), jnp.float32), sysd)
    step = jax.jit(lambda s: fista_step(s, b_jax, sysd, LAM, NTV, True))
    dj, rj = [], []
    for _ in range(NIT):
        st, (_, dd, _) = step(st)
        dj.append(float(dd))
        rj.append(float(ops.rmse(st.x, jnp.asarray(gt))))

    e = _fresh_native(b_nat)
    x_old = np.zeros((NS, N, N), np.float32)
    yk = x_old.copy()
    t = 1.0
    dn, rn = [], []
    for _ in range(NIT):
        e.set_recon(yk)
        e.sirt_astra(1)
        xk = fgp_np(e.get_recon(), NTV, LAM)
        t_new = 0.5 * (1.0 + np.sqrt(1.0 + 4.0 * t * t))
        yk = xk + ((t - 1.0) / t_new) * (xk - x_old)
        x_old, t = xk, t_new
        e.set_recon(xk)
        dn.append(e.data_distance())
        rn.append(e.rmse(gt))
    _assert_curves(np.array(dj), np.array(rj), np.array(dn), np.array(rn),
                   dd_tol=0.06, rmse_tol=0.003)


def test_asd_pocs_parity(setup):
    """ASD-POCS, the canonical working recipe (cpu/sim_ASD.py:65-96):
    ART data step w/ beta reduction, dPOCS-normalized TV-GD, dg/dp/eps
    adaptation. Native trace = CpuEngine.art + CpuEngine.tv_gd + the same
    host logic. The adaptive feedback amplifies operator differences into
    the dd curve (measured 0.105) but reconstruction quality matches:
    rmse gap measured 0.0006."""
    gt, geom, sysd, b_jax, b_nat = setup
    NG, ALPHA, ALPHA_RED, RMAX, EPS_DD = 10, 0.2, 0.95, 0.95, 0.02
    BETA0, BETA_RED, NIT = 0.5, 0.985, 10

    order = jnp.arange(NA * N, dtype=jnp.int32)
    arts = jax.jit(lambda x, beta: art_sweep(x, b_jax, sysd, beta, order))
    tvgd = jax.jit(lambda x, dp: tvmod.tv_gd(x, NG, dp))
    ddj = jax.jit(lambda x: ops.data_distance(fp(x, geom), b_jax))
    x = jnp.zeros((NS, N, N), jnp.float32)
    beta, dpocs = BETA0, 0.0
    dj, tj, rj = [], [], []
    for i in range(NIT):
        x0 = x
        x = arts(x, beta)
        beta *= BETA_RED
        dp = float(jnp.linalg.norm(x - x0))
        if i == 0:
            dpocs = dp * ALPHA
        dj.append(float(ddj(x)))
        rj.append(float(ops.rmse(x, jnp.asarray(gt))))
        x1 = x
        x, tv0 = tvgd(x, dpocs)
        tj.append(float(tv0))
        dg = float(jnp.linalg.norm(x - x1))
        if dg > dp * RMAX and dj[-1] > EPS_DD:
            dpocs *= ALPHA_RED

    e = _fresh_native(b_nat)
    beta, dpocs = BETA0, 0.0
    dn, tn, rn = [], [], []
    for i in range(NIT):
        x0 = e.get_recon().copy()
        e.art(beta=beta)
        beta *= BETA_RED
        dp = float(np.linalg.norm(e.get_recon() - x0))
        if i == 0:
            dpocs = dp * ALPHA
        dn.append(e.data_distance())
        rn.append(e.rmse(gt))
        x1 = e.get_recon().copy()
        tn.append(e.tv())
        e.tv_gd(NG, dpocs)
        dg = float(np.linalg.norm(e.get_recon() - x1))
        if dg > dp * RMAX and dn[-1] > EPS_DD:
            dpocs *= ALPHA_RED

    dj, tj, rj = np.array(dj), np.array(tj), np.array(rj)
    dn, tn, rn = np.array(dn), np.array(tn), np.array(rn)
    assert np.max(np.abs(dj / dj[0] - dn / dn[0])) < 0.2
    assert np.max(np.abs(tj / tj[0] - tn / tn[0])) < 0.12
    assert np.max(np.abs(rj - rn)) < 0.005
    assert rj[-1] < 0.15 and rn[-1] < 0.15  # both reconstruct well


# --------------------------------------------------------------------------
# Fusion-family parity oracle (round-3 VERDICT ask #1): an INDEPENDENT
# NumPy + exact-Siddon-matrix implementation of the reference fusion
# engine, derived directly from multimodal.cpp — data_fusion
# (:455-491: per-slice g = FP(sigma x^gamma); fuse :427-441 = ASTRA-SIRT
# from the HAADF model toward bh then gamma-chain-ruled sigma^T
# correction; x -= lamC/L_Aps dCHEM - lamH dHAADF; costs from PRE-update
# Ax/g; positivity at sweep end), poisson_ml (:277-304), and
# rescale_projections (:307-328: per-projection block max-matching).
# sigma is the weighted element sum (fusion_helper.py:12-29), so sigma^T
# is per-element broadcast-by-weight. Same protocol as the solvers above:
# each engine simulates measurements with its OWN operator from the same
# ground truth; convergence curves are compared.
# --------------------------------------------------------------------------

F_NEL, F_NSL = 2, 4
F_HANG = np.linspace(-70, 70, 20)
F_CANG = np.linspace(-60, 60, 9)
F_GAMMA = 1.6
F_EPS = 0.1  # multimodal.hpp:67


class FusionOracle:
    def __init__(self, w):
        self.eh = native.CpuEngine(F_NSL, N, F_HANG)
        self.ec = native.CpuEngine(F_NEL * F_NSL, N, F_CANG)
        self.w = np.asarray(w, np.float32)
        self.l_aps = self.ec.lipschitz  # max(A^T A 1), multimodal.cpp:261

    def sigma_pow(self, x):  # (nel, ns, ncol) -> (ns, ncol)
        return np.einsum(
            "e,esc->sc", self.w, np.power(np.maximum(x, 0), F_GAMMA)
        )

    def fp_c(self, x):
        return self.ec.fp(x.reshape(F_NEL * F_NSL, -1))

    def bp_c(self, y):
        return self.ec.bp(y).reshape(F_NEL, F_NSL, -1)

    def poisson_ml(self, x, b_c, lam):
        ax = self.fp_c(x)
        upd = self.bp_c((ax - b_c) / (ax + F_EPS))
        cost = np.sum(ax - b_c * np.log(ax + F_EPS))  # pre-update Ax
        return np.maximum(x - (lam / self.l_aps) * upd, 0), cost

    def fuse_step(self, x, b_h, b_c, lam_h, lam_c, it_sirt):
        xpos = np.maximum(x, 0)
        h = self.sigma_pow(x)
        g = self.eh.fp(h)
        self.eh.x = h.copy()
        self.eh.b = b_h.copy()
        self.eh.sirt_astra(it_sirt)  # ASTRA SIRT from h toward bh
        u = self.eh.x
        diff = self.w[:, None, None] * (u - h)[None]  # sigma^T
        d_h = F_GAMMA * np.power(xpos, F_GAMMA - 1.0) * diff
        ax = self.fp_c(x)
        d_c = self.bp_c((ax - b_c) / (ax + F_EPS))
        cost_c = np.sum(ax - b_c * np.log(ax + F_EPS))
        x = np.maximum(x - (lam_c / self.l_aps) * d_c + lam_h * d_h, 0)
        return x, float(np.linalg.norm(g - b_h)), cost_c

    def rescale_proj(self, x, b_h):
        g = self.eh.fp(self.sigma_pow(x)).reshape(F_NSL, len(F_HANG), N)
        b3 = b_h.reshape(F_NSL, len(F_HANG), N)
        bmax = b3.max(axis=(0, 2), keepdims=True)
        gmax = g.max(axis=(0, 2), keepdims=True)
        return (b3 / np.maximum(bmax, 1e-30) * gmax).reshape(F_NSL, -1)


@pytest.fixture(scope="module")
def fusion_setup():
    from tomojax.fusion import (
        make_fusion_system, weights_for_elements, fp4d, model_haadf,
    )

    yy, xx = np.mgrid[0:N, 0:N]
    e1 = 0.8 * (((xx - 12.0) ** 2 + (yy - 16.0) ** 2) < 36)
    e2 = 0.6 * (((xx - 21.0) ** 2 + (yy - 14.0) ** 2) < 25)
    gt = np.stack(
        [np.stack([e1] * F_NSL), np.stack([e2] * F_NSL)]
    ).astype(np.float32)
    w = np.asarray(weights_for_elements(["c", "au"], F_GAMMA, 3), np.float32)

    orc = FusionOracle(w)
    gt_rows = gt.reshape(F_NEL, F_NSL, N * N)
    b_c_nat = orc.fp_c(gt_rows)
    b_h_nat = orc.eh.fp(orc.sigma_pow(gt_rows))

    fsys = make_fusion_system(
        N, np.deg2rad(F_HANG), np.deg2rad(F_CANG), w, F_GAMMA
    )
    gt_j = jnp.asarray(gt)
    b_c_jax = fp4d(gt_j, fsys.chem)
    b_h_jax = jax.jit(lambda h: fp(h, fsys.haadf.geom))(
        model_haadf(gt_j, fsys)
    )
    return gt, gt_rows, w, orc, fsys, b_c_nat, b_h_nat, b_c_jax, b_h_jax


def _ml_curves(gt, gt_rows, orc, fsys, b_c_nat, b_c_jax, n_iter, lam):
    from tomojax.fusion import poisson_ml_step_4d

    xj = jnp.zeros((F_NEL, F_NSL, N, N), jnp.float32)
    xn = np.zeros_like(gt_rows)
    step = jax.jit(lambda x: poisson_ml_step_4d(x, b_c_jax, fsys, lam))
    cj, cn, rj, rn = [], [], [], []
    for _ in range(n_iter):
        xj, c = step(xj)
        cj.append(float(c))
        rj.append(np.asarray(ops.rmse_per_element(xj, jnp.asarray(gt))))
        xn, c2 = orc.poisson_ml(xn, b_c_nat, lam)
        cn.append(c2)
        rn.append(np.sqrt(((xn - gt_rows) ** 2).mean(axis=(1, 2))))
    return xj, xn, *(np.array(v) for v in (cj, cn, rj, rn))


def test_poisson_ml_4d_parity(fusion_setup):
    """4D chem-only Poisson-ML (multimodal.cpp:277-304). L_Aps gap
    jax 350.5 vs Siddon 352.3; measured curve gaps: cost 0.008
    (normalized), per-element rmse 0.0014."""
    gt, gt_rows, w, orc, fsys, b_c_nat, b_h_nat, b_c_jax, b_h_jax = fusion_setup
    _, _, cj, cn, rj, rn = _ml_curves(
        gt, gt_rows, orc, fsys, b_c_nat, b_c_jax, 12, 0.5
    )
    assert np.max(np.abs(cj / cj[0] - cn / cn[0])) < 0.02
    assert np.max(np.abs(rj - rn)) < 0.005
    assert cj[-1] < 0.9 * cj[0] and cn[-1] < 0.9 * cn[0]


def test_rescale_projections_parity(fusion_setup):
    """Per-HAADF-projection max-matching of bh to the model g
    (multimodal.cpp:307-328). Compare the per-angle scale factors
    gmax_a/bmax_a between engines; measured relative gap ~4% (the
    factor is a ratio of operator outputs — Joseph vs Siddon row sums)."""
    from tomojax.fusion import rescale_projections, rescale_tomograms

    gt, gt_rows, w, orc, fsys, b_c_nat, b_h_nat, b_c_jax, b_h_jax = fusion_setup
    xj, xn, *_ = _ml_curves(
        gt, gt_rows, orc, fsys, b_c_nat, b_c_jax, 12, 0.5
    )
    xj10 = rescale_tomograms(xj, 10.0)
    xn10 = xn * 10.0
    bh_j = np.asarray(
        jax.jit(lambda x, bh: rescale_projections(x, bh, fsys))(xj10, b_h_jax)
    )
    bh_n = orc.rescale_proj(xn10, b_h_nat)
    # factors: one scalar per angle (max over slices x detector)
    fj = bh_j.max(axis=(0, 2)) / np.asarray(b_h_jax).max(axis=(0, 2))
    fn = (
        bh_n.reshape(F_NSL, len(F_HANG), N).max(axis=(0, 2))
        / b_h_nat.reshape(F_NSL, len(F_HANG), N).max(axis=(0, 2))
    )
    assert np.max(np.abs(fj / fn - 1.0)) < 0.1
    assert fj.min() > 1.0  # the x10 rescale must actually inflate bh


def test_data_fusion_parity(fusion_setup):
    """Fused HAADF+chem update (multimodal.cpp:455-491 with the SIRT
    `fuse` of :427-441), 8 iterations from the rescaled chem recon.
    Measured gaps in the stable regime (lamH=0.02, lamC=0.05,
    iterSIRT=2): costHAADF 8.3e-4, costCHEM 2.8e-4 (normalized),
    per-element rmse 0.0076; both engines converge to 0.87x."""
    from tomojax.fusion import (
        data_fusion_step, rescale_projections, rescale_tomograms,
    )

    gt, gt_rows, w, orc, fsys, b_c_nat, b_h_nat, b_c_jax, b_h_jax = fusion_setup
    xj, xn, *_ = _ml_curves(
        gt, gt_rows, orc, fsys, b_c_nat, b_c_jax, 12, 0.5
    )
    xj = rescale_tomograms(xj, 10.0)
    xn = xn * 10.0
    bh_j = jax.jit(lambda x, bh: rescale_projections(x, bh, fsys))(xj, b_h_jax)
    bh_n = orc.rescale_proj(xn, b_h_nat)

    lam_h, lam_c, it = 0.02, 0.05, 2
    step = jax.jit(
        lambda x, bh: data_fusion_step(
            x, bh, b_c_jax, fsys, lam_h, lam_c, it
        )
    )
    chj, chn, ccj, ccn, rj, rn = [], [], [], [], [], []
    gtj = jnp.asarray(gt) * 10.0
    gt10 = gt_rows * 10.0
    for _ in range(8):
        xj, ch, cc = step(xj, bh_j)
        chj.append(float(ch))
        ccj.append(float(cc))
        rj.append(np.asarray(ops.rmse_per_element(xj, gtj)))
        xn, ch2, cc2 = orc.fuse_step(xn, bh_n, b_c_nat, lam_h, lam_c, it)
        chn.append(ch2)
        ccn.append(cc2)
        rn.append(np.sqrt(((xn - gt10) ** 2).mean(axis=(1, 2))))
    chj, chn, ccj, ccn, rj, rn = map(
        np.array, (chj, chn, ccj, ccn, rj, rn)
    )
    assert np.max(np.abs(chj / chj[0] - chn / chn[0])) < 5e-3
    assert np.max(np.abs(ccj / ccj[0] - ccn / ccn[0])) < 2e-3
    assert np.max(np.abs(rj - rn)) < 0.03
    # the fused update must actually reduce the HAADF cost in BOTH
    assert chj[-1] < 0.9 * chj[0] and chn[-1] < 0.9 * chn[0]
