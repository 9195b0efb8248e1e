"""Native C++ engine tests: exact agreement with the numpy Siddon oracle,
OpenMP sparse FP/BP correctness, ART/SIRT convergence, Poisson noise."""

import numpy as np
import pytest

from tomojax.projector import oracle
from tomojax.sim import shepp_logan

native = pytest.importorskip("tomojax.native")

N = 32
ANGLES = np.linspace(-70, 70, 20)


@pytest.fixture(scope="module")
def eng():
    try:
        native.build()
    except Exception as e:  # no compiler in env
        pytest.skip(f"native build failed: {e}")
    return native.CpuEngine(3, N, ANGLES)


def test_matrix_matches_numpy_oracle(eng):
    a_np = oracle.ray_matrix(N, ANGLES)
    a_cc = eng.A
    assert a_cc.shape == a_np.shape
    d = (a_cc.astype(np.float64) - a_np).tocoo()
    assert abs(d.data).max() if d.nnz else 0 < 1e-5
    # nnz structure identical
    assert a_cc.nnz == a_np.nnz


def test_fp_bp_match_scipy(eng):
    rng = np.random.default_rng(0)
    x = rng.uniform(0, 1, (3, N * N)).astype(np.float32)
    got = eng.fp(x)
    want = (eng.A @ x.T).T
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)
    y = rng.uniform(0, 1, (3, eng.nrow)).astype(np.float32)
    got_b = eng.bp(y)
    want_b = (eng.A.T @ y.T).T
    np.testing.assert_allclose(got_b, want_b, rtol=1e-4, atol=1e-4)


def test_art_and_sirt_converge(eng):
    ph = np.stack([shepp_logan(N)] * 3)
    eng.set_recon(np.zeros_like(ph))
    eng.set_sinogram(eng.fp(ph.reshape(3, -1)).reshape(3, -1))
    dd0 = eng.data_distance()
    eng.art(beta=0.5)
    dd1 = eng.data_distance()
    assert dd1 < dd0
    eng.set_recon(np.zeros_like(ph))
    eng.sirt(n_iter=60)
    eng.positivity()
    assert eng.rmse(ph.reshape(3, -1)) < 0.12
    eng.set_recon(np.zeros_like(ph))
    eng.sirt(n_iter=30, cimmino=True, beta=float(eng.nrow) / eng.lipschitz)
    assert eng.data_distance() < dd0


def test_reference_layout_roundtrip(eng):
    ph = np.stack([shepp_logan(N)] * 3)
    sino = eng.fp(ph.reshape(3, -1)).reshape(3, len(ANGLES), N)
    series = np.transpose(sino, (0, 2, 1))  # (Ns, Nray, Nangles)
    eng.set_tilt_series(series)
    np.testing.assert_allclose(eng.b.reshape(3, len(ANGLES), N), sino)


def test_poisson_noise(eng):
    eng.b[:] = 5.0
    total0 = eng.b.sum()
    eng.poisson_noise(500, seed=1)
    assert abs(eng.b.sum() - total0) / total0 < 0.05
    assert eng.b.std() > 0.01


def test_native_vs_jax_projector():
    """Cross-validation: the native exact projector and the JAX Joseph
    projector agree on a smooth phantom (different discretizations)."""
    import jax.numpy as jnp
    from tomojax.geometry import Geometry
    from tomojax.projector.joseph import fp as jfp

    try:
        native.build()
    except Exception as e:
        pytest.skip(f"native build failed: {e}")
    eng = native.CpuEngine(1, N, ANGLES)
    yy, xx = np.mgrid[0:N, 0:N]
    ph = np.exp(-(((xx - N / 2) / (N / 4)) ** 2 + ((yy - N / 2) / (N / 5)) ** 2))
    ph = ph.astype(np.float32)[None]
    p_native = eng.fp(ph.reshape(1, -1)).reshape(1, len(ANGLES), N)
    geom = Geometry.make(N, np.deg2rad(ANGLES))
    p_jax = np.asarray(jfp(jnp.asarray(ph), geom))
    rel = np.linalg.norm(p_native - p_jax) / np.linalg.norm(p_native)
    assert rel < 1e-2, rel


def test_update_proj_angles():
    """Dynamic operator growth (ctvlib.cpp:317-333): new angles extend
    A/b; existing measurement rows survive when the old angle set is a
    prefix of the new one."""
    import numpy as np
    from tomojax.native import CpuEngine
    from tomojax.sim import shepp_logan

    gt = np.stack([shepp_logan(32)] * 2).astype(np.float32)
    a1 = np.linspace(-60, 60, 10)
    e = CpuEngine(2, 32, a1)
    e.set_recon(gt)
    b1 = e.fp()
    e.b = b1.copy()
    nrow1 = e.nrow

    a2 = np.concatenate([a1, [65.0, 70.0]])
    e.update_proj_angles(a2)
    assert e.nrow > nrow1
    assert np.array_equal(e.b[:, :nrow1], b1)
    assert np.all(e.b[:, nrow1:] == 0)
    # solver still converges with the grown operator once data arrives
    e.set_recon(gt)
    e.b = e.fp()
    e.set_recon(np.zeros_like(gt))
    d0 = e.data_distance()
    e.sirt_astra(5)
    assert e.data_distance() < 0.7 * d0
