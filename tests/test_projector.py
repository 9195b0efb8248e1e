"""Projector pair tests: oracle agreement + adjoint consistency.

Strategy follows SURVEY.md §4: the reference CPU ray generator
(tomofusion/cpu/utils/pytvlib.py:8-121) is an exact, self-contained oracle
for the parallel-beam operator; adjointness <Ax, y> == <x, A^T y> is the
property ASTRA gave the reference implicitly.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest
from functools import partial

from tomojax.geometry import Geometry
from tomojax.projector.joseph import fp, bp, fp_adjointable
from tomojax.projector.oracle import ray_matrix, fp_oracle
from tomojax.solvers.base import bp_single_angle


def _smooth_phantom(n, ns=2):
    yy, xx = np.mgrid[0:n, 0:n]
    ph = np.exp(
        -(((xx - n / 2) / (n / 4)) ** 2 + ((yy - n / 2.5) / (n / 5)) ** 2)
    ).astype(np.float32)
    return np.stack([ph * (0.5 + 0.5 * s) for s in range(ns)])


ANGLE_SETS = [
    np.linspace(-70, 70, 25),
    np.linspace(0, 180, 13, endpoint=False),
    np.array([0.0, 30.0, 45.0, 60.0, 90.0, 135.0]),
]


@pytest.mark.parametrize("angles_deg", ANGLE_SETS, ids=["tilt", "half", "mixed"])
def test_fp_matches_siddon_oracle(angles_deg):
    n = 32
    geom = Geometry.make(n, np.deg2rad(angles_deg))
    x = _smooth_phantom(n)
    p = np.asarray(jax.jit(partial(fp, geom=geom))(jnp.asarray(x)))
    a = ray_matrix(n, angles_deg)
    p_ref = fp_oracle(a, x.astype(np.float64))
    rel = np.linalg.norm(p - p_ref) / np.linalg.norm(p_ref)
    # Joseph vs Siddon are different discretizations; agreement on a
    # smooth phantom should be sub-percent.
    assert rel < 1e-2, rel


@pytest.mark.parametrize("mode", ["gather", "mxu"])
@pytest.mark.parametrize("angles_deg", ANGLE_SETS, ids=["tilt", "half", "mixed"])
def test_adjoint_dot_product(angles_deg, mode):
    n = 32
    geom = Geometry.make(n, np.deg2rad(angles_deg))
    rng = np.random.default_rng(0)
    x = rng.standard_normal((2, n, n)).astype(np.float32)
    y = rng.standard_normal((2, len(angles_deg), n)).astype(np.float32)
    lhs = np.vdot(
        np.asarray(jax.jit(partial(fp, geom=geom, mode=mode))(jnp.asarray(x))), y
    )
    rhs = np.vdot(
        x, np.asarray(jax.jit(partial(bp, geom=geom, mode=mode))(jnp.asarray(y)))
    )
    # Weights computed in f32 through two algebraically-identical paths;
    # mismatch is bounded by rounding noise of the path (see joseph.py).
    assert abs(lhs - rhs) / max(abs(lhs), 1e-6) < 1e-3


def test_mxu_matches_gather():
    """The MXU one-hot contraction is the same operator as the gather path
    (to matmul rounding at the configured precision)."""
    n = 32
    geom = Geometry.make(n, np.deg2rad(np.linspace(-70, 70, 25)))
    x = jnp.asarray(_smooth_phantom(n))
    p_g = np.asarray(fp(x, geom, "gather"))
    p_m = np.asarray(fp(x, geom, "mxu"))
    assert np.linalg.norm(p_m - p_g) / np.linalg.norm(p_g) < 1e-4
    y = jnp.asarray(
        np.random.default_rng(0).standard_normal((2, 25, n)).astype(np.float32)
    )
    b_g = np.asarray(bp(y, geom, "gather"))
    b_m = np.asarray(bp(y, geom, "mxu"))
    assert np.linalg.norm(b_m - b_g) / np.linalg.norm(b_g) < 1e-4


def test_bp_is_exact_transpose_structurally():
    """Dense-matrix check on a tiny problem: BP^T == FP elementwise to f32
    weight rounding (gather mode — the strict-adjoint path)."""
    n = 6
    angles = np.deg2rad([-52.5, 20.0, 80.0])
    geom = Geometry.make(n, angles)
    na = len(angles)
    fpj = jax.jit(partial(fp, geom=geom, mode="gather"))
    bpj = jax.jit(partial(bp, geom=geom, mode="gather"))
    a_fp = np.zeros((na * n, n * n))
    for k in range(n * n):
        e = np.zeros((1, n, n), np.float32)
        e.flat[k] = 1
        a_fp[:, k] = np.asarray(fpj(jnp.asarray(e))).ravel()
    a_bp = np.zeros((n * n, na * n))
    for k in range(na * n):
        e = np.zeros((1, na, n), np.float32)
        e.flat[k] = 1
        a_bp[:, k] = np.asarray(bpj(jnp.asarray(e))).ravel()
    assert np.abs(a_fp - a_bp.T).max() < 5e-6


def test_single_angle_consistency():
    n = 16
    angles = np.deg2rad([-60.0, 10.0, 45.0, 100.0])
    geom = Geometry.make(n, angles)
    rng = np.random.default_rng(1)
    y = rng.standard_normal((2, len(angles), n)).astype(np.float32)
    b_full = np.asarray(bp(jnp.asarray(y), geom, "gather"))
    b_sum = np.zeros_like(b_full)
    for a in range(len(angles)):
        b_sum += np.asarray(
            bp_single_angle(
                jnp.asarray(y[:, a, :]),
                jnp.float32(geom.cos[a]),
                jnp.float32(geom.sin[a]),
                n,
            )
        )
    np.testing.assert_allclose(b_sum, b_full, rtol=0, atol=1e-4)


def test_custom_vjp_links_pair():
    n = 16
    geom = Geometry.make(n, np.deg2rad(np.linspace(-60, 60, 9)))
    x = jnp.asarray(_smooth_phantom(n))
    y = jnp.ones((2, 9, n))
    _, vjp = jax.vjp(lambda v: fp_adjointable(v, geom), x)
    (gx,) = vjp(y)
    np.testing.assert_allclose(
        np.asarray(gx), np.asarray(bp(y, geom)), rtol=0, atol=1e-5
    )


def test_nonsquare_batch_and_empty_branch():
    """All angles in one driving branch (e.g. all near 0 deg) must work."""
    n = 16
    geom = Geometry.make(n, np.deg2rad(np.linspace(-20, 20, 5)))
    assert geom.row_driven.all()
    x = jnp.asarray(_smooth_phantom(n, ns=3))
    p = fp(x, geom)
    assert p.shape == (3, 5, n)
    assert bool(jnp.isfinite(p).all())
    back = bp(p, geom)
    assert back.shape == (3, n, n)


def test_fbp_window_closed_forms():
    """The realized frequency responses equal ramp * analytic window for
    the classical CT filters — independent closed-form rewrites, so a
    regression in _window/make_filter can't hide (VERDICT round-2 ask #7;
    parameter provenance documented in projector/filters.py)."""
    from tomojax.projector.filters import make_filter

    nray = 128
    ramp, m = make_filter("ram-lak", nray)
    u = np.fft.rfftfreq(m) / 0.5  # normalized frequency in [0, 1]
    forms = {
        "shepp-logan": np.sinc(u / 2.0),
        "hamming": 0.54 + 0.46 * np.cos(np.pi * u),
        "hann": 0.5 * (1.0 + np.cos(np.pi * u)),
        "cosine": np.cos(np.pi * u / 2.0),
    }
    for name, w in forms.items():
        resp, m2 = make_filter(name, nray)
        assert m2 == m
        np.testing.assert_allclose(resp, ramp * w, rtol=1e-6, atol=1e-9)
    # parameterized windows: documented choices (kaiser beta=4,
    # gaussian sigma=1/3, tukey alpha=0.5) pinned at spot frequencies
    kaiser, _ = make_filter("kaiser", nray)
    np.testing.assert_allclose(
        kaiser / np.maximum(ramp, 1e-30),
        np.i0(4.0 * np.sqrt(np.maximum(0.0, 1.0 - u**2))) / np.i0(4.0),
        rtol=1e-5,
    )
    gauss, _ = make_filter("gaussian", nray)
    np.testing.assert_allclose(
        gauss / np.maximum(ramp, 1e-30), np.exp(-4.5 * u**2), rtol=1e-5
    )
    tukey, _ = make_filter("tukey", nray)
    ratio = tukey / np.maximum(ramp, 1e-30)
    np.testing.assert_allclose(ratio[u <= 0.5], 1.0, rtol=1e-6)
    mid = np.argmin(np.abs(u - 0.75))
    assert np.isclose(ratio[mid], 0.5, atol=0.02)  # cos taper midpoint
