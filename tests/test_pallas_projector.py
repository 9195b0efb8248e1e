"""Pallas projector kernels (projector/pallas_joseph.py) vs the XLA paths.

Runs in interpret mode on the CPU test mesh (tests/conftest.py). The
kernels implement the same unified Joseph closed form as the XLA 'gather'
mode (the strict-adjoint reference); at HIGHEST precision they must agree
to f32 rounding, and the emulated-HIGH split to ~1e-4 absolute.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tomojax import config as tjconfig
from tomojax.geometry import Geometry
from tomojax.projector.joseph import bp, fp
from tomojax.projector.pallas_joseph import bp_pallas, fp_pallas

HI = jax.lax.Precision.HIGHEST

SHAPES = [(5, 33, 7), (8, 32, 12), (3, 16, 1), (130, 24, 9)]


def _problem(ns, n, na, seed=0):
    rng = np.random.default_rng(seed)
    geom = Geometry.make(n, np.deg2rad(np.linspace(-76, 76, na)))
    x = jnp.asarray(rng.normal(size=(ns, n, n)).astype(np.float32))
    y = jnp.asarray(rng.normal(size=(ns, na, n)).astype(np.float32))
    return geom, x, y


@pytest.mark.parametrize("ns,n,na", SHAPES)
def test_fp_matches_gather(ns, n, na):
    geom, x, _ = _problem(ns, n, na)
    ref = fp(x, geom, mode="gather")
    got = fp_pallas(x, geom, precision=HI, interpret=True)
    np.testing.assert_allclose(got, ref, rtol=1e-4, atol=1e-4)


@pytest.mark.parametrize("ns,n,na", SHAPES)
def test_bp_matches_gather(ns, n, na):
    geom, _, y = _problem(ns, n, na)
    ref = bp(y, geom, mode="gather")
    got = bp_pallas(y, geom, precision=HI, interpret=True)
    np.testing.assert_allclose(got, ref, rtol=1e-4, atol=1e-4)


def test_adjointness_tolerance():
    geom, x, y = _problem(6, 32, 11)
    ax = fp_pallas(x, geom, precision=HI, interpret=True)
    aty = bp_pallas(y, geom, precision=HI, interpret=True)
    lhs = float(jnp.vdot(ax, y))
    rhs = float(jnp.vdot(x, aty))
    assert abs(lhs - rhs) <= 1e-5 * max(abs(lhs), abs(rhs), 1.0)


def test_high_precision_split_close():
    geom, x, _ = _problem(4, 32, 9)
    ref = fp(x, geom, mode="gather")
    got = fp_pallas(x, geom, precision=jax.lax.Precision.HIGH, interpret=True)
    scale = float(jnp.max(jnp.abs(ref)))
    np.testing.assert_allclose(got, ref, atol=5e-5 * scale)


def test_dispatch_via_config():
    geom, x, y = _problem(4, 16, 5)
    old = tjconfig.projector_mode
    try:
        tjconfig.set_projector_mode("pallas")
        # jax.default_backend() == 'cpu' in tests -> interpret mode
        got_fp = fp(x, geom)
        got_bp = bp(y, geom)
    finally:
        tjconfig.set_projector_mode(old)
    np.testing.assert_allclose(got_fp, fp(x, geom, mode="gather"),
                               rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(got_bp, bp(y, geom, mode="gather"),
                               rtol=1e-4, atol=1e-4)


def test_empty_angles_falls_back():
    geom = Geometry.make(16, np.zeros((0,)))
    old = tjconfig.projector_mode
    try:
        tjconfig.set_projector_mode("pallas")
        out = fp(jnp.ones((2, 16, 16)), geom)
    finally:
        tjconfig.set_projector_mode(old)
    assert out.shape == (2, 0, 16)


def test_shard_map_pallas_matches_unsharded():
    """shard_map-wrapped per-shard Pallas FP/BP == unsharded kernel on
    the virtual mesh (the data term is slice-parallel with zero
    cross-device traffic, so per-shard kernels are legal — reference
    MPI slabs likewise exchange nothing for FP/BP,
    mpi_astra_ctvlib.cpp:211-231)."""
    import jax
    from tomojax import dist
    from tomojax.projector.sharded import fp_sharded, bp_sharded
    from tomojax.projector.pallas_joseph import fp_pallas, bp_pallas

    ns, n, na = 16, 16, 7
    geom = Geometry.make(n, np.deg2rad(np.linspace(-60, 60, na)))
    rng = np.random.default_rng(11)
    x = jnp.asarray(rng.random((ns, n, n), np.float32))
    mesh = dist.make_mesh()

    ref = fp_pallas(x, geom, interpret=True)
    got = jax.jit(lambda v: fp_sharded(v, geom, mesh))(
        dist.shard_volume(x, mesh)
    )
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=1e-5, atol=1e-5)

    y = ref
    ref_b = bp_pallas(y, geom, interpret=True)
    got_b = jax.jit(lambda v: bp_sharded(v, geom, mesh))(
        dist.shard_volume(y, mesh)
    )
    np.testing.assert_allclose(np.asarray(got_b), np.asarray(ref_b),
                               rtol=1e-5, atol=1e-5)


def test_dispatch_sharded_pallas_via_config():
    """With a registered multi-device mesh and pallas mode, joseph.fp/bp
    route through the shard_map-wrapped kernels (the sharded-TPU fast
    path: measured 3.0x over the XLA mxu scan per chip on v5e); batches
    whose slice axis does not divide the mesh fall back to mxu."""
    import jax
    from tomojax import config as tjconfig
    from tomojax import dist
    from tomojax.projector.joseph import fp, bp

    ns, n, na = 16, 16, 7
    geom = Geometry.make(n, np.deg2rad(np.linspace(-60, 60, na)))
    rng = np.random.default_rng(12)
    x = jnp.asarray(rng.random((ns, n, n), np.float32))
    ref = fp(x, geom, mode="mxu")
    mesh = dist.make_mesh()
    try:
        tjconfig.set_mesh(mesh)
        tjconfig.set_projector_mode("pallas")
        got = jax.jit(lambda v: fp(v, geom))(dist.shard_volume(x, mesh))
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                                   rtol=1e-4, atol=1e-5)
        got_b = jax.jit(lambda v: bp(v, geom))(dist.shard_volume(ref, mesh))
        np.testing.assert_allclose(
            np.asarray(got_b), np.asarray(bp(ref, geom, mode="mxu")),
            rtol=1e-4, atol=1e-5,
        )
        # non-divisible batch: falls back to mxu instead of failing
        x_odd = x[:3]
        got_odd = fp(x_odd, geom)
        np.testing.assert_allclose(
            np.asarray(got_odd), np.asarray(fp(x_odd, geom, mode="mxu")),
            rtol=1e-5, atol=1e-6,
        )
    finally:
        tjconfig.set_mesh(None)
        tjconfig.set_projector_mode("auto")


def test_banded_kernels_match_dense():
    """Tile-banded FP/BP (window tables + dynamic j-slices) == the dense
    kernels, including the fused SIRT epilogue and non-multiple angle
    counts. Interpret-mode; n=256 -> 2 c-tiles per row."""
    from tomojax.projector.pallas_joseph import fp_pallas_sl, bp_pallas_sl

    n, na, ns = 256, 21, 8
    geom = Geometry.make(n, np.deg2rad(np.linspace(-76, 76, na)))
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(n, n, ns)).astype(np.float32))
    y = jnp.asarray(rng.normal(size=(na, n, ns)).astype(np.float32))
    yv = jnp.asarray(rng.normal(size=(n, n, ns)).astype(np.float32))
    ic = jnp.asarray(rng.random((n, n)).astype(np.float32))
    try:
        tjconfig.set_banded_projector("off")
        fp_ref = fp_pallas_sl(x, geom, interpret=True)
        bp_ref = bp_pallas_sl(y, geom, interpret=True)
        bpf_ref = bp_pallas_sl(y, geom, interpret=True,
                               y_vol=yv, inv_col2d=ic)
        tjconfig.set_banded_projector("on")
        fp_b = fp_pallas_sl(x, geom, interpret=True)
        bp_b = bp_pallas_sl(y, geom, interpret=True)
        bpf_b = bp_pallas_sl(y, geom, interpret=True,
                             y_vol=yv, inv_col2d=ic)
    finally:
        tjconfig.set_banded_projector("auto")
    np.testing.assert_allclose(np.asarray(fp_b), np.asarray(fp_ref),
                               atol=2e-5)
    np.testing.assert_allclose(np.asarray(bp_b), np.asarray(bp_ref),
                               atol=2e-5)
    np.testing.assert_allclose(np.asarray(bpf_b), np.asarray(bpf_ref),
                               atol=2e-5)


def test_band_windows_cover_support():
    """Every nonzero Joseph weight lies inside its tile's j-window: the
    window tables are a covering, so banding can never drop weight."""
    from tomojax.projector.pallas_joseph import (
        _band_windows_fp, _band_windows_bp, _BAND_CT, _round_up,
    )

    n, na = 256, 33
    geom = Geometry.make(n, np.deg2rad(np.linspace(-80, 80, na)))
    a_blk = 16
    na_pad = _round_up(na, a_blk)
    j0f, jwf, nct = _band_windows_fp(geom, a_blk, na_pad, n)
    j0f = np.asarray(j0f)
    off = (geom.nray - 1) / 2.0
    cols = np.arange(n) - (n - 1) / 2.0
    for r in (0, 100, n - 1):
        yr = (n - 1) / 2.0 - r
        for a in range(na):
            ab = a // a_blk
            js = geom.cos[a] * cols + geom.sin[a] * yr + off  # (n,)
            for t in range(nct):
                seg = js[t * _BAND_CT:(t + 1) * _BAND_CT]
                lo, hi = seg.min() - 1, seg.max() + 1
                assert j0f[ab, r, t] <= max(np.floor(lo), 0)
                assert j0f[ab, r, t] + jwf >= min(np.ceil(hi), geom.nray - 1)


def test_fp_band_windows_row_grouped_cover():
    """At n>512 the FP window table is row-grouped (SMEM budget); the
    grouped windows must still cover every row's support."""
    from tomojax.projector.pallas_joseph import (
        _band_windows_fp, _fp_row_group, _BAND_CT, _round_up,
    )

    n, na, a_blk = 1024, 90, 16
    geom = Geometry.make(n, np.deg2rad(np.linspace(-76, 76, na)))
    rg = _fp_row_group(n)
    assert rg > 1
    j0, jw, nct = _band_windows_fp(geom, a_blk, _round_up(na, a_blk), n)
    j0 = np.asarray(j0)
    assert j0.shape == (_round_up(na, a_blk) // a_blk, n // rg, nct)
    off = (geom.nray - 1) / 2.0
    cols = np.arange(n) - (n - 1) / 2.0
    rng = np.random.default_rng(0)
    for r in rng.integers(0, n, size=6):
        yr = (n - 1) / 2.0 - r
        for a in (0, na // 2, na - 1):
            ab = a // a_blk
            js = geom.cos[a] * cols + geom.sin[a] * yr + off
            for t in range(nct):
                seg = js[t * _BAND_CT:(t + 1) * _BAND_CT]
                g = int(r) // rg
                assert j0[ab, g, t] <= max(np.floor(seg.min() - 1), 0)
                assert j0[ab, g, t] + jw >= min(
                    np.ceil(seg.max() + 1), geom.nray - 1
                )
