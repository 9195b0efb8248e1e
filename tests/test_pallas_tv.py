"""Pallas FGP kernel tests (interpret mode on CPU): exact agreement with
the XLA stencil implementation and with the numpy port of the reference
CUDA loop."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from tomojax import tv as tvmod
from tomojax.tv.pallas_fgp import tv_fgp_pallas
from tomojax import config as tjconfig


def _vol(shape=(6, 16, 16), seed=0):
    rng = np.random.default_rng(seed)
    return jnp.asarray(rng.uniform(0, 1, shape).astype(np.float32))


@pytest.mark.parametrize("iters", [1, 3, 7])
def test_pallas_matches_xla(iters):
    x = _vol()
    ref, tv_ref = tvmod.tv_fgp(x, iters, 0.15)
    got, tv_got = tv_fgp_pallas(x, iters, 0.15, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=1e-6)
    assert float(tv_ref) == float(tv_got)


def test_pallas_boundaries():
    """Boundary planes (z=0 and z=nz-1) carry the zero-flux semantics."""
    x = jnp.zeros((4, 8, 8), jnp.float32).at[0].set(1.0).at[-1].set(2.0)
    ref, _ = tvmod.tv_fgp(x, 5, 0.1)
    got, _ = tv_fgp_pallas(x, 5, 0.1, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=1e-6)


def test_pallas_tvgd_matches_xla():
    from tomojax.tv.pallas_tvgd import tv_gd_pallas, tv_grad_pallas

    x = _vol((6, 16, 16), 2)
    g_ref = tvmod._tv_grad(x)
    g_got = tv_grad_pallas(x, interpret=True)
    np.testing.assert_allclose(np.asarray(g_got), np.asarray(g_ref), atol=1e-5)
    for ng in (1, 5):
        ref, tvr = tvmod.tv_gd(x, ng, 0.3)
        got, tvg = tv_gd_pallas(x, ng, 0.3, interpret=True)
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=1e-5)
        assert float(tvr) == float(tvg)


def test_dispatch_respects_config():
    x = _vol()
    ref, _ = tvmod.tv_fgp(x, 2, 0.1)  # cpu backend -> auto == xla
    tjconfig.set_tv_impl("xla")
    try:
        xla_out, _ = tvmod.tv_fgp(x, 2, 0.1)
    finally:
        tjconfig.set_tv_impl("auto")
    np.testing.assert_allclose(np.asarray(xla_out), np.asarray(ref))
    assert not tjconfig.use_pallas_tv()  # cpu in tests
    with pytest.raises(AssertionError):
        tjconfig.set_tv_impl("gpu-only")


@pytest.mark.parametrize("iters,shape", [(1, (8, 16, 16)), (4, (12, 16, 16)),
                                         (10, (16, 24, 24)), (7, (5, 12, 12))])
def test_fused_matches_twopass(iters, shape):
    """The fused obj+grad kernel (n-1 fused iters + final obj) is an
    exact reformulation of the two-pass path; results agree to f32
    rounding (compiler may re-associate/FMA differently)."""
    from tomojax.tv.pallas_fgp import tv_fgp_pallas_fused

    rng = np.random.default_rng(3)
    x = jnp.asarray(rng.normal(size=shape).astype(np.float32)) + 0.5
    ref, tv_ref = tv_fgp_pallas(x, iters, 0.2, interpret=True)
    got, tv_got = tv_fgp_pallas_fused(x, iters, 0.2, interpret=True,
                                      dual_dtype=jnp.float32)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=2e-6, atol=2e-6)
    assert float(tv_got) == float(tv_ref)


def test_fused_bf16_duals_close():
    """bf16 dual storage (the default perf knob, config.fgp_dual_dtype)
    perturbs the denoised volume by ~lam * 2^-9 only — the duals are
    unit-ball bounded, arithmetic stays f32 (tv/pallas_fgp.py)."""
    from tomojax.tv.pallas_fgp import tv_fgp_pallas_fused

    rng = np.random.default_rng(5)
    lam = 0.2
    x = jnp.asarray(rng.normal(size=(8, 16, 16)).astype(np.float32)) + 0.5
    ref, _ = tv_fgp_pallas_fused(x, 6, lam, interpret=True,
                                 dual_dtype=jnp.float32)
    got, _ = tv_fgp_pallas_fused(x, 6, lam, interpret=True,
                                 dual_dtype=jnp.bfloat16)
    assert got.dtype == jnp.float32
    err = float(jnp.max(jnp.abs(got - ref)))
    assert err < lam * 3e-2, err
    # and the default config routes through bf16
    from tomojax import config as tjconfig
    assert jnp.dtype(tjconfig.fgp_dual_dtype) == jnp.bfloat16


def test_fgp_4d_element_batching():
    """The fused kernel takes 4D input directly: the element axis folds
    into the pallas grid (reference chemistry tv_fgp.cu:192-287
    semantics: elements never couple; no per-element kernel chains)."""
    from tomojax.tv.pallas_fgp import tv_fgp_pallas_fused
    from tomojax.tv import tv_fgp

    rng = np.random.default_rng(5)
    x = jnp.asarray(rng.normal(size=(2, 8, 12, 12)).astype(np.float32)) + 0.4
    ref, tv_ref = tv_fgp(x, 5, 0.1)  # XLA 4D path on CPU
    got, tv0 = tv_fgp_pallas_fused(x, 5, 0.1, interpret=True,
                                   dual_dtype=jnp.float32)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=2e-6, atol=2e-6)
    np.testing.assert_allclose(float(tv0), float(tv_ref), rtol=1e-6)


def test_fgp_4d_grid_equals_per_element():
    """4D-grid output == per-element 3D invocations (the element grid
    axis is pure batching; boundary logic stays within each element)."""
    from tomojax.tv.pallas_fgp import tv_fgp_pallas_fused

    rng = np.random.default_rng(6)
    x = jnp.asarray(rng.normal(size=(3, 8, 12, 12)).astype(np.float32)) + 0.4
    got, _ = tv_fgp_pallas_fused(x, 6, 0.15, interpret=True,
                                 dual_dtype=jnp.float32)
    for e in range(3):
        ref_e, _ = tv_fgp_pallas_fused(x[e], 6, 0.15, interpret=True,
                                       dual_dtype=jnp.float32)
        np.testing.assert_allclose(
            np.asarray(got[e]), np.asarray(ref_e), rtol=1e-6, atol=1e-6
        )


@pytest.mark.parametrize("iters", [3, 4, 5, 9])
@pytest.mark.parametrize("shape", [(8, 16, 16), (12, 16, 16)])
def test_fused2_matches_xla(iters, shape):
    """The two-iterations-per-pass kernel (intermediate duals in
    registers) reproduces the XLA stencil FGP exactly at f32 duals, for
    odd and even iteration counts and across block boundaries."""
    from tomojax.tv.pallas_fgp import tv_fgp_pallas_fused
    from tomojax.tv import tv_fgp

    rng = np.random.default_rng(7)
    x = jnp.asarray(rng.normal(size=shape).astype(np.float32)) + 0.5
    ref, tv_ref = tv_fgp(x, iters, 0.2)
    got, tv_got = tv_fgp_pallas_fused(x, iters, 0.2, interpret=True,
                                      dual_dtype=jnp.float32,
                                      fuse_pairs=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=3e-6, atol=3e-6)
    np.testing.assert_allclose(float(tv_got), float(tv_ref), rtol=1e-6)


@pytest.mark.parametrize("iters", [1, 4, 7])
def test_sharded_fgp_matches_unsharded(iters):
    """shard_map FGP (per-shard fused kernels + 1-plane ppermute halos)
    == the unsharded XLA stencil result, on the 8-device virtual mesh.
    This is the reference's MPI halo-ring TV path
    (mpi_astra_ctvlib.cpp:360-386) at fused-kernel efficiency."""
    from tomojax import dist
    from tomojax.tv.pallas_fgp_sharded import tv_fgp_sharded

    rng = np.random.default_rng(9)
    x = jnp.asarray(rng.normal(size=(16, 16, 16)).astype(np.float32)) + 0.5
    ref, tv_ref = tvmod.tv_fgp(x, iters, 0.2)
    mesh = dist.make_mesh()
    xs = dist.shard_volume(x, mesh)
    got, tv_got = jax.jit(
        lambda v: tv_fgp_sharded(v, iters, 0.2, mesh,
                                 dual_dtype=jnp.float32)
    )(xs)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=3e-6, atol=3e-6)
    np.testing.assert_allclose(float(tv_got), float(tv_ref), rtol=1e-6)


def test_sharded_fgp_dispatch_via_config():
    """tv_fgp routes through the shard_map kernels when a multi-device
    mesh is registered and pallas is forced (CPU backend otherwise keeps
    the XLA stencils)."""
    from tomojax import dist

    rng = np.random.default_rng(10)
    x = jnp.asarray(rng.normal(size=(16, 16, 16)).astype(np.float32)) + 0.5
    ref, _ = tvmod.tv_fgp(x, 4, 0.15)
    mesh = dist.make_mesh()
    try:
        tjconfig.set_mesh(mesh)
        tjconfig.set_tv_impl("pallas", dual_dtype=jnp.float32)
        got, _ = jax.jit(lambda v: tvmod.tv_fgp(v, 4, 0.15))(
            dist.shard_volume(x, mesh)
        )
    finally:
        tjconfig.set_mesh(None)
        tjconfig.set_tv_impl("auto", dual_dtype=jnp.bfloat16)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=3e-6, atol=3e-6)


def test_sharded_tvgd_matches_unsharded():
    """shard_map TV-GD (per-shard fused gradient kernel + periodic
    ppermute halo RING + global psum norm) == the unsharded XLA stencil
    result on the 8-device virtual mesh. This is the reference's MPI
    ASD-POCS TV loop (mpi_ctvlib.cpp:495-558) at fused-kernel efficiency,
    with the documented global-norm deviation (SURVEY.md §3.3)."""
    from tomojax import dist
    from tomojax.tv.pallas_tvgd_sharded import tv_gd_sharded

    rng = np.random.default_rng(11)
    x = jnp.asarray(rng.normal(size=(16, 16, 16)).astype(np.float32)) + 0.5
    ref, tv_ref = tvmod.tv_gd(x, 5, 0.07)
    mesh = dist.make_mesh()
    xs = dist.shard_volume(x, mesh)
    got, tv_got = jax.jit(
        lambda v, dp: tv_gd_sharded(v, 5, dp, mesh)
    )(xs, jnp.float32(0.07))
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=3e-5, atol=3e-6)
    np.testing.assert_allclose(float(tv_got), float(tv_ref), rtol=1e-6)


def test_sharded_tvgd_periodic_ring():
    """The z-halo is a RING: the gradient at plane 0 must see plane
    nz-1 (periodic BCs, tv_gd.cu:27-47) — a zero-fill halo would give a
    different (open-boundary) answer. Use a field that varies sharply at
    the wrap seam so a wrong halo is detectable."""
    from tomojax import dist
    from tomojax.tv.pallas_tvgd_sharded import tv_gd_sharded

    nz = 16
    x = np.ones((nz, 8, 8), np.float32)
    x[0] = 4.0
    x[-1] = -2.0  # sharp wrap-seam contrast
    x = jnp.asarray(x)
    ref, _ = tvmod.tv_gd(x, 3, 0.1)
    mesh = dist.make_mesh()
    got, _ = jax.jit(
        lambda v, dp: tv_gd_sharded(v, 3, dp, mesh)
    )(dist.shard_volume(x, mesh), jnp.float32(0.1))
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=3e-5, atol=3e-6)


def test_sharded_tvgd_dispatch_via_config():
    """tv_gd routes through the shard_map kernel when a multi-device
    mesh is in scope and pallas is forced."""
    from tomojax import dist

    rng = np.random.default_rng(12)
    x = jnp.asarray(rng.normal(size=(16, 16, 16)).astype(np.float32)) + 0.5
    ref, _ = tvmod.tv_gd(x, 4, 0.05)
    mesh = dist.make_mesh()
    try:
        tjconfig.set_tv_impl("pallas")
        with tjconfig.mesh_scope(mesh):
            got, _ = jax.jit(lambda v: tvmod.tv_gd(v, 4, 0.05))(
                dist.shard_volume(x, mesh)
            )
    finally:
        tjconfig.set_tv_impl("auto")
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=3e-5, atol=3e-6)


def test_tv_value_kernel_matches_stencil():
    """One-pass Pallas TV value == the XLA stencil (periodic, eps=1e-6),
    3D and 4D, including the z-wrap at the last plane block."""
    from tomojax.tv.pallas_tv_value import tv_value_pallas

    rng = np.random.default_rng(13)
    x3 = jnp.asarray(rng.normal(size=(16, 16, 16)).astype(np.float32))
    ref3 = float(tvmod.tv(x3))
    got3 = float(tv_value_pallas(x3, interpret=True))
    assert np.isclose(got3, ref3, rtol=1e-6)
    x4 = jnp.asarray(rng.normal(size=(3, 8, 16, 16)).astype(np.float32))
    ref4 = float(tvmod.tv(x4))
    got4 = float(tv_value_pallas(x4, interpret=True))
    assert np.isclose(got4, ref4, rtol=5e-6)
    # wrap sensitivity: change ONLY plane 0, TV at plane nz-1 must move
    x3b = x3.at[0].add(1.0)
    d_ref = float(tvmod.tv(x3b)) - ref3
    d_got = float(tv_value_pallas(x3b, interpret=True)) - got3
    assert np.isclose(d_got, d_ref, rtol=1e-4)


def test_sharded_4d_tv_fast_paths():
    """4D chemistry TV (FGP + GD) on a slice-axis-sharded stack routes
    through the element-mapped shard_map kernels and matches the
    unsharded XLA result (the reference's multi-GPU per-element 4D TV,
    chemistry tv_fgp.cu:192-287 / multigpufusion.cpp)."""
    from jax.sharding import NamedSharding, PartitionSpec as P
    from tomojax import dist

    rng = np.random.default_rng(14)
    x = jnp.asarray(rng.normal(size=(3, 16, 16, 16)).astype(np.float32)) + 0.5
    ref_f, tvf = tvmod.tv_fgp_4d(x, 4, 0.15)
    ref_g, tvg = tvmod.tv_gd_4d(x, 4, 0.05)
    mesh = dist.make_mesh()
    xs = jax.device_put(x, NamedSharding(mesh, P(None, "z", None, None)))
    try:
        tjconfig.set_tv_impl("pallas", dual_dtype=jnp.float32)
        with tjconfig.mesh_scope(mesh):
            got_f, tvf2 = jax.jit(lambda v: tvmod.tv_fgp_4d(v, 4, 0.15))(xs)
            got_g, tvg2 = jax.jit(lambda v: tvmod.tv_gd_4d(v, 4, 0.05))(xs)
    finally:
        tjconfig.set_tv_impl("auto", dual_dtype=jnp.bfloat16)
    np.testing.assert_allclose(np.asarray(got_f), np.asarray(ref_f),
                               rtol=3e-6, atol=3e-6)
    np.testing.assert_allclose(np.asarray(got_g), np.asarray(ref_g),
                               rtol=3e-5, atol=3e-6)
    assert np.isclose(float(tvf2), float(tvf), rtol=5e-6)
    assert np.isclose(float(tvg2), float(tvg), rtol=5e-6)


def test_fgp_momentum_epilogue_matches_composition():
    """tv_fgp_pallas_fused(mom=(x_old, beta)) == (d, d + beta (d - x_old)):
    the fused Nesterov extrapolation must be exactly the separate
    elementwise pass it replaces (solvers/fista.py fista_step_sl)."""
    from tomojax.tv.pallas_fgp import tv_fgp_pallas_fused

    rng = np.random.default_rng(21)
    x = jnp.asarray(rng.normal(size=(8, 16, 16)).astype(np.float32)) + 0.4
    x_old = jnp.asarray(rng.normal(size=(8, 16, 16)).astype(np.float32))
    beta = jnp.float32(0.37)
    d_ref, tv_ref = tv_fgp_pallas_fused(
        x, 4, 0.1, interpret=True, dual_dtype=jnp.float32
    )
    d, y, tv0 = tv_fgp_pallas_fused(
        x, 4, 0.1, interpret=True, dual_dtype=jnp.float32,
        mom=(x_old, beta),
    )
    np.testing.assert_array_equal(np.asarray(d), np.asarray(d_ref))
    np.testing.assert_allclose(
        np.asarray(y), np.asarray(d_ref + beta * (d_ref - x_old)),
        rtol=1e-6, atol=1e-6,
    )
    assert np.isclose(float(tv0), float(tv_ref))
    # beta is traced (the FISTA momentum scalar): must work under jit
    d2, y2, _ = jax.jit(
        lambda b: tv_fgp_pallas_fused(
            x, 4, 0.1, interpret=True, dual_dtype=jnp.float32, mom=(x_old, b)
        )
    )(beta)
    np.testing.assert_allclose(np.asarray(y2), np.asarray(y), rtol=1e-6)


def test_fgp_transposed_big_plane_dispatch_matches():
    """Round-5 lane-padding fix: 3D inputs whose trailing dim is below
    128 lanes but whose planes are big (the 1024-class slice-last
    layout) run TRANSPOSED through the fused kernels (measured 1.7x on
    v5e; FGP is axis-permutation invariant). Pin transposed == direct,
    with and without the fused Nesterov epilogue, by lowering the
    plane-size gate to hit the path at test size."""
    import tomojax.tv.pallas_fgp as pf

    rng = np.random.default_rng(5)
    x = jnp.asarray(rng.random((32, 128, 16), dtype=np.float32))
    xo = jnp.asarray(rng.random((32, 128, 16), dtype=np.float32))
    kw = dict(interpret=True, dual_dtype=jnp.float32)
    d_ref, tv_ref = pf.tv_fgp_pallas_fused(x, 5, 0.1, **kw)
    dm_ref, ym_ref, _ = pf.tv_fgp_pallas_fused(
        x, 5, 0.1, mom=(xo, jnp.float32(0.4)), **kw
    )
    assert x.shape[2] < 128 <= x.shape[1]
    prev = pf._TRANSPOSE_PLANE_BYTES
    pf._TRANSPOSE_PLANE_BYTES = 1024
    try:
        d_t, tv_t = pf.tv_fgp_pallas_fused(x, 5, 0.1, **kw)
        dm_t, ym_t, _ = pf.tv_fgp_pallas_fused(
            x, 5, 0.1, mom=(xo, jnp.float32(0.4)), **kw
        )
    finally:
        pf._TRANSPOSE_PLANE_BYTES = prev
    np.testing.assert_allclose(np.asarray(d_t), np.asarray(d_ref),
                               rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(np.asarray(dm_t), np.asarray(dm_ref),
                               rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(np.asarray(ym_t), np.asarray(ym_ref),
                               rtol=1e-5, atol=1e-5)
    assert float(tv_t) == pytest.approx(float(tv_ref), rel=1e-5)
