"""Elementwise/reduction op tests (reference matrix_ops.cu semantics)."""

import numpy as np
import jax
import jax.numpy as jnp

from tomojax import ops


def test_soft_threshold():
    x = jnp.asarray([-2.0, -0.5, 0.0, 0.3, 1.5])
    got = np.asarray(ops.soft_threshold(x, 1.0))
    np.testing.assert_allclose(got, [-1.0, 0.0, 0.0, 0.0, 0.5])


def test_nesterov():
    x = jnp.asarray([1.0, 2.0])
    xo = jnp.asarray([0.0, 1.0])
    np.testing.assert_allclose(
        np.asarray(ops.nesterov(x, xo, 0.5)), [1.5, 2.5]
    )


def test_positivity_and_background():
    x = jnp.asarray([-1.0, 0.0, 2.0])
    np.testing.assert_allclose(np.asarray(ops.positivity(x)), [0.0, 0.0, 2.0])
    np.testing.assert_allclose(
        np.asarray(ops.set_background(x, 9.0)), [-1.0, 9.0, 2.0]
    )


def test_norms_and_rmse():
    rng = np.random.default_rng(0)
    a = rng.standard_normal((3, 4, 5)).astype(np.float32)
    b = rng.standard_normal((3, 4, 5)).astype(np.float32)
    assert np.isclose(float(ops.norm2(jnp.asarray(a))), np.linalg.norm(a), rtol=1e-5)
    assert np.isclose(float(ops.l1_norm(jnp.asarray(a))), np.abs(a).sum(), rtol=1e-5)
    assert np.isclose(
        float(ops.rmse(jnp.asarray(a), jnp.asarray(b))),
        np.sqrt(np.mean((a - b) ** 2)),
        rtol=1e-5,
    )
    per = ops.rmse_per_element(jnp.asarray(a), jnp.asarray(b))
    assert per.shape == (3,)


def test_poisson_noise_preserves_scale():
    key = jax.random.PRNGKey(0)
    b = jnp.ones((4, 10, 10)) * 5.0
    noisy = ops.poisson_noise(key, b, 200)
    # mean preserved within sampling error; variance nonzero
    assert abs(float(jnp.mean(noisy)) - 5.0) < 0.1
    assert float(jnp.std(noisy)) > 0.05


def test_poisson_noise_does_not_mutate_input():
    """The native sampler writes in place — the public op must copy
    (regression: np.ascontiguousarray returned the caller's buffer)."""
    key = jax.random.PRNGKey(1)
    b_jax = jnp.full((3, 8, 8), 10.0)
    before = np.asarray(b_jax).copy()
    _ = ops.poisson_noise(key, b_jax, 50)
    np.testing.assert_array_equal(np.asarray(b_jax), before)
    b_np = np.full((3, 8, 8), 10.0, np.float32)
    before_np = b_np.copy()
    _ = ops.poisson_noise(key, b_np, 50)
    np.testing.assert_array_equal(b_np, before_np)


def test_poisson_noise_sharded_pod_safe():
    """Sharded sinogram: global mean via one psum'd scalar, per-shard
    local corruption (the reference's MPI design,
    mpi_astra_ctvlib.cpp:152-173) — the result keeps the slab sharding,
    preserves the mean, and is deterministic in (key, layout)."""
    from tomojax import dist

    mesh = dist.make_mesh(8)
    rng = np.random.default_rng(4)
    b = jnp.asarray(rng.uniform(1.0, 3.0, (16, 10, 32)).astype(np.float32))
    bs = dist.shard_volume(b, mesh)
    key = jax.random.PRNGKey(7)
    noisy = ops.poisson_noise(key, bs, 200)
    assert noisy.sharding.is_equivalent_to(bs.sharding, 3)
    # mean preserved to Poisson statistics (relative sd ~ 1/sqrt(N*200))
    ratio = float(jnp.sum(noisy)) / float(jnp.sum(b))
    assert abs(ratio - 1.0) < 0.01
    # actually corrupted, and deterministically so
    assert float(jnp.max(jnp.abs(noisy - bs))) > 0
    noisy2 = ops.poisson_noise(key, bs, 200)
    np.testing.assert_array_equal(np.asarray(noisy), np.asarray(noisy2))
    # different shards got different noise streams (seed mixing works)
    a0 = np.asarray(noisy)[0] - np.asarray(b)[0]
    a1 = np.asarray(noisy)[2] - np.asarray(b)[2]
    assert np.abs(a0 - a1).max() > 0
