"""Elementwise / reduction volume ops.

TPU-native equivalents of the reference's CUDA container kernels
(tomofusion/gpu/utils/container/matrix_ops.cu — norm/l1/sum, squared
difference reductions, positivity clamp, background fill, soft threshold,
Nesterov momentum; SURVEY.md N8/N10). There each call does its own
malloc → H2D → kernel → D2H round trip; here they are plain jnp functions
that XLA fuses into the surrounding jitted solver step, so most of them
cost zero extra HBM traffic.

All functions work on arrays of any shape (3D ``(Ns, N, N)`` volumes or 4D
``(Nel, Ns, N, N)`` chemistry stacks) unless noted.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np


def positivity(x):
    """Clamp negatives to zero (matrix_ops.cu:266-293)."""
    return jnp.maximum(x, 0.0)


def set_background(x, value):
    """Fill exact zeros with `value` (matrix_ops.cu:295-321)."""
    return jnp.where(x == 0.0, value, x)


def soft_threshold(x, lam):
    """sign(x) * max(|x| - lam, 0) (matrix_ops.cu:64-75)."""
    return jnp.sign(x) * jnp.maximum(jnp.abs(x) - lam, 0.0)


def nesterov(xk, xk_old, beta):
    """y = x + beta (x - x_old) (matrix_ops.cu:77-86)."""
    return xk + beta * (xk - xk_old)


def norm2(x):
    """Frobenius norm sqrt(sum x^2) (matrix_ops.cu cuda_norm)."""
    return jnp.sqrt(jnp.sum(x * x))


def l1_norm(x):
    return jnp.sum(jnp.abs(x))


def euclidean_dist(a, b):
    """sqrt(sum (a-b)^2) — reference matrix_2norm (tomoengine.cpp:407)."""
    d = a - b
    return jnp.sqrt(jnp.sum(d * d))


def rmse(x, ref):
    """Root-mean-square error vs ground truth (tomoengine.cpp:430)."""
    d = x - ref
    return jnp.sqrt(jnp.mean(d * d))


def rmse_per_element(x, ref):
    """Per-element RMSE vector for 4D chemistry volumes
    (chemistry/utils/multimodal.cpp:503-505)."""
    d = x - ref
    return jnp.sqrt(jnp.mean(d * d, axis=tuple(range(1, x.ndim))))


def data_distance(g, b):
    """Unnormalized ||g - b||_F between model and measured projections
    (tomoengine.cpp:410-413 — deliberately unnormalized, SURVEY.md §2.5)."""
    return euclidean_dist(g, b)


def poisson_noise(key, b, n_counts: int):
    """Poisson-corrupt a sinogram at a mean count level.

    Functional version of reference tomoengine.cpp:471-484: scale so the
    mean *total* is `n_counts * size / sum`, draw Poisson, scale back.

    Sampling happens on the HOST (native OpenMP C++ when available, numpy
    otherwise) like the reference's std::poisson_distribution loop:
    `jax.random.poisson` at high count levels is a rejection sampler that
    took minutes on the remote TPU backend for 256-class sinograms.
    """
    b_host = np.asarray(b)
    seed = int(np.asarray(jax.random.key_data(key)).ravel()[-1]) & 0x7FFFFFFF
    try:
        from tomojax import native

        # forced copy: np.ascontiguousarray can return the caller's own
        # buffer (or a zero-copy view of a jax array) and the native
        # kernel writes in place
        noisy = np.array(b_host, np.float32)
        native.lib().poisson_noise(noisy, noisy.size, int(n_counts), seed)
    except Exception:
        total = float(b_host.sum())
        scale = n_counts * b_host.size / total
        rng = np.random.default_rng(seed)
        noisy = (rng.poisson(b_host * scale) / scale).astype(b_host.dtype)
    return jnp.asarray(noisy, jnp.float32)
