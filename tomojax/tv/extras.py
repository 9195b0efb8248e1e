"""Extra TV denoisers: Chambolle dual projection and Split-Bregman.

The reference *intended* to ship these (gpu/utils/regularizers/
tv_chambolle.cu and chemistry/utils/regularizers/tv_sb.cu) but both files
do not compile — Python-style syntax and undefined variables — and are
excluded from the build (SURVEY.md N13). These are working, from-the-paper
implementations:

  * chambolle: A. Chambolle, "An algorithm for total variation
    minimization and applications" (2004) — fixed-point dual iteration
    p <- (p + tau grad(div p - x/lam)) / (1 + tau |...|), tau = 1/4 for
    2D, 1/6 for 3D; denoised = x - lam div(p).
  * split_bregman: Goldstein & Osher, "The split Bregman method for
    L1-regularized problems" (2009) — anisotropic TV via alternating
    Gauss-Seidel-free updates (gradient descent on the quadratic
    subproblem) + shrinkage + Bregman updates.

Both operate on (..., nx, ny, nz) with zero-flux boundaries and are
jit/shard friendly (same stencil structure as tv_fgp).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from tomojax.tv import _fdiff, _bdiff_accum


def _grad3(x, ax):
    return (_fdiff(x, ax[0]), _fdiff(x, ax[1]), _fdiff(x, ax[2]))


def _div3(p1, p2, p3, ax):
    return (
        _bdiff_accum(p1, ax[0])
        + _bdiff_accum(p2, ax[1])
        + _bdiff_accum(p3, ax[2])
    )


def tv_chambolle(x, n_iter: int = 20, lam: float = 0.1, tau: float = 1.0 / 12.0):
    """Chambolle-projection TV denoise. Returns (denoised, tv_of_input)."""
    from tomojax import tv as tvmod

    a = x.ndim
    ax = (a - 3, a - 2, a - 1)
    tv0 = tvmod.tv(x)

    def body(_, ps):
        # Chambolle's `div` is the NEGATIVE transpose of the gradient
        # (⟨∇u, p⟩ = −⟨u, div p⟩); our `_div3` is the positive transpose,
        # hence the sign flips relative to the paper's notation.
        p1, p2, p3 = ps
        neg_div_p = -_div3(p1, p2, p3, ax)
        g1, g2, g3 = _grad3(neg_div_p - x / lam, ax)
        mag = jnp.sqrt(g1 * g1 + g2 * g2 + g3 * g3)
        denom = 1.0 + tau * mag
        return (
            (p1 + tau * g1) / denom,
            (p2 + tau * g2) / denom,
            (p3 + tau * g3) / denom,
        )

    z = jnp.zeros_like(x)
    p1, p2, p3 = jax.lax.fori_loop(0, n_iter, body, (z, z, z))
    den = x + lam * _div3(p1, p2, p3, ax)
    return den, tv0


def tv_split_bregman(
    x,
    n_iter: int = 10,
    lam: float = 0.1,
    mu: float = 2.0,
    n_inner: int = 2,
    nonneg: bool = True,
):
    """Split-Bregman anisotropic-TV denoise of x.

    Solves min_u lam*sum|grad u|_1 + 0.5||u - x||^2 via splitting
    d = grad u with penalty mu. Returns (denoised, tv_of_input)."""
    from tomojax import tv as tvmod

    a = x.ndim
    ax = (a - 3, a - 2, a - 1)
    tv0 = tvmod.tv(x)
    shrink = lambda v, t: jnp.sign(v) * jnp.maximum(jnp.abs(v) - t, 0.0)

    def body(_, carry):
        u, d1, d2, d3, b1, b2, b3 = carry
        # quadratic subproblem: (I + mu grad^T grad) u = x + mu div(d - b)
        # solved by a few gradient-descent steps (step 1/(1+6 mu) stable).
        rhs_div = _div3(d1 - b1, d2 - b2, d3 - b3, ax)

        def inner(_, u):
            g1, g2, g3 = _grad3(u, ax)
            lap = _div3(g1, g2, g3, ax)
            grad_obj = (u - x) + mu * (lap - rhs_div)
            return u - grad_obj / (1.0 + 6.0 * mu)

        u = jax.lax.fori_loop(0, n_inner, inner, u)
        if nonneg:
            u = jnp.maximum(u, 0.0)
        g1, g2, g3 = _grad3(u, ax)
        d1 = shrink(g1 + b1, lam / mu)
        d2 = shrink(g2 + b2, lam / mu)
        d3 = shrink(g3 + b3, lam / mu)
        b1 = b1 + g1 - d1
        b2 = b2 + g2 - d2
        b3 = b3 + g3 - d3
        return u, d1, d2, d3, b1, b2, b3

    z = jnp.zeros_like(x)
    u, *_ = jax.lax.fori_loop(0, n_iter, body, (x, z, z, z, z, z, z))
    return u, tv0
