"""Pallas TPU kernel for the isotropic TV subgradient (tv_gd.cu math).

Computes the 4-term divided-difference TV gradient in one fused plane-wise
pass. Uses the same identity as the XLA path (tv/__init__.py::_tv_grad):
the three "neighbor" denominators are the forward denominator field D
evaluated at shifted voxels, so a program that sees planes (i-1, i, i+1)
— delivered via periodic shifted BlockSpec index maps — can produce the
full gradient for plane i:

    g_i = (3 x_i - x_{i+1} - jp - kp)/D_i + (x_i - x_{i-1})/D_{i-1}
        + (x_i - jm)/roll_y(D_i) + (x_i - km)/roll_x(D_i)

Periodic boundaries in all three axes (tv_gd.cu:27-47 semantics). The
normalized descent step and positivity stay in XLA (they need the global
gradient norm — a psum-style reduction).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

from tomojax.tv.pallas_fgp import _tv_compiler_params

EPS_TV = 1e-6


def _roll_y(a, shift):
    return jnp.roll(a, shift, axis=0)


def _roll_x(a, shift):
    return jnp.roll(a, shift, axis=1)


def _denom(center, znext):
    """Forward denominator D for a plane given its +z neighbor plane."""
    jp = _roll_y(center, -1)
    kp = _roll_x(center, -1)
    return jnp.sqrt(
        EPS_TV
        + (center - znext) ** 2
        + (center - jp) ** 2
        + (center - kp) ** 2
    )


def _grad_kernel(xp_ref, xc_ref, xn_ref, g_ref):
    xp = xp_ref[0]
    xc = xc_ref[0]
    xn = xn_ref[0]
    d_cur = _denom(xc, xn)
    d_prev = _denom(xp, xc)
    jp = _roll_y(xc, -1)
    kp = _roll_x(xc, -1)
    jm = _roll_y(xc, 1)
    km = _roll_x(xc, 1)
    g = (3.0 * xc - xn - jp - kp) / d_cur
    g = g + (xc - xp) / d_prev
    g = g + (xc - jm) / _roll_y(d_cur, 1)
    g = g + (xc - km) / _roll_x(d_cur, 1)
    g_ref[0] = g


def tv_grad_pallas(x, interpret: bool | None = None):
    """Fused TV subgradient: (nz, ny, nx) -> same shape."""
    if interpret is None:
        interpret = jax.default_backend() == "cpu"
    nz, ny, nx = x.shape
    spec = pl.BlockSpec((1, ny, nx), lambda i: (i, 0, 0))
    spec_prev = pl.BlockSpec((1, ny, nx), lambda i: ((i - 1) % nz, 0, 0))
    spec_next = pl.BlockSpec((1, ny, nx), lambda i: ((i + 1) % nz, 0, 0))
    return pl.pallas_call(
        _grad_kernel,
        grid=(nz,),
        in_specs=[spec_prev, spec, spec_next],
        out_specs=spec,
        out_shape=jax.ShapeDtypeStruct(x.shape, x.dtype),
        compiler_params=_tv_compiler_params(nx),
        interpret=interpret,
    )(x, x, x)


def tv_gd_pallas(x, ng: int, dpocs, interpret: bool | None = None):
    """`ng` normalized TV-subgradient steps + positivity, Pallas gradient.

    Matches tomojax.tv.tv_gd for 3D inputs (global-norm normalization)."""
    from tomojax import tv as tvmod

    tv0 = tvmod.tv(x)

    def body(_, xx):
        g = tv_grad_pallas(xx, interpret=interpret)
        nrm = jnp.sqrt(jnp.sum(g * g))
        return xx - dpocs * g / nrm

    x = jax.lax.fori_loop(0, ng, body, x)
    return jnp.maximum(x, 0.0), tv0
