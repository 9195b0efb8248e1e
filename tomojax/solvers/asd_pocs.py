"""ASD-POCS (adaptive steepest descent — projection onto convex sets).

Follows the reference's *working* driver loop
(tomofusion/cpu/sim_ASD.py:65-96 and examples/sim_ASD.py:67-94 — the
TomoGPU.asd_pocs method has undefined-name bugs, SURVEY.md §2.5):

  per iteration i:
    x0 = x;  x = SART(x, beta);  beta *= beta_red
    dp = ||x - x0||          (dPOCS = alpha * dp on the first iteration)
    dd = ||A x - b||
    x1 = x;  x = TV-GD(x, ng, dPOCS);  dg = ||x - x1||
    if dg > r_max * dp and dd > eps:  dPOCS *= alpha_red

The device-side iteration is a single jitted function returning the
metrics; the scalar adaptation (dPOCS, beta) stays on the host exactly
like the reference — scalars enter as traced arguments so no recompiles.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from tomojax.solvers.base import System
from tomojax.solvers.iterative import sart_sweep
from tomojax.projector.joseph import fp
from tomojax import tv as tvmod


class AsdPocsParams(NamedTuple):
    """Default recipe = reference defaults (reconstructor.py:157-162)."""

    niter: int = 100
    eps: float = 0.025
    beta0: float = 0.25
    beta_red: float = 0.9985
    r_max: float = 0.95
    ng: int = 10
    alpha: float = 0.2
    alpha_red: float = 0.95


def make_asd_pocs_iteration(sys: System, inv_col_a, ng: int):
    """Build the jitted per-iteration function with ng baked in."""

    @jax.jit
    def run(x, b, beta, dpocs, order):
        x0 = x
        x = sart_sweep(x, b, sys, inv_col_a, beta, order)
        dp = jnp.sqrt(jnp.sum((x - x0) ** 2))
        resid = fp(x, sys.geom) - b
        dd = jnp.sqrt(jnp.sum(resid * resid))
        x1 = x
        x, tv0 = tvmod.tv_gd(x, ng, dpocs)
        dg = jnp.sqrt(jnp.sum((x - x1) ** 2))
        return x, dp, dd, dg, tv0

    return run
