"""Pallas TV-value kernel: one streaming pass over the volume.

The XLA stencil `tv()` (tv/__init__.py, reference tv_gd.cu:220-269
semantics: isotropic, periodic wrap, eps=1e-6) materializes rolled
copies and measured 1.16 ms at 256^3 on v5e; inside the FISTA metric it
is the single largest non-kernel cost. This kernel reads each plane
block once (plus the periodic next-plane halo via a wrapped BlockSpec
index map) and accumulates per-block partial sums into an SMEM scalar —
~67 MB of traffic, ~0.15 ms at the HBM roofline.

Accumulation note: per-block sums are vector tree-reductions (Mosaic's
jnp.sum lowering); only the ~nz/pb partials accumulate sequentially in
f32, so the result matches the XLA reduction to ~1e-6 relative at
256-class sizes (pinned by tests/test_pallas_tv.py::
test_tv_value_kernel_matches_stencil).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from tomojax.tv.pallas_fgp import _fused_plane_block, _tv_compiler_params

EPS_TV = 1e-6


def _tv_value_kernel(pb, x_ref, xn_ref, out_ref):
    e = pl.program_id(0)
    i = pl.program_id(1)

    @pl.when((e == 0) & (i == 0))
    def _():
        out_ref[0, 0] = jnp.float32(0.0)

    xx = jnp.concatenate([x_ref[0], xn_ref[0]], axis=0)  # (pb+1, ny, nx)
    c = xx[:-1]
    zp = xx[1:]
    jp = jnp.roll(c, -1, axis=1)
    kp = jnp.roll(c, -1, axis=2)
    t = jnp.sqrt(
        EPS_TV + (c - zp) ** 2 + (c - jp) ** 2 + (c - kp) ** 2
    )
    out_ref[0, 0] += jnp.sum(t)


def tv_value_pallas(x, interpret: bool | None = None):
    """Isotropic periodic TV value of (nz, ny, nx) or (nel, nz, ny, nx)
    (per-element TVs summed, like tv()'s batch reduction)."""
    if interpret is None:
        interpret = jax.default_backend() == "cpu"
    squeeze = x.ndim == 3
    x4 = x[None] if squeeze else x
    nel, nz, ny, nx = x4.shape
    pb = _fused_plane_block(nz)
    nblk = nz // pb
    blk = pl.BlockSpec((1, pb, ny, nx), lambda e, i: (e, i, 0, 0))
    # periodic next plane: the plane after the block, wrapping to 0
    plane_next = pl.BlockSpec(
        (1, 1, ny, nx), lambda e, i: (e, ((i + 1) * pb) % nz, 0, 0)
    )
    out = pl.pallas_call(
        partial(_tv_value_kernel, pb),
        grid=(nel, nblk),
        in_specs=[blk, plane_next],
        out_specs=pl.BlockSpec(
            (1, 1), lambda e, i: (0, 0), memory_space=pltpu.SMEM
        ),
        out_shape=jax.ShapeDtypeStruct((1, 1), jnp.float32),
        compiler_params=_tv_compiler_params(nx),
        interpret=interpret,
    )(x4, x4)
    return out[0, 0]
