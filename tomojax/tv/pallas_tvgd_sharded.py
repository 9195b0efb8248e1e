"""shard_map TV-GD: fused Pallas subgradient kernel on z-slab shards.

Closes the round-2 gap where sharded ASD-POCS — the reference's flagship
MPI workload (mpi_ctvlib.cpp:495-558, examples/sim_ASD.py) — fell back to
the XLA stencil formulation for its TV-GD loop while FGP already had
per-shard fused kernels. Each device runs the fused 4-term
divided-difference gradient kernel (tv/pallas_tvgd.py math, tv_gd.cu:52-106
semantics) on its local slab and exchanges ONE x-plane per direction per
descent step over ICI with `jax.lax.ppermute` — the same communication
volume as the reference's per-tv_gd-call MPI halo ring
(mpi_ctvlib.cpp:400-422).

Boundary mechanics: TV-GD uses **periodic** boundary conditions in all
three axes (tv_gd.cu:27-47), so unlike the FGP kernels (zero-BC, open
chain) the halo exchange here is a full ring — shard 0's left neighbor is
shard n-1. In-plane periodicity stays `jnp.roll` inside the kernel.

Documented deviation (SURVEY.md §3.3, carried over from the unsharded
path): the reference's multi-rank TV-GD normalizes each step by the
*local* slab gradient norm (tv_gd.cu:194-195 is never all-reduced) and
exchanges halos only once per tv_gd call, not per inner step. We compute
the global `psum` norm and exchange halos every step, so sharded ==
unsharded by construction (enforced by
tests/test_pallas_tv.py::test_sharded_tvgd_matches_unsharded).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.sharding import PartitionSpec as P

from tomojax.dist import SLAB_AXIS
from tomojax.tv.pallas_fgp import _fused_plane_block, _tv_compiler_params

EPS_TV = 1e-6


def _grad_kernel_halo(pb, x_ref, xp_ref, xn_ref, xl_ref, xh_ref, g_ref):
    """TV subgradient for a PB-plane block of a LOCAL slab.

    Receives x planes [b0-1 .. b0+pb] where the below/above planes come
    from the in-slab clamped neighbors (`xp_ref`/`xn_ref`) for interior
    blocks and from the ring halos (`xl_ref`/`xh_ref`) at the slab ends.
    Same identity as tv/pallas_tvgd.py::_grad_kernel: the three neighbor
    denominators are the forward denominator field D at shifted voxels.
    """
    i = pl.program_id(0)
    nblk = pl.num_programs(0)
    low = jnp.where(i == 0, xl_ref[:], xp_ref[:])
    high = jnp.where(i == nblk - 1, xh_ref[:], xn_ref[:])
    xx = jnp.concatenate([low, x_ref[:], high], axis=0)  # (pb+2, ny, nx)

    # forward denominators D at planes [b0-1 .. b0+pb-1] (pb+1 planes)
    c = xx[:-1]
    nz_next = xx[1:]
    jp = jnp.roll(c, -1, axis=1)
    kp = jnp.roll(c, -1, axis=2)
    d = jnp.sqrt(
        EPS_TV + (c - nz_next) ** 2 + (c - jp) ** 2 + (c - kp) ** 2
    )

    xc = xx[1:-1]  # output planes
    xn = xx[2:]
    xp = xx[:-2]
    jpc = jnp.roll(xc, -1, axis=1)
    kpc = jnp.roll(xc, -1, axis=2)
    jmc = jnp.roll(xc, 1, axis=1)
    kmc = jnp.roll(xc, 1, axis=2)
    d_cur = d[1:]
    d_prev = d[:-1]
    g = (3.0 * xc - xn - jpc - kpc) / d_cur
    g = g + (xc - xp) / d_prev
    g = g + (xc - jmc) / jnp.roll(d_cur, 1, axis=1)
    g = g + (xc - kmc) / jnp.roll(d_cur, 1, axis=2)
    g_ref[:] = g


def tv_gd_sharded(x, ng: int, dpocs, mesh, interpret: bool | None = None):
    """`ng` globally-normalized TV-subgradient steps + positivity on a
    z-slab-sharded (nz, ny, nx) volume. Returns (x_new, tv_of_input),
    matching tomojax.tv.tv_gd (3D, global norm) to f32 reduction order."""
    from tomojax import tv as tvmod

    if interpret is None:
        interpret = jax.default_backend() == "cpu"
    nshards = mesh.shape[SLAB_AXIS]
    nz, ny, nx = x.shape
    assert nz % nshards == 0, (nz, nshards)
    nz_loc = nz // nshards
    pb = _fused_plane_block(nz_loc)
    nblk = nz_loc // pb

    tv0 = tvmod.tv(x)  # XLA stencil: rolls lower to halo collectives

    blk = pl.BlockSpec((pb, ny, nx), lambda i: (i, 0, 0))
    plane_prev = pl.BlockSpec(
        (1, ny, nx), lambda i: (jnp.maximum(i * pb - 1, 0), 0, 0)
    )
    plane_next = pl.BlockSpec(
        (1, ny, nx), lambda i: (jnp.minimum(i * pb + pb, nz_loc - 1), 0, 0)
    )
    halo = pl.BlockSpec((1, ny, nx), lambda i: (0, 0, 0))
    grad = pl.pallas_call(
        partial(_grad_kernel_halo, pb),
        grid=(nblk,),
        in_specs=[blk, plane_prev, plane_next, halo, halo],
        out_specs=blk,
        out_shape=jax.ShapeDtypeStruct((nz_loc, ny, nx), jnp.float32),
        compiler_params=_tv_compiler_params(nx),
        interpret=interpret,
    )

    # periodic ring: every shard has both neighbors (mod nshards) —
    # unlike the FGP zero-BC chain, shard 0 wraps to shard n-1.
    to_right = [(j, (j + 1) % nshards) for j in range(nshards)]
    to_left = [(j, (j - 1) % nshards) for j in range(nshards)]

    def local(xs, dp):
        def body(_, xx):
            xl = jax.lax.ppermute(xx[-1:], SLAB_AXIS, to_right)
            xh = jax.lax.ppermute(xx[:1], SLAB_AXIS, to_left)
            g = grad(xx, xx, xx, xl, xh)
            nrm = jnp.sqrt(
                jax.lax.psum(jnp.sum(g * g), SLAB_AXIS)
            )
            return xx - dp * g / nrm

        xs = jax.lax.fori_loop(0, ng, body, xs)
        return jnp.maximum(xs, 0.0)

    x_new = jax.shard_map(
        local, mesh=mesh,
        in_specs=(P(SLAB_AXIS, None, None), P()),
        out_specs=P(SLAB_AXIS, None, None),
        check_vma=False,
    )(x, jnp.float32(dpocs))
    return x_new, tv0
