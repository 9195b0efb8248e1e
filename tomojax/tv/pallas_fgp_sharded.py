"""shard_map FGP: fused Pallas TV-prox kernels on z-slab-sharded volumes.

The fused single-device FGP kernel (tv/pallas_fgp.py) needs the whole
z-extent local, so sharded runs previously fell back to the XLA stencil
formulation (~10x slower per iteration at 256^3: ~4 ms vs 0.38 ms).
Here each device runs the fused kernel on its local slab and exchanges
ONE boundary plane per dual field per iteration over ICI
(`jax.lax.ppermute`) — the identical communication volume to the
reference's MPI halo ring (mpi_astra_ctvlib.cpp:360-386: one slice each
way before every TV call), and to what the XLA stencil's
collective-permutes move, but with the single-device kernel's HBM
efficiency.

Boundary mechanics: `lax.ppermute` writes ZEROS into shards with no
source, so the bottom shard's left p1-halo is automatically the
reference's zero-divergence low boundary (tv_fgp.cu:56-62). The top
shard must apply the zero-forward-difference mask at its last plane
(tv_fgp.cu:79-88) while interior shards instead consume a right halo —
two kernel instantiations selected by `lax.cond` on the shard index.

Semantics: bit-identical (up to f32 rounding / the bf16 dual-storage
knob) to the unsharded fused kernel — enforced by
tests/test_pallas_tv.py::test_sharded_fgp_matches_unsharded on the
virtual mesh.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.sharding import PartitionSpec as P

from tomojax.dist import SLAB_AXIS
from tomojax.tv.pallas_fgp import _fused_plane_block, _tv_compiler_params


def _fused_kernel_halo(lam, multip, pb, nz, mask_top,
                       x_ref, xn_ref, xh_ref,
                       p1_ref, p1p_ref, p1n_ref, p1l_ref, p1h_ref,
                       p2_ref, p2n_ref, p2h_ref,
                       p3_ref, p3n_ref, p3h_ref,
                       o1_ref, o2_ref, o3_ref):
    """One FGP iteration for a PB-plane block of a LOCAL slab.

    Same math as pallas_fgp._fused_kernel, with the global-boundary
    clamps replaced by halo planes: `*l_ref` = last plane of the left
    neighbor's field (zeros at the bottom shard), `*h_ref` = first plane
    of the right neighbor's (x, p1, p2, p3). `mask_top` (static) selects
    top-shard semantics (zero z-forward-difference at the last plane)
    vs interior (consume the right halo)."""
    i = pl.program_id(1)
    nblk = pl.num_programs(1)
    f32 = jnp.float32

    def nxt(blk_next_ref, halo_ref):
        # plane nz..: the right halo for the last block, else the
        # in-slab clamped "next" plane
        return jnp.where(i == nblk - 1, halo_ref[0], blk_next_ref[0])

    xx = jnp.concatenate([x_ref[0], nxt(xn_ref, xh_ref)], axis=0)
    p2 = jnp.concatenate(
        [p2_ref[0], nxt(p2n_ref, p2h_ref)], axis=0
    ).astype(f32)
    p3 = jnp.concatenate(
        [p3_ref[0], nxt(p3n_ref, p3h_ref)], axis=0
    ).astype(f32)
    # p1 planes i*pb-1 .. i*pb+pb; the plane below the slab comes from
    # the left halo (zeros at the bottom shard = reference low boundary)
    low = jnp.where(i == 0, p1l_ref[0], p1p_ref[0])
    p1f = jnp.concatenate(
        [low, p1_ref[0], nxt(p1n_ref, p1h_ref)], axis=0
    ).astype(f32)

    _, n_r, n_c = xx.shape
    div = p1f[1:] - p1f[:-1]
    div += p2 - jnp.concatenate(
        [jnp.zeros((pb + 1, 1, n_c), p2.dtype), p2[:, :-1, :]], axis=1
    )
    div += p3 - jnp.concatenate(
        [jnp.zeros((pb + 1, n_r, 1), p3.dtype), p3[:, :, :-1]], axis=2
    )
    d = jnp.maximum(xx - lam * div, 0.0)

    g1 = d[:-1] - d[1:]
    if mask_top:
        zloc = jax.lax.broadcasted_iota(jnp.int32, (pb, 1, 1), 0)
        g1 = jnp.where((i == nblk - 1) & (zloc == pb - 1), 0.0, g1)
    db = d[:-1]
    g2 = jnp.concatenate(
        [db[:, :-1, :] - db[:, 1:, :], jnp.zeros((pb, 1, n_c), d.dtype)],
        axis=1,
    )
    g3 = jnp.concatenate(
        [db[:, :, :-1] - db[:, :, 1:], jnp.zeros((pb, n_r, 1), d.dtype)],
        axis=2,
    )
    p1 = p1f[1:-1] + multip * g1
    p2 = p2[:-1] + multip * g2
    p3 = p3[:-1] + multip * g3
    denom = p1 * p1 + p2 * p2 + p3 * p3
    scale = jnp.where(denom > 1.0, jax.lax.rsqrt(denom), 1.0)
    o1_ref[0] = (p1 * scale).astype(o1_ref.dtype)
    o2_ref[0] = (p2 * scale).astype(o2_ref.dtype)
    o3_ref[0] = (p3 * scale).astype(o3_ref.dtype)


def _obj_kernel_halo(lam, x_ref, p1_ref, p1m_ref, p1l_ref,
                     p2_ref, p3_ref, d_ref):
    """Final obj pass with the left p1-halo instead of the zero clamp
    (zeros arrive naturally at the bottom shard)."""
    i = pl.program_id(1)
    f32 = jnp.float32
    p1 = p1_ref[0, 0].astype(f32)
    p2 = p2_ref[0, 0].astype(f32)
    p3 = p3_ref[0, 0].astype(f32)
    n_r, n_c = p2.shape
    prev = jnp.where(
        i == 0, p1l_ref[0, 0].astype(f32), p1m_ref[0, 0].astype(f32)
    )
    div = p1 - prev
    div += p2 - jnp.concatenate(
        [jnp.zeros((1, n_c), p2.dtype), p2[:-1, :]], axis=0
    )
    div += p3 - jnp.concatenate(
        [jnp.zeros((n_r, 1), p3.dtype), p3[:, :-1]], axis=1
    )
    d_ref[0, 0] = jnp.maximum(x_ref[0, 0] - lam * div, 0.0)


def tv_fgp_sharded(x, n_iter: int, lam, mesh, dual_dtype=None,
                   interpret: bool | None = None):
    """Reference-faithful FGP on a z-slab-sharded (nz, ny, nx) volume.

    Returns (denoised, tv_of_input), both carrying the slab sharding /
    replicated scalar. Requires nz divisible by the mesh size."""
    from tomojax import tv as tvmod
    from tomojax import config as tjconfig

    if interpret is None:
        interpret = jax.default_backend() == "cpu"
    if dual_dtype is None:
        dual_dtype = tjconfig.fgp_dual_dtype
    dual_dtype = jnp.dtype(dual_dtype)
    lam = float(lam)
    multip = 1.0 / (26.0 * lam)
    nshards = mesh.shape[SLAB_AXIS]
    nz, ny, nx = x.shape
    assert nz % nshards == 0, (nz, nshards)
    nz_loc = nz // nshards
    pb = _fused_plane_block(nz_loc)
    nblk = nz_loc // pb

    tv0 = tvmod.tv(x)  # XLA stencil: rolls lower to halo collectives

    blk = pl.BlockSpec((1, pb, ny, nx), lambda e, i: (e, i, 0, 0))
    plane_prev = pl.BlockSpec(
        (1, 1, ny, nx), lambda e, i: (e, jnp.maximum(i * pb - 1, 0), 0, 0)
    )
    plane_next = pl.BlockSpec(
        (1, 1, ny, nx),
        lambda e, i: (e, jnp.minimum(i * pb + pb, nz_loc - 1), 0, 0),
    )
    halo = pl.BlockSpec((1, 1, ny, nx), lambda e, i: (e, 0, 0, 0))
    dshape4 = jax.ShapeDtypeStruct((1, nz_loc, ny, nx), dual_dtype)
    shape4 = jax.ShapeDtypeStruct((1, nz_loc, ny, nx), jnp.float32)

    def make_fused(mask_top):
        return pl.pallas_call(
            partial(_fused_kernel_halo, lam, multip, pb, nz_loc, mask_top),
            grid=(1, nblk),
            in_specs=[blk, plane_next, halo,
                      blk, plane_prev, plane_next, halo, halo,
                      blk, plane_next, halo,
                      blk, plane_next, halo],
            out_specs=(blk, blk, blk),
            out_shape=(dshape4, dshape4, dshape4),
            compiler_params=_tv_compiler_params(nx),
            interpret=interpret,
        )

    fused_top = make_fused(True)
    fused_int = make_fused(False)

    spec1 = pl.BlockSpec((1, 1, ny, nx), lambda e, i: (e, i, 0, 0))
    spec1_prev = pl.BlockSpec(
        (1, 1, ny, nx), lambda e, i: (e, jnp.maximum(i - 1, 0), 0, 0)
    )
    obj = pl.pallas_call(
        partial(_obj_kernel_halo, lam),
        grid=(1, nz_loc),
        in_specs=[spec1, spec1, spec1_prev, halo, spec1, spec1],
        out_specs=spec1,
        out_shape=shape4,
        compiler_params=_tv_compiler_params(nx),
        interpret=interpret,
    )

    right = [(j, (j + 1) % nshards) for j in range(nshards - 1)]
    left = [(j + 1, j) for j in range(nshards - 1)]

    def local(xs):
        ax = jax.lax.axis_index(SLAB_AXIS)
        is_top = ax == nshards - 1
        x4 = xs[None]
        # right halo of x is loop-invariant: first plane from the right
        # neighbor (zeros at the top shard; masked/discarded there)
        xh = jax.lax.ppermute(xs[:1], SLAB_AXIS, left)[None]

        def exchange(p1, p2, p3):
            p1l = jax.lax.ppermute(p1[:, -1:], SLAB_AXIS, right)
            p1h = jax.lax.ppermute(p1[:, :1], SLAB_AXIS, left)
            p2h = jax.lax.ppermute(p2[:, :1], SLAB_AXIS, left)
            p3h = jax.lax.ppermute(p3[:, :1], SLAB_AXIS, left)
            return p1l, p1h, p2h, p3h

        def body(_, carry):
            p1, p2, p3 = carry
            p1l, p1h, p2h, p3h = exchange(p1, p2, p3)
            args = (x4, x4, xh,
                    p1, p1, p1, p1l, p1h,
                    p2, p2, p2h,
                    p3, p3, p3h)
            return jax.lax.cond(
                is_top,
                lambda a: fused_top(*a),
                lambda a: fused_int(*a),
                args,
            )

        z = jnp.zeros((1, nz_loc, ny, nx), dual_dtype)
        p1, p2, p3 = jax.lax.fori_loop(0, n_iter - 1, body, (z, z, z))
        p1l = jax.lax.ppermute(p1[:, -1:], SLAB_AXIS, right)
        d = obj(x4, p1, p1, p1l, p2, p3)
        return d[0]

    d = jax.shard_map(
        local, mesh=mesh,
        in_specs=P(SLAB_AXIS, None, None),
        out_specs=P(SLAB_AXIS, None, None),
        check_vma=False,
    )(x)
    return d, tv0
