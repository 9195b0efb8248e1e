"""shard_map-wrapped Pallas projector pair for slab-sharded volumes.

The fused Pallas kernels (projector/pallas_joseph.py) require the whole
slice extent to be device-local, so the auto dispatch
(tomojax.config.resolve_projector_mode) falls back to the XLA 'mxu'
formulation under a mesh. But the data term is embarrassingly parallel
over slices — the reference's MPI slab decomposition exchanges nothing
for FP/BP (mpi_astra_ctvlib.cpp:211-231: per-slice ASTRA calls on the
local slab only) — so running the per-shard Pallas kernel under
`jax.shard_map` is legal: each device projects its own z-slab with zero
cross-device traffic, and the result carries the same slab sharding.

Correctness is validated against the unsharded kernel on the virtual
CPU mesh (interpret mode; tests/test_pallas_projector.py). Performance:
on this container only one real TPU chip exists, so the committed
measurement is the 1-device-mesh plumbing overhead vs a direct kernel
call (see docs/ARCHITECTURE.md); the >=2-chip comparison vs the XLA mxu
path needs a pod and inherits per-chip kernel speed (no collectives are
involved either way).

Requires the slice count to divide evenly by the mesh size (pad with
dist.pad_slices first — same contract as every sharded path here).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P

from tomojax.geometry import Geometry
from tomojax.projector import pallas_joseph as pj
from tomojax.dist import SLAB_AXIS


def _interpret() -> bool:
    return jax.default_backend() == "cpu"


def fp_sharded(x, geom: Geometry, mesh: Mesh, precision=None):
    """Forward projection of a z-slab-sharded (Ns, N, N) volume via the
    per-shard fused Pallas kernel; output keeps the slab sharding."""
    spec = P(SLAB_AXIS, None, None)
    fn = jax.shard_map(
        partial(pj.fp_pallas, geom=geom, precision=precision,
                interpret=_interpret()),
        mesh=mesh, in_specs=(spec,), out_specs=spec,
        check_vma=False,  # pallas_call out_shape carries no vma info
    )
    return fn(x)


def bp_sharded(y, geom: Geometry, mesh: Mesh, precision=None):
    """Matched backprojection of a slab-sharded (Ns, Na, Nt) sinogram."""
    spec = P(SLAB_AXIS, None, None)
    fn = jax.shard_map(
        partial(pj.bp_pallas, geom=geom, precision=precision,
                interpret=_interpret()),
        mesh=mesh, in_specs=(spec,), out_specs=spec,
        check_vma=False,  # pallas_call out_shape carries no vma info
    )
    return fn(y)
