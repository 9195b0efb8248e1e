"""Global performance knobs.

projector_mode:
  'mxu'    — one-hot interpolation-matrix contraction on the MXU (default;
             ~2.5-3x faster than 'gather' on v5e at 256-class problems).
             Operator error vs the exact gather path is ~1e-5 relative at
             the default bf16x3 precision — far below the Joseph-vs-Siddon
             discretization gap (~1e-3).
  'gather' — 2-point gather formulation; exact transpose pair to f32
             rounding. Use for strict adjointness (e.g. verification).

mxu_precision: jax.lax.Precision for the MXU path —
  DEFAULT (bf16 passes, fastest, ~1e-3 rel), HIGH (bf16x3, ~1e-5),
  HIGHEST (f32, ~1e-6, ~1.6x slower than HIGH).

Set via `tomojax.config.set_projector_mode(...)` BEFORE building jitted
steps (jit closures capture the mode at trace time).
"""

from __future__ import annotations

import jax

projector_mode: str = "mxu"
mxu_precision = jax.lax.Precision.HIGH

# tv_impl: 'auto' uses the fused Pallas FGP kernels on a single-device
# non-CPU backend (1.9x at 256^3) and the XLA stencils otherwise (CPU,
# multi-device meshes — where the rolls must lower to halo collectives).
tv_impl: str = "auto"


def set_projector_mode(mode: str, precision=None):
    global projector_mode, mxu_precision
    assert mode in ("mxu", "gather"), mode
    projector_mode = mode
    if precision is not None:
        mxu_precision = precision


def set_tv_impl(impl: str):
    global tv_impl
    assert impl in ("auto", "xla", "pallas"), impl
    tv_impl = impl


def use_pallas_tv() -> bool:
    if tv_impl == "xla":
        return False
    if tv_impl == "pallas":
        return True
    return jax.default_backend() != "cpu" and jax.device_count() == 1
