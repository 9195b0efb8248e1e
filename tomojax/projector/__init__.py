"""Matched forward/back projector pair and FBP filters.

Replaces the reference's entire ASTRA dependency (SURVEY.md N12;
reference tomofusion/gpu/utils/tomoengine.hpp:17-31): the CUDA
`CCudaForwardProjectionAlgorithm` / `CCudaBackProjectionAlgorithm` pair and
the filter bank of `CCudaFilteredBackProjectionAlgorithm` are re-designed
as batched, jit-compiled JAX operators over the whole `(Nslice, N, N)`
volume at once (no per-slice host loop, no H2D/D2H staging).
"""

from tomojax.projector.joseph import fp, bp, fp_adjointable, bp_adjointable
from tomojax.projector.filters import FILTERS, filter_sinogram

__all__ = [
    "fp",
    "bp",
    "fp_adjointable",
    "bp_adjointable",
    "FILTERS",
    "filter_sinogram",
]
