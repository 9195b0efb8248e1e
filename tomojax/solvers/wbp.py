"""Weighted/filtered backprojection (WBP / FBP).

Replaces ASTRA's `CCudaFilteredBackProjectionAlgorithm` as driven by the
reference (tomoengine.cpp:317-347, filter list :317-321, positivity flag
:346). One batched rFFT filter over the detector axis + one batched
backprojection of the whole tilt series.
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp

from tomojax.geometry import Geometry
from tomojax.projector.joseph import bp
from tomojax.projector.filters import filter_sinogram


def fbp(b, geom: Geometry, filter_name: str = "ram-lak",
        apply_positivity: bool = True):
    """b: (Ns, Na, Nt) -> (Ns, N, N).

    Scaling: discrete angular integration factor = mean angular spacing
    (== pi/Nproj for full half-circle coverage; for missing-wedge tilt
    ranges the actual spacing is the correct Riemann weight). The
    band-limited ramp kernel already carries the detector-sampling factor
    — Kak & Slaney Ch.3; validated against phantom amplitude in
    tests/test_solvers.py."""
    q = filter_sinogram(b, filter_name)
    if geom.nproj > 1:
        dtheta = float(np.ptp(geom.angles)) / (geom.nproj - 1)
    else:
        dtheta = np.pi
    x = bp(q, geom) * dtheta
    if apply_positivity:
        x = jnp.maximum(x, 0.0)
    return x
