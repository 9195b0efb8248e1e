"""Parallel-beam tilt-series geometry.

The reference decomposes a single-tilt-axis tilt series into `Nslice`
independent 2D parallel-beam problems (reference
tomofusion/gpu/utils/tomoengine.cpp:48-84: one `CParallelProjectionGeometry2D`
shared by every slice). We keep that decomposition but express it as a
*batched* geometry: one `Geometry` object describes the 2D problem, and all
projector/solver functions operate on `(Nslice, N, N)` volumes at once.

Conventions (must match the reference for data parity — SURVEY.md §0):
  * Tilt series enters as ``(Nslice, Nray, Nangles)``; sinograms are
    ``(Nslice, Nangles, Nray)`` (angle-major per slice, the layout produced
    by ``tiltSeries[s].T`` in reference tomofusion/gpu/reconstructor.py:54-59).
  * A 2D slice image is ``(N, N)`` with row index ``r`` (top row = r=0) and
    column index ``c``. Continuous coordinates of the pixel *center*:
    ``x = c - (N-1)/2`` (rightward), ``y = (N-1)/2 - r`` (upward), matching
    the pixel-index convention of the reference CPU ray oracle
    (tomofusion/cpu/utils/pytvlib.py:98-103).
  * Detector bin ``j`` has offset ``t_j = j - (Nray-1)/2`` (reference
    cpu/utils/pytvlib.py:20-21), and the detector coordinate of a point is
    ``t = x*cos(theta) + y*sin(theta)``.
  * Angles are radians inside the engine (converted at the API boundary,
    reference gpu/reconstructor.py:26).

`Geometry` is a *static* object: its angle array is a concrete numpy array
and all derived trig / driving-axis partitions are computed eagerly in
numpy. Jitted functions close over it; it is hashable so it can also be a
``static_argnum``. Changing the angle set (dynamic/streaming mode) creates
a new Geometry and triggers a (cached) re-jit, which replaces the
reference's ASTRA geometry rebuild (tomoengine.cpp:130-149).
"""

from __future__ import annotations

import dataclasses
from functools import cached_property

import numpy as np


@dataclasses.dataclass(frozen=True)
class Geometry:
    """Static description of a batched 2D parallel-beam tilt geometry.

    Attributes:
      n: image side (the reference always reconstructs square Nray x Nray
         slices — tomoengine.cpp:52 ``Ny = Nz = Nray``).
      nray: number of detector bins per projection (== n in the reference).
      angles_key: tuple of float angles in radians (hashable form).
    """

    n: int
    nray: int
    angles_key: tuple

    @staticmethod
    def make(n: int, angles_rad, nray: int | None = None) -> "Geometry":
        angles = np.asarray(angles_rad, dtype=np.float64).reshape(-1)
        return Geometry(
            n=int(n),
            nray=int(nray) if nray is not None else int(n),
            angles_key=tuple(float(a) for a in angles),
        )

    # ---- derived, cached numpy quantities -------------------------------

    @cached_property
    def angles(self) -> np.ndarray:
        return np.asarray(self.angles_key, dtype=np.float64)

    @property
    def nproj(self) -> int:
        return len(self.angles_key)

    @cached_property
    def cos(self) -> np.ndarray:
        c = np.cos(self.angles)
        c[np.abs(c) < 1e-12] = 0.0
        return c

    @cached_property
    def sin(self) -> np.ndarray:
        s = np.sin(self.angles)
        s[np.abs(s) < 1e-12] = 0.0
        return s

    @cached_property
    def row_driven(self) -> np.ndarray:
        """Boolean per angle: True when |cos| >= |sin|.

        For such angles the Joseph projector steps over image *rows* and
        linearly interpolates along *columns*; otherwise it steps over
        columns and interpolates along rows.
        """
        return np.abs(self.cos) >= np.abs(self.sin)

    @cached_property
    def driving(self) -> np.ndarray:
        """D_a = max(|cos|, |sin|) — Joseph footprint scale per angle."""
        return np.maximum(np.abs(self.cos), np.abs(self.sin))

    # index bookkeeping for the two-branch forward projector
    @cached_property
    def perm(self) -> np.ndarray:
        """Permutation putting row-driven angles first."""
        return np.concatenate(
            [np.nonzero(self.row_driven)[0], np.nonzero(~self.row_driven)[0]]
        )

    @cached_property
    def inv_perm(self) -> np.ndarray:
        inv = np.empty(self.nproj, dtype=np.int64)
        inv[self.perm] = np.arange(self.nproj)
        return inv

    # ---- helpers --------------------------------------------------------

    @property
    def det_center(self) -> float:
        return (self.nray - 1) / 2.0

    @property
    def img_center(self) -> float:
        return (self.n - 1) / 2.0

    def with_angles(self, angles_rad) -> "Geometry":
        """New geometry with a different angle set (streaming mode)."""
        return Geometry.make(self.n, angles_rad, self.nray)

    def extended(self, new_angles_rad) -> "Geometry":
        """Append angles (reference tomoengine.cpp:130-149 grows Nproj)."""
        allang = np.concatenate([self.angles, np.atleast_1d(new_angles_rad)])
        return Geometry.make(self.n, allang, self.nray)
