"""Gaussian random fields on mesh points (gstools SRF replacement).

The reference samples smooth conductivity/density fields with gstools'
Gaussian-covariance SRF (datagen/heat.py:46-47, heat_tetmesh.py:30-36) and
then min-max normalizes them, so only smoothness at the right length scale
matters. This implements the classic randomization (spectral) method:

    f(x) = sqrt(2 var / N) * sum_i cos(k_i . x + phi_i)

with wavevectors k_i drawn from the spectral measure of the Gaussian
covariance model (isotropic normal with std ~ 1/len_scale) and uniform
phases — an exact sampler of a stationary Gaussian field in the N -> inf
limit.
"""

from __future__ import annotations

import numpy as np


class GaussianRandomField:
    def __init__(
        self,
        dim: int = 3,
        var: float = 5.0,
        len_scale: float = 1.0,
        n_modes: int = 256,
    ):
        self.dim = dim
        self.var = var
        self.len_scale = len_scale
        self.n_modes = n_modes

    def __call__(self, points: np.ndarray, seed: int) -> np.ndarray:
        rng = np.random.default_rng(seed)
        # Gaussian covariance spectral measure: k ~ N(0, (pi/(2 l))^2 * 2) per
        # dim (constants folded; normalization removed by min-max rescale).
        std_k = np.pi / (2.0 * self.len_scale) * np.sqrt(2.0)
        k = rng.normal(0.0, std_k, size=(self.n_modes, self.dim))
        phi = rng.uniform(0, 2 * np.pi, size=self.n_modes)
        proj = points[:, : self.dim] @ k.T + phi  # [n_pts, n_modes]
        return np.sqrt(2.0 * self.var / self.n_modes) * np.cos(proj).sum(axis=1)


def minmax_scaled_field(
    grf: GaussianRandomField,
    points: np.ndarray,
    seed: int,
    lo: float,
    hi: float,
) -> np.ndarray:
    """Sample + min-max rescale into [lo, hi] (heat.py:83-87 convention:
    field <- (field - min)/(max + 1e-4) * (hi-lo) + lo)."""
    f = grf(points, seed)
    f = f - f.min()
    f = f / (f.max() + 1e-4)
    return f * (hi - lo) + lo


def to_elem_field(elems: np.ndarray, vertex_field: np.ndarray) -> np.ndarray:
    """Average a vertex field onto elements (heat.py:15-19 to_tet_field)."""
    return vertex_field[elems].mean(axis=1)
