"""Scene utilities: datasets, Morton spatial sort, synthetic scene generators.

Equivalents of Utils/Scene.swift (GaussianDataset, bounds/centroid, Morton sort)
and the test fixtures in Tests/RendererTests/TestUtils.swift:144-231
(generateGridGaussians / generateVisibleGaussians).
"""

from __future__ import annotations

import dataclasses

import numpy as np

from ..config import Precision, sh_components
from ..types import GaussianInput, make_gaussian_input


@dataclasses.dataclass
class GaussianDataset:
    """Host-side scene container (Scene.swift:4-157)."""

    positions: np.ndarray   # (N, 3) f32
    scales: np.ndarray      # (N, 3) f32 (linear, not log)
    rotations: np.ndarray   # (N, 4) f32 quaternion (x, y, z, w)
    opacities: np.ndarray   # (N,) f32 in [0, 1]
    harmonics: np.ndarray   # (N, n_coeffs, 3) f32

    @property
    def count(self) -> int:
        return self.positions.shape[0]

    def bounds(self):
        """Scene AABB (Scene.swift:159-197)."""
        return self.positions.min(0), self.positions.max(0)

    def centroid(self):
        return self.positions.mean(0)

    def to_input(self, precision: Precision = Precision.FLOAT32) -> GaussianInput:
        return make_gaussian_input(self.positions, self.scales, self.rotations,
                                   self.opacities, self.harmonics, precision)


# --- Morton spatial sort (Scene.swift:44-138) ------------------------------------

def _expand_bits_21(v: np.ndarray) -> np.ndarray:
    """Interleave 21-bit integers with two zero bits between each bit."""
    v = v.astype(np.uint64) & np.uint64(0x1FFFFF)
    v = (v | (v << np.uint64(32))) & np.uint64(0x1F00000000FFFF)
    v = (v | (v << np.uint64(16))) & np.uint64(0x1F0000FF0000FF)
    v = (v | (v << np.uint64(8))) & np.uint64(0x100F00F00F00F00F)
    v = (v | (v << np.uint64(4))) & np.uint64(0x10C30C30C30C30C3)
    v = (v | (v << np.uint64(2))) & np.uint64(0x1249249249249249)
    return v


def morton_codes(positions: np.ndarray) -> np.ndarray:
    """63-bit Morton codes: 21 bits per axis over the scene AABB."""
    lo = positions.min(0)
    hi = positions.max(0)
    extent = np.maximum(hi - lo, 1e-12)
    q = np.clip(((positions - lo) / extent) * ((1 << 21) - 1), 0, (1 << 21) - 1)
    q = q.astype(np.uint64)
    return (_expand_bits_21(q[:, 0])
            | (_expand_bits_21(q[:, 1]) << np.uint64(1))
            | (_expand_bits_21(q[:, 2]) << np.uint64(2)))


def sort_by_morton(ds: GaussianDataset) -> GaussianDataset:
    """Spatial cache-locality sort (GaussianSceneBuilder.sortByMortonCode,
    Scene.swift:44-138).  Uses the native C++ path when available."""
    from ..native import morton_sort_indices
    order = morton_sort_indices(ds.positions)
    if order is None:
        order = np.argsort(morton_codes(ds.positions), kind="stable")
    return GaussianDataset(
        positions=ds.positions[order], scales=ds.scales[order],
        rotations=ds.rotations[order], opacities=ds.opacities[order],
        harmonics=ds.harmonics[order])


# --- Synthetic scenes (TestUtils.swift:144-231) ----------------------------------

def generate_grid_gaussians(count: int, sh_degree: int = 0, seed: int = 42,
                            z_range=(2.0, 6.0), xy_extent: float = 2.0,
                            scale_range=(0.02, 0.08)) -> GaussianDataset:
    """Seeded grid of gaussians in front of an identity OpenCV camera (+Z)."""
    rng = np.random.default_rng(seed)
    side = int(np.ceil(np.sqrt(count)))
    ix = np.arange(count) % side
    iy = np.arange(count) // side
    x = (ix / max(side - 1, 1) - 0.5) * 2 * xy_extent
    y = (iy / max(side - 1, 1) - 0.5) * 2 * xy_extent
    z = rng.uniform(*z_range, count)
    positions = np.stack([x, y, z], -1).astype(np.float32)

    scales = rng.uniform(*scale_range, (count, 3)).astype(np.float32)
    quats = rng.normal(size=(count, 4)).astype(np.float32)
    quats /= np.linalg.norm(quats, axis=-1, keepdims=True)
    opacities = rng.uniform(0.4, 1.0, count).astype(np.float32)

    n_coeffs = sh_components(sh_degree)
    harmonics = np.zeros((count, n_coeffs, 3), np.float32)
    # DC component such that final color (sh * C0 + 0.5) spans [0.1, 0.9]
    harmonics[:, 0, :] = (rng.uniform(0.1, 0.9, (count, 3)) - 0.5) / 0.28209479
    if n_coeffs > 1:
        harmonics[:, 1:, :] = rng.normal(0, 0.05, (count, n_coeffs - 1, 3))
    return GaussianDataset(positions, scales, quats, opacities,
                           harmonics.astype(np.float32))


def generate_visible_gaussians(count: int, sh_degree: int = 0, seed: int = 7,
                               spread: float = 1.5,
                               scale_range=(0.01, 0.12)) -> GaussianDataset:
    """Random cloud guaranteed in the view frustum of the default test camera."""
    rng = np.random.default_rng(seed)
    z = rng.uniform(1.5, 8.0, count)
    # keep x, y within ~55% of the frustum at each depth (fov 60)
    lim = 0.55 * np.tan(np.radians(30.0)) * z
    x = rng.uniform(-1, 1, count) * lim * spread / 1.5
    y = rng.uniform(-1, 1, count) * lim * spread / 1.5
    positions = np.stack([x, y, z], -1).astype(np.float32)
    scales = rng.uniform(*scale_range, (count, 3)).astype(np.float32)
    quats = rng.normal(size=(count, 4)).astype(np.float32)
    quats /= np.linalg.norm(quats, axis=-1, keepdims=True)
    opacities = rng.uniform(0.2, 1.0, count).astype(np.float32)
    n_coeffs = sh_components(sh_degree)
    harmonics = np.zeros((count, n_coeffs, 3), np.float32)
    harmonics[:, 0, :] = (rng.uniform(0.0, 1.0, (count, 3)) - 0.5) / 0.28209479
    if n_coeffs > 1:
        harmonics[:, 1:, :] = rng.normal(0, 0.08, (count, n_coeffs - 1, 3))
    return GaussianDataset(positions, scales, quats, opacities,
                           harmonics.astype(np.float32))
