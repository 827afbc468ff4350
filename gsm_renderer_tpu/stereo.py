"""Stereo presentation utilities: side-by-side targets and the foveated
rendering equivalent.

The reference's foveated path uses Apple's ``MTLRasterizationRateMap``: the
stereo image is rasterized into a smaller physical target whose sample density
follows a per-axis rate map, and the display hardware expands it
(DepthFirstStereoCopyEncoder.swift:28-100, FoveatedStereoDrawable —
GaussianRendererProtocol.swift:168-193).

No such hardware exists on a TPU.  The equivalent here (SURVEY.md section 7
design mapping) is explicit and separable:

* :func:`make_rate_maps` builds per-axis sample-density maps (high density at a
  gaze center, falling off toward the periphery);
* :func:`warp_tables` integrates them into monotone sample-position tables
  mapping a reduced-resolution intermediate image to screen coordinates;
* the stereo pipeline renders the intermediate at reduced resolution through a
  screen-space *warp camera* (same projection, scaled viewport), and
* :func:`expand_foveated` resamples the intermediate to the full display target
  (the "fullscreen copy pass" analogue).
"""

from __future__ import annotations

import dataclasses
from typing import Any

import jax.numpy as jnp
import numpy as np

Array = Any


@dataclasses.dataclass
class FoveatedStereoTarget:
    """Equivalent of ``FoveatedStereoDrawable``: per-axis rate maps plus the
    physical (display) size."""

    display_width: int
    display_height: int
    rate_x: np.ndarray  # (display_width,) relative sample density in (0, 1]
    rate_y: np.ndarray  # (display_height,)

    @property
    def render_width(self) -> int:
        return int(np.ceil(self.rate_x.sum()))

    @property
    def render_height(self) -> int:
        return int(np.ceil(self.rate_y.sum()))


def make_rate_maps(width: int, height: int, center=(0.5, 0.5),
                   min_rate: float = 0.35, radius: float = 0.35
                   ) -> FoveatedStereoTarget:
    """Gaussian-falloff foveation: full rate inside ``radius`` (fractional) of
    the gaze center, smoothly dropping to ``min_rate`` at the edges."""
    def axis(n, c):
        t = (np.arange(n) + 0.5) / n
        d = np.abs(t - c)
        # fall reaches 1 at the far screen edge
        edge = max(max(c, 1.0 - c) - radius, 1e-6)
        fall = np.clip((d - radius) / edge, 0.0, 1.0)
        return (1.0 - (1.0 - min_rate) * fall ** 2).astype(np.float32)

    return FoveatedStereoTarget(
        display_width=width, display_height=height,
        rate_x=axis(width, center[0]), rate_y=axis(height, center[1]))


def warp_tables(target: FoveatedStereoTarget):
    """Monotone sample-position tables.

    Returns (x_table (render_width,), y_table (render_height,)): for each
    intermediate pixel, the screen coordinate it samples.  Inverse of the
    cumulative rate integral.
    """
    def table(rate, n_out):
        cum = np.concatenate([[0.0], np.cumsum(rate)])  # screen pos -> sample idx
        total = cum[-1]
        want = (np.arange(n_out) + 0.5) * (total / n_out)
        # invert: screen coordinate whose cumulative sample count equals `want`
        return np.interp(want, cum, np.arange(len(cum))).astype(np.float32)

    return (table(target.rate_x, target.render_width),
            table(target.rate_y, target.render_height))


def compress_foveated(full: Array, target: FoveatedStereoTarget,
                      stereo: bool = True) -> Array:
    """Resample a full-resolution render into the reduced-rate physical target
    — the TPU analogue of the reference's fullscreen copy pass with a
    rasterization rate map attached (DepthFirstStereoCopyEncoder.swift:28-100):
    gaussians composite at full resolution, the copy compresses into the
    smaller drawable, and the display hardware expands it."""
    import jax.numpy as jnp
    xt, yt = warp_tables(target)
    h, w = full.shape[:2]
    n_eyes = 2 if stereo else 1
    eye_w = w // n_eyes

    sx = jnp.asarray(np.clip(xt, 0, eye_w - 1.001))
    sy = jnp.asarray(np.clip(yt, 0, h - 1.001))
    ix = jnp.floor(sx).astype(jnp.int32)
    iy = jnp.floor(sy).astype(jnp.int32)
    fx = (sx - ix.astype(jnp.float32))[None, :, None]
    fy = (sy - iy.astype(jnp.float32))[:, None, None]

    outs = []
    for e in range(n_eyes):
        img = full[:, e * eye_w:(e + 1) * eye_w]
        g = lambda yy, xx: img[yy][:, xx]
        outs.append(g(iy, ix) * (1 - fx) * (1 - fy)
                    + g(iy, ix + 1) * fx * (1 - fy)
                    + g(iy + 1, ix) * (1 - fx) * fy
                    + g(iy + 1, ix + 1) * fx * fy)
    return jnp.concatenate(outs, axis=1)


def expand_foveated(intermediate: Array, target: FoveatedStereoTarget,
                    stereo: bool = True) -> Array:
    """Resample the reduced-resolution intermediate to the display target — the
    TPU analogue of the vertex-amplified fullscreen copy with a rasterization
    rate map attached."""
    xt, yt = warp_tables(target)
    h, w = intermediate.shape[:2]
    n_eyes = 2 if stereo else 1
    eye_w = w // n_eyes
    # a tile-aligned render may exceed the rate-map integral size; the warp
    # tables only address the first render_width/height texels
    use_w = min(eye_w, target.render_width)
    use_h = min(h, target.render_height)

    # display pixel -> intermediate coordinate (inverse of the warp tables)
    disp_x = np.interp(np.arange(target.display_width) + 0.5, xt,
                       np.arange(len(xt))).astype(np.float32)
    disp_y = np.interp(np.arange(target.display_height) + 0.5, yt,
                       np.arange(len(yt))).astype(np.float32)

    ix = jnp.clip(jnp.asarray(np.floor(disp_x)).astype(jnp.int32), 0, use_w - 2)
    iy = jnp.clip(jnp.asarray(np.floor(disp_y)).astype(jnp.int32), 0, use_h - 2)
    fx = jnp.asarray(disp_x)[None, :, None] - ix[None, :, None].astype(jnp.float32)
    fy = jnp.asarray(disp_y)[:, None, None] - iy[:, None, None].astype(jnp.float32)

    outs = []
    for e in range(n_eyes):
        img = intermediate[:, e * eye_w:(e + 1) * eye_w]
        g = lambda yy, xx: img[yy][:, xx]
        bilinear = (g(iy, ix) * (1 - fx) * (1 - fy)
                    + g(iy, ix + 1) * fx * (1 - fy)
                    + g(iy + 1, ix) * (1 - fx) * fy
                    + g(iy + 1, ix + 1) * fx * fy)
        outs.append(bilinear)
    return jnp.concatenate(outs, axis=1)
