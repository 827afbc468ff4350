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


def foveated_raster_tables(target: FoveatedStereoTarget, tile_w: int = 16,
                           tile_h: int = 16):
    """Host-side tables for rasterizing DIRECTLY into the reduced-rate
    physical target (the true rasterization-rate-map equivalent: render *less*,
    not render-then-compress).

    Returns a dict of numpy arrays:
      ``coord_x`` (tiles_x_phys, P): display-space x of every physical pixel,
        laid out per tile (P = tile_w*tile_h, row-major within the tile);
      ``coord_y`` (tiles_y_phys, P): display-space y per physical tile row;
      ``lut_x_lo/lut_x_hi`` (tiles_x_disp,): conservative physical-tile range
        covered by each display tile column (inclusive);
      ``lut_y_lo/lut_y_hi`` (tiles_y_disp,).
    """
    xt, yt = warp_tables(target)  # physical index -> display coordinate
    rw, rh = target.render_width, target.render_height
    txp = -(-rw // tile_w)
    typ = -(-rh // tile_h)
    p = tile_w * tile_h

    def pad_table(t, n):
        # pad past the physical edge: continue the last step so padded pixels
        # sample just outside the display (alpha 0 there)
        step = t[-1] - t[-2] if len(t) > 1 else 1.0
        extra = t[-1] + step * np.arange(1, n - len(t) + 1)
        return np.concatenate([t, extra]).astype(np.float32)

    xt_pad = pad_table(xt, txp * tile_w)
    yt_pad = pad_table(yt, typ * tile_h)
    coord_x = np.empty((txp, p), np.float32)
    for t in range(txp):
        coord_x[t] = np.tile(xt_pad[t * tile_w:(t + 1) * tile_w], tile_h)
    coord_y = np.empty((typ, p), np.float32)
    for t in range(typ):
        coord_y[t] = np.repeat(yt_pad[t * tile_h:(t + 1) * tile_h], tile_w)

    # display tile -> physical tile range (conservative: the physical tiles
    # whose sample coordinates fall inside the display tile's pixel span)
    def luts(t_pad, n_phys, tile, n_disp_tiles, disp_size):
        # inverse map: display coordinate -> physical sample index
        inv = np.interp(np.arange(disp_size + 1, dtype=np.float64),
                        t_pad, np.arange(len(t_pad)))
        lo = np.empty(n_disp_tiles, np.int32)
        hi = np.empty(n_disp_tiles, np.int32)
        n_tiles_phys = -(-n_phys // tile)
        for t in range(n_disp_tiles):
            p0 = inv[min(t * tile, disp_size)]
            p1 = inv[min((t + 1) * tile, disp_size)]
            lo[t] = max(int(np.floor(p0)) // tile, 0)
            hi[t] = min(int(np.ceil(p1) - 1) // tile, n_tiles_phys - 1)
        return lo, hi

    tiles_x_disp = -(-target.display_width // tile_w)
    tiles_y_disp = -(-target.display_height // tile_h)
    lut_x_lo, lut_x_hi = luts(xt_pad, rw, tile_w, tiles_x_disp,
                              target.display_width)
    lut_y_lo, lut_y_hi = luts(yt_pad, rh, tile_h, tiles_y_disp,
                              target.display_height)

    # physical-tile boundary tables in DISPLAY pixel coordinates (for the
    # expand kernel's dual-eye tile test): bound[t] = display coordinate of
    # physical tile t's first sample; one row per axis, padded to 128 lanes
    # (the kernel gathers them with a single take_along_axis — requires the
    # physical tile grid to fit 127 tiles per axis)
    if txp + 1 > 128 or typ + 1 > 128:
        raise ValueError("foveated physical tile grid must fit 127 tiles/axis")

    def bound_row(t_pad, n_tiles, tile):
        ext = pad_table(t_pad, (n_tiles + 1) * tile + 1)
        row = np.full(128, 1e9, np.float32)
        row[:n_tiles + 1] = ext[np.arange(n_tiles + 1) * tile]
        return row

    bound_x = bound_row(xt_pad, txp, tile_w)
    bound_y = bound_row(yt_pad, typ, tile_h)

    # Polynomial fit of the INVERSE warp (display pixel coordinate ->
    # physical sample index), for per-gaussian physical re-binning: mapping
    # through display-TILE-granular LUTs rounds every rect out to tile
    # boundaries first and measured ~2x instance inflation; mapping the
    # gaussian's PIXEL bounds through this fit (+- fitted error margin) keeps
    # physical rects as tight as display rects.  A table gather would cost
    # ~6 ns/element on XLA:TPU (~24 ms at 1M x 4 bounds); the degree-9
    # polynomial is ~10 FMAs.
    def inv_fit(t_pad, disp_size):
        xs = np.arange(disp_size + 1, dtype=np.float64)
        ys = np.interp(xs, t_pad, np.arange(len(t_pad), dtype=np.float64))
        t = (xs / disp_size) * 2.0 - 1.0
        coeffs = np.polyfit(t, ys, 9)
        margin = np.abs(np.polyval(coeffs, t) - ys).max() + 1e-3
        return np.concatenate([coeffs, [0.0, float(disp_size),
                                        float(margin)]]).astype(np.float32)

    fit = np.stack([inv_fit(xt_pad, target.display_width),
                    inv_fit(yt_pad, target.display_height)])
    return dict(coord_x=coord_x, coord_y=coord_y,
                lut_x_lo=lut_x_lo, lut_x_hi=lut_x_hi,
                lut_y_lo=lut_y_lo, lut_y_hi=lut_y_hi,
                bounds=np.stack([bound_x, bound_y]),
                inv_fit=fit)


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
