"""Observability: stage timing and trace annotation.

The reference's tracing story is encoder labels + Xcode GPU capture and an
unimplemented ``lastGPUTime`` stub (SURVEY.md section 5).  Here:

* every renderer exposes a real ``last_gpu_time`` via ``render_timed``,
* :func:`profile_depth_first_stages` measures a per-stage time split using
  OPERAND-PRESERVING cut-point programs: each cut is its own XLA program that
  touches one element of EVERY live operand at the cut, so XLA cannot
  dead-code-eliminate sort payloads or table planes near the cut.  The old
  cumulative ``upto(k)`` method (kept as :func:`profile_depth_first_stages_upto`
  for comparison, DEPRECATED) let XLA drop unused operands, misattributing
  ~6 ms of composed-sort cost to the blend at the 1M/SH3/1080p headline
  (see CLAUDE.md gotchas; scratch/stage3.py vs scratch/framesplit2.py),
* the DepthFirst frame program annotates its stages with ``jax.named_scope``
  (pipelines/depth_first.py: project_cull / fused_binning / tile_ranges /
  blend / assemble) so device traces (``jax.profiler.trace``) group by stage.
"""

from __future__ import annotations

import time
import warnings

import jax
import jax.numpy as jnp
import numpy as np


def _time_program(fn, args, short: int = 2, long_: int = 8,
                  reps: int = 3) -> float:
    """Slope-based device time per call: chains of two lengths with one host
    fetch each; the fixed dispatch+fetch overhead cancels in the difference
    (block_until_ready is unreliable on tunneled backends)."""
    f = jax.jit(fn)
    r = f(*args)
    np.asarray(jax.tree_util.tree_leaves(r)[0]).ravel()[:1]

    def chain(k):
        best = 1e9
        for _ in range(reps):
            t0 = time.perf_counter()
            for _ in range(k):
                r = f(*args)
            np.asarray(jax.tree_util.tree_leaves(r)[0]).ravel()[:1]
            best = min(best, time.perf_counter() - t0)
        return best

    a, b = chain(short), chain(long_)
    return (b - a) / (long_ - short) * 1000.0


def profile_depth_first_stages(gi, camera, width: int, height: int, *,
                               sh_degree: int = 3, capacity: int = 0,
                               alpha_threshold: float = 0.005,
                               total_ink_threshold: float = 2.0,
                               use_pallas: bool = True):
    """Per-stage ms for the DepthFirst pipeline on the current backend.

    Cut-point method (unbiased): builds one program per cut —
    project | +prep | +expand | +sort | +ranges | full frame — where every
    cut returns a scalar touching a single element of EVERY operand that is
    live at the cut (Pallas calls are opaque, so one element retains the full
    kernel; all sort operands are touched so the composed sort keeps its true
    cost).  Stage cost = delta between consecutive cut programs, each timed
    by chained-iteration slope.

    Returns a dict: project, prep, expand, sort, ranges, blend (includes the
    words-table build + assemble on the Pallas path), total.
    """
    from . import config as cfg
    from .kernels import blend as K
    from .kernels import expand as E
    from .ops import binning as B

    n = gi.count
    if capacity <= 0:
        capacity = max(cfg.INSTANCE_CAPACITY_FACTOR * n, n + 1)
    capacity = -(-capacity // 4096) * 4096
    tiles_x, tiles_y = cfg.tiles_for(width, height, 16, 16)
    view, proj, center = camera.astuple_jax()

    kw = dict(width=width, height=height, tile_w=16, tile_h=16,
              sh_degree=sh_degree, near_plane=camera.near_plane,
              far_plane=camera.far_plane, alpha_threshold=alpha_threshold,
              total_ink_threshold=total_ink_threshold, input_is_srgb=False)

    plan = B.make_key_plan(tiles_x * tiles_y, n,
                           near_plane=camera.near_plane,
                           far_plane=camera.far_plane)

    from .kernels.project import (cached_projection_inputs,
                                  project_and_cull_packed)
    prepared = cached_projection_inputs(gi, sh_degree)

    def build(stage):
        def f(gi, view, proj, center, comp, harm):
            packed = project_and_cull_packed(
                gi, view, proj, center, key_plan=plan,
                prepared=(comp, harm), **kw)
            if stage == "project":
                s = packed.dsw[0].astype(jnp.float32) \
                    + packed.rect_word[1].astype(jnp.float32) \
                    + packed.rect_h[2].astype(jnp.float32) \
                    + packed.visible[5].astype(jnp.float32)
                for k in range(4):
                    s = s + packed.words[k][k].astype(jnp.float32)
                return s
            tab = E.binning_prep_pallas(
                packed.rect_word, packed.rect_h, packed.dsw,
                packed.words,
                tile_w=16, tile_h=16, alpha_threshold=alpha_threshold,
                mode="mono")
            if stage == "prep":
                if isinstance(tab, (tuple, list)):
                    return sum(jnp.ravel(x)[0].astype(jnp.float32)
                               for x in tab)
                return tab.ravel()[0].astype(jnp.float32)
            outs = E.expand_slots_pallas(
                None, None, None, capacity=capacity, tiles_x=tiles_x,
                fused_depth16=False, exact_test=True, tile_w=16, tile_h=16,
                alpha_threshold=alpha_threshold, prebuilt_tab=tab,
                n_gaussians=n,
                key_plan=None if plan is None else plan.kernel_tuple)
            key, d_slot = outs[0], outs[1]
            slot_words = outs[2:-2]
            if stage == "expand":
                s = key[0].astype(jnp.float32) + d_slot[1].astype(jnp.float32)
                for k, x in enumerate(slot_words):
                    s = s + x[k].astype(jnp.float32)
                return s
            ops = jax.lax.sort((key, d_slot, *slot_words), num_keys=2,
                               is_stable=plan is None)
            sorted_key, sw = ops[0], ops[2:]
            if stage == "sort":
                s = sorted_key[0].astype(jnp.float32) \
                    + ops[1][1].astype(jnp.float32)
                for k, x in enumerate(sw):
                    s = s + x[k].astype(jnp.float32)
                return s
            sorted_tile = jnp.where(sorted_key == jnp.uint32(E.SENTINEL),
                                    jnp.uint32(E.SENTINEL),
                                    sorted_key >> plan.kernel_tuple[0])
            starts, counts_t = B.extract_tile_ranges(sorted_tile,
                                                     tiles_x * tiles_y)
            if stage == "ranges":
                s = starts[0].astype(jnp.float32) \
                    + counts_t[-1].astype(jnp.float32)
                for k, x in enumerate(sw):
                    s = s + x[k].astype(jnp.float32)
                return s
            if use_pallas:
                table = K.build_words_table(sw, capacity)
                tc, td = K.blend_tiles_pallas(table, starts, counts_t,
                                              tiles_x=tiles_x,
                                              tiles_y=tiles_y)
            else:
                from .pipelines.common import sorted_instance_attrs
                sorted_words = jnp.stack(sw, axis=-1)
                attrs = sorted_instance_attrs(
                    sorted_words, sorted_tile, tiles_x=tiles_x, tile_w=16,
                    tile_h=16, alpha_threshold=alpha_threshold,
                    exact_tile_test=False)
                table = K.build_blend_table(attrs, capacity)
                tc, td = K.blend_tiles_xla(table, starts, counts_t,
                                           tiles_x=tiles_x, tiles_y=tiles_y,
                                           max_per_tile=2048)
            color, depth = K.assemble_image(tc, td, tiles_x=tiles_x,
                                            tiles_y=tiles_y, width=width,
                                            height=height)
            return color[0, 0, 0] + depth[-1, -1]
        return f

    stages = ["project", "prep", "expand", "sort", "ranges", "full"]
    names = {"full": "blend"}  # the last delta = table build + blend + assemble
    args = (gi, view, proj, center, *prepared)
    out = {}
    prev = 0.0
    for stage in stages:
        cum = _time_program(build(stage), args)
        # RAW delta — may be slightly negative when two cut programs differ
        # by less than the slope-timing noise (~0.3 ms); clamping/rounding
        # silently would hide exactly the noise the reader needs to see to
        # judge the split (round-4 MATRIX reported project=0.0 while the
        # true value was ~0.4 with ~3 ms of frame time unattributed).
        out[names.get(stage, stage)] = cum - prev
        prev = cum
    # total == the "full" cut's cumulative slope == the FUSED single-program
    # frame time on this backend; the bench headline adds one per-dispatch
    # service overhead (~1.5-3 ms through the tunnel) on top of this.
    out["total"] = prev
    return out


def profile_depth_first_stages_upto(gi, camera, width: int, height: int, *,
                                    sh_degree: int = 3, capacity: int = 0,
                                    alpha_threshold: float = 0.005,
                                    total_ink_threshold: float = 2.0,
                                    use_pallas: bool = True):
    """DEPRECATED cumulative upto(k) stage split.

    Kept only for comparison: its cumulative prefix programs let XLA
    dead-code-eliminate sort payload operands / table planes near the cut,
    misattributing composed-sort cost to the next stage (measured ~6 ms of
    sort cost booked against the blend at the 1M headline).  Use
    :func:`profile_depth_first_stages` (cut-point method) instead.
    """
    warnings.warn(
        "profile_depth_first_stages_upto is DCE-biased (sort cost leaks into "
        "the next stage); use profile_depth_first_stages",
        DeprecationWarning, stacklevel=2)
    from . import config as cfg
    from .kernels import blend as K
    from .kernels import expand as E
    from .ops import binning as B
    from .ops.project import project_and_cull

    n = gi.count
    if capacity <= 0:
        capacity = max(cfg.INSTANCE_CAPACITY_FACTOR * n, n + 1)
    capacity = -(-capacity // 4096) * 4096
    tiles_x, tiles_y = cfg.tiles_for(width, height, 16, 16)
    view, proj, center = camera.astuple_jax()

    kw = dict(width=width, height=height, tile_w=16, tile_h=16,
              sh_degree=sh_degree, near_plane=camera.near_plane,
              far_plane=camera.far_plane, alpha_threshold=alpha_threshold,
              total_ink_threshold=total_ink_threshold, input_is_srgb=False)

    key_plan = B.make_key_plan(tiles_x * tiles_y, n,
                               near_plane=camera.near_plane,
                               far_plane=camera.far_plane)

    def upto(stage):
        def f(gi, view, proj, center):
            pr = project_and_cull(gi, view, proj, center, **kw)
            if stage == 1:
                return pr.depth_key.max() + jnp.uint32(pr.rect_count.sum())
            from .pipelines.common import (binning_inputs, pack_record_words,
                                           sorted_instance_attrs)
            words = pack_record_words(pr.record)
            word_list = [words[:, k] for k in range(4)]
            depth_word = (key_plan.normalize(pr.depth_key)
                          if key_plan is not None else pr.depth_key)
            counts, rect_word, tile_mask, aux = binning_inputs(
                pr.visible, pr.min_tx, pr.min_ty, pr.max_tx, pr.rect_count,
                depth_word, word_list,
                exact_test=True, alpha_threshold=alpha_threshold)
            if stage == 2:
                return jnp.uint32(jnp.cumsum(counts)[-1])
            expand = E.expand_slots_pallas if use_pallas else E.expand_slots_xla
            key, d_slot, w0, w1, w2, w3, total, _ovf = expand(
                counts, rect_word, aux, capacity=capacity, tiles_x=tiles_x,
                fused_depth16=False, exact_test=True, tile_mask=tile_mask,
                key_plan=None if key_plan is None else key_plan.kernel_tuple)
            if stage == 3:
                return key[0] + w0[-1]
            ops = jax.lax.sort((key, d_slot, w0, w1, w2, w3), num_keys=2,
                               is_stable=key_plan is None)
            sorted_key, sw = ops[0], ops[2:]
            if stage == 4:
                return sorted_key[-1] + sw[0][0]
            sorted_words = jnp.stack(sw, axis=-1)
            if key_plan is not None:
                sorted_key = jnp.where(
                    sorted_key == jnp.uint32(0xFFFFFFFF),
                    jnp.uint32(0xFFFFFFFF), sorted_key >> key_plan.d_hi)
            starts, counts_t = B.extract_tile_ranges(sorted_key,
                                                     tiles_x * tiles_y)
            if use_pallas:
                table = K.build_words_table(sorted_words, capacity)
                if stage == 5:
                    return jnp.uint32(table[0, 0, 0]) + jnp.uint32(starts[0])
                tc, td = K.blend_tiles_pallas(table, starts, counts_t,
                                              tiles_x=tiles_x, tiles_y=tiles_y)
            else:
                attrs = sorted_instance_attrs(
                    sorted_words, sorted_key, tiles_x=tiles_x, tile_w=16,
                    tile_h=16, alpha_threshold=alpha_threshold,
                    exact_tile_test=False)
                table = K.build_blend_table(attrs, capacity)
                if stage == 5:
                    return jnp.uint32(table[0, 0, 0] + starts[0])
                tc, td = K.blend_tiles_xla(table, starts, counts_t,
                                           tiles_x=tiles_x, tiles_y=tiles_y,
                                           max_per_tile=2048)
            if stage == 6:
                return jnp.uint32(tc[0, 0, 0] + td[-1, 0])
            color, depth = K.assemble_image(tc, td, tiles_x=tiles_x,
                                            tiles_y=tiles_y, width=width,
                                            height=height)
            return jnp.uint32(color[0, 0, 0] + depth[-1, -1])
        return f

    names = ["project", "precount_pack", "expand", "sort", "attrs_table",
             "blend", "assemble"]
    args = (gi, view, proj, center)
    out = {}
    prev = 0.0
    for stage, name in enumerate(names, start=1):
        cum = _time_program(upto(stage), args)
        out[name] = max(cum - prev, 0.0)
        prev = cum
    out["total"] = prev
    return out
