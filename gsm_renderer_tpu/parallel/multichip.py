"""Multi-chip rendering over a jax.sharding.Mesh.

The reference is a single-GPU engine (SURVEY.md section 2.6: no multi-device code
exists).  This module is the TPU-native scale-out design the reference never had:

* **DP projection** — gaussians are sharded over the mesh axis; each chip projects
  and quantizes its shard (the embarrassingly parallel stage).  On TPU backends
  the shard runs the same fused Pallas projection kernel as the mono production
  path (kernels/project.py) — project + cull + quantize + record-pack in one
  HBM pass.
* **One collective** — the compact per-gaussian results (4 record words + rect
  word + depth key + rect rows + pre-count mask: 8 x u32 per gaussian) are
  all-gathered over ICI.
* **SP (screen-space) binning + blend** — each chip owns a horizontal band of tile
  rows; it clamps every gaussian's tile rect to its band, expands/sorts/blends
  only its band's instances, and emits its band of the image.  No further
  communication; the final image is already sharded by rows.

This is a real DP+SP hybrid: the only traffic is one all-gather of ~32 B/gaussian.

Production parity with the mono path (round-5): the per-band instance sort uses
the same tie-free KeyPlan (ops/binning.KeyPlan) so it runs UNSTABLE with exact
reference tie order, and ``split_frame`` dispatches the same 3-program shape
(pre | bare sort | post) that sidesteps the composed-sort MSA pathology
(pipelines/depth_first.py depth_first_pre_frame docstring) — each program is its
own jitted shard_map, so on a real multi-chip mesh every chip's sort owns its
program's VMEM scratch exactly like the mono production frame.
"""

from __future__ import annotations

import functools
from typing import Any

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from .. import config as cfg
from ..kernels import blend as K
from ..ops import binning as B
from ..ops.project import project_and_cull
from ..types import GaussianInput

Array = Any


def _gi_partition_specs(axis: str):
    """Per-field PartitionSpecs: every field shards its gaussian axis (the
    leading axis, except channel-planar harmonics whose gaussian axis is last)."""
    return GaussianInput(
        positions=P(axis), scales=P(axis), rotations=P(axis),
        opacities=P(axis), harmonics=P(None, None, axis))


def pad_gaussian_input(gi: GaussianInput, multiple: int) -> GaussianInput:
    """Pad the gaussian axis to a multiple (shard_map needs evenly divisible
    shards).  Pad gaussians are inert: zero scale trips the scale cull
    (mathlib.cull_by_scale), so they contribute one sentinel slot and nothing
    else."""
    n = gi.count
    pad = (-n) % multiple
    if pad == 0:
        return gi
    rot = jnp.zeros((pad, 4), gi.rotations.dtype).at[:, 3].set(1)
    return GaussianInput(
        positions=jnp.pad(gi.positions, ((0, pad), (0, 0))),
        scales=jnp.pad(gi.scales, ((0, pad), (0, 0))),
        rotations=jnp.concatenate([gi.rotations, rot]),
        opacities=jnp.pad(gi.opacities, (0, pad)),
        harmonics=jnp.pad(gi.harmonics, ((0, 0), (0, 0), (0, pad))),
    )


def shard_gaussian_input(gi: GaussianInput, mesh: Mesh, axis: str = "dp"):
    """Place a GaussianInput with its gaussian axis sharded over the mesh,
    padding to a device multiple when needed."""
    gi = pad_gaussian_input(gi, mesh.shape[axis])
    specs = _gi_partition_specs(axis)
    return jax.tree_util.tree_map(
        lambda x, sp: jax.device_put(x, NamedSharding(mesh, sp)), gi, specs)


def build_sharded_depth_first(
    mesh: Mesh,
    *,
    width: int, height: int,
    n_total: int,
    sh_degree: int = 3,
    capacity_per_device: int = 0,
    tile_w: int = 16, tile_h: int = 16,
    near_plane: float = 0.1, far_plane: float = 100.0,
    alpha_threshold: float = cfg.DEFAULT_ALPHA_THRESHOLD,
    total_ink_threshold: float = cfg.DEFAULT_TOTAL_INK_THRESHOLD,
    input_is_srgb: bool = False,
    use_xla_blend: bool | None = None,
    axis: str = "dp",
    band_starts: tuple | None = None,
    pallas_project: bool | None = None,
    use_keyplan: bool = True,
    split_frame: bool | None = None,
    interpret: bool = False,
):
    """Returns a jitted ``fn(gi_sharded, view, proj, center) -> (color, depth,
    overflow)`` running the full DepthFirst render step over every device in
    ``mesh``.

    ``band_starts``: optional STATIC tile-row boundaries (len n_dev + 1,
    monotone, [0] == 0, [-1] >= tiles_y) — content-adaptive load balancing
    (:func:`balance_band_starts` from a measured per-row instance histogram).
    SPMD keeps one uniform program: every device renders a ``bands``-row
    (max band height) raster; rows past its own band stay empty (the blend's
    empty-tile skip makes them ~free) and the final image is stitched from
    STATIC per-device row segments.  None = equal split (row-uniform).

    ``pallas_project``: run the fused Pallas projection kernel per shard (the
    mono production projection).  None = auto (on whenever the Pallas blend
    is on).  ``interpret`` runs the kernel in interpreter mode (CPU tests).

    ``use_keyplan``: tie-free fused sort keys -> the per-band instance sort
    runs unstable with exact reference tie order (the mono production sort);
    falls back to the stable 2-key sort when the bit budget can't hold the
    plan.

    ``split_frame``: dispatch pre | bare-sort | post as three separate
    programs (the mono production shape; see module docstring).  None = auto:
    split only on a real local TPU backend — through the axon tunnel and on
    CPU meshes the per-dispatch overhead exceeds the sort win (BACKLOG
    receipts), matching DepthFirstRenderer's auto-select.
    """
    n_dev = mesh.shape[axis]
    tiles_x, tiles_y = cfg.tiles_for(width, height, tile_w, tile_h)
    if band_starts is not None:
        bs = tuple(int(b) for b in band_starts)
        assert len(bs) == n_dev + 1 and bs[0] == 0 and bs[-1] >= tiles_y \
            and all(b1 > b0 for b0, b1 in zip(bs, bs[1:])), bs
        bands = max(b1 - b0 for b0, b1 in zip(bs, bs[1:]))
    else:
        # equal split: pad tile rows to a band multiple
        bands = -(-tiles_y // n_dev)
        bs = tuple(d * bands for d in range(n_dev + 1))
    if capacity_per_device <= 0:
        # exact pre-count masks travel with the all-gather and are band-shifted
        # per device, so the per-band capacity follows the mono 4x model
        # (the reference's maxInstances discipline) instead of the inflated
        # full-rect factor
        capacity_per_device = (cfg.INSTANCE_CAPACITY_FACTOR * n_total) // n_dev
    # expand_slots_pallas requires capacity % 1024 == 0 (kernels/expand.py BLK);
    # round up to 4096 like the mono instance_capacity helper.
    capacity_per_device = -(-capacity_per_device // 4096) * 4096
    if use_xla_blend is None:
        use_xla_blend = jax.default_backend() not in ("tpu", "axon")
    if pallas_project is None:
        pallas_project = not use_xla_blend
    if split_frame is None:
        # mono auto-select parity: split only where a dispatch is cheap
        # (real local TPU); the axon tunnel pays ~1.5-3 ms per execution
        split_frame = jax.default_backend() == "tpu"

    # the gathered gaussian order IS the global input order (tiled all_gather
    # concatenates shards in order), so KeyPlan's index tiebreak reproduces
    # the mono tie order exactly; tile ids are band-local
    n_padded = n_total + ((-n_total) % n_dev)
    key_plan = None
    if use_keyplan:
        key_plan = B.make_key_plan(tiles_x * bands, n_padded,
                                   near_plane=near_plane, far_plane=far_plane)

    def _project_shard(gi_shard: GaussianInput, view, proj, center):
        """DP stage on the local shard -> (word_list, min_tx, min_ty, max_ty,
        rect_w, depth_key, visible, mask) — everything the gather carries."""
        from ..kernels import expand as E
        from ..pipelines.common import pack_record_words
        if pallas_project:
            # the mono production projection kernel (project + cull +
            # quantize + pack in one HBM pass); key_plan=None -> dsw is the
            # raw 32-bit sortable depth key (normalization happens in
            # binning_sort_operands against the band-local plan)
            from ..kernels.project import project_and_cull_packed
            packed = project_and_cull_packed(
                gi_shard, view, proj, center,
                width=width, height=height, tile_w=tile_w, tile_h=tile_h,
                sh_degree=sh_degree, near_plane=near_plane,
                far_plane=far_plane, alpha_threshold=alpha_threshold,
                total_ink_threshold=total_ink_threshold,
                input_is_srgb=input_is_srgb, key_plan=None,
                interpret=interpret)
            word_list = list(packed.words)
            min_tx, min_ty, rect_w = B.unpack_rect_word(packed.rect_word)
            max_ty = min_ty + packed.rect_h - 1
            visible = packed.visible
            depth_key = packed.dsw
        else:
            pr = project_and_cull(
                gi_shard, view, proj, center,
                width=width, height=height, tile_w=tile_w, tile_h=tile_h,
                sh_degree=sh_degree, near_plane=near_plane,
                far_plane=far_plane, alpha_threshold=alpha_threshold,
                total_ink_threshold=total_ink_threshold,
                input_is_srgb=input_is_srgb)
            words = pack_record_words(pr.record)
            word_list = [words[:, k] for k in range(4)]
            min_tx, min_ty, rect_w = pr.min_tx, pr.min_ty, \
                pr.max_tx - pr.min_tx + 1
            max_ty = pr.max_ty
            visible = pr.visible
            depth_key = pr.depth_key
        # exact 8x4 pre-count mask in GLOBAL display coordinates, computed on
        # the owning shard (the same predicate the mono path pre-counts with;
        # band devices sub-mask it after the gather)
        rect_h = max_ty - min_ty + 1
        mask, _ = E.exact_tile_masks(
            word_list[0], word_list[1], word_list[2], word_list[3],
            min_tx, min_ty, rect_w, rect_h, tile_w, tile_h, alpha_threshold)
        return word_list, min_tx, min_ty, max_ty, rect_w, depth_key, \
            visible, mask

    def _pre_body(gi_shard: GaussianInput, view, proj, center):
        """Project the local shard, all-gather, band-clamp, and stop at the
        instance-sort operands (the mono pre-frame shape)."""
        from ..kernels import expand as E
        from ..pipelines.common import binning_sort_operands

        word_list, min_tx, min_ty, max_ty, rect_w, depth_key, visible, \
            mask_l = _project_shard(gi_shard, view, proj, center)
        rect_word = B.pack_rect_word(min_tx, min_ty, rect_w)
        rect_rows = B.pack_rect_word(min_ty, max_ty, jnp.zeros_like(min_ty))
        # culled gaussians carry the sentinel depth key (live keys are
        # sortable floats in [near, far], always < 0xFFFFFFFF), so visibility
        # rides the depth-key plane through the gather for free
        depth_key = jnp.where(visible, depth_key, jnp.uint32(0xFFFFFFFF))

        # --- the one collective: all-gather compact per-gaussian data over ICI
        # (4 record words + rect + rows + depth key + mask = 32 B/gaussian)
        ag = lambda x: jax.lax.all_gather(x, axis, tiled=True)
        words_g = [ag(w) for w in word_list]
        rect_word_g = ag(rect_word)
        rect_rows_g = ag(rect_rows)
        depth_key_g = ag(depth_key)
        mask_g = ag(mask_l)
        visible_g = depth_key_g != jnp.uint32(0xFFFFFFFF)
        rect_w_g = ((rect_word_g >> 20) & jnp.uint32(0x3FF)).astype(jnp.int32)

        # --- SP: clamp every rect to this device's tile-row band --------------
        band = jax.lax.axis_index(axis)
        # static boundary tables (built in-trace from Python ints: module
        # jnp constants trip jax 0.9.0's const-arg dispatch — CLAUDE.md)
        band0 = jnp.asarray(bs[:-1], jnp.int32)[band]
        band1 = jnp.asarray(bs[1:], jnp.int32)[band]  # exclusive

        min_ty_g = (rect_rows_g & jnp.uint32(0x3FF)).astype(jnp.int32)
        max_ty_g = ((rect_rows_g >> 10) & jnp.uint32(0x3FF)).astype(jnp.int32)
        bty0 = jnp.maximum(min_ty_g, band0)
        bty1 = jnp.minimum(max_ty_g, band1 - 1)
        rows_in_band = jnp.maximum(bty1 - bty0 + 1, 0)
        visible_here = visible_g & (rows_in_band > 0)
        counts = jnp.where(visible_here, rect_w_g * rows_in_band, 0)

        # band sub-mask: the global mask's rows rebased to the band clamp
        # (bit = dy * 8 + dx relative to min_ty; the band keeps rows
        # [bty0 - min_ty, bty1 - min_ty]) — eligible gaussians get exact
        # band-local counts and the expand kernel's j-th-set-bit mapping
        # works unchanged against the band-local min row
        rect_h_full = max_ty_g - min_ty_g + 1
        # eligible gaussians (rect_h <= MASK_H, >= 1 row in band) shift by at
        # most MASK_H - 1; the clip also keeps the u32 shift in-range for
        # ineligible ones whose sub_mask is never used
        shift = jnp.clip(bty0 - min_ty_g, 0, E.MASK_H - 1)
        sub_mask = mask_g >> (8 * shift).astype(jnp.uint32)
        rows_bits = jnp.where(
            rows_in_band >= E.MASK_H, jnp.uint32(0xFFFFFFFF),
            (jnp.uint32(1) << (8 * jnp.clip(rows_in_band, 0, E.MASK_H - 1))
             .astype(jnp.uint32)) - jnp.uint32(1))
        sub_mask = sub_mask & rows_bits
        eligible = (visible_here & (rect_w_g <= E.MASK_W)
                    & (rect_h_full <= E.MASK_H))
        sub_cnt = E._popcount(sub_mask)
        counts = jnp.where(eligible, sub_cnt, counts)
        visible_here = visible_here & (~eligible | (sub_cnt > 0))

        # fused binning in band-local tile space: every gathered gaussian owns
        # >= 1 slot; not-in-band ones are flagged culled; the exact per-tile
        # test runs in global coordinates via tile_row_offset
        min_tx_g = (rect_word_g & jnp.uint32(0x3FF)).astype(jnp.int32)
        max_tx_g = min_tx_g + rect_w_g - 1
        sort_ops, spec, plan_tuple, _total, ovf = binning_sort_operands(
            visible_here, min_tx_g, bty0 - band0, max_tx_g, counts,
            depth_key_g, words_g, capacity=capacity_per_device,
            tiles_x=tiles_x, fused_depth16=False,
            use_pallas=not use_xla_blend, interpret=interpret,
            exact_test=True, tile_w=tile_w, tile_h=tile_h,
            alpha_threshold=alpha_threshold, tile_row_offset=band0,
            mask_override=(sub_mask, sub_cnt, eligible), key_plan=key_plan)
        # propagate per-band capacity overflow (the mono header reports it;
        # the sharded path must too — a hot band silently dropping instances
        # is otherwise invisible)
        overflow = jax.lax.pmax(ovf.astype(jnp.int32), axis)
        return sort_ops, spec, plan_tuple, overflow

    # static sort spec: derived from the (static) key plan exactly like
    # binning_sort_operands does
    if key_plan is not None:
        sort_spec = (2, False, 1)
        plan_tuple_static = key_plan.kernel_tuple
    else:
        sort_spec = (2, True, 1)
        plan_tuple_static = None

    def _post_body(sorted_key, sw):
        """Sorted keys -> band tile ranges -> blend -> band image (the mono
        post-frame shape)."""
        from ..pipelines.common import binning_sorted_tile, \
            sorted_instance_attrs

        band = jax.lax.axis_index(axis)
        band0 = jnp.asarray(bs[:-1], jnp.int32)[band]
        sorted_tile = binning_sorted_tile(sorted_key, fused_depth16=False,
                                          plan_tuple=plan_tuple_static)
        starts, cts = B.extract_tile_ranges(sorted_tile, tiles_x * bands)

        if use_xla_blend:
            sorted_words = jnp.stack(sw, axis=-1)
            global_key = jnp.where(sorted_tile == jnp.uint32(B.SENTINEL_KEY),
                                   jnp.uint32(B.SENTINEL_KEY),
                                   sorted_tile + jnp.uint32(band0 * tiles_x))
            attrs = sorted_instance_attrs(
                sorted_words, global_key, tiles_x=tiles_x, tile_w=tile_w,
                tile_h=tile_h, alpha_threshold=alpha_threshold,
                exact_tile_test=False)
            # the XLA blend uses band-local pixel rows; shift the linear-form
            # constants by the band's pixel offset
            band_py = (band0 * tile_h).astype(jnp.float32)
            attrs = dict(attrs,
                         c1=attrs["c1"] + attrs["b1"] * band_py,
                         c2=attrs["c2"] + attrs["b2"] * band_py)
            table = K.build_blend_table(attrs, capacity_per_device)
            tc, td = K.blend_tiles_xla(table, starts, cts, tiles_x=tiles_x,
                                       tiles_y=bands,
                                       max_per_tile=min(capacity_per_device,
                                                        2048),
                                       tile_w=tile_w, tile_h=tile_h)
        else:
            wtable = K.build_words_table(sw, capacity_per_device)
            tc, td = K.blend_tiles_pallas(wtable, starts, cts, tiles_x=tiles_x,
                                          tiles_y=bands, tile_w=tile_w,
                                          tile_h=tile_h,
                                          tile_row_offset=band0,
                                          interpret=interpret)
        return K.assemble_image(tc, td, tiles_x=tiles_x, tiles_y=bands,
                                width=width, height=bands * tile_h,
                                tile_w=tile_w, tile_h=tile_h)

    def _stitch(color, depth):
        if band_starts is None:
            return color[:height], depth[:height]
        # stitch the STATIC per-device row segments (each device rendered a
        # max-height raster; only its own band's rows are real)
        segs_c, segs_d = [], []
        for d in range(n_dev):
            r0 = d * bands * tile_h
            h_d = (bs[d + 1] - bs[d]) * tile_h
            segs_c.append(color[r0:r0 + h_d])
            segs_d.append(depth[r0:r0 + h_d])
        return (jnp.concatenate(segs_c)[:height],
                jnp.concatenate(segs_d)[:height])

    smap = functools.partial(jax.shard_map, mesh=mesh, check_vma=False)

    if not split_frame:
        def local_frame(gi_shard, view, proj, center):
            sort_ops, (num_keys, is_stable, drop), _plan, overflow = \
                _pre_body(gi_shard, view, proj, center)
            ops = jax.lax.sort(sort_ops, num_keys=num_keys,
                               is_stable=is_stable)
            color, depth = _post_body(ops[0], ops[1 + drop:])
            return color, depth, overflow

        mapped = smap(local_frame,
                      in_specs=(_gi_partition_specs(axis), P(), P(), P()),
                      out_specs=(P(axis), P(axis), P()))

        @jax.jit
        def render(gi_sharded, view, proj, center):
            color, depth, overflow = mapped(gi_sharded, view, proj, center)
            color, depth = _stitch(color, depth)
            return color, depth, overflow

        return render

    # --- 3-program production split: pre | bare sort | post -----------------
    num_keys, is_stable, drop = sort_spec
    n_ops = 6  # key, d_slot, 4 record words

    def pre_local(gi_shard, view, proj, center):
        sort_ops, _spec, _plan, overflow = _pre_body(gi_shard, view, proj,
                                                     center)
        return (*sort_ops, overflow)

    pre_mapped = smap(pre_local,
                      in_specs=(_gi_partition_specs(axis), P(), P(), P()),
                      out_specs=(*([P(axis)] * n_ops), P()))

    def sort_local(*ops):
        # the bare per-band sort: each device sorts ITS band's instances —
        # nothing else shares this program (composed-sort pathology)
        return jax.lax.sort(ops, num_keys=num_keys, is_stable=is_stable)

    sort_mapped = smap(sort_local, in_specs=tuple([P(axis)] * n_ops),
                       out_specs=tuple([P(axis)] * n_ops))

    def post_local(sorted_key, *sw):
        color, depth = _post_body(sorted_key, sw)
        return color, depth

    post_mapped = smap(post_local,
                       in_specs=tuple([P(axis)] * (n_ops - drop)),
                       out_specs=(P(axis), P(axis)))

    pre_jit = jax.jit(pre_mapped)
    sort_jit = jax.jit(sort_mapped)

    @jax.jit
    def post_jit(sorted_key, *sw):
        color, depth = post_mapped(sorted_key, *sw)
        return (*_stitch(color, depth),)

    def render(gi_sharded, view, proj, center):
        outs = pre_jit(gi_sharded, view, proj, center)
        sort_ops, overflow = outs[:-1], outs[-1]
        sorted_ops = sort_jit(*sort_ops)
        color, depth = post_jit(sorted_ops[0], *sorted_ops[1 + drop:])
        return color, depth, overflow

    return render


def row_instance_histogram(gi: GaussianInput, view, proj, center, *,
                           width: int, height: int, tile_w: int = 16,
                           tile_h: int = 16, sh_degree: int = 3,
                           near_plane: float = 0.1, far_plane: float = 100.0,
                           alpha_threshold: float = cfg.DEFAULT_ALPHA_THRESHOLD,
                           total_ink_threshold: float =
                           cfg.DEFAULT_TOTAL_INK_THRESHOLD,
                           input_is_srgb: bool = False):
    """Per-tile-row instance counts (exact pre-count masks where eligible,
    full rects otherwise) — the planning input for
    :func:`balance_band_starts`.  Single-device; run once per scene/viewpoint
    class, not per frame."""
    from ..kernels import expand as E
    from ..pipelines.common import pack_record_words
    tiles_x, tiles_y = cfg.tiles_for(width, height, tile_w, tile_h)
    pr = project_and_cull(
        gi, view, proj, center, width=width, height=height, tile_w=tile_w,
        tile_h=tile_h, sh_degree=sh_degree, near_plane=near_plane,
        far_plane=far_plane, alpha_threshold=alpha_threshold,
        total_ink_threshold=total_ink_threshold, input_is_srgb=input_is_srgb)
    words = pack_record_words(pr.record)
    rect_w = pr.max_tx - pr.min_tx + 1
    rect_h = pr.max_ty - pr.min_ty + 1
    mask, _cnt = E.exact_tile_masks(
        words[:, 0], words[:, 1], words[:, 2], words[:, 3],
        pr.min_tx, pr.min_ty, rect_w, rect_h, tile_w, tile_h, alpha_threshold)
    eligible = pr.visible & (rect_w <= E.MASK_W) & (rect_h <= E.MASK_H)
    hist = jnp.zeros(tiles_y, jnp.int32)
    for dy in range(E.MASK_H):
        row_bits = (mask >> (8 * dy)) & jnp.uint32(0xFF)
        row_cnt = jnp.where(
            eligible, E._popcount(row_bits),
            jnp.where(pr.visible & (dy < rect_h), rect_w, 0))
        hist = hist + jax.ops.segment_sum(
            row_cnt, jnp.clip(pr.min_ty + dy, 0, tiles_y - 1),
            num_segments=tiles_y)
    # ineligible tall rects: rows past MASK_H still count
    import numpy as np
    extra_rows = int(jnp.max(jnp.where(pr.visible, rect_h, 0)))
    for dy in range(E.MASK_H, max(extra_rows, E.MASK_H)):
        row_cnt = jnp.where(pr.visible & ~eligible & (dy < rect_h), rect_w, 0)
        hist = hist + jax.ops.segment_sum(
            row_cnt, jnp.clip(pr.min_ty + dy, 0, tiles_y - 1),
            num_segments=tiles_y)
    return np.asarray(hist)


def balance_band_starts(row_hist, n_dev: int):
    """Split tile rows into ``n_dev`` contiguous bands with ~equal instance
    loads: boundary d lands where the cumulative histogram crosses
    total * d / n_dev.  Returns a monotone tuple of length n_dev + 1 for
    :func:`build_sharded_depth_first`'s ``band_starts``."""
    import numpy as np
    hist = np.asarray(row_hist, np.float64)
    tiles_y = hist.shape[0]
    cum = np.concatenate([[0.0], np.cumsum(hist)])
    total = max(cum[-1], 1.0)
    starts = [0]
    for d in range(1, n_dev):
        target = total * d / n_dev
        b = int(np.searchsorted(cum, target, side="left"))
        # the crossing may overshoot by a whole hot row; take the closer side
        if b > 1 and abs(cum[b - 1] - target) < abs(cum[min(b, tiles_y)]
                                                    - target):
            b -= 1
        # monotone, leave at least one row per remaining band
        b = min(max(b, starts[-1] + 1), tiles_y - (n_dev - d))
        starts.append(b)
    starts.append(tiles_y)
    return tuple(starts)
