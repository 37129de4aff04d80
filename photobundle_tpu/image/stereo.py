"""TPU-native stereo block matching (disparity estimation).

Replaces the reference's OpenCV `cv::StereoBM` / `cv::StereoSGBM` call in the
dataset layer (pb:src/dataset.cc `StereoAlgorithm::run`). The reference runs
SAD block matching on the CPU per frame; here the whole cost volume is one
fused XLA program: for each candidate disparity, a shifted absolute
difference, box-filtered with a separable cumulative-sum window — a
(D, H, W) tensor pipeline that maps cleanly onto the VPU with zero
data-dependent shapes. Winner-take-all + sub-pixel parabola refinement +
uniqueness/texture gating reproduce StereoBM's postprocessing semantics.

Depth from disparity stays in geometry/camera.py (`disparity_to_depth`).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp


def _box_filter(img: jax.Array, radius: int) -> jax.Array:
    """Separable box sum over (2r+1)^2 windows, edge-padded. (..., H, W)."""
    k = 2 * radius + 1
    p = jnp.pad(img, [(0, 0)] * (img.ndim - 2) + [(radius, radius), (radius, radius)], mode="edge")
    # cumsum trick: sum over window = cs[i + k] - cs[i]
    cs = jnp.cumsum(p, axis=-1)
    cs = jnp.pad(cs, [(0, 0)] * (img.ndim - 1) + [(1, 0)])
    out = cs[..., k:] - cs[..., :-k]
    cs = jnp.cumsum(out, axis=-2)
    cs = jnp.pad(cs, [(0, 0)] * (img.ndim - 2) + [(1, 0), (0, 0)])
    return cs[..., k:, :] - cs[..., :-k, :]


def prefilter_xsobel(img: jax.Array, cap: float) -> jax.Array:
    """cv::StereoBM PREFILTER_XSOBEL analog (the reference's dataset layer
    runs cv::StereoBM, whose default prefilter is exactly this): horizontal
    3x3 Sobel response, clamped to [-cap, cap]. Removes low-frequency
    illumination/exposure differences between the two views so SAD matches
    structure, not absolute brightness. `cap` is in image units (images
    here are [0, 1]; OpenCV's 8-bit default preFilterCap=31 corresponds to
    ~0.12)."""
    p = jnp.pad(img, 1, mode="edge")
    gx = ((p[:-2, 2:] + 2.0 * p[1:-1, 2:] + p[2:, 2:])
          - (p[:-2, :-2] + 2.0 * p[1:-1, :-2] + p[2:, :-2]))
    return jnp.clip(gx, -cap, cap)


def _lr_consistency(cost: jax.Array, best_l: jax.Array, min_disparity: int,
                    max_diff: float = 1.0) -> jax.Array:
    """Left-right consistency gate from ONE cost volume.

    The right image's matching cost is the same volume re-indexed by the
    ACTUAL disparity: costR[d, y, xR] = costL[d, y, xR + d + min_disparity]
    (see the shift below). Repetitive texture aliases the
    left match but rarely aliases consistently in both directions, so
    requiring |dL(x) - dR(x - dL(x))| <= max_diff removes the gross
    outliers (measured: ~15% of 'valid' BM depths on periodic synthetic
    texture were >20% wrong before this gate). cost: (D, H, W) with +inf
    at masked entries; best_l: (H, W) winning disparity INDEX."""
    d_count, h, w = cost.shape
    # costR via a per-plane left-shift by the ACTUAL disparity (index +
    # min_disparity): plane di at left column xl scores the pair
    # (xl, xl - di - min_disparity), so the right-view cost at column xr is
    # costL[di, xr + di + min_disparity]. (Roll wraps; wrapped entries land
    # on columns whose dR is out of range and compare unequal anyway.)
    cost_r = jax.vmap(lambda c, d: jnp.roll(c, -d, axis=1))(
        cost, jnp.arange(d_count) + min_disparity)
    best_r = jnp.argmin(cost_r, axis=0)                       # (H, W) index
    # dR sampled at xR = x - dL(x).
    col = jax.lax.broadcasted_iota(jnp.int32, (h, w), 1)
    xr = jnp.clip(col - (best_l + min_disparity), 0, w - 1)
    d_r_at = jnp.take_along_axis(best_r, xr, axis=1)          # (H, W)
    return jnp.abs(d_r_at - best_l) <= max_diff


@functools.partial(jax.jit, static_argnames=("num_disparities", "min_disparity",
                                             "sad_radius", "lr_check",
                                             "prefilter_cap"))
def block_match(
    left: jax.Array,
    right: jax.Array,
    num_disparities: int = 64,
    min_disparity: int = 1,
    sad_radius: int = 4,
    uniqueness_ratio: float = 0.97,
    texture_threshold: float = 0.02,
    lr_check: bool = True,
    prefilter_cap: float = 0.0,
) -> tuple[jax.Array, jax.Array]:
    """SAD block matching. left/right: (H, W) in [0, 1].

    prefilter_cap > 0 enables the X-Sobel prefilter (see prefilter_xsobel);
    matching AND the texture gate then run on the filtered response, so
    texture_threshold is in gradient units rather than intensity units.

    Returns (disparity (H, W) float32 with sub-pixel refinement,
             valid (H, W) bool).
    """
    if prefilter_cap > 0.0:
        left = prefilter_xsobel(left, prefilter_cap)
        right = prefilter_xsobel(right, prefilter_cap)
    h, w = left.shape
    disps = jnp.arange(min_disparity, min_disparity + num_disparities)

    def sad_at(d):
        shifted = jnp.roll(right, d, axis=1)
        # Columns x < d have no valid correspondence; mark with +inf cost.
        ad = jnp.abs(left - shifted)
        cost = _box_filter(ad, sad_radius)
        col = jax.lax.broadcasted_iota(jnp.int32, (h, w), 1)
        return jnp.where(col >= d + sad_radius, cost, jnp.inf)

    cost = jax.vmap(sad_at)(disps)                     # (D, H, W)
    best = jnp.argmin(cost, axis=0)                    # (H, W)
    cmin = jnp.min(cost, axis=0)

    # Sub-pixel parabola on (c[-1], c0, c[+1]).
    d0 = jnp.clip(best, 1, num_disparities - 2)
    take = lambda idx: jnp.take_along_axis(cost, idx[None], axis=0)[0]
    cm = take(d0 - 1)
    c0 = take(d0)
    cp = take(d0 + 1)
    # Neighbors can be +inf (border columns); a finite parabola needs all 3.
    all_finite = jnp.isfinite(cm) & jnp.isfinite(c0) & jnp.isfinite(cp)
    denom = jnp.where(all_finite, cm - 2 * c0 + cp, 1.0)
    delta = jnp.where(all_finite & (jnp.abs(denom) > 1e-9),
                      0.5 * (cm - cp) / jnp.where(denom == 0, 1.0, denom), 0.0)
    delta = jnp.clip(delta, -0.5, 0.5)
    disparity = (best + min_disparity).astype(jnp.float32) + jnp.where(best == d0, delta, 0.0)

    # Uniqueness: best cost must beat the runner-up (excluding neighbors).
    d_idx = jax.lax.broadcasted_iota(jnp.int32, cost.shape, 0)
    masked = jnp.where(jnp.abs(d_idx - best[None]) <= 1, jnp.inf, cost)
    second = jnp.min(masked, axis=0)
    unique = cmin <= uniqueness_ratio * second

    # Texture: reject windows with too little intensity variation.
    k = 2 * sad_radius + 1
    n_px = float(k * k)
    mean = _box_filter(left, sad_radius) / n_px
    var = _box_filter(left * left, sad_radius) / n_px - mean * mean
    textured = jnp.sqrt(jnp.maximum(var, 0.0)) > texture_threshold

    at_edge = (best == 0) | (best == num_disparities - 1)
    valid = jnp.isfinite(cmin) & unique & textured & ~at_edge
    if lr_check:
        valid = valid & _lr_consistency(cost, best, min_disparity)
    return jnp.where(valid, disparity, 0.0), valid


def _aggregate_dir_h(cost: jax.Array, p1: float, p2: float,
                     reverse: bool) -> jax.Array:
    """Horizontal SGM path: scan over x carrying (H, D) path costs."""
    d_axis = cost.shape[0]
    # (D, H, W) -> (W, H, D) scan elements
    seq = jnp.moveaxis(cost, (0, 1, 2), (2, 1, 0))

    def step(carry, c):
        # carry (H, D): aggregated cost at previous pixel along the path
        prev_min = jnp.min(carry, axis=-1, keepdims=True)
        lo = jnp.pad(carry, ((0, 0), (1, 0)), constant_values=jnp.inf)[:, :-1]
        hi = jnp.pad(carry, ((0, 0), (0, 1)), constant_values=jnp.inf)[:, 1:]
        best = jnp.minimum(
            jnp.minimum(carry, prev_min + p2),
            jnp.minimum(lo + p1, hi + p1))
        out = c + best - prev_min
        return out, out

    # First pixel along the path has no predecessor: its aggregated cost
    # is the raw cost; seed the scan with it.
    first = seq[-1] if reverse else seq[0]
    if reverse:
        _, rest = jax.lax.scan(step, first, seq[:-1], reverse=True)
        out = jnp.concatenate([rest, first[None]], axis=0)
    else:
        _, rest = jax.lax.scan(step, first, seq[1:], reverse=False)
        out = jnp.concatenate([first[None], rest], axis=0)
    return jnp.moveaxis(out, (0, 1, 2), (2, 1, 0))


@functools.partial(jax.jit, static_argnames=(
    "num_disparities", "min_disparity", "sad_radius", "lr_check",
    "prefilter_cap"))
def semi_global_match(
    left: jax.Array,
    right: jax.Array,
    num_disparities: int = 64,
    min_disparity: int = 1,
    sad_radius: int = 2,
    p1: float = 0.03,
    p2: float = 0.4,
    uniqueness_ratio: float = 0.97,
    texture_threshold: float = 0.02,
    lr_check: bool = True,
    prefilter_cap: float = 0.0,
) -> tuple[jax.Array, jax.Array]:
    """Semi-global matching — the reference's cv::StereoSGBM counterpart.

    SAD matching costs (same base cost as block_match, smaller default
    window) aggregated along 4 scanline directions (left/right/up/down —
    OpenCV's SGBM default mode aggregates 5 paths; 4-path is the standard
    TPU/GPU formulation) with the Hirschmueller P1/P2 smoothness model,
    then the same winner-take-all + sub-pixel + gating postprocessing as
    block_match. Each direction is one `lax.scan` whose carry is a full
    scanline's (pixels, D) cost slice — compiler-friendly control flow, no
    data-dependent shapes.

    prefilter_cap > 0 enables the X-Sobel prefilter (see prefilter_xsobel).
    """
    if prefilter_cap > 0.0:
        left = prefilter_xsobel(left, prefilter_cap)
        right = prefilter_xsobel(right, prefilter_cap)
    h, w = left.shape
    disps = jnp.arange(min_disparity, min_disparity + num_disparities)

    def sad_at(d):
        shifted = jnp.roll(right, d, axis=1)
        ad = jnp.abs(left - shifted)
        c = _box_filter(ad, sad_radius)
        col = jax.lax.broadcasted_iota(jnp.int32, (h, w), 1)
        # Finite sentinel (not inf): path aggregation propagates values
        # along rows, and inf would poison every pixel behind it.
        big = jnp.asarray(1e4, c.dtype)
        return jnp.where(col >= d + sad_radius, c, big)

    cost = jax.vmap(sad_at)(disps)                    # (D, H, W)

    # 4-path aggregation: horizontal pair + vertical pair (via transpose).
    agg = _aggregate_dir_h(cost, p1, p2, reverse=False)
    agg = agg + _aggregate_dir_h(cost, p1, p2, reverse=True)
    cost_t = jnp.swapaxes(cost, 1, 2)
    agg_v = _aggregate_dir_h(cost_t, p1, p2, reverse=False)
    agg_v = agg_v + _aggregate_dir_h(cost_t, p1, p2, reverse=True)
    cost_sum = agg + jnp.swapaxes(agg_v, 1, 2)        # (D, H, W)

    best = jnp.argmin(cost_sum, axis=0)
    cmin = jnp.min(cost_sum, axis=0)

    d0 = jnp.clip(best, 1, num_disparities - 2)
    take = lambda idx: jnp.take_along_axis(cost_sum, idx[None], axis=0)[0]
    cm = take(d0 - 1)
    c0 = take(d0)
    cp = take(d0 + 1)
    denom = cm - 2 * c0 + cp
    delta = jnp.where(jnp.abs(denom) > 1e-9,
                      0.5 * (cm - cp) / jnp.where(denom == 0, 1.0, denom), 0.0)
    delta = jnp.clip(delta, -0.5, 0.5)
    disparity = (best + min_disparity).astype(jnp.float32) + jnp.where(
        best == d0, delta, 0.0)

    d_idx = jax.lax.broadcasted_iota(jnp.int32, cost_sum.shape, 0)
    masked = jnp.where(jnp.abs(d_idx - best[None]) <= 1, jnp.inf, cost_sum)
    second = jnp.min(masked, axis=0)
    unique = cmin <= uniqueness_ratio * second

    k = 2 * sad_radius + 1
    n_px = float(k * k)
    mean = _box_filter(left, sad_radius) / n_px
    var = _box_filter(left * left, sad_radius) / n_px - mean * mean
    textured = jnp.sqrt(jnp.maximum(var, 0.0)) > texture_threshold

    # Reject pixels whose raw cost at the winner was the sentinel (no
    # valid correspondence) and disparity-range edges.
    raw_at_best = jnp.take_along_axis(cost, best[None], axis=0)[0]
    at_edge = (best == 0) | (best == num_disparities - 1)
    valid = (raw_at_best < 1e3) & unique & textured & ~at_edge
    if lr_check:
        # Consistency on the AGGREGATED volume (smoothness-aware in both
        # directions); big-sentinel masked entries behave like inf here.
        valid = valid & _lr_consistency(cost_sum, best, min_disparity)
    return jnp.where(valid, disparity, 0.0), valid
