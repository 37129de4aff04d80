"""Static-shape BA state: fixed-capacity point table + window ring buffer.

This is the design keystone (SURVEY.md section 7.3): the reference's dynamic
data structures — `std::vector<ScenePoint>` with insert/erase and a
`boost::circular_buffer` of descriptor frames (pb:src/photobundle.h) — become
fixed-capacity arrays with occupancy masks. Every "dynamic" behavior
(selection, culling, window slide) is a masked update at static shape, so the
whole engine state is a pytree that flows through `jit` without recompiles
and shards over a device mesh without reshapes.

Layout (N = cfg.maxNumPoints, W = cfg.slidingWindowSize, D = cfg.patch_dim,
C = channels, P = patch pixels):

    PointTable
        x_world   (N, 3)    point positions, world frame
        patch     (N, C, P) mean-normalized reference descriptor patch
        ref_frame (N,)      global frame id of the reference frame
        last_seen (N,)      global frame id of the newest observation
        active    (N,)      slot occupancy
        obs       (N, W)    visibility against window *slots*

    Window (slot 0 = oldest, slot W-1 = newest; slides by jnp.roll)
        channels  (W, C, H, W_img)   descriptor channels at refinement level
        grads     (W, C, H, W_img, 2)
        saliency  (W, H, W_img)
        t_wc      (W, 4, 4)          world-from-camera poses
        t_vo      (W, 4, 4)          RAW VO input poses (never refined) —
                                     the absolute anchor for posePriorWeight
        frame_ids (W,)               global frame ids (-1 = empty slot)
        depth     (W, H, W_img)      metric depth (for new-point init)
        depth_ok  (W, H, W_img)      depth validity
        count     ()                 number of occupied slots
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..config import PBAConfig


class PointTable(NamedTuple):
    x_world: jax.Array
    patch: jax.Array
    ref_frame: jax.Array
    last_seen: jax.Array
    active: jax.Array
    obs: jax.Array
    inv_depth_seed: jax.Array  # (N,) 1/z at creation (stereo prior anchor)

    @property
    def capacity(self) -> int:
        return self.x_world.shape[0]

    def num_active(self) -> jax.Array:
        return jnp.sum(self.active.astype(jnp.int32))


class Window(NamedTuple):
    channels: jax.Array
    grads: jax.Array
    saliency: jax.Array
    t_wc: jax.Array
    t_vo: jax.Array
    frame_ids: jax.Array
    depth: jax.Array
    depth_ok: jax.Array
    count: jax.Array

    @property
    def size(self) -> int:
        return self.channels.shape[0]

    def is_full(self) -> jax.Array:
        return self.count >= self.size


def init_point_table(cfg: PBAConfig, dtype=jnp.float32) -> PointTable:
    n = cfg.maxNumPoints
    c = cfg.num_channels
    p = cfg.patch_size * cfg.patch_size
    w = cfg.slidingWindowSize
    return PointTable(
        x_world=jnp.zeros((n, 3), dtype),
        patch=jnp.zeros((n, c, p), dtype),
        ref_frame=jnp.full((n,), -1, jnp.int32),
        last_seen=jnp.full((n,), -1, jnp.int32),
        active=jnp.zeros((n,), bool),
        obs=jnp.zeros((n, w), bool),
        inv_depth_seed=jnp.full((n,), 1.0, dtype),
    )


def init_window(cfg: PBAConfig, image_shape, dtype=jnp.float32) -> Window:
    h, wimg = image_shape
    w = cfg.slidingWindowSize
    c = cfg.num_channels
    return Window(
        channels=jnp.zeros((w, c, h, wimg), dtype),
        grads=jnp.zeros((w, c, h, wimg, 2), dtype),
        saliency=jnp.zeros((w, h, wimg), dtype),
        t_wc=jnp.broadcast_to(jnp.eye(4, dtype=dtype), (w, 4, 4)),
        t_vo=jnp.broadcast_to(jnp.eye(4, dtype=dtype), (w, 4, 4)),
        frame_ids=jnp.full((w,), -1, jnp.int32),
        depth=jnp.zeros((w, h, wimg), dtype),
        depth_ok=jnp.zeros((w, h, wimg), bool),
        count=jnp.asarray(0, jnp.int32),
    )


def push_frame(win: Window, channels, grads, saliency, t_wc, frame_id, depth, depth_ok,
               points: PointTable):
    """Append a frame to the newest slot; if full, slide (drop oldest).

    Sliding shifts slot indices down by one, so the point table's per-slot
    observation mask rolls with it (slot 0's column is discarded and the new
    slot W-1 column cleared). Mirrors the reference's circular buffer push +
    observation bookkeeping (pb:src/photobundle.cc addFrame).
    """
    w = win.size
    full = win.count >= w

    def place(arr, value, idx):
        return arr.at[idx].set(value)

    def shift_then_place(arr, value):
        return jnp.roll(arr, -1, axis=0).at[w - 1].set(value)

    idx = jnp.minimum(win.count, w - 1)

    def sel(arr, value):
        return jax.lax.cond(
            full,
            lambda a: shift_then_place(a, value),
            lambda a: place(a, value, idx),
            arr,
        )

    new_win = Window(
        channels=sel(win.channels, channels),
        grads=sel(win.grads, grads),
        saliency=sel(win.saliency, saliency),
        t_wc=sel(win.t_wc, t_wc),
        # The incoming pose is the caller's RAW VO estimate; t_wc gets
        # refined by window solves while t_vo keeps the original — the
        # unbiased absolute measurement the pose prior anchors to.
        t_vo=sel(win.t_vo, t_wc),
        frame_ids=sel(win.frame_ids, jnp.asarray(frame_id, jnp.int32)),
        depth=sel(win.depth, depth),
        depth_ok=sel(win.depth_ok, depth_ok),
        count=jnp.minimum(win.count + 1, w),
    )
    obs = jax.lax.cond(
        full,
        lambda o: jnp.roll(o, -1, axis=1).at[:, w - 1].set(False),
        lambda o: o,
        points.obs,
    )
    return new_win, points._replace(obs=obs)


def cull_points(points: PointTable, oldest_frame_id: jax.Array, min_obs: int = 1) -> PointTable:
    """Deactivate points whose reference frame has left the window, or that
    have no remaining window observations. Reference: the slide step of
    pb:src/photobundle.cc (drop points whose ref frame exits the window)."""
    n_obs = jnp.sum(points.obs, axis=1)
    keep = points.active & (points.ref_frame >= oldest_frame_id) & (n_obs >= min_obs)
    return points._replace(
        active=keep,
        obs=points.obs & keep[:, None],
    )
