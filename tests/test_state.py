"""State-model tests: window ring buffer semantics, culling, masked updates."""

import jax.numpy as jnp
import numpy as np

from photobundle_tpu.config import PBAConfig
from photobundle_tpu.core import state


def mk(cfg=None, shape=(16, 20)):
    cfg = cfg or PBAConfig(maxNumPoints=8, slidingWindowSize=3, maxIterations=2)
    return cfg, state.init_window(cfg, shape), state.init_point_table(cfg)


def push(win, pts, fid, shape=(16, 20), cfg=None):
    cfg = cfg or PBAConfig(maxNumPoints=8, slidingWindowSize=3)
    c = cfg.num_channels
    h, w = shape
    return state.push_frame(
        win,
        jnp.full((c, h, w), float(fid)),
        jnp.zeros((c, h, w, 2)),
        jnp.zeros((h, w)),
        jnp.eye(4) * 1.0,
        fid,
        jnp.zeros((h, w)),
        jnp.zeros((h, w), bool),
        pts,
    )


def test_push_fills_then_slides():
    cfg, win, pts = mk()
    for fid in range(3):
        win, pts = push(win, pts, fid)
        assert int(win.count) == fid + 1
    np.testing.assert_array_equal(np.asarray(win.frame_ids), [0, 1, 2])
    # Channel content tracks slot order.
    assert float(win.channels[0, 0, 0, 0]) == 0.0
    win, pts = push(win, pts, 3)
    assert int(win.count) == 3
    np.testing.assert_array_equal(np.asarray(win.frame_ids), [1, 2, 3])
    assert float(win.channels[0, 0, 0, 0]) == 1.0
    assert float(win.channels[2, 0, 0, 0]) == 3.0


def test_slide_rolls_observation_mask():
    cfg, win, pts = mk()
    for fid in range(3):
        win, pts = push(win, pts, fid)
    # Observation in slots (0, 2) for point 0.
    pts = pts._replace(
        obs=pts.obs.at[0, 0].set(True).at[0, 2].set(True),
        active=pts.active.at[0].set(True),
        ref_frame=pts.ref_frame.at[0].set(0),
    )
    win, pts = push(win, pts, 3)
    obs = np.asarray(pts.obs[0])
    # Old slot 0 dropped, old slot 2 -> new slot 1, new slot 2 cleared.
    np.testing.assert_array_equal(obs, [False, True, False])


def test_cull_points_by_ref_frame_and_obs():
    cfg, win, pts = mk()
    pts = pts._replace(
        active=pts.active.at[:3].set(True),
        ref_frame=pts.ref_frame.at[0].set(0).at[1].set(5).at[2].set(6),
        obs=pts.obs.at[0, 0].set(True).at[1, 1].set(True),  # point 2: no obs
    )
    out = state.cull_points(pts, jnp.asarray(5))
    active = np.asarray(out.active)
    assert not active[0]      # ref frame left the window
    assert active[1]
    assert not active[2]      # no observations
    assert not np.asarray(out.obs)[0].any()


def test_window_is_full():
    cfg, win, pts = mk()
    assert not bool(win.is_full())
    for fid in range(3):
        win, pts = push(win, pts, fid)
    assert bool(win.is_full())
