"""Synthetic textured-sphere scene for end-to-end and solver tests.

A smooth analytic 3D texture lives on a large sphere in front of the
cameras; views are rendered by exact ray-sphere intersection + closed-form
texture evaluation, so multi-view photometric consistency holds to float
precision and ground-truth depth is known — the golden-test setup of
SURVEY.md section 4 ("synthetic scene where PBA must recover ground-truth
poses from perturbed initialization"). A sphere (unlike a plane) gives
depth variation and avoids the classic planar-scene BA degeneracy.
"""

import jax.numpy as jnp
import numpy as np

from photobundle_tpu.geometry import se3
from photobundle_tpu.geometry.camera import Camera

SPHERE_C = np.array([0.0, 0.0, 10.0])
SPHERE_R = 6.0


def make_texture(rng, n_waves=64, min_wavelength=0.4, max_wavelength=2.5):
    """Analytic C-infinity 3D texture: random mixture of 3D sinusoids.

    Smooth and exactly evaluable at any world point, so rendered views are
    photometrically consistent to float precision and the photometric
    optimum IS the ground-truth geometry. At fx=100 and depth ~4-7 m one
    pixel spans ~0.04-0.07 m, so features span ~10-80 px.
    Returns (freqs (K, 3), phases (K,), amps (K,))."""
    wl = rng.uniform(min_wavelength, max_wavelength, size=n_waves)
    d = rng.standard_normal((n_waves, 3))
    d /= np.linalg.norm(d, axis=1, keepdims=True)
    freqs = (2 * np.pi / wl)[:, None] * d
    phases = rng.uniform(0, 2 * np.pi, size=n_waves)
    amps = rng.uniform(0.3, 1.0, size=n_waves) / np.sqrt(n_waves)
    return freqs.astype(np.float64), phases.astype(np.float64), amps.astype(np.float64)


def sample_texture3d(tex, pts):
    """World points (..., 3) -> texture value in ~[0, 1]."""
    freqs, phases, amps = tex
    phase = np.asarray(pts, np.float64) @ freqs.T + phases  # (..., K)
    return (0.5 + 0.5 * np.tanh(np.sin(phase) @ amps)).astype(np.float32)


def render_view(tex, cam: Camera, t_wc: np.ndarray, shape):
    """Render image + ground-truth z-depth for camera pose t_wc (4x4) by
    exact ray-sphere intersection (front surface)."""
    h, w = shape
    ys, xs = np.meshgrid(np.arange(h), np.arange(w), indexing="ij")
    fx, fy, cx, cy = float(cam.fx), float(cam.fy), float(cam.cx), float(cam.cy)
    d_cam = np.stack(
        [(xs - cx) / fx, (ys - cy) / fy, np.ones_like(xs, np.float64)], axis=-1
    )
    r = t_wc[:3, :3].astype(np.float64)
    o = t_wc[:3, 3].astype(np.float64)
    d_world = d_cam @ r.T                       # (H, W, 3), unnormalized
    oc = o - SPHERE_C
    a = (d_world ** 2).sum(-1)
    b = 2.0 * (d_world @ oc)
    c = oc @ oc - SPHERE_R ** 2
    disc = np.maximum(b * b - 4 * a * c, 0.0)
    t = (-b - np.sqrt(disc)) / (2 * a)          # front intersection
    x_world = o + t[..., None] * d_world
    img = sample_texture3d(tex, x_world)
    depth = (t * d_cam[..., 2]).astype(np.float32)  # z-depth in camera frame
    return img, depth


def make_sequence(rng, n_frames=6, shape=(96, 144), motion_scale=0.1,
                  rot_scale=0.002):
    """Ground-truth camera track + rendered frames.

    Returns (cam, images, depths, poses_gt) — poses are world-from-camera.
    Motion is a gentle forward+lateral walk with small rotations, keeping
    the plane in view.
    """
    h, w = shape
    cam = Camera.create(fx=100.0, fy=100.0, cx=w / 2 - 0.5, cy=h / 2 - 0.5, baseline=0.2)
    tex = make_texture(rng)
    poses, images, depths = [], [], []
    t_wc = np.eye(4, dtype=np.float32)
    for i in range(n_frames):
        poses.append(t_wc.copy())
        img, depth = render_view(tex, cam, t_wc, shape)
        images.append(img)
        depths.append(depth)
        xi = np.concatenate([
            rng.standard_normal(3) * motion_scale + np.array([motion_scale, 0, 0]),
            rng.standard_normal(3) * rot_scale,
        ]).astype(np.float32)
        step = np.asarray(se3.se3_exp(jnp.asarray(xi)))
        t_wc = (t_wc @ step).astype(np.float32)
    return cam, images, depths, np.stack(poses)


def perturb_poses(rng, poses, trans_sigma=0.01, rot_sigma=0.002, keep_first=1):
    """Right-perturb each pose by an independent random twist (iid jitter)."""
    out = poses.copy()
    for i in range(keep_first, len(poses)):
        xi = np.concatenate([
            rng.standard_normal(3) * trans_sigma,
            rng.standard_normal(3) * rot_sigma,
        ]).astype(np.float32)
        out[i] = poses[i] @ np.asarray(se3.se3_exp(jnp.asarray(xi)))
    return out


def drift_poses(rng, poses, trans_sigma=0.01, rot_sigma=0.002, keep_first=1):
    """VO-like error: a random-walk drift composed into the trajectory —
    each frame's relative motion carries a small error that accumulates,
    which is how real visual odometry degrades (and what sliding-window
    photometric refinement is built to correct)."""
    out = poses.copy()
    err = np.eye(4, dtype=np.float64)
    for i in range(keep_first, len(poses)):
        xi = np.concatenate([
            rng.standard_normal(3) * trans_sigma,
            rng.standard_normal(3) * rot_sigma,
        ]).astype(np.float32)
        err = err @ np.asarray(se3.se3_exp(jnp.asarray(xi)), np.float64)
        out[i] = (err @ poses[i].astype(np.float64)).astype(poses.dtype)
    return out


def pose_errors(poses_a, poses_b):
    """(translation RMSE, rotation RMSE in radians) between pose arrays."""
    dt = poses_a[:, :3, 3] - poses_b[:, :3, 3]
    t_rmse = float(np.sqrt((dt ** 2).sum(-1).mean()))
    angles = []
    for a, b in zip(poses_a, poses_b):
        dr = a[:3, :3].T @ b[:3, :3]
        c = np.clip((np.trace(dr) - 1) / 2, -1, 1)
        angles.append(np.arccos(c))
    r_rmse = float(np.sqrt(np.mean(np.square(angles))))
    return t_rmse, r_rmse


BOX_HALF = 60.0           # half-extent (m) of the textured box room
BOX_GROUND = 1.65         # camera height above ground (KITTI-like)
BOX_CEIL = -25.0          # "sky" plane (camera y is DOWN-positive)


def default_obstacles(rng=None, n: int = 36):
    """Textured AABB 'buildings/parked cars' scattered beside the block-loop
    route (which runs along x,z in [-28, 41]): depth variety and strong
    near-field parallax — without them the bare room is a worst case for
    forward-motion BA (points near the FOE + narrow FOV leave the classic
    yaw/lateral-translation valley weakly constrained)."""
    rng = np.random.default_rng(7) if rng is None else rng
    route = [(-28.0, z) for z in np.linspace(-24, 36, 8)]
    route += [(x, 40.7) for x in np.linspace(-12, 38, 6)]
    route += [(41.0, z) for z in np.linspace(36, -20, 7)]
    boxes = []
    for i in range(n):
        cx, cz = route[i % len(route)]
        side = 1.0 if (i // len(route)) % 2 == 0 else -1.0
        off = rng.uniform(4.0, 12.0)
        w = rng.uniform(1.0, 4.0)
        d = rng.uniform(1.0, 4.0)
        h = rng.uniform(1.5, 6.0)
        # Offset perpendicular-ish: alternate x/z placement.
        if i % 2 == 0:
            lo = np.array([cx + side * off, BOX_GROUND - h, cz - d / 2])
            hi = np.array([cx + side * off + w, BOX_GROUND, cz + d / 2])
        else:
            lo = np.array([cx - w / 2, BOX_GROUND - h, cz + side * off])
            hi = np.array([cx + w / 2, BOX_GROUND, cz + side * off + d])
        boxes.append((lo, hi))
    return boxes


def _ray_aabb(o, d_world, lo, hi):
    """Slab test: entry t for rays o + t*d vs one AABB; +inf where missed.
    d components of exactly 0 handled via +/-inf slabs."""
    with np.errstate(divide="ignore", invalid="ignore"):
        t1 = (lo - o) / d_world
        t2 = (hi - o) / d_world
    tmin = np.nanmax(np.minimum(t1, t2), axis=-1)
    tmax = np.nanmin(np.maximum(t1, t2), axis=-1)
    hit = (tmax >= tmin) & (tmax > 0.1) & (tmin > 0.1)
    return np.where(hit, tmin, np.inf)


def render_box(tex, cam: Camera, t_wc: np.ndarray, shape,
               max_depth: float = 250.0, obstacles=None):
    """Render image + z-depth of a large textured box room (ground at
    y=+BOX_GROUND, walls at x,z = +/-BOX_HALF, ceiling at y=BOX_CEIL;
    camera convention: x right, y down, z forward). The box is a single
    rigid world, so ANY in-box trajectory — including real turns — stays
    multi-view photometrically consistent to float precision; near-field
    signal comes from the ground (the 'road'), far field from the walls.
    Viewed from inside a convex box every ray exits through exactly one
    face: depth = min positive ray-plane t."""
    h, w = shape
    ys, xs = np.meshgrid(np.arange(h), np.arange(w), indexing="ij")
    fx, fy, cx, cy = float(cam.fx), float(cam.fy), float(cam.cx), float(cam.cy)
    d_cam = np.stack(
        [(xs - cx) / fx, (ys - cy) / fy, np.ones_like(xs, np.float64)], axis=-1
    )
    r = t_wc[:3, :3].astype(np.float64)
    o = t_wc[:3, 3].astype(np.float64)
    d_world = d_cam @ r.T                        # (H, W, 3)

    big = 1e9
    t_best = np.full((h, w), big)
    for axis, value in ((0, -BOX_HALF), (0, BOX_HALF),
                        (2, -BOX_HALF), (2, BOX_HALF),
                        (1, BOX_GROUND), (1, BOX_CEIL)):
        d_ax = d_world[..., axis]
        with np.errstate(divide="ignore", invalid="ignore"):
            t = (value - o[axis]) / d_ax
        t = np.where(np.isfinite(t) & (t > 0.1), t, big)
        t_best = np.minimum(t_best, t)
    if obstacles:
        for lo_b, hi_b in obstacles:
            t_best = np.minimum(t_best, _ray_aabb(o, d_world, lo_b, hi_b))
    x_world = o + t_best[..., None] * d_world
    img = sample_texture3d(tex, x_world)
    depth = (t_best * d_cam[..., 2]).astype(np.float32)
    return img, np.where(depth < max_depth, depth, 0.0).astype(np.float32)


def make_render_box_jax(shape, obstacles=None, max_depth: float = 250.0,
                        downsample: int = 1, quantize: bool = False):
    """Jitted (TPU-capable) twin of render_box for golden-dataset rendering.

    The numpy renderer materializes (H*W, K) float64 phase temporaries
    (~1.4 GB at 740x2452 x 96 waves) — >2 min per supersampled frame on a
    1-core host, which round-3's verdict flagged as the golden-velocity
    bottleneck. This path computes the identical ray-plane/AABB geometry
    and sinusoid texture in float32 under jit (seconds per frame on CPU,
    ~ms on a TPU chip). float32 is sufficient for the golden's multi-view
    consistency: worst-case phase error at BOX_HALF extent and 0.1 m
    wavelength is ~6e-4 rad -> intensity error ~1e-4, an order below the
    PNG 1/255 quantization floor. Returns render(tex, fx, fy, cx, cy,
    t_wc) -> (img, depth) as numpy arrays.

    downsample/quantize ('jax2' dataset renderer): box-average the
    supersampled image and quantize to uint8 ON DEVICE, and skip the
    depth readback — on a tunneled chip the f32 img+depth transfer
    dominated render wall-clock (~8x the bytes of the uint8 result).
    The on-device mean can differ from the host numpy mean by 1 ulp, so
    pixels may flip by 1/255 vs the 'jax' renderer: a DIFFERENT dataset
    provenance, recorded as renderer='jax2' (golden tables are keyed by
    it — never mix epochs in one table). quantize returns (img_u8, None).
    """
    import jax
    import jax.numpy as jnp_

    h, w = shape
    if obstacles:
        lo_all = np.stack([lo for lo, _ in obstacles]).astype(np.float32)
        hi_all = np.stack([hi for _, hi in obstacles]).astype(np.float32)
    else:
        lo_all = hi_all = None

    @jax.jit
    def _render(freqs, phases, amps, fx, fy, cx, cy, t_wc):
        ys, xs = jnp_.meshgrid(jnp_.arange(h, dtype=jnp_.float32),
                               jnp_.arange(w, dtype=jnp_.float32),
                               indexing="ij")
        d_cam = jnp_.stack([(xs - cx) / fx, (ys - cy) / fy,
                            jnp_.ones_like(xs)], axis=-1)
        r = t_wc[:3, :3]
        o = t_wc[:3, 3]
        d_world = d_cam @ r.T
        big = jnp_.float32(1e9)
        t_best = jnp_.full((h, w), big)
        for axis, value in ((0, -BOX_HALF), (0, BOX_HALF),
                            (2, -BOX_HALF), (2, BOX_HALF),
                            (1, BOX_GROUND), (1, BOX_CEIL)):
            d_ax = d_world[..., axis]
            t = (jnp_.float32(value) - o[axis]) / d_ax
            t = jnp_.where(jnp_.isfinite(t) & (t > 0.1), t, big)
            t_best = jnp_.minimum(t_best, t)

        if lo_all is not None:
            def hit_box(t_best, lohi):
                lo, hi = lohi
                t1 = (lo - o) / d_world
                t2 = (hi - o) / d_world
                tmin = jnp_.max(jnp_.minimum(t1, t2), axis=-1)
                tmax = jnp_.min(jnp_.maximum(t1, t2), axis=-1)
                hit = (tmax >= tmin) & (tmax > 0.1) & (tmin > 0.1)
                return jnp_.minimum(t_best,
                                    jnp_.where(hit, tmin, big)), None
            t_best, _ = jax.lax.scan(
                hit_box, t_best,
                (jnp_.asarray(lo_all), jnp_.asarray(hi_all)))

        x_world = o + t_best[..., None] * d_world
        phase = x_world @ freqs.T + phases
        img = 0.5 + 0.5 * jnp_.tanh(jnp_.sin(phase) @ amps)
        if quantize:
            s = int(downsample)
            if s > 1:
                img = img.reshape(h // s, s, w // s, s).mean(axis=(1, 3))
            return jnp_.clip(img * 255.0, 0, 255).astype(jnp_.uint8), None
        depth = t_best * d_cam[..., 2]
        depth = jnp_.where(depth < max_depth, depth, 0.0)
        return img, depth

    def render(tex, cam, t_wc):
        freqs, phases, amps = (np.asarray(a, np.float32) for a in tex)
        img, depth = _render(jnp_.asarray(freqs), jnp_.asarray(phases),
                             jnp_.asarray(amps),
                             jnp_.float32(cam.fx), jnp_.float32(cam.fy),
                             jnp_.float32(cam.cx), jnp_.float32(cam.cy),
                             jnp_.asarray(np.asarray(t_wc, np.float32)))
        if quantize:
            return np.asarray(img), None
        return np.asarray(img, np.float32), np.asarray(depth, np.float32)

    return render


def kitti_like_trajectory(n_frames: int, step: float = 0.8,
                          straight: int = 70, turn: int = 25) -> np.ndarray:
    """seq-00-style block-loop motion: alternating straights and 90-degree
    right turns (rounded corners), starting at (-28, 0, -28) heading +z —
    stays well inside the BOX_HALF=60 room for any n_frames."""
    from photobundle_tpu.geometry import se3 as _se3

    poses = []
    t_wc = np.eye(4, dtype=np.float64)
    t_wc[0, 3] = -28.0
    t_wc[2, 3] = -28.0
    yaw_rate = (np.pi / 2) / turn
    i = 0
    while len(poses) < n_frames:
        phase = i % (straight + turn)
        yaw = yaw_rate if phase >= straight else 0.0
        poses.append(t_wc.astype(np.float32).copy())
        xi = np.array([0.0, 0.0, step, 0.0, yaw, 0.0], np.float32)
        t_wc = t_wc @ np.asarray(_se3.se3_exp(jnp.asarray(xi)), np.float64)
        i += 1
    return np.stack(poses)


def lateral_trajectory(n_frames: int, step: float = 0.3,
                       z_pos: float = 10.0, x0: float = -25.0) -> np.ndarray:
    """Pure lateral strafe: the camera faces +z (the z=+BOX_HALF wall, 50 m
    ahead from z_pos=10) and translates along world +x. Translation is
    perpendicular to every viewing ray's dominant axis, so parallax is
    ~fx*step/z for ALL points — the textbook strong-geometry regime for
    photometric BA, with none of the forward-motion FOE degeneracy of the
    block loop. This is the parity positive-control trajectory (round-3
    VERDICT task 4: the paper's nominal conditions)."""
    poses = []
    for i in range(n_frames):
        t = np.eye(4, dtype=np.float32)
        t[0, 3] = x0 + i * step
        t[2, 3] = z_pos
        poses.append(t)
    return np.stack(poses)


def write_box_kitti_dataset(root, sequence, rng, n_frames=200,
                            shape=(370, 1226), fx=707.0, baseline=0.537,
                            step=0.8,
                            min_wavelength=0.25, max_wavelength=4.0,
                            obstacles="default", supersample=1,
                            trajectory="block", renderer="numpy"):
    """KITTI-scale golden dataset (BASELINE configs 1/2 stand-in until real
    KITTI exists on disk): textured box room, seq-00-style block-loop
    trajectory (straights + 90-degree turns), true KITTI calibration scale
    (fx=707, b=0.537 m, 370x1226), stereo PNG pairs + calib/times/poses in
    odometry layout.

    supersample > 1 renders at S x resolution and box-averages down —
    modeling a real camera's pixel-footprint integration instead of point
    sampling. This is what makes SHARP textures usable: the default
    point-sampled render aliases below ~2.5 px wavelength (at z = 80 m the
    far walls hit that at min_wavelength ~0.28 m), and aliasing is
    view-DEPENDENT, which breaks the multi-view photometric consistency
    the golden depends on. Pixel integration attenuates those frequencies
    the way real optics do."""
    import os

    from PIL import Image

    h, w = shape
    cam = Camera.create(fx=fx, fy=fx, cx=w / 2 - 0.5, cy=h / 2 - 0.5,
                        baseline=baseline)
    seq_dir = os.path.join(root, "sequences", f"{sequence:02d}")
    os.makedirs(os.path.join(seq_dir, "image_0"), exist_ok=True)
    os.makedirs(os.path.join(seq_dir, "image_1"), exist_ok=True)
    os.makedirs(os.path.join(root, "poses"), exist_ok=True)

    tex = make_texture(rng, n_waves=96, min_wavelength=min_wavelength,
                       max_wavelength=max_wavelength)
    if trajectory == "lateral":
        poses = lateral_trajectory(n_frames, step=step)
    else:
        poses = kitti_like_trajectory(n_frames, step=step)
    if obstacles == "default":
        obstacles = default_obstacles()
    elif obstacles == "none":
        obstacles = None

    s = int(supersample)
    cam_ss = cam.scaled(float(s)) if s > 1 else cam
    shape_ss = (shape[0] * s, shape[1] * s)
    if renderer == "jax2":
        # Device-side downsample + uint8 quantize, no depth readback —
        # ~8x less tunnel transfer per frame. A distinct dataset
        # provenance (on-device mean differs from the host mean by ulps).
        jax_render = make_render_box_jax(shape_ss, obstacles=obstacles,
                                         downsample=s, quantize=True)
    elif renderer == "jax":
        jax_render = make_render_box_jax(shape_ss, obstacles=obstacles)
    else:
        jax_render = None

    for i, p in enumerate(poses):
        # Per-frame renders are pure functions of (texture, pose) — the rng
        # is fully consumed by make_texture above — so an interrupted
        # render resumes by skipping frames already on disk.
        out_l = os.path.join(seq_dir, "image_0", f"{i:06d}.png")
        out_r = os.path.join(seq_dir, "image_1", f"{i:06d}.png")
        if os.path.exists(out_l) and os.path.exists(out_r):
            continue

        def _render(pose):
            if renderer == "jax2":
                return jax_render(tex, cam_ss, pose)[0]   # uint8 already
            if jax_render is not None:
                im, _ = jax_render(tex, cam_ss, pose)
            else:
                im, _ = render_box(tex, cam_ss, pose, shape_ss,
                                   obstacles=obstacles)
            if s > 1:
                im = im.reshape(shape[0], s, shape[1], s).mean(axis=(1, 3))
            return np.clip(im * 255, 0, 255).astype(np.uint8)
        img_l = _render(p)
        pr = p.copy()
        pr[:3, 3] = p[:3, 3] + p[:3, :3] @ np.array([baseline, 0, 0],
                                                    np.float32)
        img_r = _render(pr)
        for sub, arr in (("image_0", img_l), ("image_1", img_r)):
            Image.fromarray(arr).save(
                os.path.join(seq_dir, sub, f"{i:06d}.png"))

    with open(os.path.join(seq_dir, "calib.txt"), "w") as f:
        f.write(f"P0: {fx} 0 {w/2-0.5} 0 0 {fx} {h/2-0.5} 0 0 0 1 0\n")
        f.write(f"P1: {fx} 0 {w/2-0.5} {-fx*baseline} 0 {fx} {h/2-0.5} 0 "
                f"0 0 1 0\n")
    with open(os.path.join(seq_dir, "times.txt"), "w") as f:
        f.writelines(f"{i*0.1:.6f}\n" for i in range(n_frames))
    with open(os.path.join(root, "poses", f"{sequence:02d}.txt"), "w") as f:
        for p in poses:
            f.write(" ".join(f"{v:.9f}" for v in p[:3].reshape(-1)) + "\n")
    return poses, cam


def write_kitti_dataset(root, sequence, rng, n_frames=10, shape=(96, 160),
                        fx=100.0, baseline=0.2, motion_scale=0.05,
                        rot_scale=0.002):
    """Render a textured-sphere stereo sequence into KITTI odometry layout.

    Returns (poses_gt (N, 4, 4), camera). Creates
    <root>/sequences/<NN>/{image_0,image_1,calib.txt,times.txt} and
    <root>/poses/<NN>.txt.
    """
    import os

    from PIL import Image

    h, w = shape
    cam = Camera.create(fx=fx, fy=fx, cx=w / 2 - 0.5, cy=h / 2 - 0.5,
                        baseline=baseline)
    seq_dir = os.path.join(root, "sequences", f"{sequence:02d}")
    os.makedirs(os.path.join(seq_dir, "image_0"), exist_ok=True)
    os.makedirs(os.path.join(seq_dir, "image_1"), exist_ok=True)
    os.makedirs(os.path.join(root, "poses"), exist_ok=True)

    tex = make_texture(rng)
    poses = []
    t_wc = np.eye(4, dtype=np.float32)
    for i in range(n_frames):
        poses.append(t_wc.copy())
        xi = np.concatenate([
            rng.standard_normal(3) * motion_scale + np.array([motion_scale, 0, 0]),
            rng.standard_normal(3) * rot_scale]).astype(np.float32)
        t_wc = (t_wc @ np.asarray(se3.se3_exp(jnp.asarray(xi)))).astype(np.float32)
    poses = np.stack(poses)

    for i, p in enumerate(poses):
        img_l, _ = render_view(tex, cam, p, shape)
        pr = p.copy()
        pr[:3, 3] = p[:3, 3] + p[:3, :3] @ np.array([baseline, 0, 0])
        img_r, _ = render_view(tex, cam, pr, shape)
        for sub, im in (("image_0", img_l), ("image_1", img_r)):
            arr = np.clip(im * 255, 0, 255).astype(np.uint8)
            Image.fromarray(arr).save(
                os.path.join(seq_dir, sub, f"{i:06d}.png"))

    with open(os.path.join(seq_dir, "calib.txt"), "w") as f:
        f.write(f"P0: {fx} 0 {w/2-0.5} 0 0 {fx} {h/2-0.5} 0 0 0 1 0\n")
        f.write(f"P1: {fx} 0 {w/2-0.5} {-fx*baseline} 0 {fx} {h/2-0.5} 0 "
                f"0 0 1 0\n")
    with open(os.path.join(seq_dir, "times.txt"), "w") as f:
        f.writelines(f"{i*0.1:.6f}\n" for i in range(n_frames))
    with open(os.path.join(root, "poses", f"{sequence:02d}.txt"), "w") as f:
        for p in poses:
            f.write(" ".join(f"{v:.9f}" for v in p[:3].reshape(-1)) + "\n")
    return poses, cam
