"""Within-chip DP: total keyframes/s for B concurrent sequences on one chip
(batched engine) vs B=1. Prints one JSON line per batch size."""
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from photobundle_tpu.config import PBAConfig
from photobundle_tpu.core.batched import BatchedPhotometricBundleAdjustment
from photobundle_tpu.geometry.camera import Camera

H, WI = 370, 1226


def run(batch):
    rng = np.random.default_rng(0)
    cam = Camera.create(fx=718.856, fy=718.856, cx=607.19, cy=185.21,
                        baseline=0.537)
    cfg = PBAConfig(maxNumPoints=4096, maxPointsPerFrame=1024,
                    slidingWindowSize=5, patchRadius=2, maxIterations=30,
                    functionTolerance=1e-6)
    bp = BatchedPhotometricBundleAdjustment(cam, (H, WI), cfg, batch)
    base = np.zeros((H + 40, WI + 40), np.float32)
    ys, xs = np.meshgrid(np.arange(H + 40), np.arange(WI + 40), indexing="ij")
    for _ in range(40):
        f1, f2, ph = (rng.uniform(0.02, 0.5), rng.uniform(0.02, 0.5),
                      rng.uniform(0, 6))
        base += np.sin(f1 * xs + f2 * ys + ph).astype(np.float32)
    base = 0.5 + base / 60
    frames = [np.ascontiguousarray(base[k:k + H, k:k + WI])
              for k in range(12)]
    depth = rng.uniform(5, 60, (H, WI)).astype(np.float32)
    t = np.eye(4, dtype=np.float32)
    times = []
    for i, img in enumerate(frames):
        t = t.copy()
        t[0, 3] += 0.5
        imgs = [img + 0.001 * k for k in range(batch)]
        t0 = time.perf_counter()
        rs = bp.add_frames(imgs, [depth] * batch, [t] * batch)
        if rs is not None and i >= 6:
            times.append(time.perf_counter() - t0)
    med = float(np.median(times))
    print(json.dumps({
        "batch": batch,
        "keyframes_per_s_total": round(batch / med, 3),
        "ms_per_step": round(med * 1e3, 1),
    }))


if __name__ == "__main__":
    for b in (1, 2, 4):
        run(b)
