"""End-to-end engine throughput: keyframes/s including ingestion.

Synthetic KITTI-resolution frames through the full add_frame path
(descriptor build, tracking, selection, sliding-window LM solve). Prints
one JSON line. Run on the accelerator.
"""
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from photobundle_tpu.config import PBAConfig
from photobundle_tpu.core.engine import PhotometricBundleAdjustment
from photobundle_tpu.geometry.camera import Camera

H, WI = 370, 1226


def main():
    rng = np.random.default_rng(0)
    cam = Camera.create(fx=718.856, fy=718.856, cx=607.19, cy=185.21,
                        baseline=0.537)
    cfg = PBAConfig(maxNumPoints=4096, maxPointsPerFrame=1024,
                    slidingWindowSize=5, patchRadius=2, maxIterations=30,
                    functionTolerance=1e-6, pipelineResults=True)
    # results lag one frame under pipelining; timing medians are unaffected
    pba = PhotometricBundleAdjustment(cam, (H, WI), cfg)

    base = np.zeros((H + 40, WI + 40), np.float32)
    ys, xs = np.meshgrid(np.arange(H + 40), np.arange(WI + 40), indexing="ij")
    for _ in range(40):
        f1, f2, ph = (rng.uniform(0.02, 0.5), rng.uniform(0.02, 0.5),
                      rng.uniform(0, 6))
        base += np.sin(f1 * xs + f2 * ys + ph).astype(np.float32)
    base = 0.5 + base / 60
    frames = [np.ascontiguousarray(base[k:k + H, k:k + WI]) for k in range(14)]
    depth = rng.uniform(5, 60, (H, WI)).astype(np.float32)

    t = np.eye(4, dtype=np.float32)
    solve_times = []
    for i, img in enumerate(frames):
        t = t.copy()
        t[0, 3] += 0.5
        t0 = time.perf_counter()
        r = pba.add_frame(img, depth, t)
        if r is not None and i >= 6:  # steady state
            solve_times.append(time.perf_counter() - t0)
    pba.flush_result()
    med = float(np.median(solve_times))
    print(json.dumps({
        "metric": "keyframes_per_s_end_to_end",
        "value": round(1.0 / med, 3),
        "unit": f"keyframes/s (ingest+track+select+{cfg.maxIterations}-iter solve, "
                f"{cfg.maxNumPoints} pts, {H}x{WI})",
        "ms_per_keyframe": round(med * 1e3, 1),
    }))


if __name__ == "__main__":
    main()
