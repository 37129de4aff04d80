#!/bin/bash
# Round-5 session 4: tukey-delta neighborhood sweep, multi-seed.
# W5_production_tukey (delta=0.3) is the round's accuracy headline; the
# backend A/B set the single-row noise floor at ~±10-19 ATE points, so
# the delta choice needs the same multi-realization sign-consistency
# treatment as the config ranking: deltas {0.2, 0.45} x seeds {99,7,123}
# against the committed delta=0.3 rows.
set -u
mkdir -p /root/repo/benchlogs
cd /root/repo
P=benchlogs
. tools/tpu_session_lib.sh
tunnel_preflight

for seed in 99 7 123; do
    for delta in 0.2 0.45; do
        tag=${delta/./}
        run "r5d_tukey${tag}_s${seed}" python tools/golden_kitti.py \
            --root /tmp/golden_sharp --frames 100 --supersample 2 \
            --min-wavelength 0.10 --renderer jax \
            --error-model iid --seed "$seed" \
            --configs W5_production_tukey --set robustThreshold="$delta" \
            --out-dir "/tmp/golden_sharp_out_tk${tag}_${seed}"
    done
done

echo "=== done; logs in benchlogs/ — commit them ==="
