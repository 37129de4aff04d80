#!/bin/bash
# Round-5 session 3: fixed-grid XLA controls for the backend A/B.
# r5ab showed pwscale-on-XLA > pwscale-on-Pallas on every seed; these
# rows tell whether the backend moves the FIXED grid equally (backend
# noise floor) or the gap is specific to the scaled kernel. Within-
# backend comparison (pwscale-xla vs fixed-xla) is then the fair warp
# verdict.
set -u
mkdir -p /root/repo/benchlogs
cd /root/repo
P=benchlogs
. tools/tpu_session_lib.sh
tunnel_preflight

for seed in 99 7 123; do
    run "r5ab_fixed_xla_s${seed}" python tools/golden_kitti.py \
        --root /tmp/golden_sharp --frames 100 --supersample 2 \
        --min-wavelength 0.10 --renderer jax \
        --error-model iid --seed "$seed" \
        --configs W5_production --set solverBackend=xla \
        --out-dir "/tmp/golden_sharp_out_abfixedxla_${seed}"
done

echo "=== done; logs in benchlogs/ — commit them ==="
