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
run() {
    name=$1; shift
    echo "=== $name: $* ==="
    timeout 3600 "$@" 2>&1 | tee "$P/$name.log" | tail -12
    rc=${PIPESTATUS[0]}
    echo "[exit $rc]" >> "$P/$name.log"
    if [ "$rc" -ne 0 ]; then
        echo "FAILED ($rc): $name — aborting session" >&2
        exit "$rc"
    fi
}

for attempt in 1 2 3; do
    if timeout 120 python -c "import jax; jax.devices()" 2>/dev/null; then
        break
    fi
    echo "tunnel probe $attempt hung; retrying in 90s..." >&2
    sleep 90
    if [ "$attempt" = 3 ]; then
        echo "TPU tunnel unreachable — aborting session" >&2
        exit 9
    fi
done

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
