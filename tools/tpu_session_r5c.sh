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
    run "r5ab_fixed_xla_s${seed}" python tools/golden_kitti.py \
        --root /tmp/golden_sharp --frames 100 --supersample 2 \
        --min-wavelength 0.10 --renderer jax \
        --error-model iid --seed "$seed" \
        --configs W5_production --set solverBackend=xla \
        --out-dir "/tmp/golden_sharp_out_abfixedxla_${seed}"
done

echo "=== done; logs in benchlogs/ — commit them ==="
