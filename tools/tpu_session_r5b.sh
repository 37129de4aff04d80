#!/bin/bash
# Round-5 follow-up TPU session (runs after tpu_session_r5.sh golden):
#   1. lateral parity control with the jax2 renderer (the float32 'jax'
#      readback wedged the tunnel mid-render on the first attempt —
#      see tpu_session_r5.sh lateral phase note).
#   2. pwscale backend A/B: same golden, same seeds, solverBackend=xla
#      vs the (already-swept) Pallas default — attributes the
#      +39.5%(xla) vs +27.9%(pallas) seed-99 swing: accumulation-order
#      noise on a chaotic solve, or a systematic path difference.
set -u
mkdir -p /root/repo/benchlogs
cd /root/repo
P=benchlogs
. tools/tpu_session_lib.sh
tunnel_preflight

phase=${1:-all}

if [ "$phase" = "all" ] || [ "$phase" = "lateral" ]; then
    for model in iid walk; do
        run "r5g_lateral_${model}" python tools/golden_kitti.py \
            --root /tmp/golden_lateral2 --frames 60 --trajectory lateral \
            --obstacles none --renderer jax2 --error-model "$model" \
            --configs reference_exact,W5_production \
            --out-dir "/tmp/golden_lateral2_out_${model}"
    done
fi

if [ "$phase" = "all" ] || [ "$phase" = "ab" ]; then
    # Pallas rows for these seeds are in r5g_sharp_iid_s{99,7,123}.log;
    # these runs differ ONLY in solverBackend.
    for seed in 99 7 123; do
        run "r5ab_pwscale_xla_s${seed}" python tools/golden_kitti.py \
            --root /tmp/golden_sharp --frames 100 --supersample 2 \
            --min-wavelength 0.10 --renderer jax \
            --error-model iid --seed "$seed" \
            --configs W5_production_pwscale --set solverBackend=xla \
            --out-dir "/tmp/golden_sharp_out_abxla_${seed}"
    done
fi

if [ "$phase" = "all" ] || [ "$phase" = "bench" ]; then
    # The r5 bench.py rewrite (K-chained links, RTT measured + subtracted,
    # CPU probe chained identically) landed AFTER the 05:45 r5_bench run —
    # validate the driver's end-of-round entrypoint on real hardware and
    # record the new-methodology number. (Gated on 'bench' only: re-running
    # just the A/B must not clobber these committed logs.)
    run r5b_bench python bench.py
    # Planned-log completeness (round-4 verdict task 7): these three from
    # tpu_session_r5.sh's bench phase never ran in the piecemeal sweep.
    run r5_warp_kernel      python tools/bench_warp_kernel.py
    run r5_ablate           python tools/ablate_packed_kernel.py
    run r5_multihost_dry    env JAX_PLATFORMS=cpu \
        python tools/bench_multihost.py --local --procs 2
fi

echo "=== done; logs in benchlogs/ — commit them ==="
