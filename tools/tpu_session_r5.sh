#!/bin/bash
# Round-5 TPU session: measurement sweep + provenance-keyed goldens.
# Logs land in benchlogs/ (committable evidence). Serializes every TPU job
# (one chip; two processes skew timings).
#
# Phases (run all, or one by name):
#   bash tools/tpu_session_r5.sh            # everything
#   bash tools/tpu_session_r5.sh bench      # throughput sweep only
#   bash tools/tpu_session_r5.sh golden     # sharp-texture table (long)
#   bash tools/tpu_session_r5.sh lateral    # lateral parity control + walk
#   bash tools/tpu_session_r5.sh dryrun     # CPU import smoke only
#
# Round-4 verdict task 7: run() FAILS LOUDLY — a nonzero exit aborts the
# session (a measurement tool that dies halfway must not look like a
# completed sweep), and the log records the exit status either way.
set -u
mkdir -p /root/repo/benchlogs
cd /root/repo
P=benchlogs
. tools/tpu_session_lib.sh

phase=${1:-all}

if [ "$phase" != "dryrun" ]; then
    tunnel_preflight
fi

if [ "$phase" = "dryrun" ]; then
    for t in bench_lm_breakdown bench_scaling bench_warp_kernel \
             bench_sampling; do
        JAX_PLATFORMS=cpu timeout 120 python -c "import importlib,sys; \
sys.path.insert(0,'tools'); importlib.import_module('$t')" 2>/dev/null \
            && echo "ok  tools/$t.py" || echo "FAIL tools/$t.py (import)"
    done
    # ablate_packed_kernel and probe_eval65k execute their sweeps at
    # module level (straight-line measurement scripts) — import would
    # RUN them; check syntax only.
    for t in ablate_packed_kernel probe_eval65k; do
        python -m py_compile "tools/$t.py" \
            && echo "ok  tools/$t.py (py_compile)" \
            || echo "FAIL tools/$t.py (py_compile)"
    done
    exit 0
fi

if [ "$phase" = "all" ] || [ "$phase" = "bench" ]; then
    run r5_bench            python bench.py
    run r5_breakdown_4096   python tools/bench_lm_breakdown.py 4096 5
    run r5_breakdown_16384  python tools/bench_lm_breakdown.py 16384 5
    run r5_breakdown_65536  python tools/bench_lm_breakdown.py 65536 5
    # N-scaling curve (K-chained; refuses non-physical slopes).
    run r5_scaling          python tools/bench_scaling.py
    # Kernel-level numbers (warp kernel in isolation; sampling modes).
    run r5_warp_kernel      python tools/bench_warp_kernel.py
    run r5_sampling         python tools/bench_sampling.py  # incl. patchWarp rows
    # Packed-kernel ablation (loads vs combine vs stats at 65k).
    run r5_ablate           python tools/ablate_packed_kernel.py
    # Multi-host harness wiring check (local CPU stand-in devices).
    run r5_multihost_dry    env JAX_PLATFORMS=cpu \
        python tools/bench_multihost.py --local --procs 2
fi

if [ "$phase" = "all" ] || [ "$phase" = "golden" ]; then
    # Sharp-texture table (round-4 verdict task 2): full config set, iid
    # AND walk, seeds 99/7/123, on the cached SS2 sharp dataset.
    # Provenance: jax renderer, supersample 2, min-wavelength 0.10,
    # 100 frames, dataset root /tmp/golden_sharp.
    CFGS=reference_W5,W5_production,W5_production_c2f,W5_production_tukey,W5_production_pwscale
    for seed in 99 7 123; do
        for model in iid walk; do
            run "r5g_sharp_${model}_s${seed}" python tools/golden_kitti.py \
                --root /tmp/golden_sharp --frames 100 --supersample 2 \
                --min-wavelength 0.10 --renderer jax \
                --error-model "$model" --seed "$seed" --configs "$CFGS" \
                --out-dir "/tmp/golden_sharp_out_${model}_${seed}"
        done
        # rot-weight split row (walk regime is where it matters).
        run "r5g_sharp_rot256_s${seed}" python tools/golden_kitti.py \
            --root /tmp/golden_sharp --frames 100 --supersample 2 \
            --min-wavelength 0.10 --renderer jax \
            --error-model walk --seed "$seed" \
            --configs W5_production_c2f --set posePriorRotWeight=256 \
            --out-dir "/tmp/golden_sharp_out_rot_${seed}"
    done
fi

if [ "$phase" = "all" ] || [ "$phase" = "lateral" ]; then
    # Lateral-strafe parity control (round 4) — now with walk rows
    # (round-4 verdict task 8).
    # Renderer jax2 (round 5): the float32 img+depth readback of 'jax'
    # (~7 MB/frame) reliably WEDGES the tunnel mid-render; jax2's
    # device-side downsample + uint8 (no depth) is ~8x less transfer.
    # New dataset root -> new provenance key (recorded + printed).
    for model in iid walk; do
        run "r5g_lateral_${model}" python tools/golden_kitti.py \
            --root /tmp/golden_lateral2 --frames 60 --trajectory lateral \
            --obstacles none --renderer jax2 --error-model "$model" \
            --configs reference_exact,W5_production \
            --out-dir "/tmp/golden_lateral2_out_${model}"
    done
fi

echo "=== done; logs in benchlogs/ — commit them ==="
