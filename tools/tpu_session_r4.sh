#!/bin/bash
# Round-4 TPU session: the full measurement sweep for BASELINE.md's
# throughput sections. Logs land in benchlogs/ (IN the repo — round-3's
# /tmp logs were stranded when the round ended; never again) so every run
# is committable evidence. Serializes every TPU job (one chip; two
# processes skew timings).
#
# CPU-safe subset (no TPU needed): the ablate tool and breakdowns run
# under JAX_PLATFORMS=cpu with --interpret semantics where applicable;
# use `bash tools/tpu_session_r4.sh dryrun` to smoke the wiring only.
set -u
mkdir -p /root/repo/benchlogs
cd /root/repo
P=benchlogs
run() { name=$1; shift; echo "=== $name: $* ==="; timeout 1800 "$@" 2>&1 | tee $P/$name.log | tail -12; }

if [ "${1:-}" = "dryrun" ]; then
    # Wiring smoke: import every tool and print its help on CPU.
    for t in bench_lm_breakdown bench_scaling bench_warp_kernel \
             bench_sampling ablate_packed_kernel probe_eval65k; do
        JAX_PLATFORMS=cpu timeout 120 python -c "import importlib,sys; \
sys.path.insert(0,'tools'); importlib.import_module('$t')" 2>/dev/null \
            && echo "ok  tools/$t.py" || echo "FAIL tools/$t.py (import)"
    done
    exit 0
fi

# Headline + per-phase breakdowns (lane-packed kernel is the default
# eval path since round 4 — no env flags needed).
run r4_bench           python bench.py
run r4s_breakdown_4096  python tools/bench_lm_breakdown.py 4096 5
run r4s_breakdown_16384 python tools/bench_lm_breakdown.py 16384 5
run r4s_breakdown_65536 python tools/bench_lm_breakdown.py 65536 5
# N-scaling curve for BASELINE.md's scaling table.
run r4s_scaling        python tools/bench_scaling.py
# Kernel-level numbers (warp kernel in isolation; sampling modes).
run r4s_warp_kernel    python tools/bench_warp_kernel.py
run r4s_sampling       python tools/bench_sampling.py
# Packed-kernel ablation (where the remaining 65k eval milliseconds go:
# loads vs combine vs stats — BASELINE.md "Large-N attribution").
run r4s_ablate         python tools/ablate_packed_kernel.py
# Multi-host scaling harness: wiring-validated with local CPU stand-in
# devices; real numbers need a multi-host slice (see BASELINE.md runbook).
run r4s_multihost_dry  env JAX_PLATFORMS=cpu python tools/bench_multihost.py --local --procs 2
echo "=== done; logs in benchlogs/ — commit them ==="
