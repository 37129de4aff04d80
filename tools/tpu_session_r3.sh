#!/bin/bash
# Round-3 TPU session: run the moment the tunnel is back (VERDICT task 4 +
# BENCH_r03 prep). Serializes every TPU job (one chip; two processes skew
# timings) and logs everything under /tmp/tpu_r3/.
set -u
mkdir -p /tmp/tpu_r3
cd /root/repo
run() { name=$1; shift; echo "=== $name: $* ==="; timeout 1800 "$@" 2>&1 | tee /tmp/tpu_r3/$name.log | tail -15; }

run bench            python bench.py
run breakdown_4096   python tools/bench_lm_breakdown.py 4096 5
run breakdown_65536  python tools/bench_lm_breakdown.py 65536 5
run breakdown_16384  python tools/bench_lm_breakdown.py 16384 5
# Fused Mosaic assembly (ops/assemble.py, round-3): first live-compiler
# validation, then the same breakdowns. If fa_* crash or regress, leave
# PB_FUSED_ASSEMBLY default off; if they win, flip the default in lm.py.
run fa_breakdown_4096  env PB_FUSED_ASSEMBLY=1 python tools/bench_lm_breakdown.py 4096 5
run fa_breakdown_65536 env PB_FUSED_ASSEMBLY=1 python tools/bench_lm_breakdown.py 65536 5
run fa_bench           env PB_FUSED_ASSEMBLY=1 python bench.py
run scaling          python tools/bench_scaling.py
run warp_kernel      python tools/bench_warp_kernel.py
run sampling         python tools/bench_sampling.py
echo "=== done; logs in /tmp/tpu_r3/ ==="
