# Shared helpers for the round TPU session scripts (sourced, not run).
# Extracted round 5: run() and the tunnel preflight were copy-pasted
# across four scripts and had already drifted.
#
# run NAME CMD...  — execute one serialized TPU job, tee its log to
# benchlogs/NAME.log, record the exit status, and ABORT the session on
# failure (a measurement tool that dies halfway must not look like a
# completed sweep — round-4 verdict task 7).
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

# tunnel_preflight — a wedged chip claim makes the FIRST jax call of a
# job hang silently until its 3600 s timeout; probe cheaply and retry
# while the stale grant expires (~90 s) instead of burning an hour.
tunnel_preflight() {
    for attempt in 1 2 3; do
        if timeout 120 python -c "import jax; jax.devices()" 2>/dev/null; then
            return 0
        fi
        if [ "$attempt" = 3 ]; then
            echo "TPU tunnel unreachable — aborting session" >&2
            exit 9
        fi
        echo "tunnel probe $attempt hung; retrying in 90s..." >&2
        sleep 90
    done
}
