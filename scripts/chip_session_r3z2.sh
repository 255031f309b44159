# Re-warm the AOT executable cache for the final committed source state
# (the CPU-cache fix re-keyed the package fingerprint), then confirm the
# warm start.  Run: bash scripts/chip_session_r3z2.sh >> /tmp/chip_r3z2.log 2>&1
cd "$(dirname "$0")/.."
set -x
. scripts/chip_lock.sh && chip_lock_acquire
timeout 2000 python -u bench.py 2>&1 | tee /tmp/r3z2_bench1.log | tail -1
timeout 2000 python -u bench.py 2>&1 | tee /tmp/r3z2_bench2.log | tail -1
chip_lock_release
