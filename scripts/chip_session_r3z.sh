# Round-3 final chip session: frozen-source bench pair.
#   1. bench (default config: fast mode, int8 DiT, bf16 VAE, kernel_cache,
#      eager stall measured) — populates the AOT executable cache
#   2. bench again — the warm-AOT first_run_s + final headline numbers
# Run:  bash scripts/chip_session_r3z.sh >> /tmp/chip_r3z.log 2>&1
cd "$(dirname "$0")/.."
set -x
. scripts/chip_lock.sh && chip_lock_acquire
echo "=== [1/2] bench (stores AOT executables for the frozen source) ==="
timeout 2000 python -u bench.py 2>&1 | tee /tmp/r3z_bench1.log | tail -1
echo "=== [2/2] bench again (warm-AOT first_run_s) ==="
timeout 2000 python -u bench.py 2>&1 | tee /tmp/r3z_bench2.log | tail -1
chip_lock_release
