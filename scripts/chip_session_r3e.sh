# Round-3 chip session e: B=2 memory attribution + int8-KV fit attempt.
# Run:  bash scripts/chip_session_r3e.sh >> /tmp/chip_r3e.log 2>&1
cd "$(dirname "$0")/.."
set -x
. scripts/chip_lock.sh && chip_lock_acquire

DEADLINE_TS=${DEADLINE_TS:-9999999999}
left() { echo $((DEADLINE_TS - $(date +%s))); }

echo "=== [1/4] B=2 compile-only memory attribution (std) ==="
if [ "$(left)" -gt 600 ]; then
  timeout 1800 python -u scripts/b2_mem_probe.py --batch 2 2>&1 \
    | tee /tmp/r3e_mem_std.log | grep -E "^\{"
fi

echo "=== [2/4] B=2 compile-only memory attribution (kernel_cache) ==="
if [ "$(left)" -gt 600 ]; then
  timeout 1800 python -u scripts/b2_mem_probe.py --batch 2 --kl 2>&1 \
    | tee /tmp/r3e_mem_kl.log | grep -E "^\{"
fi

echo "=== [3/4] B=1 baseline attribution (context for the B=2 gap) ==="
if [ "$(left)" -gt 600 ]; then
  timeout 1800 python -u scripts/b2_mem_probe.py --batch 1 --kl 2>&1 \
    | tee /tmp/r3e_mem_b1.log | grep -E "^\{"
fi

echo "=== [4/4] B=2 e2e attempt: int8 KV cache + per-stream VAE ==="
if [ "$(left)" -gt 600 ]; then
  BENCH_BATCH=2 BENCH_PER_STREAM_VAE=1 BENCH_FRAMES=18 \
    BENCH_INT8_KV=1 BENCH_EAGER_SWITCH=0 \
    timeout 2400 python -u bench.py 2>&1 | tee /tmp/r3e_b2_kv8.log | tail -1
fi

chip_lock_release
