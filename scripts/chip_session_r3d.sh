# Round-3 chip session d: reruns with the round-3 fixes.
#   1. B=2 per-stream-VAE e2e, kernel_cache off — with the uniform kv_only
#      scan (the [:-1] cache-slice temps that caused the r3b compile OOM
#      are gone; headroom was 1.52 G vs 4.66 G of temps removed)
#   2. B=2 e2e with kernel_cache ON (r3a's runtime OOM retry; eager
#      measurement off)
#   3. 240-frame fast-mode drift, CHUNKED generation (one big program
#      crashed the tunneled worker in r3b stage 2)
# Run:  bash scripts/chip_session_r3d.sh >> /tmp/chip_r3d.log 2>&1
cd "$(dirname "$0")/.."
set -x
. scripts/chip_lock.sh && chip_lock_acquire

DEADLINE_TS=${DEADLINE_TS:-9999999999}
left() { echo $((DEADLINE_TS - $(date +%s))); }

echo "=== [1/3] B=2 e2e per-stream VAE, kernel_cache off, uniform kv_only ==="
if [ "$(left)" -gt 600 ]; then
  BENCH_BATCH=2 BENCH_PER_STREAM_VAE=1 BENCH_FRAMES=18 \
    BENCH_KERNEL_CACHE=0 BENCH_EAGER_SWITCH=0 \
    timeout 2400 python -u bench.py 2>&1 | tee /tmp/r3d_b2_std.log | tail -1
fi

echo "=== [2/3] B=2 e2e per-stream VAE, kernel_cache ON ==="
if [ "$(left)" -gt 600 ]; then
  BENCH_BATCH=2 BENCH_PER_STREAM_VAE=1 BENCH_FRAMES=18 \
    BENCH_KERNEL_CACHE=1 BENCH_EAGER_SWITCH=0 \
    timeout 2400 python -u bench.py 2>&1 | tee /tmp/r3d_b2_kl.log | tail -1
fi

echo "=== [3/3] fast-mode long-horizon drift (240 frames, chunked) ==="
if [ "$(left)" -gt 900 ]; then
  timeout 3000 python -u scripts/quality_delta.py --frames 240 \
    --drift_interval 30 --skip_vae --modes reuse 2>&1 \
    | tee /tmp/r3d_drift.log | tail -2
fi

chip_lock_release
