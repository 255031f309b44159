# Round-3 chip session b: follow-ups from r3a.
#   1. B=2 per-stream-VAE e2e RETRY with kernel_cache OFF (r3a stage 3
#      OOMed; the auto rule now enables the kernel-layout cache at B=2,
#      which the r2 B=2 rows never carried)
#   2. long-horizon fast-mode drift at full geometry (VERDICT item 3):
#      240 frames, per-30-frame rel-RMS vs bf16 — does the 0.4 dB
#      compound?
#   3. frozen-source bench x2: warm-AOT first_run_s + the new
#      switch_visible_stall_ms (eager recache) metric
# Run:  bash scripts/chip_session_r3b.sh >> /tmp/chip_r3b.log 2>&1
cd "$(dirname "$0")/.."
set -x
. scripts/chip_lock.sh && chip_lock_acquire

DEADLINE_TS=${DEADLINE_TS:-9999999999}
left() { echo $((DEADLINE_TS - $(date +%s))); }

echo "=== [1/4] B=2 e2e per-stream VAE, kernel_cache off ==="
if [ "$(left)" -gt 600 ]; then
  BENCH_BATCH=2 BENCH_PER_STREAM_VAE=1 BENCH_FRAMES=18 \
    BENCH_KERNEL_CACHE=0 BENCH_EAGER_SWITCH=0 \
    timeout 2400 python -u bench.py 2>&1 | tee /tmp/r3b_b2.log | tail -1
fi

echo "=== [2/4] fast-mode long-horizon drift (240 frames, full geometry) ==="
if [ "$(left)" -gt 900 ]; then
  timeout 3000 python -u scripts/quality_delta.py --frames 240 \
    --drift_interval 30 --skip_vae --modes reuse 2>&1 \
    | tee /tmp/r3b_drift.log | tail -3
fi

echo "=== [3/4] bench (populates AOT for the current source state) ==="
if [ "$(left)" -gt 600 ]; then
  timeout 1500 python -u bench.py 2>&1 | tee /tmp/r3b_bench1.log | tail -1
fi

echo "=== [4/4] bench again (warm-AOT first_run_s + eager stall) ==="
if [ "$(left)" -gt 600 ]; then
  timeout 1500 python -u bench.py 2>&1 | tee /tmp/r3b_bench2.log | tail -1
fi

chip_lock_release
