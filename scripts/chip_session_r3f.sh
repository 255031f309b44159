# Round-3 chip session f: B=2 e2e with streamed-off pixels (the r3e
# memory attribution showed B x 2.53 GB of resident pixel outputs was the
# overflow; a real server streams them off-chip per segment).
# Run:  bash scripts/chip_session_r3f.sh >> /tmp/chip_r3f.log 2>&1
cd "$(dirname "$0")/.."
set -x
. scripts/chip_lock.sh && chip_lock_acquire

DEADLINE_TS=${DEADLINE_TS:-9999999999}
left() { echo $((DEADLINE_TS - $(date +%s))); }

echo "=== [1/2] B=2 e2e per-stream VAE (pixels streamed off), kernel_cache on ==="
if [ "$(left)" -gt 600 ]; then
  BENCH_BATCH=2 BENCH_PER_STREAM_VAE=1 BENCH_FRAMES=18 \
    BENCH_EAGER_SWITCH=0 \
    timeout 2400 python -u bench.py 2>&1 | tee /tmp/r3f_b2.log | tail -1
fi

echo "=== [2/2] same at B=3 (aggregate scaling probe) ==="
if [ "$(left)" -gt 600 ]; then
  BENCH_BATCH=3 BENCH_PER_STREAM_VAE=1 BENCH_FRAMES=18 \
    BENCH_EAGER_SWITCH=0 \
    timeout 2400 python -u bench.py 2>&1 | tee /tmp/r3f_b3.log | tail -1
fi

chip_lock_release
