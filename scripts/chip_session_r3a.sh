# Round-3 chip session a: cold-start kill + queued round-2 A/Bs.
#   1. bench default run (populates the AOT executable cache)
#   2. bench again — measures warm-AOT first_run_s (target < 30 s;
#      r2 cold was 168.7 s, XLA-cache-warm 52.3 s)
#   3. r2j: B=2 e2e with per-stream full-VAE decode (previously OOM)
#   4. r2i: staged 6-frame lora_step, sync vs async critic host AdamW
# Run:  bash scripts/chip_session_r3a.sh >> /tmp/chip_r3a.log 2>&1
cd "$(dirname "$0")/.."
set -x
. scripts/chip_lock.sh && chip_lock_acquire

DEADLINE_TS=${DEADLINE_TS:-9999999999}
left() { echo $((DEADLINE_TS - $(date +%s))); }

echo "=== [1/5] bench default (stores AOT executables) ==="
if [ "$(left)" -gt 600 ]; then
  timeout 1500 python -u bench.py 2>&1 | tee /tmp/r3a_bench1.log | tail -1
fi

echo "=== [2/5] bench default again (warm AOT first_run_s) ==="
if [ "$(left)" -gt 600 ]; then
  timeout 1500 python -u bench.py 2>&1 | tee /tmp/r3a_bench2.log | tail -1
fi

echo "=== [3/5] B=2 e2e, per-stream full-VAE decode (r2j) ==="
if [ "$(left)" -gt 600 ]; then
  BENCH_BATCH=2 BENCH_PER_STREAM_VAE=1 BENCH_FRAMES=18 \
    timeout 2400 python -u bench.py 2>&1 | tee /tmp/r3a_b2.log | tail -1
fi

echo "=== [4/5] staged 6-frame lora_step, SYNC host AdamW (r2i baseline) ==="
if [ "$(left)" -gt 900 ]; then
  timeout 2100 python -u scripts/train_probe_1p3b.py \
    --mode lora_step --frames 6 --reps 3 --staged 2>&1 \
    | tee /tmp/r3a_sync.log | tail -5
fi

echo "=== [5/5] staged 6-frame lora_step, ASYNC critic host AdamW (r2i) ==="
if [ "$(left)" -gt 900 ]; then
  timeout 2100 python -u scripts/train_probe_1p3b.py \
    --mode lora_step --frames 6 --reps 3 --staged --opt_async 2>&1 \
    | tee /tmp/r3a_async.log | tail -5
fi

chip_lock_release
