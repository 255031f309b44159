# Round-3 chip session c: opt_async A/B with a budget that fits the
# tunnel-paging reality (r3a's 3-rep/2100s attempt hit the timeout after
# first_step_done — each staged 6-frame rep pages ~GBs of host AdamW
# state through the tunnel).
# Run:  bash scripts/chip_session_r3c.sh >> /tmp/chip_r3c.log 2>&1
cd "$(dirname "$0")/.."
set -x
. scripts/chip_lock.sh && chip_lock_acquire

DEADLINE_TS=${DEADLINE_TS:-9999999999}
left() { echo $((DEADLINE_TS - $(date +%s))); }

echo "=== [1/2] staged 6-frame lora_step, SYNC host AdamW (2 reps) ==="
if [ "$(left)" -gt 1200 ]; then
  timeout 3000 python -u scripts/train_probe_1p3b.py \
    --mode lora_step --frames 6 --reps 2 --staged 2>&1 \
    | tee /tmp/r3c_sync.log | tail -6
fi

echo "=== [2/2] staged 6-frame lora_step, ASYNC critic host AdamW (2 reps) ==="
if [ "$(left)" -gt 1200 ]; then
  timeout 3000 python -u scripts/train_probe_1p3b.py \
    --mode lora_step --frames 6 --reps 2 --staged --opt_async 2>&1 \
    | tee /tmp/r3c_async.log | tail -6
fi

chip_lock_release
