# Round-2 chip session i: async host-AdamW A/B (TrainerConfig.opt_async).
# The critic's host AdamW (grad D2H + numpy math + param H2D — ~3.3 GB of
# tunnel paging per step at LoRA-r256) runs on a worker thread and lands
# after the NEXT step's rollout dispatch.  Exact (parity-tested on CPU);
# this measures how much of it hides behind device compute on the real
# chip, at the 6-frame staged full-geometry step (the cheapest
# configuration where the overlap window — rollout fwd + teacher paging —
# is real).  Waits for any previous chip session (pid file) first.
# Run:  bash scripts/chip_session_r2i.sh >> /tmp/chip_r2i.log 2>&1
cd "$(dirname "$0")/.."
set -x

DEADLINE_TS=${DEADLINE_TS:-9999999999}
left() { echo $((DEADLINE_TS - $(date +%s))); }

while kill -0 "$(cat /tmp/chip_session.pid 2>/dev/null)" 2>/dev/null; do sleep 30; done
echo $$ > /tmp/chip_session.pid

echo "=== staged 6-frame lora_step, SYNC host AdamW (baseline) ==="
if [ "$(left)" -gt 600 ]; then
  timeout 2100 python -u scripts/train_probe_1p3b.py \
    --mode lora_step --frames 6 --reps 3 --staged 2>&1 | tee /tmp/r2i_sync.log
fi

echo "=== staged 6-frame lora_step, ASYNC critic host AdamW ==="
if [ "$(left)" -gt 600 ]; then
  timeout 2100 python -u scripts/train_probe_1p3b.py \
    --mode lora_step --frames 6 --reps 3 --staged --opt_async 2>&1 | tee /tmp/r2i_async.log
fi

rm -f /tmp/chip_session.pid
