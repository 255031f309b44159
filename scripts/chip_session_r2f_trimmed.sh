#!/bin/bash
# Trimmed r2f chain: waits for the running r2e session to release the chip,
# then runs what fits before this driver session's wall deadline:
#   1) fused-conv kernel ablation at the res96 full-res shape (~20 min —
#      decides the next kernel move: batched-t DMA vs tau-only pack vs stop)
#   2) the 21-frame staged-step allocation dump ONLY if >55 min remain
#      (otherwise it stays queued in chip_session_r2f.sh for the next
#      session; r2d's auto-shrunk re-exec already proved 18 frames reach
#      first_step_done)
# DEADLINE_TS guards every step so no chip job overlaps the driver's
# end-of-session bench.
# Run:  bash scripts/chip_session_r2f_trimmed.sh > /tmp/chip_r2f.log 2>&1
cd "$(dirname "$0")/.."
set -x

DEADLINE_TS=${DEADLINE_TS:-1787168558}

while kill -0 "$(cat /tmp/chip_session.pid)" 2>/dev/null; do sleep 20; done

left=$((DEADLINE_TS - $(date +%s)))
if [ "$left" -gt 600 ]; then
  timeout $((left > 1800 ? 1800 : left)) python scripts/vae_kernel_ablate.py 2>&1 | tail -12
fi

left=$((DEADLINE_TS - $(date +%s)))
if [ "$left" -gt 3300 ]; then
  timeout $((left - 120)) python scripts/train_probe_1p3b.py --mode lora_step \
    --frames 21 --reps 1 --staged --page_gen --cache_int8 2>&1 | tail -60
fi
