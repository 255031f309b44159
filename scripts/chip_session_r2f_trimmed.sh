#!/bin/bash
# Trimmed r2f: waits for the running r2e session to release the chip, then
# runs the two decisive probes that fit the remaining round budget:
#   1) fused-conv kernel ablation at the res96 full-res shape (decides the
#      next kernel move: batched-t DMA vs tau-only pack vs stop)
#   2) 21-frame staged LoRA step WITH the allocation dump (r2d ran it with
#      stderr suppressed; this is the VERDICT item-3 capstone probe)
# The 18-frame confirm from chip_session_r2f.sh is dropped: r2d's auto-shrunk
# re-exec already reached first_step_done at 18 frames.
# Run:  bash scripts/chip_session_r2f_trimmed.sh > /tmp/chip_r2f.log 2>&1
cd "$(dirname "$0")/.."
set -x

while kill -0 "$(cat /tmp/chip_session.pid)" 2>/dev/null; do sleep 20; done

timeout 2700 python scripts/vae_kernel_ablate.py 2>&1 | tail -12

timeout 3900 python scripts/train_probe_1p3b.py --mode lora_step --frames 21 \
  --reps 1 --staged --page_gen --cache_int8 2>&1 | tail -60
