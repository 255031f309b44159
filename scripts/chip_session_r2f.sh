#!/bin/bash
# Round-2 continuation: VAE fused-conv step-time attribution + the
# 21-frame staged-training OOM dump (r2d ran it with stderr suppressed).
# Run:  bash scripts/chip_session_r2f.sh >> /tmp/chip_r2f.log 2>&1
cd "$(dirname "$0")/.."
set -x

# 1) fused-conv kernel ablations at the res96 full-res shape: decides the
#    next kernel move (batched-t DMA vs tau-only pack vs stop)
timeout 3600 python scripts/vae_kernel_ablate.py 2>&1 | tail -10

# 2) 21-frame staged LoRA step WITH the allocation dump (no auto-shrink):
#    the r2d run OOMed inside the first step with stderr discarded
timeout 5400 python scripts/train_probe_1p3b.py --mode lora_step --frames 21 \
  --reps 1 --staged --page_gen --cache_int8 2>&1 | tail -60

# 3) 18-frame staged confirm (the auto-shrunk r2d re-exec reached
#    first_step_done but hit the stage wall before steady state)
timeout 5400 python scripts/train_probe_1p3b.py --mode lora_step --frames 18 \
  --reps 1 --staged --page_gen --cache_int8 2>/dev/null | tail -4
