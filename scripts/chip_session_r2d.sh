#!/bin/bash
# Round-2 continuation: the measurements the r2b session never reached
# (it died mid stage-9) plus the staged-training rerun with the
# page_generator + kv_only-commit changes that landed after staged21c
# OOMed at 20.9/15.75 GB in the rollout-VJP phase.
# Run:  bash scripts/chip_session_r2d.sh >> /tmp/chip_r2d.log 2>&1
cd "$(dirname "$0")/.."
set -x

# 1) staged 21-frame LoRA DMD step: page_gen pages the generator tree to
#    host during the loss-grad phase; cache_int8 halves the two 1.47 GB
#    rollout cache chains the OOM dump blamed.
timeout 5400 python scripts/train_probe_1p3b.py --mode lora_step --frames 21 \
  --reps 1 --staged --page_gen --cache_int8 --auto_shrink 2>/dev/null | tail -4

# 2) streaming chunk step at 21 frames, same squeeze
timeout 5400 python scripts/train_probe_1p3b.py --mode stream_chunk --frames 21 \
  --reps 1 --staged --cache_int8 --auto_shrink 2>/dev/null | tail -4

# 3) 14B host-streamed teacher on the 16 GB chip (the real_name teacher
#    config; layer-streamed CFG-batched teacher pass)
timeout 5400 python scripts/train_probe_1p3b.py --mode lora_step --frames 6 \
  --reps 1 --teacher_14b --auto_shrink 2>/dev/null | tail -4

# 4) int8 MXU pipe inside the fused VAE kernel (never measured: r2b died)
echo "=== vae int8 kernel A/B ==="
VAE_PROBE_ONLY=fused_96 timeout 1800 python scripts/vae_probe.py 2>/dev/null | tail -1
VAE_PROBE_ONLY=fused_96_int8 timeout 1800 python scripts/vae_probe.py 2>/dev/null | tail -1
VAE_PROBE_ONLY=fused_96_int8_dense timeout 1800 python scripts/vae_probe.py 2>/dev/null | tail -1

# 5) quality rows for every int8 serving mode at the current defaults
timeout 3600 python scripts/quality_delta.py 2>/dev/null | tail -8
