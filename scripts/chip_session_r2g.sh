#!/bin/bash
# Round-2 chip session g:
#   1) fused-conv kernel ablation at the res96 full-res shape — now with
#      operands as jit ARGS + lax.scan chain (the r2f run died on HTTP 413:
#      closure-captured [T,H,W,C] constants made ~1.1 GB of StableHLO that
#      the tunnel's remote compiler rejects).  Decides the next kernel
#      move: batched-t DMA vs tau-only pack vs stop.
#   2) dense-stream A/B at the single res96 conv shape (same fixed script;
#      isolates the full-decode dense hang from the kernel itself).
#   3) bench default confirmation (kernel_cache AUTO + fused_rope on —
#      expect ~484 ms/latent-frame int8).
#   4) the 21-frame staged-step allocation dump (VERDICT item 3 closure).
# Run:  bash scripts/chip_session_r2g.sh >> /tmp/chip_r2g.log 2>&1
cd "$(dirname "$0")/.."
set -x

DEADLINE_TS=${DEADLINE_TS:-9999999999}
left() { echo $((DEADLINE_TS - $(date +%s))); }

echo "=== 1) kernel ablation (bf16, padded streams) ==="
if [ "$(left)" -gt 1500 ]; then
  timeout 1500 python scripts/vae_kernel_ablate.py 2>&1 | tail -10
fi

echo "=== 2) dense-stream single-conv A/B ==="
if [ "$(left)" -gt 1200 ]; then
  LONGLIVE_VAE_DENSE=1 timeout 1200 python scripts/vae_kernel_ablate.py 8 2>&1 | tail -10
fi

echo "=== 2b) dense-stream full-decode A/B (gated widths) ==="
if [ "$(left)" -gt 1800 ]; then
  VAE_PROBE_ONLY=fused_96,fused_96_dense,fused_96_int8_dense \
    timeout 1800 python scripts/vae_probe.py 2>&1 | tail -6
fi

echo "=== 3) bench default confirm (auto kernel_cache + fused_rope) ==="
if [ "$(left)" -gt 2400 ]; then
  BENCH_FRAMES=18 timeout 2400 python bench.py 2>/dev/null | tail -1
fi

echo "=== 4) 21-frame staged LoRA step (page_gen + cache_int8) ==="
if [ "$(left)" -gt 3600 ]; then
  timeout $(( $(left) - 120 < 5400 ? $(left) - 120 : 5400 )) \
    python scripts/train_probe_1p3b.py --mode lora_step \
    --frames 21 --reps 1 --staged --page_gen --cache_int8 2>&1 | tail -60
fi
