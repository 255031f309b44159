#!/bin/bash
# Round-2 chip session h: VAE decode row-tile A/B, guided by the r2g kernel
# ablation (GEMM 8.5 ms near its padded floor; exposed DMA ~3.7, rolls
# ~5.0, pack ~1.3 ms per res96 conv).  Dense streaming is DEAD (XLA
# lane-pads HBM storage physically and Mosaic rejects sub-tile lane
# slices — PERF.md negative result); the live lever is th=8 row tiles:
# 4x fewer grid steps, halo redundancy 1.25x vs 2x at the res96 stage.
#   1) bigtiles vs th=2 default, on top of fused_96
#   2) e2e bench at the bigger tiles
# Waits for the previous chip session (pid file) to release the chip.
# Run:  bash scripts/chip_session_r2h.sh >> /tmp/chip_r2h.log 2>&1
cd "$(dirname "$0")/.."
set -x

DEADLINE_TS=${DEADLINE_TS:-9999999999}
left() { echo $((DEADLINE_TS - $(date +%s))); }

while kill -0 "$(cat /tmp/chip_session.pid 2>/dev/null)" 2>/dev/null; do sleep 30; done
echo $$ > /tmp/chip_session.pid

echo "=== bigtiles A/B (fused_96 at th=2 vs 45e6-budget tiles) ==="
if [ "$(left)" -gt 2400 ]; then
  VAE_PROBE_ONLY=fused_96,fused_bigtiles_96 \
    timeout 2400 python scripts/vae_probe.py 2>&1 | tail -4
fi

echo "=== e2e with bigtiles VAE (auto kernel_cache defaults) ==="
if [ "$(left)" -gt 2400 ]; then
  LONGLIVE_VAE_VMEM_BUDGET=45e6 BENCH_FRAMES=18 \
    timeout 2400 python bench.py 2>/dev/null | tail -1
fi
