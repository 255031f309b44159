#!/bin/bash
# Round-2 continuation A/Bs: contiguous KV writes + dense cross-attention
# (committed after chip_session_r2b launched) + remaining config decisions.
# Run:  bash scripts/chip_session_r2c.sh >> /tmp/chip_r2c.log 2>&1
cd "$(dirname "$0")/.."
set -x

# 1) component breakdown with the new defaults (expect kv_writes and
#    cross-attn deltas to shrink vs the r2b run: 14.36 / 3.25 ms)
timeout 1800 python scripts/dit_breakdown.py 2>/dev/null | tail -9

# 2) new default e2e (contig writes + dense cross; bkv=1024)
echo "=== default (contig + dense cross) ==="
timeout 2400 python bench.py 2>/dev/null | tail -1

# 3) kv tile: kernel sweep said bkv=512 wins 0.28 ms/layer — e2e check
echo "=== default + LONGLIVE_BKV=512 ==="
LONGLIVE_BKV=512 timeout 2400 python bench.py 2>/dev/null | tail -1

# 4) fast mode on the winning config (write-then-attend + contig commit)
echo "=== fast mode (reuse_last_denoise_kv) ==="
BENCH_REUSE_KV=1 LONGLIVE_BKV=512 timeout 2400 python bench.py 2>/dev/null | tail -1

# 5) switch-latency effect of contig recache writes
timeout 2400 python scripts/recache_breakdown.py 2>/dev/null | tail -8

# 6) int8-QK recache prefill (one-shot quantize amortized over O(S^2))
echo "=== recache: int8-QK prefill A/B ==="
BENCH_FRAMES=6 BENCH_RECACHE_QK8=1 timeout 2400 python bench.py 2>/dev/null | tail -1

# 7) q-tile sweep: whole-query-resident tiles (fewer grid steps, bigger MXU ops)
for st in bq1560_512 bq2340_512 bq4680_512 bq4680_1024; do
  timeout 1200 python scripts/attn_kernel_sweep.py --stage "$st" 2>/dev/null | tail -1
done

# 8) kv_int8 re-A/B: contig writes halve the per-layer copy the earlier
#    negative result paid in bf16 (int8 K also halves the copied bytes)
echo "=== kv_int8 e2e (contig era re-measure) ==="
BENCH_FRAMES=18 BENCH_INT8_KV=1 timeout 2400 python bench.py 2>/dev/null | tail -1

# 9) true serving-shape kernel numbers (Skv=14040 write-then-attend) + q tiles
for st in serving_1024 serving_512 serving_256 bq4680_512 bq2340_512; do
  : # bq stages above use the 18720 two-seg shape; re-run at serving shape
done
for st in serving_1024 serving_512 serving_256; do
  timeout 1200 python scripts/attn_kernel_sweep.py --stage "$st" 2>/dev/null | tail -1
done

# 10) channels-first RGB-head tap partials (dense f32 instead of 42x
#     lane-padded) — expect several ms off the decode
echo "=== vae decode: head channels-first (default) vs channels-last ==="
VAE_PROBE_ONLY=fused_96 timeout 1800 python scripts/vae_probe.py 2>/dev/null | tail -1
LONGLIVE_VAE_HEAD_CF=0 VAE_PROBE_ONLY=fused_96 timeout 1800 python scripts/vae_probe.py 2>/dev/null | tail -1

# 11) fused qkv projection A/B (one activation read + one int8 quant pass
#     instead of three)
echo "=== fused qkv (default) vs separate q/k/v ==="
BENCH_FRAMES=18 timeout 2400 python bench.py 2>/dev/null | tail -1
BENCH_FRAMES=18 BENCH_FUSE_QKV=0 timeout 2400 python bench.py 2>/dev/null | tail -1

# 12) batched serving crashed silently in r2b stage 5c — rerun with stderr
echo "=== batched serving B=2 (stderr visible) ==="
BENCH_BATCH=2 BENCH_FRAMES=12 timeout 2400 python bench.py 2>&1 | tail -4
echo "=== batched serving B=2 DiT-only + int8-KV cache (fits HBM) ==="
BENCH_BATCH=2 BENCH_FRAMES=12 BENCH_SKIP_VAE=1 timeout 2400 python bench.py 2>&1 | tail -1
BENCH_BATCH=2 BENCH_FRAMES=12 BENCH_INT8_KV=1 timeout 2400 python bench.py 2>&1 | tail -1
