#!/bin/bash
# Extended round-2 chip session: the original queued A/Bs plus the decode
# and recache breakdown probes added while the tunnel was down.
# Run:  bash scripts/chip_session_r2b.sh >> /tmp/chip_r2.log 2>&1
cd "$(dirname "$0")/.."
set -x

bash scripts/chip_session_r2.sh

# 4) current VAE decode component map (fused defaults)
timeout 2400 python scripts/vae_breakdown.py 2>/dev/null

# 5) prompt-switch recache split: attention / linears / dispatch RTT
timeout 2400 python scripts/recache_breakdown.py 2>/dev/null

# 5b) tap-split causal conv on the XLA decode path (exact; removes the
#     3-frame concat materialization per conv)
echo "=== vae decode xla: tap-split (default) vs concat ==="
VAE_PROBE_ONLY=xla timeout 1800 python scripts/vae_probe.py 2>/dev/null | tail -1
LONGLIVE_VAE_TAPSPLIT=0 VAE_PROBE_ONLY=xla timeout 1800 python scripts/vae_probe.py 2>/dev/null | tail -1

# 5c) batched serving throughput (aggregate FPS; B>1 VAE falls back to the
#     XLA conv path by design — fused kernel is B==1)
echo "=== batched serving B=2 (e2e) / B=4 (DiT only) ==="
BENCH_BATCH=2 BENCH_FRAMES=18 timeout 2400 python bench.py 2>/dev/null | tail -1
BENCH_BATCH=4 BENCH_FRAMES=12 BENCH_SKIP_VAE=1 timeout 2400 python bench.py 2>/dev/null | tail -1

# 6) HBM-layout ground truth: does XLA:TPU store (…,96) lane-padded to 128?
#    per-step scan time ratio ~1.0 => padded (dense streaming saves only the
#    pad ops); ~0.75 => dense (the (128/96)^2 stream tax is real)
timeout 900 python - <<'EOF' 2>/dev/null | tail -2
import time, jax, jax.numpy as jnp
def step_ms(c):
    x = jnp.ones((8192, 512, c), jnp.bfloat16)
    f = jax.jit(lambda a: jax.lax.scan(lambda s, _: (s * 1.0001, 0.0), a,
                                       None, length=50)[0])
    r = f(x); _ = float(jnp.sum(r[::512, ::64, 0].astype(jnp.float32)))
    t0 = time.perf_counter(); r = f(x)
    _ = float(jnp.sum(r[::512, ::64, 0].astype(jnp.float32)))
    return (time.perf_counter() - t0) / 50 * 1e3
a, b = step_ms(96), step_ms(128)
print({"lane96_ms": round(a, 3), "lane128_ms": round(b, 3),
       "ratio": round(a / b, 3)})
EOF

# 7) dense-stream fused VAE kernel A/B (exact; Mosaic acceptance unproven
#    off-chip — if it crashes, the log shows it and default stays padded)
echo "=== vae decode: padded streams (current default) ==="
VAE_PROBE_ONLY=fused_96 timeout 1800 python scripts/vae_probe.py 2>/dev/null | tail -1
echo "=== vae decode: dense streams (LONGLIVE_VAE_DENSE=1) ==="
LONGLIVE_VAE_DENSE=1 VAE_PROBE_ONLY=fused_96 timeout 1800 python scripts/vae_probe.py 2>&1 | tail -3
echo "=== vae decode: dense + big tiles (halo-redundancy tradeoff moved) ==="
LONGLIVE_VAE_DENSE=1 VAE_PROBE_ONLY=fused_bigtiles_96 timeout 1800 python scripts/vae_probe.py 2>&1 | tail -3

# 8) staged-phase DMD step (teacher + frozen critic base paged to host):
#    the 21-frame full-geometry single-chip target (VERDICT #3)
echo "=== 1.3B lora_step, 21 frames, staged phases ==="
timeout 3600 python scripts/train_probe_1p3b.py --mode lora_step --frames 21 \
  --reps 1 --staged --auto_shrink 2>/dev/null | tail -4
echo "=== 1.3B lora_step, 21 frames, staged + int8 rollout cache ==="
timeout 3600 python scripts/train_probe_1p3b.py --mode lora_step --frames 21 \
  --reps 1 --staged --cache_int8 --auto_shrink 2>/dev/null | tail -4

# 9) streaming long-tuning chunk step at full geometry (the shipped
#    longlive_train_long.yaml config) with staged phases
echo "=== 1.3B stream_chunk, 21 frames, staged phases ==="
timeout 3600 python scripts/train_probe_1p3b.py --mode stream_chunk \
  --frames 21 --reps 1 --staged --auto_shrink 2>/dev/null | tail -4

# 10) 14B teacher, host-streamed during the DMD loss (teacher_stream):
#     the real_name=Wan2.1-T2V-14B configuration on one 16 GB chip
echo "=== 1.3B generator + 14B streamed teacher, staged, 9 frames ==="
timeout 5400 python scripts/train_probe_1p3b.py --mode lora_step --frames 9 \
  --reps 1 --teacher_14b --auto_shrink 2>/dev/null | tail -4

# 11) int8 MXU pipe inside the fused VAE conv kernel (LONGLIVE_VAE_INT8):
#     per-oc weight scales + gamma-fold + per-tile dynamic activation
#     scale; quantization-bounded.  Perf A/B + isolated quality row.
echo "=== vae decode: fused_96 bf16 vs int8 (vs int8+dense) ==="
VAE_PROBE_ONLY=fused_96,fused_96_int8,fused_96_int8_dense \
  timeout 1800 python scripts/vae_probe.py 2>/dev/null | tail -3
echo "=== quality delta incl. bf16_latents+int8_vae_decode row ==="
timeout 3600 python scripts/quality_delta.py --frames 12 2>/dev/null | tail -6
