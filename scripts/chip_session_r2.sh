#!/bin/bash
# Queued chip experiments for when the axon tunnel recovers (round 2).
# Run:  bash scripts/chip_session_r2.sh >> /tmp/chip_r2.log 2>&1
# Each stage is timeout-bounded so a wedged tunnel can't hold the session.
cd "$(dirname "$0")/.."
set -x

# 0) is the chip back?
timeout 120 python -c "import jax; print('TPU-UP', jax.devices())" || exit 1

# 0a) numerical sanity of the newly flash-routed cross-attention at the
#     real decode shape (Skv=512 pads into one 1024 tile)
timeout 900 python - <<'EOF' 2>/dev/null | tail -1
import jax, jax.numpy as jnp
from longlive_tpu.ops.attention import attend
q = jax.random.normal(jax.random.PRNGKey(0), (1, 4680, 12, 128), jnp.bfloat16)
k = jax.random.normal(jax.random.PRNGKey(1), (1, 512, 12, 128), jnp.bfloat16)
v = jax.random.normal(jax.random.PRNGKey(2), (1, 512, 12, 128), jnp.bfloat16)
a = attend(q, k, v, None, impl="pallas").astype(jnp.float32)
b = attend(q, k, v, None, impl="xla").astype(jnp.float32)
print("cross flash-vs-dense max abs err:", float(jnp.max(jnp.abs(a - b))))
EOF

# 0b) rope-layout A/B (exact reformulation; expect ~10+ ms/forward off the
#     pair-gather relayouts) + component breakdown at serving defaults
timeout 1800 python scripts/dit_breakdown.py 2>/dev/null | tail -9

# 1) kernel-level sweep: dead-tile elision at the real decode layout
#    (frame-aligned dead range), bkv in {1024, 512, 256} + bf16 baselines
for st in bf16 bf16_512 twoseg_skip_1024 twoseg_skip_512 twoseg_skip_256; do
  timeout 1200 python scripts/attn_kernel_sweep.py --stage "$st" 2>/dev/null | tail -1
done

# 2) e2e A/B of the winning tile (edit LONGLIVE_BKV if the sweep disagrees)
echo "=== default (current shipped config) ==="
timeout 2400 python bench.py 2>/dev/null | tail -1
echo "=== twoseg_skip bkv=512 (short exploratory run) ==="
BENCH_FRAMES=18 LONGLIVE_TWO_SEGMENT=1 LONGLIVE_BKV=512 timeout 2400 python bench.py 2>/dev/null | tail -1
echo "=== twoseg_skip bkv=256 (short exploratory run) ==="
BENCH_FRAMES=18 LONGLIVE_TWO_SEGMENT=1 LONGLIVE_BKV=256 timeout 2400 python bench.py 2>/dev/null | tail -1
echo "=== fast mode + best skip (expected best overall) ==="
BENCH_REUSE_KV=1 LONGLIVE_TWO_SEGMENT=1 LONGLIVE_BKV=512 timeout 2400 python bench.py 2>/dev/null | tail -1

# 2b) subpixel upsample-conv A/B (exact reformulation; expect a few ms off
#     the VAE decode)
echo "=== vae decode: subpixel (default) ==="
timeout 1800 python scripts/vae_probe.py 2>/dev/null | tail -1
echo "=== vae decode: literal upsample+conv ==="
LONGLIVE_VAE_SUBPIXEL=0 timeout 1800 python scripts/vae_probe.py 2>/dev/null | tail -1

# 3) does the int8 rollout cache close the 9-frame full-geometry gap?
echo "=== 1.3B lora_step, 9 frames, int8 rollout cache ==="
timeout 3000 python scripts/train_probe_1p3b.py --mode lora_step --frames 9 \
  --reps 1 --cache_int8 --auto_shrink 2>/dev/null | tail -3
