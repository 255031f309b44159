#!/bin/bash
# Round-2 continuation: kernel-layout KV cache (kernel_cache) A/B on the
# real chip.  The mode keeps the cache in the flash kernel's own operand
# layout [L*B*N, S_pad, D], carried through the layer scan with one
# in-place DUS per layer, and the kernel reads layer rows via a
# scalar-prefetch offset — removing the write-then-attend path's measured
# ~16 ms/forward KV-write tax (PERF.md).  CPU parity is green
# (tests/test_pipeline.py::test_kernel_cache_*).
# Run:  bash scripts/chip_session_r2e.sh >> /tmp/chip_r2e.log 2>&1
cd "$(dirname "$0")/.."
set -x

# 1) int8 DiT e2e A/B (serving default vs kernel_cache)
echo "=== int8 default ==="
timeout 2400 python bench.py 2>/dev/null | tail -1
echo "=== int8 + kernel_cache ==="
BENCH_KERNEL_CACHE=1 timeout 2400 python bench.py 2>/dev/null | tail -1

# 2) bf16 A/B (kernel_cache is a pure data-movement change; the bf16
#    delta isolates it from int8 quant-pass interactions)
echo "=== bf16 default ==="
BENCH_INT8=0 BENCH_FRAMES=18 timeout 2400 python bench.py 2>/dev/null | tail -1
echo "=== bf16 + kernel_cache ==="
BENCH_INT8=0 BENCH_FRAMES=18 BENCH_KERNEL_CACHE=1 timeout 2400 python bench.py 2>/dev/null | tail -1

# 3) fast mode stack: kernel_cache + reuse_last_denoise_kv
echo "=== fast mode + kernel_cache ==="
BENCH_REUSE_KV=1 BENCH_KERNEL_CACHE=1 timeout 2400 python bench.py 2>/dev/null | tail -1

# 4) switch latency under kernel_cache (recache converts layouts around
#    the replay — expect ~neutral; confirms no regression)
echo "=== switches + kernel_cache ==="
BENCH_SWITCHES=1 BENCH_FRAMES=18 BENCH_KERNEL_CACHE=1 timeout 2400 python bench.py 2>/dev/null | tail -1

# 5) e2e attribution: DiT-only rows.  Component sums (DiT 5-forward ~235 +
#    VAE 206 ms/latent-frame) leave ~80 ms of the 519 e2e unattributed;
#    these rows split the gap between the generation path and the
#    in-pipeline VAE (vs its 206 standalone probe number).
echo "=== DiT-only (skip VAE) default ==="
BENCH_SKIP_VAE=1 BENCH_FRAMES=18 timeout 2400 python bench.py 2>/dev/null | tail -1
echo "=== DiT-only + kernel_cache ==="
BENCH_SKIP_VAE=1 BENCH_FRAMES=18 BENCH_KERNEL_CACHE=1 timeout 2400 python bench.py 2>/dev/null | tail -1

# 6) batched serving B=2 DiT-only WITH full stderr (r2c stage 12 crashed
#    with the traceback suppressed by tail -1)
echo "=== batched B=2 DiT-only, full stderr ==="
BENCH_BATCH=2 BENCH_FRAMES=12 BENCH_SKIP_VAE=1 timeout 2400 python bench.py 2>&1 | tail -25

# 7) fused q-rope (in-kernel prologue) on top of kernel_cache — the
#    VERDICT item-5 stack: zero-copy cache reads + in-place writes +
#    no external rope pass over q
echo "=== int8 + kernel_cache + fused_rope ==="
BENCH_KERNEL_CACHE=1 BENCH_FUSED_ROPE=1 timeout 2400 python bench.py 2>/dev/null | tail -1
echo "=== fast mode + kernel_cache + fused_rope ==="
BENCH_REUSE_KV=1 BENCH_KERNEL_CACHE=1 BENCH_FUSED_ROPE=1 timeout 2400 python bench.py 2>/dev/null | tail -1

# 8) dense-stream VAE kernel variants: r2d's fused_96_int8_dense produced
#    NO output (stderr suppressed) — rerun with stderr, plus the bf16
#    dense variant that was never tried
echo "=== vae dense-stream reruns (stderr visible) ==="
VAE_PROBE_ONLY=fused_96_dense timeout 1800 python scripts/vae_probe.py 2>&1 | tail -5
VAE_PROBE_ONLY=fused_96_int8_dense timeout 1800 python scripts/vae_probe.py 2>&1 | tail -5
