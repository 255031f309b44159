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
