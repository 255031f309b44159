# Round-2 chip session j: B=2 full-VAE e2e with per-stream decode.
# Batched B=2 serving with the full VAE OOMed a 16 GB v5e (PERF.md:
# int8-KV variant included); BENCH_PER_STREAM_VAE=1 decodes each stream
# as a separate B=1 call with its own conv-cache chain, halving the
# decode HBM peak.  If it fits, the B=2 aggregate e2e row replaces the
# DiT-only 12.2 FPS as the batched-serving headline.
# Waits for any previous chip session (pid file) first.
# Run:  bash scripts/chip_session_r2j.sh >> /tmp/chip_r2j.log 2>&1
cd "$(dirname "$0")/.."
set -x

DEADLINE_TS=${DEADLINE_TS:-9999999999}
left() { echo $((DEADLINE_TS - $(date +%s))); }

while kill -0 "$(cat /tmp/chip_session.pid 2>/dev/null)" 2>/dev/null; do sleep 30; done
echo $$ > /tmp/chip_session.pid

echo "=== B=2 e2e, per-stream full-VAE decode (previously OOM batched) ==="
if [ "$(left)" -gt 600 ]; then
  BENCH_BATCH=2 BENCH_PER_STREAM_VAE=1 BENCH_FRAMES=18 \
    timeout 2400 python -u bench.py 2>&1 | tee /tmp/r2j_b2.log | tail -2
fi

rm -f /tmp/chip_session.pid
