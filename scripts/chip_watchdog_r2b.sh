#!/bin/bash
# Finite watchdog: probe the axon tunnel every ~8 min; when it answers,
# run the queued round-2 chip session once and exit.
# Run:  bash scripts/chip_watchdog_r2b.sh >> /tmp/chip_watchdog_r2b.log 2>&1
cd "$(dirname "$0")/.."
for i in $(seq 1 80); do
  echo "[watchdog] probe $i $(date -u +%H:%M:%S)"
  if timeout 120 python -c "import jax; assert jax.devices()[0].platform == 'tpu'; print('TPU-UP')"; then
    echo "[watchdog] tunnel up — running chip session"
    bash scripts/chip_session_r2b.sh >> /tmp/chip_r2.log 2>&1
    echo "[watchdog] chip session done rc=$?"
    exit 0
  fi
  sleep 480
done
echo "[watchdog] gave up after 80 probes"
exit 1
