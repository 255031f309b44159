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
