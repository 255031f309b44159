# 960-frame constant-memory run at the round-3 serving defaults (fast
# mode + 9/3 window) — re-validates the 240 s-class headline at the NEW
# default schedule.  Run: bash scripts/chip_session_r3g.sh >> /tmp/chip_r3g.log 2>&1
cd "$(dirname "$0")/.."
set -x
. scripts/chip_lock.sh && chip_lock_acquire
timeout 3000 python -u scripts/long_gen.py 960 2>&1 | tee /tmp/r3g_long.log | tail -4
chip_lock_release
