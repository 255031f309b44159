#!/bin/bash
# Round-4 attention-knob A/B ladder (one subprocess per variant).
cd "$(dirname "$0")/.."
OUT=${1:-/tmp/r4_attn_ab.jsonl}
: > "$OUT"
run() {
  echo "== $* ==" >&2
  env "$@" timeout 1200 python scripts/r4_attn_ab.py 2>/dev/null | tail -1 >> "$OUT"
  tail -1 "$OUT" >&2
}
run DUMMY=0                      # baseline bq=1560 bkv=512
run LONGLIVE_BKV=1024
run LONGLIVE_BQ=2340
run LONGLIVE_BQ=2340 LONGLIVE_BKV=1024
run LONGLIVE_BQ=4680 LONGLIVE_BKV=256
run LONGLIVE_EXP2=1
run LONGLIVE_MXU_LSUM=1
run LONGLIVE_EXP2=1 LONGLIVE_MXU_LSUM=1
echo done
