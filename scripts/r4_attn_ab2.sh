#!/bin/bash
cd "$(dirname "$0")/.."
OUT=${1:-/tmp/r4_attn_ab2.jsonl}
: > "$OUT"
run() {
  echo "== $* ==" >&2
  env "$@" timeout 1200 python scripts/r4_attn_ab.py 2>/dev/null | tail -1 >> "$OUT"
  tail -1 "$OUT" >&2
}
run LONGLIVE_BQ=4680 LONGLIVE_BKV=256 LONGLIVE_EXP2=1
run LONGLIVE_BQ=4680 LONGLIVE_BKV=128
run LONGLIVE_BQ=4680 LONGLIVE_BKV=512
run LONGLIVE_INT8_FUSED=1
run LONGLIVE_BQ=4680 LONGLIVE_BKV=256 LONGLIVE_EXP2=1 LONGLIVE_INT8_FUSED=1
echo done
