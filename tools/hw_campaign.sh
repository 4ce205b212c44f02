#!/bin/bash
# Serial on-chip measurement campaign (rounds 3-4). Run ONLY when the axon
# tunnel probes healthy (tools/tunnel_probe.py). Order matters: the
# official-comparable bench capture comes FIRST (VERDICT r2 next #2 —
# insurance against a re-wedge), then the kernel-decision A/Bs, then the
# rooflines. Everything strictly serial (1-vCPU host, CLAUDE.md).
# Usage: bash tools/hw_campaign.sh [outdir]   (default /tmp/campaign)
set -u
OUT=${1:-/tmp/campaign}
mkdir -p "$OUT"
cd "$(dirname "$0")/.."

run() { # name timeout cmd...
  local name=$1 to=$2; shift 2
  echo "=== $name ($(date -u +%H:%M:%S)) ===" | tee -a "$OUT/campaign.log"
  timeout "$to" "$@" > "$OUT/$name.log" 2>&1
  local rc=$?
  echo "$name rc=$rc" | tee -a "$OUT/campaign.log"
  tail -20 "$OUT/$name.log"
}

# 1. healthy-capture insurance: the full bench (headline + extras)
run bench 3600 python bench.py
grep -h '"metric"' "$OUT/bench.log" | tail -1 > "$OUT/bench.json" || true

# 2. kernel-decision A/Bs (VERDICT r2 next #3)
run train_ab 2400 python tools/train_attn_bench.py
run energy_ab 1800 python tools/stage_ab.py energy
run cinn_ab 1200 python tools/stage_ab.py cinn

# 3. rooflines (VERDICT r2 next #4 / #5)
run roofline_small 1800 python tools/roofline_small_stages.py
run roofline_ds3 1200 python tools/roofline_ds3.py
run roofline_ds2 1200 python tools/roofline_ds3.py --ds2

# 4. round-4 decompositions + crossovers (VERDICT r3 #2/#5/#7)
run cinn_budget 1800 python tools/cinn_budget.py
run megakernel_residue 2400 python tools/megakernel_residue.py both
run flash_threshold 2400 python tools/flash_threshold.py
run fused_chain_ab 1800 python tools/fused_chain_bench.py 4096

echo "=== campaign done ($(date -u +%H:%M:%S)) ===" | tee -a "$OUT/campaign.log"
