#!/usr/bin/env bash
# One command to capture every measurement currently blocked on the TPU
# tunnel outage (BASELINE.md "2026-08-18 tunnel outage").  Run it the
# moment `rau-vqa doctor` reports the device ok; each step is
# watchdog-guarded, so a mid-run relapse produces parseable error lines
# instead of a hang.  Outputs land under benchmarks/pending/ with one
# .json (last stdout JSON line) and one .log per step.
#
# Usage: bash scripts/run_pending_measurements.sh [outdir]
set -u
cd "$(dirname "$0")/.."
OUT=${1:-benchmarks/pending}
mkdir -p "$OUT"

FAILED=0
run() { # name, cmd...
  local name=$1; shift
  echo "=== $name: $*" | tee -a "$OUT/$name.log"
  "$@" >"$OUT/$name.stdout" 2>>"$OUT/$name.log"
  local rc=$?
  tail -n 1 "$OUT/$name.stdout" >"$OUT/$name.json"
  if [ "$rc" -ne 0 ]; then FAILED=$((FAILED + 1)); fi
  echo "--- $name rc=$rc: $(cat "$OUT/$name.json")"
}

# preflight once; abort the whole sweep early on a hung tunnel.  Budget
# must exceed doctor's own worst-case internal probes (90s device + 90s
# cpu + 2x180s native rebuilds = 540s), or a slow-but-healthy rig gets
# SIGTERMed mid-diagnosis and the sweep aborts spuriously.
if ! timeout 600 python -m rau_vqa_tpu.cli doctor \
      >"$OUT/doctor.stdout" 2>"$OUT/doctor.log"; then
  tail -n 1 "$OUT/doctor.stdout" >"$OUT/doctor.json" 2>/dev/null
  echo "doctor UNHEALTHY — not measuring (see $OUT/doctor.{json,log})"
  exit 3
fi
tail -n 1 "$OUT/doctor.stdout" >"$OUT/doctor.json"

# 1. headline question-path serving (median of 5 + canary)
run bench python bench.py

# 2. from-pixels serving (ResNet-101-448 B=64 default)
run bench_pixels python bench_pixels.py

# 3. precompute-features throughput (never measured on the real chip)
run bench_precompute python scripts/bench_precompute.py

# 4. serving batch-size knee (B=1024..8192 interleaved sweep)
run probe_serving_batch python scripts/probe_serving_batch.py

# 5. AOT-artifact re-measurement (VERDICT r3 #6): compile_first_s should
#    drop toward load+upload vs steps 1-2 (same protocol, no Python
#    trace, persistent executable cache warm from steps 1-2); the
#    steady-state value must match within spread
run bench_artifact python bench.py --artifact
run bench_pixels_artifact python bench_pixels.py --artifact

# 6. ViT-L stretch config (BASELINE.json configs[4]) — never benchmarked:
#    from-pixels serving with the S=256 RAU head, B in {32, 64}
run bench_pixels_vit_b32 python bench_pixels.py --backbone vit --batch 32
run bench_pixels_vit_b64 python bench_pixels.py --backbone vit --batch 64

# 7. HTTP service under real concurrency: unloaded p50/p99 + saturated
#    micro-batched q/s (VERDICT r3 weak #4 — serve.py's latency claim)
run bench_serve python scripts/bench_serve.py

# 8. Pallas stage-fused bottleneck A/B (VERDICT r3 #2) — paired against
#    step 2's live baseline in the same window.  KILL CRITERION: <=1.0x
#    of the paired baseline retires it to the measured-negative ledger
#    like s2d and int8; a win extends per-stage toward the ~53% MFU the
#    5k/448px target needs.  Stage 2 alone is the 22-identity-block
#    bulk; 1,2,3 adds the cheap neighbors.
run bench_pixels_fused_s2 python bench_pixels.py --fused-stages 2
run bench_pixels_fused_s123 python bench_pixels.py --fused-stages 1,2,3

# 9. training step re-baseline on the post-refactor tree (the round-3
#    consume()/one-device_get change touched this path; expect ~32.8
#    ms/step plain b512 and the ~-3.9% trunc16 delta)
run bench_train python scripts/bench_train.py --variants plain,trunc16

if [ "$FAILED" -ne 0 ]; then
  echo "$FAILED step(s) FAILED — check the per-step .log/.json under $OUT/"
  exit 1
fi
echo "all pending measurements captured under $OUT/"
