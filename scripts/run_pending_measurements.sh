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

# (Round-4 recovery completed 2026-08-18 — results in
# benchmarks/pending_r4/ and BASELINE.md.  The steps below are the
# CURRENT re-baseline set for any future outage recovery; retired A/Bs
# — fused stages, s2d, int8 — are not re-run, their verdicts stand.)

# 1. headline question-path serving (B=6144 knee; expect ~151-153k q/s)
run bench python bench.py

# 2. from-pixels serving (ResNet-101-448 B=120 default; expect ~5.6k q/s)
run bench_pixels python bench_pixels.py

# 3. precompute-features throughput (tunnel-bandwidth-bound on this rig:
#    ~7 img/s; the on-device backbone sustains ~1.8k img/s)
run bench_precompute python scripts/bench_precompute.py

# 4. serving batch-size knee (B=1024..8192 interleaved sweep)
run probe_serving_batch python scripts/probe_serving_batch.py

# 5. AOT-artifact re-measurement: compile_first_s should drop toward
#    load+upload vs steps 1-2; steady state must match within spread
run bench_artifact python bench.py --artifact
run bench_pixels_artifact python bench_pixels.py --artifact

# 6. ViT-L stretch config (B=48 measured best; expect ~2.0k q/s)
run bench_pixels_vit python bench_pixels.py --backbone vit --batch 48

# 7. HTTP service under real concurrency (expect ~270 q/s saturated,
#    ~50 ms unloaded p50 = tunnel RTT floor, 0 errors)
run bench_serve python scripts/bench_serve.py

# 8. training step re-baseline (expect ~31.5 ms/step plain b512)
run bench_train python scripts/bench_train.py --variants plain,trunc16

# 9. from-pixels TRAINING (inline frozen backbone; expect ~113 ms/step =
#    ~3.2k questions/s trained at 120 img/step)
run bench_train_pixels python scripts/bench_train.py --variants pixels \
    --preset ours_resnet --batch 360 --qpi 3

# 10. backbone FINE-TUNING, best measured config (grouped unique-image
#     batches, no-remat; expect ~318 ms/step = ~900 q/s trained)
run bench_train_finetune python scripts/bench_train.py \
    --variants finetunegrp --preset ours_resnet --batch 288 --steps 5 \
    --ft-no-remat

if [ "$FAILED" -ne 0 ]; then
  echo "$FAILED step(s) FAILED — check the per-step .log/.json under $OUT/"
  exit 1
fi
echo "all pending measurements captured under $OUT/"
