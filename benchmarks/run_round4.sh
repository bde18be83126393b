#!/bin/bash
# Round-4 on-chip measurement chain (benchmarks/ROUND4_RUNBOOK.md).
# Run when the TPU relay is up:  bash benchmarks/run_round4.sh
# Logs to benchmarks/r4_logs/. Jobs run SEQUENTIALLY (the TPU serializes
# across processes); each has a generous timeout (cold compiles are
# minutes through the tunnel). Safe to re-run: steps are independent and
# the compile cache warms as it goes.
set -u
cd "$(dirname "$0")/.."
LOGS=benchmarks/r4_logs
mkdir -p "$LOGS"

run() {
  local name="$1"; shift
  echo "=== $name: $* ===" | tee -a "$LOGS/chain.log"
  local t0=$SECONDS
  timeout 2700 "$@" >"$LOGS/$name.log" 2>&1
  local rc=$?
  echo "=== $name done rc=$rc in $((SECONDS - t0))s ===" | tee -a "$LOGS/chain.log"
  tail -3 "$LOGS/$name.log" | tee -a "$LOGS/chain.log"
}

# 1. headline + fold_b1 revert check + canonical recount for the new hash
run 01_bench python bench.py

# 2. full sweep -> refresh results.json (+ per-model infer rows), sync README
run 02_all python benchmarks/all.py --infer-all
run 02b_sync python tools/sync_readme.py

# 3. U-Net full-res packed_stage0 A/B (false | true | mixed)
run 03_unet_mixed_fullres python tools/bench_flags.py --model unet --batch 8 \
    --ab 'packed_stage0=false|true|"mixed"' --steps 10

# 4. U-Net fast_upconv A/B at full-res (on the best non-packed base)
run 04_unet_fastup_fullres python tools/bench_flags.py --model unet --batch 8 \
    --ab fast_upconv --base '{"packed_stage0": false}' --steps 10

# 5. U-Net preset shape: packed_stage0 sweep + fast_upconv
run 05_unet_mixed_preset python tools/bench_flags.py --model unet --batch 8 \
    --h 256 --w 512 --nc 19 --ab 'packed_stage0=false|true|"mixed"' --steps 10
run 06_unet_fastup_preset python tools/bench_flags.py --model unet --batch 8 \
    --h 256 --w 512 --nc 19 --ab fast_upconv \
    --base '{"packed_stage0": true}' --steps 10

# 7. SegNet packed_dec1 A/B (also re-measures post-gather-fix baseline)
run 07_segnet_dec1 python tools/bench_flags.py --model segnet --batch 8 \
    --ab packed_dec1 --steps 10

# 7b. confusion-matrix impl A/B (runbook item 5): same row, direct cm
run 07b_segnet_cm_direct env SEG_CM_IMPL=direct \
    python tools/bench_flags.py --model segnet --batch 8 \
    --ab packed_dec1 --steps 10

# 8. per-op profiles for the ceiling subsections
run 08_prof_segnet python tools/profile_step.py --model segnet --batch 8 --top 50
run 09_prof_unet_fullres python tools/profile_step.py --model unet --batch 8 --top 50
run 10_prof_unet_preset python tools/profile_step.py --model unet --batch 8 \
    --height 256 --width 512 --nc 19 --top 50
run 11_prof_deeplab python tools/profile_step.py --model deeplab --batch 8 --top 50
run 12_prof_deeplab16 python tools/profile_step.py --model deeplab --batch 8 \
    --model-kw output_stride=16 --top 50

echo "CHAIN COMPLETE" | tee -a "$LOGS/chain.log"
