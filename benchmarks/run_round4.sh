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

run() {                    # run <timeout_s> <name> <cmd...>
  local to="$1" name="$2"; shift 2
  echo "=== $name (timeout ${to}s): $* ===" | tee -a "$LOGS/chain.log"
  local t0=$SECONDS
  timeout "$to" "$@" >"$LOGS/$name.log" 2>&1
  local rc=$?
  echo "=== $name done rc=$rc in $((SECONDS - t0))s ===" | tee -a "$LOGS/chain.log"
  tail -3 "$LOGS/$name.log" | tee -a "$LOGS/chain.log"
}

# 1. headline + fold_b1 revert check + canonical recount for the new hash
run 2700 01_bench python bench.py

# 1b. bf16 first-moment Adam on the headline (weight-heavy fc4096: the
#     Adam update is ~5 full-param HBM passes; bf16 mu deletes one).
#     Numerics knob — check train_miou/loss parity before any default flip.
run 2700 01b_bench_bf16mu env BENCH_OPT_KWARGS='{"mu_dtype": "bfloat16"}' \
    python bench.py

# 2. full sweep -> refresh results.json (+ per-model infer rows), sync
#    README. BIG budget: canonical_flops.json was pruned this round, so
#    all 6 train rows recount (a multi-minute extra compile each) plus 3
#    cold inference compiles.
run 7200 02_all python benchmarks/all.py --infer-all
run 600 02b_sync python tools/sync_readme.py

# 3. U-Net full-res packed_stage0 A/B (false | true | mixed)
run 3600 03_unet_mixed_fullres python tools/bench_flags.py --model unet --batch 8 \
    --ab 'packed_stage0=false|true|"mixed"' --steps 10

# 4. U-Net fast_upconv A/B at full-res (on the best non-packed base)
run 2700 04_unet_fastup_fullres python tools/bench_flags.py --model unet --batch 8 \
    --ab fast_upconv --base '{"packed_stage0": false}' --steps 10

# 5. U-Net preset shape: packed_stage0 sweep + fast_upconv
run 3600 05_unet_mixed_preset python tools/bench_flags.py --model unet --batch 8 \
    --h 256 --w 512 --nc 19 --ab 'packed_stage0=false|true|"mixed"' --steps 10
run 2700 06_unet_fastup_preset python tools/bench_flags.py --model unet --batch 8 \
    --h 256 --w 512 --nc 19 --ab fast_upconv \
    --base '{"packed_stage0": true}' --steps 10

# 7. SegNet packed_dec1 A/B (also re-measures post-gather-fix baseline)
run 2700 07_segnet_dec1 python tools/bench_flags.py --model segnet --batch 8 \
    --ab packed_dec1 --steps 10

# 7b. confusion-matrix impl A/B (runbook item 5): same row, direct cm
run 2700 07b_segnet_cm_direct env SEG_CM_IMPL=direct \
    python tools/bench_flags.py --model segnet --batch 8 \
    --ab packed_dec1 --steps 10

# 7b2. DeepLab concat-free ASPP projection (kernel-sliced sum of branch
#      convs + broadcast-add image branch; checkpoint-identical)
run 2700 07b2_deeplab_asppsplit python tools/bench_flags.py --model deeplab \
    --batch 8 --ab aspp_split_proj --steps 10
run 2700 07b3_deeplab16_asppsplit python tools/bench_flags.py --model deeplab \
    --batch 8 --ab aspp_split_proj --base '{"output_stride": 16}' --steps 10

# 7c. DeepLab batch scaling probe (r3: os8 went 27->73 img/s from b4->b8;
# os16 at b8 runs a 4x smaller grid — check whether b16 keeps scaling)
run 2700 07c_deeplab16_b16 python tools/bench_flags.py --model deeplab \
    --batch 16 --ab 'output_stride=16' --steps 10

# 7d. int8 PTQ serving A/B + per-op attribution (runbook item 9): does
#     XLA hit the v5e int8 MXU (conv fusions ~2x the bf16 rows) or
#     emulate? The sweep (02_all) already logs fcn8s_int8_infer_b8.
run 2700 07d_prof_int8 python tools/profile_int8.py --batch 8 --steps 10

# 8. per-op profiles for the ceiling subsections
run 2400 08_prof_segnet python tools/profile_step.py --model segnet --batch 8 --top 50
run 2400 09_prof_unet_fullres python tools/profile_step.py --model unet --batch 8 --top 50
run 2400 10_prof_unet_preset python tools/profile_step.py --model unet --batch 8 \
    --height 256 --width 512 --nc 19 --top 50
run 2400 11_prof_deeplab python tools/profile_step.py --model deeplab --batch 8 --top 50
run 2400 12_prof_deeplab16 python tools/profile_step.py --model deeplab --batch 8 \
    --model-kw output_stride=16 --top 50

echo "CHAIN COMPLETE" | tee -a "$LOGS/chain.log"
