#!/bin/bash
# Round-3 TPU bench sweep. Each benchmark runs TWICE in separate
# processes: pass 1 compiles into the persistent cache, pass 2 (fresh
# process, warm cache) measures — same-process timings right after long
# XLA compiles overcount 8-25x (CLAUDE.md). Stages run sequentially:
# the axon TPU is single-client.
#
# Usage: [SWEEP_TIMEOUT=sec] bash scripts/run_bench_sweep.sh [stage...]
#   stages: flagship flagship512 profile rawnet fab attacks attacks_models
#           fab256 effectiveness   (default: all in that order)
# SWEEP_TIMEOUT: per-pass SIGTERM bound. The 2400 s default assumes a
# multi-core host; on a 1-vCPU VM cold compiles run ~8x longer — use
# 10800 there (see CLAUDE.md "CHECK nproc FIRST").
set -u
cd "$(dirname "$0")/.."
BOUND=${SWEEP_TIMEOUT:-2400}
LOG=logs/bench_sweep_$(date +%s).log
echo "sweep -> $LOG"

run2() {  # run2 <name> <cmd...>: two-pass, keep pass-2 output
  local name=$1; shift
  # bounded: a TPU-tunnel flap mid-stage must not hang the sweep
  # (SIGTERM only — never kill -9 a TPU client, it wedges the lease)
  echo "=== $name pass1 $(date +%H:%M:%S)" | tee -a "$LOG"
  timeout "$BOUND" "$@" >> "$LOG" 2>&1 \
    || echo "=== $name pass1 FAILED rc=$?" | tee -a "$LOG"
  echo "=== $name pass2 $(date +%H:%M:%S)" | tee -a "$LOG"
  timeout "$BOUND" "$@" 2>&1 | tee -a "$LOG"
}

for stage in "${@:-flagship profile layers18 rawnet attacks attacks_models fab fab256 blackbox rawnet256 floor pool_r5 strategies train effectiveness flagship512}"; do
for s in $stage; do
case $s in
  flagship)      run2 bench.py python bench.py ;;
  flagship512)   run2 bench512 python bench.py --batch 512 ;;
  flagship_eqmask) run2 bench_eqmask env ADAA_MFM_EQMASK=1 python bench.py --skip-baseline ;;
  effectiveness_eqmask) run2 effectiveness_eqmask env ADAA_MFM_EQMASK=1 python scripts/bench_effectiveness.py ;;
  fab_merged_row) run2 fab_merged_b256 env ADAA_FAB_MERGED=1 python scripts/bench_attacks.py --attacks FAB --batch 256 --key-suffix "+merged" ;;
  profile)       run2 profile_r3b python scripts/profiling/profile_r3b.py ;;
  layers18)      run2 profile_layers18 python scripts/profiling/profile_layers18.py ;;
  layers_r4)     run2 profile_layers_r4 python scripts/profiling/profile_layers_r4.py ;;
  rawnet)        run2 profile_rawnet python scripts/profiling/profile_rawnet_r3b.py ;;
  rawnet_r4)     run2 profile_rawnet_r4 python scripts/profiling/profile_rawnet_r4.py ;;
  train)         run2 bench_train python scripts/bench_train.py ;;
  train_profile) run2 profile_train python scripts/profiling/profile_train_r4.py ;;
  fab)           run2 profile_fab python scripts/profiling/profile_fab.py ;;
  attacks)       run2 bench_attacks python scripts/bench_attacks.py ;;
  attacks_models)
                 run2 bench_attacks_specrnet python scripts/bench_attacks.py --model specrnet --attacks PGD FGSM
                 run2 bench_attacks_rawnet3 python scripts/bench_attacks.py --model rawnet3 --attacks PGD FGSM ;;
  fab256)        run2 fab_b256 python scripts/bench_attacks.py --attacks FAB --batch 256 ;;
  blackbox)      run2 bench_blackbox python scripts/bench_attacks.py --attacks OnePixel MultiAttack AutoAttack
                 run2 square_b256 python scripts/bench_attacks.py --attacks Square --batch 256 ;;
  rawnet256)     run2 rawnet_pgd_b256 python scripts/bench_attacks.py --model rawnet3 --attacks PGD --batch 256 ;;
  rawnet128)     run2 rawnet_pgd_b128 python scripts/bench_attacks.py --model rawnet3 --attacks PGD --batch 128 ;;
  floor)         run2 profile_floor python scripts/profiling/profile_floor_r5.py ;;
  rawnet_floor)  run2 profile_rawnet_floor python scripts/profiling/profile_rawnet_floor_r5.py ;;
  s2d)           run2 profile_s2d python scripts/profiling/profile_s2d_r5.py ;;
  pool_r5)       run2 profile_pool_r5 python scripts/profiling/profile_pool_r5.py ;;
  mfmpool)       run2 profile_mfmpool python scripts/profiling/profile_mfmpool_r5.py ;;
  strategies)    run2 profile_strategies python scripts/profiling/profile_strategies_r5.py ;;
  fgsm_bisect)   run2 fgsm_bisect python scripts/profiling/fgsm_compile_bisect.py ;;
  fab_merged)    run2 fab_merged python scripts/profiling/profile_fab_merged_r5.py ;;
  effectiveness) run2 effectiveness python scripts/bench_effectiveness.py ;;
  *) echo "unknown stage $s"; exit 1 ;;
esac
done
done
echo "sweep done $(date +%H:%M:%S)" | tee -a "$LOG"
