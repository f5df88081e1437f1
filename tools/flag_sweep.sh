#!/bin/bash
# XLA TPU compiler-option sweep over bench.py (full fused G+D step).
# Local jaxlib's XLA_FLAGS parser fatally rejects tpu-only flags, so
# options go through per-compile compiler_options (BENCH_XLA_OPTS knob in
# bench.py), which serialize into the relay compile request. Each config
# gets its own compile-cache dir so every option set really recompiles.
# Usage: bash tools/flag_sweep.sh [results_log]
set -u
LOG=${1:-/tmp/flag_sweep.log}
touch "$LOG"

run_cfg() {
  local name="$1"; shift
  local opts="$*"
  local cache="/tmp/fsweep_cache_${name}"
  # resumable: skip configs that already produced a result line
  if grep -A1 "^=== $name " "$LOG" | grep -q img/s; then return; fi
  mkdir -p "$cache"
  echo "=== $name [$opts]" | tee -a "$LOG"
  BENCH_XLA_OPTS="$opts" DSGAN_CACHE_DIR="$cache" BENCH_STEPS=30 \
    timeout 580 python bench.py 2>/tmp/fsweep_err_${name}.log | tail -1 | tee -a "$LOG"
}

run_cfg baseline ""
run_cfg rwb_off xla_tpu_rwb_fusion=false
run_cfg rw_as_conv xla_tpu_handle_reduce_window_as_convolution=true
run_cfg exp_cost_model xla_tpu_enable_experimental_fusion_cost_model=true
run_cfg minimalloc xla_tpu_msa_use_minimalloc=true
run_cfg aggr_layout xla_tpu_enable_aggressive_loop_fusion_layout_opt=true
run_cfg nested_loop_fusion xla_tpu_enable_multi_level_nested_loop_fusion=true
run_cfg dot_dot_dup xla_tpu_dot_dot_fusion_duplicated=true
run_cfg licm8 xla_tpu_licm_size_inflation_ratio=8
run_cfg lhs xla_tpu_enable_latency_hiding_scheduler=true
run_cfg scavenge xla_tpu_scavenge_vmem_for_fusions=true
run_cfg autotune_fusions xla_tpu_autotune_fusions=true
run_cfg nested_dot xla_tpu_nested_dot_fusion=true
run_cfg pre_fusion_remat xla_tpu_pre_fusion_remat=true
echo DONE | tee -a "$LOG"
