#!/bin/bash
# Round-4 TPU evidence session: run sequentially the moment the tunnel
# is back. nohup this script ONCE; never timeout-kill jobs mid-compile.
# Logs land in round4_evidence/ (committed as evidence).
set -u
cd /root/repo
EV=round4_evidence
export JAX_COMPILATION_CACHE_DIR=/root/.cache/jax_tpu_cache
log() { echo "=== $(date -u +%H:%M:%S) $*" | tee -a $EV/session.log; }

log "health check"
timeout 90 python -c "import jax; print(jax.devices())" >> $EV/session.log 2>&1 || { log "TPU not healthy, aborting"; exit 1; }

log "1/7 speed_of_light kernel"
python tools/speed_of_light.py kernel > $EV/sol_kernel.log 2>&1
log "2/7 bench baseline (all 5 configs)"
python bench.py > $EV/bench_baseline.json 2>&1
log "3/7 veach x3 spread"
for i in 1 2 3; do GDPT_BENCH_ONLY=veach_mi python bench.py >> $EV/veach_spread.json 2>&1; done
log "4/7 pool-sort A/B (disney+sponza)"
GDPT_BENCH_ONLY=disney_bsdf,sponza_gradpath GDPT_POOL_SORT=1 python bench.py > $EV/bench_poolsort.json 2>&1
log "5/7 expansion premerge A/B (disney+sponza)"
GDPT_BENCH_ONLY=disney_bsdf,sponza_gradpath GDPT_EXPAND_PREMERGE=1 python bench.py > $EV/bench_premerge.json 2>&1
log "6/7 packet rows=4 A/B (disney+sponza)"
GDPT_BENCH_ONLY=disney_bsdf,sponza_gradpath GDPT_PACKET_ROWS=4 python bench.py > $EV/bench_rows4.json 2>&1
log "7/7 kernel_sweep sponza (sorted vs presorted)"
python tools/kernel_sweep.py > $EV/kernel_sweep_sorted.json 2>&1
GDPT_PACKET_SORT=0 python tools/kernel_sweep.py > $EV/kernel_sweep_nosort.json 2>&1
log "SESSION PHASE 1 DONE — review, commit, then run validate/gallery"
