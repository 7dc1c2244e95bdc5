#!/bin/bash
# Round-4 TPU evidence session, phase 2: external validation + artifacts.
# Run after r4_tpu_session.sh (phase 1: bench + kernel A/Bs) completes.
set -u
cd /root/repo
EV=round4_evidence
export JAX_COMPILATION_CACHE_DIR=/root/.cache/jax_tpu_cache
log() { echo "=== $(date -u +%H:%M:%S) $*" | tee -a $EV/session.log; }

log "phase2 health check"
timeout 90 python -c "import jax; print(jax.devices())" >> $EV/session.log 2>&1 || { log "TPU not healthy, aborting"; exit 1; }

log "1/5 validate.py full (incl. sponza gradpath 16spp + conv256)"
python tools/validate.py > $EV/validate.log 2>&1
log "2/5 validate_disney.py (22 extra_images configs)"
python tools/validate_disney.py > $EV/validate_disney.log 2>&1
log "3/5 gallery at native resolutions"
python tools/render_gallery.py > $EV/gallery.log 2>&1
log "4/5 sponza GDPT flagship artifact"
python tools/render_sponza_gdpt.py > $EV/sponza_gdpt.log 2>&1
log "5/5 occupancy report (path + volpath wavefronts)"
python tools/occupancy_report.py both > $EV/occupancy.log 2>&1
log "SESSION PHASE 2 DONE — commit VALIDATION/gallery/occupancy"
