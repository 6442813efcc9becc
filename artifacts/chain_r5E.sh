#!/bin/bash
# chain_r5E (chip, round-5 endgame): manual takeover of chain_r5C's tail
# so the remaining stages run at HEAD (with the packed pairwise kernels
# auto-enabled) instead of the pre-flip snapshot — mlpema's pairwise
# trainer step drops from ~726 ms/grad (v1) to ~195 ms (packed), turning
# the 2 h stage into ~40 min and production-validating the flip.
# Trigger: /root/runs/r5E_go (touched after chain_r5C's rot analyze is
# harvested and the chain killed).  Stages:
#   1. mlpema15k resume AT HEAD from the committed step-8000 ckpt (#3)
#      + analyze (+EMA) + 15-iterate held-out stack (CPU)
#   2. on-chip TPU-gated pallas/packed/langevin tests at HEAD (#6)
#   3. bench.py at HEAD — warms the driver's round-end cache incl. the
#      packed mlp_pairwise row
#   4. packed tile sweep (gated <06:30Z)
set -u
ROOT=/root/runs
S=$ROOT/r5E
ART=/root/repo/artifacts/r5E
REPO=$ROOT/repo_r5E
mkdir -p "$S" "$ART" "$REPO"
log() { echo "[chain] $(date -u +%H:%M:%S) $*" >> "$S/chain.log"; cp -f "$S/chain.log" "$ART/" 2>/dev/null; }
NOW() { date -u +%s; }
G_SWEEP=$(date -ud "2026-08-21 06:30" +%s)

while [ ! -f "$ROOT/r5E_go" ]; do sleep 30; done
tar -C /root/repo --exclude=.git --exclude=artifacts -cf - . | tar -C "$REPO" -xf -
cd "$REPO" || exit 1
log "snapshot ready at $REPO ($(git -C /root/repo rev-parse --short HEAD))"

( while true; do
    cp -f "$S"/*.log "$S"/*.json "$ART/" 2>/dev/null
    for ck in "$ROOT"/r5E_*_ckpt; do
      [ -d "$ck" ] && { rm -rf "$ART/$(basename "$ck").tmp"; \
        cp -r "$ck" "$ART/$(basename "$ck").tmp" 2>/dev/null && \
        rm -rf "$ART/$(basename "$ck")" && \
        mv "$ART/$(basename "$ck").tmp" "$ART/$(basename "$ck")"; }
    done
    sleep 300
  done ) & COPIER=$!
trap 'kill $COPIER 2>/dev/null' EXIT

# ---- 1: mlpema15k at HEAD (packed pairwise path)
CK=$ROOT/r5E_mlpema15k_ckpt
if [ ! -d "$CK" ] && [ -d /root/repo/artifacts/r4B/r4B_mlpema15k_ckpt ]; then
  cp -r /root/repo/artifacts/r4B/r4B_mlpema15k_ckpt "$CK"
fi
MLP="python -u -m pde_inverse_tpu.main preset=KMV-nonparametric-fourier \
  neural_network.model=mlp neural_network.fourier_features=0 \
  neural_network.fourier_trainable=False neural_network.quadratic_head=True \
  solver.train.kmv_field_reg=0.0 \
  train.optimizer.weight_decay=1e-1 train.steps_per_chunk=5 \
  train.optimizer.use_ema=True train.optimizer.ema_mode=track \
  train.optimizer.ema_switch_step=7500 \
  test.frequency=1000 test.verbose=True logging.writer=none train.data_seed=0 \
  save_and_load.save_model=True save_and_load.load_model=True \
  save_and_load.save_frequency=1000 save_and_load.model_directory=$CK \
  logging.run_dir=$S/runs_mlpema15k"
log "mlpema15k (packed) resume start"
bash scripts/supervise.sh "$S/mlpema15k.log" "$CK" 2400 8 -- $MLP
log "mlpema15k rc=$?"
MLPRUN() { PYTHONPATH="" JAX_PLATFORMS=cpu nice -n 10 python -u scripts/analyze_kmv.py "$@"; }
MEMBERS=$(seq 1000 1000 15000 | sed "s|^|$CK@|" | paste -sd,)
MLPRUN "$MEMBERS" --fit-weights --probe-seed=7 > "$S/mlpema_stack_seed7.log" 2>&1
log "stack fit rc=$?"
W=$(grep -oP 'weights-raw: \K.*' "$S/mlpema_stack_seed7.log")
if [ -n "$W" ]; then
  MLPRUN "$MEMBERS" --weights-raw="$W" > "$S/mlpema_stack_report.log" 2>&1
  log "stack report rc=$?"
fi
MLPRUN "$CK" --ema > "$S/mlpema_ema_eval.log" 2>&1
log "ema eval rc=$?"

# ---- 2: on-chip TPU gates at HEAD
log "tpu gates start"
PDE_INVERSE_TPU_TEST_TPU=1 timeout 4500 python -m pytest \
  tests/test_pallas.py tests/test_pallas_packed.py tests/test_langevin.py -q \
  > "$S/tpu_gates.log" 2>&1
log "tpu gates rc=$?"

# ---- 3: bench at HEAD (driver warm)
log "bench start"
timeout 5400 python -u bench.py > "$S/bench_warm.json" 2> "$S/bench_warm.log"
log "bench rc=$?"

# ---- 4: packed tile sweep if time remains
if [ "$(NOW)" -lt "$G_SWEEP" ]; then
  log "packed tile sweep start"
  timeout 2400 python -u scripts/probe_pairwise_train_bwd.py --sweep-blocks --packed \
    > "$S/packed_sweep.log" 2>&1
  log "packed sweep rc=$?"
fi
cp -f "$S"/*.log "$S"/bench_warm.json "$ART/" 2>/dev/null
for ck in "$ROOT"/r5E_*_ckpt; do
  [ -d "$ck" ] && { rm -rf "$ART/$(basename "$ck")"; cp -r "$ck" "$ART/"; }
done
touch "$S/done"
log "chain_r5E complete"
