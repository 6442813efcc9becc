#!/bin/bash
# chain_r4C: replacement for the stale chain_r4B instance (which skipped
# the bench-warm stage — launched before that edit landed).  The bench
# warm (PID in /root/runs/r4B/bench_warm.pid) was started by hand at
# 19:42Z; this chain waits for it, then runs the improved non-parametric
# MLP KMV production run (quad head + EMA track 7500 + ckpt every 1000).
# Leg 1 hard-cuts at 21:25Z for the driver's round-end bench (~21:50Z);
# leg 2 resumes supervised after 22:20Z; leg 3 = held-out stack analyses.
set -u
ROOT=/root/runs
S=$ROOT/r4B
ART=/root/repo/artifacts/r4B
REPO=$ROOT/repo_r4B
mkdir -p "$S" "$ART"
log() { echo "[chain] $(date -u +%H:%M:%S) $*" >> "$S/chain.log"; cp -f "$S/chain.log" "$ART/" 2>/dev/null; }

cd "$REPO" || exit 1
log "r4C takeover (snapshot unchanged at $REPO)"

# ---- wait for the hand-launched bench warm to finish
BW=$(cat "$S/bench_warm.pid" 2>/dev/null)
while [ -n "$BW" ] && kill -0 "$BW" 2>/dev/null; do sleep 30; done
log "bench warm finished: $(tail -c 400 "$S/bench_warm.json" 2>/dev/null | tr -d '\n')"
cp -f "$S/bench_warm.json" "$S/bench_warm.log" "$ART/" 2>/dev/null

( while true; do
    cp -f "$S"/*.log "$ART/" 2>/dev/null
    for ck in "$ROOT"/r4B_*_ckpt; do
      [ -d "$ck" ] && { rm -rf "$ART/$(basename "$ck").tmp"; \
        cp -r "$ck" "$ART/$(basename "$ck").tmp" 2>/dev/null && \
        rm -rf "$ART/$(basename "$ck")" && \
        mv "$ART/$(basename "$ck").tmp" "$ART/$(basename "$ck")"; }
    done
    sleep 300
  done ) & echo $! > "$S/copier.pid"

CK=$ROOT/r4B_mlpema15k_ckpt
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

# ---- leg 1: run until the 21:25Z cut (checkpoints survive the kill)
CUT=$(date -u -d 'today 21:25' +%s)
if [ "$(date -u +%s)" -lt "$CUT" ]; then
  log "leg1 mlpema15k start (cut at 21:25Z)"
  $MLP > "$S/mlpema15k.log" 2>&1 &
  TP=$!
  while kill -0 "$TP" 2>/dev/null && [ "$(date -u +%s)" -lt "$CUT" ]; do sleep 20; done
  if kill -0 "$TP" 2>/dev/null; then
    kill -TERM "$TP"; sleep 15; kill -KILL "$TP" 2>/dev/null
    log "leg1 killed at cut (chip freed for driver bench)"
  else
    log "leg1 exited on its own"
  fi
  wait "$TP" 2>/dev/null
fi

# ---- pause window for the driver's round-end bench
while [ "$(date -u +%s)" -lt "$(date -u -d 'today 22:20' +%s)" ]; do sleep 30; done
log "pause window over, resuming supervised"

# ---- leg 2: supervised to completion (resume is bitwise-exact)
bash scripts/supervise.sh "$S/mlpema15k.log" "$CK" 7200 8 -- $MLP
log "mlpema15k done rc=$?"

# ---- leg 3: analyses (CPU; chip stays free)
MLPRUN() { PYTHONPATH="" JAX_PLATFORMS=cpu python -u scripts/analyze_kmv.py "$@"; }
MEMBERS=$(seq 1000 1000 15000 | sed "s|^|$CK@|" | paste -sd,)
MLPRUN "$MEMBERS" --fit-weights --probe-seed=7 \
  --save-preds=$S/preds_mlpema_7.npz > "$S/mlpema_stack_seed7.log" 2>&1
log "stack fit rc=$?"
W=$(grep -oP 'reporting probe\): \K.*' "$S/mlpema_stack_seed7.log")
if [ -n "$W" ]; then
  MLPRUN "$MEMBERS" --weights-raw=$W \
    --save-preds=$S/preds_mlpema_123.npz > "$S/mlpema_stack_eval.log" 2>&1
  log "stack eval rc=$?"
fi
MLPRUN "$CK" --ema > "$S/mlpema_ema_eval.log" 2>&1
log "ema eval rc=$?"

kill "$(cat "$S/copier.pid")" 2>/dev/null
cp -f "$S"/*.log "$ART/" 2>/dev/null
for ck in "$ROOT"/r4B_*_ckpt; do
  [ -d "$ck" ] && { rm -rf "$ART/$(basename "$ck")"; cp -r "$ck" "$ART/"; }
done
touch "$S/done"
log "chain_r4C complete"
