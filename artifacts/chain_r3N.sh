#!/bin/bash
# chain_r3N (chip): mlp15k RESTART after the FOURTH re-image (~04:00 Aug 19).
# Recipe = chain_r3G/r3H's validated production MLP cell: pure MLP wd=1e-1
# cosine at 7x2000 through the VMEM-fixed Pallas pairwise path, chunk=5,
# ckpt every 2500.  r3H reached step 12.5k rel 0.4368 before re-image #3;
# its ckpt is gone, so this is a fresh data_seed=0 run.
#
# Chip etiquette: waits for the bench warm-up (PID in r3N/bench.pid), runs
# leg-1 until 05:35Z (mainly to get the 30-min scan-of-pallas compile into
# the persistent XLA cache), KILLS it to free the chip for the driver's
# round-end bench (~05:45Z), sleeps to 06:05Z, then resumes supervised.
# Every stage streams log+ckpt into /root/repo/artifacts/r3N so the driver's
# round-end commit persists progress across re-images.
set -u
ROOT=/root/runs
S=$ROOT/r3N
ART=/root/repo/artifacts/r3N
REPO=$ROOT/repo_r3N
mkdir -p "$S" "$ART"
log() { echo "[chain] $(date -u +%H:%M:%S) $*" >> "$S/chain.log"; cp -f "$S/chain.log" "$ART/" 2>/dev/null; }

# snapshot the repo so later git churn can't break the running chain
mkdir -p "$REPO"
tar -C /root/repo --exclude=.git --exclude=artifacts -cf - . | tar -C "$REPO" -xf -
cd "$REPO" || exit 1

# wait for the bench warm-up to release the chip
BP=$(cat "$S/bench.pid" 2>/dev/null || echo "")
while [ -n "$BP" ] && kill -0 "$BP" 2>/dev/null; do sleep 30; done
log "bench warm-up done, chip free"

MLP="python -u -m pde_inverse_tpu.main preset=KMV-nonparametric-fourier \
  neural_network.model=mlp neural_network.fourier_features=0 \
  neural_network.fourier_trainable=False \
  solver.train.kmv_field_reg=0.0 train.optimizer.weight_decay=1e-1 \
  train.steps_per_chunk=5 test.frequency=2500 test.verbose=True \
  logging.writer=none"

# background copier: stream logs + latest ckpts into the repo every 5 min
( while true; do
    cp -f "$S"/*.log "$ART/" 2>/dev/null
    for ck in "$ROOT"/r3N_*_ckpt; do
      [ -d "$ck" ] && { rm -rf "$ART/$(basename "$ck").tmp"; \
        cp -r "$ck" "$ART/$(basename "$ck").tmp" 2>/dev/null && \
        rm -rf "$ART/$(basename "$ck")" && \
        mv "$ART/$(basename "$ck").tmp" "$ART/$(basename "$ck")"; }
    done
    sleep 300
  done ) & echo $! > "$S/copier.pid"

CK=$ROOT/r3N_mlp15k_ckpt
# ---- leg 1: run until 05:35Z, then kill to free the chip for driver bench
NOW=$(date -u +%s); CUT=$(date -u -d "today 05:35" +%s)
if [ "$CUT" -gt "$NOW" ]; then
  log "leg1 mlp15k start (cut at 05:35Z)"
  $MLP train.data_seed=0 \
    save_and_load.save_model=True save_and_load.load_model=True \
    save_and_load.save_frequency=2500 save_and_load.model_directory="$CK" \
    logging.run_dir="$S/runs_mlp15k" > "$S/mlp15k.log" 2>&1 &
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
while [ "$(date -u +%s)" -lt "$(date -u -d 'today 06:05' +%s)" ]; do sleep 30; done
log "pause window over, resuming mlp15k supervised"

# ---- leg 2: supervised to completion (resume is bitwise-exact)
bash scripts/supervise.sh "$S/mlp15k.log" "$CK" 7200 6 -- \
  $MLP train.data_seed=0 \
  save_and_load.save_model=True save_and_load.load_model=True \
  save_and_load.save_frequency=2500 save_and_load.model_directory="$CK" \
  logging.run_dir="$S/runs_mlp15k"
log "mlp15k done rc=$?"
python -u scripts/analyze_kmv.py "$CK" \
  neural_network.model=mlp neural_network.fourier_features=0 \
  neural_network.fourier_trainable=False > "$S/analyze_mlp15k.log" 2>&1
log "analyze_mlp15k rc=$?"

# ---- mlpquad15k (semiparametric tail lever)
CKQ=$ROOT/r3N_mlpquad15k_ckpt
bash scripts/supervise.sh "$S/mlpquad15k.log" "$CKQ" 7200 6 -- \
  $MLP train.data_seed=0 neural_network.quadratic_head=True \
  save_and_load.save_model=True save_and_load.load_model=True \
  save_and_load.save_frequency=2500 save_and_load.model_directory="$CKQ" \
  logging.run_dir="$S/runs_mlpquad15k"
log "mlpquad15k done rc=$?"
python -u scripts/analyze_kmv.py "$CKQ" \
  neural_network.model=mlp neural_network.fourier_features=0 \
  neural_network.fourier_trainable=False > "$S/analyze_mlpquad15k.log" 2>&1
log "analyze_mlpquad15k rc=$?"

kill "$(cat "$S/copier.pid")" 2>/dev/null
cp -f "$S"/*.log "$ART/" 2>/dev/null
for ck in "$CK" "$CKQ"; do
  [ -d "$ck" ] && { rm -rf "$ART/$(basename "$ck")"; cp -r "$ck" "$ART/"; }
done
touch "$S/done"
log "chain_r3N complete"
