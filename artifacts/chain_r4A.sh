#!/bin/bash
# chain_r4A (chip): round-4 queue, starts when chain_r3N finishes.
#  1. pairwise Pallas tile sweep at production geometry (VERDICT #4b)
#  2. np step sampling decomposition (profile_np_step)
#  3. np boundary-reservoir throughput A/B (VERDICT #3; target >=6 steps/s)
#  4. FK production members from $S/fk_variants.txt (VERDICT #2)
#  5. analyze each; LS stacking runs separately on CPU
#  6. time-gated (<19:00Z): np-KGMM Run-E 36k WITH reservoir (sub-1e-2 push)
set -u
ROOT=/root/runs
S=$ROOT/r4A
ART=/root/repo/artifacts/r4A
REPO=$ROOT/repo_r4A
mkdir -p "$S" "$ART" "$REPO"
log() { echo "[chain] $(date -u +%H:%M:%S) $*" >> "$S/chain.log"; cp -f "$S/chain.log" "$ART/" 2>/dev/null; }

tar -C /root/repo --exclude=.git --exclude=artifacts -cf - . | tar -C "$REPO" -xf -
cd "$REPO" || exit 1
log "snapshot ready at $REPO ($(git -C /root/repo rev-parse --short HEAD))"

# wait for chain_r3N to release the chip
while [ ! -f "$ROOT/r3N/done" ]; do sleep 60; done
log "r3N done, chip free"

# background copier: stream logs + ckpts into the repo every 5 min
( while true; do
    cp -f "$S"/*.log "$ART/" 2>/dev/null
    for ck in "$ROOT"/r4A_*_ckpt; do
      [ -d "$ck" ] && { rm -rf "$ART/$(basename "$ck").tmp"; \
        cp -r "$ck" "$ART/$(basename "$ck").tmp" 2>/dev/null && \
        rm -rf "$ART/$(basename "$ck")" && \
        mv "$ART/$(basename "$ck").tmp" "$ART/$(basename "$ck")"; }
    done
    sleep 300
  done ) & echo $! > "$S/copier.pid"

# ---- 1: tile sweep (grad through the Pallas pairwise path, 7x2000)
log "tile sweep start"
python -u scripts/probe_pairwise_train_bwd.py --sweep-blocks > "$S/tile_sweep.log" 2>&1
log "tile sweep rc=$?"

# ---- 2: np sampling decomposition
log "np profile start"
python -u scripts/profile_np_step.py solver.train.batch_size_0T=10000 \
  pde_instance.n_steps=400 neural_network.quadratic_head=True \
  > "$S/np_profile.log" 2>&1
log "np profile rc=$?"

# ---- 3: reservoir throughput A/B (short; accuracy signal only coarse)
NP="python -u -m pde_inverse_tpu.main preset=KGMM-nonparametric-online \
  solver.train.batch_size_0T=10000 pde_instance.n_steps=400 \
  neural_network.quadratic_head=True \
  train.number_of_iterations=800 train.steps_per_chunk=100 \
  test.frequency=400 test.verbose=True logging.writer=none"
log "np A/B off start"
$NP > "$S/np_res_off.log" 2>&1
log "np A/B off rc=$?"
log "np A/B on start"
$NP solver.train.boundary_reservoir=10000 solver.train.boundary_refresh_chunks=5 \
  > "$S/np_res_on.log" 2>&1
log "np A/B on rc=$?"

# ---- 4: FK production members (variant file: "<name> <extra overrides...>")
FKBASE="python -u -m pde_inverse_tpu.main preset=KMV-nonparametric-fourier \
  test.frequency=2500 test.verbose=True logging.writer=none train.data_seed=0"
if [ -f "$S/fk_variants.txt" ]; then
  while read -r name rest; do
    [ -z "$name" ] && continue
    case "$name" in \#*) continue;; esac
    CK=$ROOT/r4A_fk_${name}_ckpt
    log "fk $name start"
    bash scripts/supervise.sh "$S/fk_${name}.log" "$CK" 7200 6 -- \
      $FKBASE save_and_load.save_model=True save_and_load.load_model=True \
      save_and_load.save_frequency=2500 save_and_load.model_directory="$CK" \
      logging.run_dir="$S/runs_fk_$name" $rest
    log "fk $name rc=$?"
    python -u scripts/analyze_kmv.py "$CK" > "$S/analyze_fk_${name}.log" 2>&1
    log "analyze fk $name rc=$?"
  done < "$S/fk_variants.txt"
fi

# ---- 6: gated Run-E 36k with reservoir (np-KGMM sub-1e-2 push)
NOW=$(date -u +%s); GATE=$(date -u -d "today 19:00" +%s)
if [ "$NOW" -lt "$GATE" ]; then
  CKE=$ROOT/r4A_npE_res_ckpt
  log "npE36k reservoir start"
  # Run-E recipe deltas on the preset (round-2 notes: 36k, freeze EMA at
  # 20k, weight_decay=0, n_steps=400, quad head) + the round-4 reservoir
  RUNE="neural_network.quadratic_head=True train.optimizer.weight_decay=0.0 \
    solver.train.batch_size_0T=10000 \
    pde_instance.n_steps=400 train.number_of_iterations=36000 \
    train.optimizer.learning_rate.cosine_decay_steps=36000 \
    train.optimizer.ema_switch_step=20000"
  bash scripts/supervise.sh "$S/npE36k_res.log" "$CKE" 7200 8 -- \
    python -u -m pde_inverse_tpu.main preset=KGMM-nonparametric-online $RUNE \
    solver.train.boundary_reservoir=10000 solver.train.boundary_refresh_chunks=5 \
    test.frequency=4000 test.verbose=True logging.writer=none train.data_seed=0 \
    save_and_load.save_model=True save_and_load.load_model=True \
    save_and_load.save_frequency=4000 save_and_load.model_directory="$CKE" \
    logging.run_dir="$S/runs_npE36k"
  log "npE36k rc=$?"
  python -u scripts/analyze_np.py "$CKE" neural_network.quadratic_head=True \
    > "$S/analyze_npE36k.log" 2>&1
  log "analyze npE36k rc=$?"
else
  log "npE36k skipped (past 19:00Z gate)"
fi

kill "$(cat "$S/copier.pid")" 2>/dev/null
cp -f "$S"/*.log "$ART/" 2>/dev/null
for ck in "$ROOT"/r4A_*_ckpt; do
  [ -d "$ck" ] && { rm -rf "$ART/$(basename "$ck")"; cp -r "$ck" "$ART/"; }
done
touch "$S/done"
log "chain_r4A complete"
