#!/bin/bash
# chain_r5B (chip, round 5, recovery-triggered): replaces the paused
# chain_r5A after the ~10:15Z tunnel wedge.  Trigger: the chip-wait loop
# (/root/runs/r5_chipwait.log) logs "recovered", then EITHER the builder
# touches /root/runs/r5_chip_free (done with packed diag) OR 15 min pass
# with no claim.  Stages (VERDICT r4 numbering), each time-gated so the
# most important work still lands if recovery comes late:
#   1. FK single-member dose grids (#4)          — cheap, always
#   2. np profile decomposition w/ rotation (#5) — cheap, always
#   3. boundary A/B rot/rc1/rot2 (#2)            — rot always, rc1 <16:00Z,
#                                                  rot2 <14:00Z
#   4. mlpema15k resume (#3)                     — start gate <17:30Z
#   5. on-chip TPU gates at HEAD (#6)            — always
#   6. bench warm                                — always
set -u
ROOT=/root/runs
S=$ROOT/r5B
ART=/root/repo/artifacts/r5B
REPO=$ROOT/repo_r5B
mkdir -p "$S" "$ART" "$REPO"
log() { echo "[chain] $(date -u +%H:%M:%S) $*" >> "$S/chain.log"; cp -f "$S/chain.log" "$ART/" 2>/dev/null; }

tar -C /root/repo --exclude=.git --exclude=artifacts -cf - . | tar -C "$REPO" -xf -
cd "$REPO" || exit 1
log "snapshot ready at $REPO ($(git -C /root/repo rev-parse --short HEAD))"

# ---- trigger
while true; do
  if [ -f "$ROOT/r5_chip_free" ]; then log "trigger: builder marker"; break; fi
  if grep -q "recovered" "$ROOT/r5_chipwait.log" 2>/dev/null; then
    REC_AGE=$(( $(date +%s) - $(stat -c %Y "$ROOT/r5_chipwait.log") ))
    if [ "$REC_AGE" -gt 900 ]; then log "trigger: 15 min after recovery, no claim"; break; fi
  fi
  sleep 60
done

( while true; do
    cp -f "$S"/*.log "$S"/*.json "$ART/" 2>/dev/null
    for ck in "$ROOT"/r5B_*_ckpt; do
      [ -d "$ck" ] && { rm -rf "$ART/$(basename "$ck").tmp"; \
        cp -r "$ck" "$ART/$(basename "$ck").tmp" 2>/dev/null && \
        rm -rf "$ART/$(basename "$ck")" && \
        mv "$ART/$(basename "$ck").tmp" "$ART/$(basename "$ck")"; }
    done
    sleep 300
  done ) & COPIER=$!
trap 'kill $COPIER 2>/dev/null' EXIT

# ---- 0: packed-kernel timing at production IF the builder's manual
# cmp512 at the pack-in-XLA HEAD printed PROBE OK (r5_cmp512_fix3.log)
if grep -q "PROBE OK" "$ROOT/r5_cmp512_fix3.log" 2>/dev/null; then
  log "packed 7x2000 probe start"
  timeout 3600 python -u scripts/probe_pairwise_train_bwd.py --packed \
    > "$S/packed7x2000.log" 2>&1
  log "packed 7x2000 rc=$?"
  log "packed tile sweep start"
  timeout 3600 python -u scripts/probe_pairwise_train_bwd.py --sweep-blocks --packed \
    > "$S/packed_sweep.log" 2>&1
  log "packed sweep rc=$?"
else
  log "no PROBE OK in r5_cmp512_fix3.log — skipping packed timing"
fi

# ---- 1: FK member grids (fonly base; ~2-10 min each on chip)
FKBASE="python -u -m pde_inverse_tpu.main preset=KMV-nonparametric-fourier \
  neural_network.quadratic_head=True solver.train.kmv_field_reg_fourier_only=True \
  test.frequency=2500 test.verbose=True logging.writer=none train.data_seed=0"
fk_run() {
  name=$1; shift
  CK=$ROOT/r5B_fk_${name}_ckpt
  log "fk $name start"
  timeout 5400 $FKBASE save_and_load.save_model=True save_and_load.load_model=True \
    save_and_load.save_frequency=2500 save_and_load.model_directory="$CK" \
    logging.run_dir="$S/runs_fk_$name" "$@" > "$S/fk_${name}.log" 2>&1
  log "fk $name rc=$?"
  python -u scripts/analyze_kmv.py "$CK" > "$S/analyze_fk_${name}.log" 2>&1
  log "analyze fk $name rc=$?"
}
# d=2 dose refinement around the 1.45e-2 best single (tb115)
fk_run tb110 pde_instance.init_broaden=1.10
fk_run tb120 pde_instance.init_broaden=1.20
# annealed dose at production (CPU A/B r5cpu/anneal_* gates the concept)
fk_run tb15a pde_instance.init_broaden=1.5 \
  pde_instance.init_broaden_decay_steps=15000
# variance levers at the best constant dose
fk_run tb115b4k pde_instance.init_broaden=1.15 solver.train.sample_per_time=4000
fk_run tb115ema pde_instance.init_broaden=1.15 \
  train.optimizer.use_ema=True train.optimizer.ema_mode=track \
  train.optimizer.ema_switch_step=7500
python -u scripts/analyze_kmv.py "$ROOT/r5B_fk_tb115ema_ckpt" --ema \
  > "$S/analyze_fk_tb115ema_ema.log" 2>&1
log "analyze tb115ema --ema rc=$?"
# d=4 dose grid (measured d-scaled dose s~1.1; control 5.07e-2 at s=1)
fk_run d4tb105 pde_instance.domain_dim=4 pde_instance.init_broaden=1.05
fk_run d4tb110 pde_instance.domain_dim=4 pde_instance.init_broaden=1.10

# ---- 2: np step decomposition with the rotation boundary (VERDICT #5)
log "np profile (rotation) start"
timeout 3600 python -u scripts/profile_np_step.py solver.train.batch_size_0T=10000 \
  pde_instance.n_steps=400 neural_network.quadratic_head=True \
  solver.train.boundary_reservoir=10000 solver.train.boundary_refresh_chunks=5 \
  solver.train.boundary_rotate=True \
  > "$S/np_profile_rot.log" 2>&1
log "np profile rc=$?"

# ---- 3: boundary A/B (reboot-killed chain_r4D cells), Run-E 36k horizon
RUNE="preset=KGMM-nonparametric-online neural_network.quadratic_head=True \
  train.optimizer.weight_decay=0.0 solver.train.batch_size_0T=10000 \
  pde_instance.n_steps=400 train.number_of_iterations=36000 \
  train.optimizer.learning_rate.cosine_decay_steps=36000 \
  train.optimizer.ema_switch_step=20000 solver.train.boundary_reservoir=10000 \
  test.frequency=4000 test.verbose=True logging.writer=none train.data_seed=0 \
  save_and_load.save_model=True save_and_load.load_model=True \
  save_and_load.save_frequency=4000"
np_variant() {
  name=$1; shift
  CK=$ROOT/r5B_${name}_ckpt
  log "$name start"
  bash scripts/supervise.sh "$S/${name}.log" "$CK" 7200 8 -- \
    python -u -m pde_inverse_tpu.main $RUNE "$@" \
    save_and_load.model_directory="$CK" logging.run_dir="$S/runs_$name"
  log "$name rc=$?"
  python -u scripts/analyze_np.py "$CK" neural_network.quadratic_head=True \
    > "$S/analyze_${name}.log" 2>&1
  log "analyze $name rc=$?"
}
before() { [ "$(date -u +%s)" -lt "$(date -u -d "today $1" +%s)" ]; }
np_variant npE36k_rot solver.train.boundary_refresh_chunks=5 \
  solver.train.boundary_rotate=True
if before 16:00; then
  np_variant npE36k_rc1 solver.train.boundary_refresh_chunks=1
else
  log "npE36k_rc1 skipped (past 16:00Z gate)"
fi
if before 14:00; then
  np_variant npE36k_rot2 solver.train.boundary_refresh_chunks=2 \
    solver.train.boundary_rotate=True
else
  log "npE36k_rot2 skipped (past 14:00Z gate)"
fi

# ---- 4: mlpema15k resume from the committed step-8000 ckpt (VERDICT #3)
if before 17:30; then
  CK=$ROOT/r5B_mlpema15k_ckpt
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
  log "mlpema15k resume start"
  bash scripts/supervise.sh "$S/mlpema15k.log" "$CK" 7200 8 -- $MLP
  log "mlpema15k rc=$?"
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
else
  log "mlpema15k skipped (past 17:30Z gate)"
fi

# ---- 5: on-chip TPU-gated tests at HEAD (VERDICT #6)
log "tpu gates start"
PDE_INVERSE_TPU_TEST_TPU=1 timeout 5400 python -m pytest \
  tests/test_pallas.py tests/test_pallas_packed.py tests/test_langevin.py -q \
  > "$S/tpu_gates.log" 2>&1
log "tpu gates rc=$?"

# ---- 6: bench warm for the driver's round-end run
log "bench start"
timeout 5400 python -u bench.py > "$S/bench_warm.json" 2> "$S/bench_warm.log"
log "bench rc=$?"
cp -f "$S"/*.log "$S"/bench_warm.json "$ART/" 2>/dev/null
for ck in "$ROOT"/r5B_*_ckpt; do
  [ -d "$ck" ] && { rm -rf "$ART/$(basename "$ck")"; cp -r "$ck" "$ART/"; }
done
touch "$S/done"
log "chain_r5B complete"
