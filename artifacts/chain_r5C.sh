#!/bin/bash
# chain_r5C (chip, round 5 overnight): relaunch of the reboot-killed r5B
# queue, gates rewritten in ABSOLUTE EPOCH time (the run spans midnight
# 2026-08-20 -> 08-21; `date -d "today HH:MM"` gates would all be stale).
# Stages (VERDICT r4 numbering):
#   0. wait for the manual cmp512 probe PID, then packed 7x2000 probe
#      IF cmp512_fix3 printed PROBE OK (#1)
#   1. FK single-member dose grids d=2 + d=4 (#4)
#   2. np profile decomposition with rotation boundary (#5)
#   3. boundary A/B npE36k_rot (+rc1 only if impossibly early) (#2)
#   4. mlpema15k resume from the committed step-8000 ckpt (#3), start-gated
#   5. on-chip TPU gates at HEAD (#6)
#   6. bench warm for the driver's ~07:15Z round-end run
# Every stage copies logs+ckpts into /root/repo/artifacts/r5C (reboot policy).
set -u
ROOT=/root/runs
S=$ROOT/r5C
ART=/root/repo/artifacts/r5C
REPO=$ROOT/repo_r5C
mkdir -p "$S" "$ART" "$REPO"
log() { echo "[chain] $(date -u +%H:%M:%S) $*" >> "$S/chain.log"; cp -f "$S/chain.log" "$ART/" 2>/dev/null; }
NOW() { date -u +%s; }
# absolute gates (epoch seconds)
G_PACKED_SWEEP=$(date -ud "2026-08-21 00:40" +%s)
G_FK_EXTRA=$(date -ud "2026-08-21 02:00" +%s)
G_RC1=$(date -ud "2026-08-21 01:00" +%s)
G_MLP_START=$(date -ud "2026-08-21 04:45" +%s)
G_BENCH_HARD=$(date -ud "2026-08-21 06:25" +%s)

tar -C /root/repo --exclude=.git --exclude=artifacts -cf - . | tar -C "$REPO" -xf -
cd "$REPO" || exit 1
log "snapshot ready at $REPO ($(git -C /root/repo rev-parse --short HEAD))"

( while true; do
    cp -f "$S"/*.log "$S"/*.json "$ART/" 2>/dev/null
    for ck in "$ROOT"/r5C_*_ckpt; do
      [ -d "$ck" ] && { rm -rf "$ART/$(basename "$ck").tmp"; \
        cp -r "$ck" "$ART/$(basename "$ck").tmp" 2>/dev/null && \
        rm -rf "$ART/$(basename "$ck")" && \
        mv "$ART/$(basename "$ck").tmp" "$ART/$(basename "$ck")"; }
    done
    sleep 300
  done ) & COPIER=$!
trap 'kill $COPIER 2>/dev/null' EXIT

# ---- 0: wait for the manual cmp512 probe, then packed production probe
if [ -f "$ROOT/r5_cmp512.pid" ]; then
  while kill -0 "$(cat "$ROOT/r5_cmp512.pid")" 2>/dev/null; do sleep 20; done
fi
log "cmp512 wait done"
if grep -q "PROBE OK" "$ROOT/r5C/cmp512_fix3.log" 2>/dev/null; then
  log "packed 7x2000 probe start"
  timeout 3600 python -u scripts/probe_pairwise_train_bwd.py --packed \
    > "$S/packed7x2000.log" 2>&1
  log "packed 7x2000 rc=$?"
  grep -q "PROBE OK" "$S/packed7x2000.log" && touch "$S/packed_prod_ok"
  if [ "$(NOW)" -lt "$G_PACKED_SWEEP" ]; then
    log "packed tile sweep start"
    timeout 2700 python -u scripts/probe_pairwise_train_bwd.py --sweep-blocks --packed \
      > "$S/packed_sweep.log" 2>&1
    log "packed sweep rc=$?"
  fi
else
  log "no PROBE OK in cmp512_fix3.log — skipping packed timing"
fi

# ---- 1: FK member grids (fonly quad-head recipe; runs are ~1-3 min warm,
# compiles dominate). d=2 dose refinement around tb115=1.45e-2, annealed
# dose at production, variance levers, d=4 dose grid.
FKBASE="python -u -m pde_inverse_tpu.main preset=KMV-nonparametric-fourier \
  neural_network.quadratic_head=True solver.train.kmv_field_reg_fourier_only=True \
  test.frequency=2500 test.verbose=True logging.writer=none train.data_seed=0"
fk_run() {
  name=$1; shift
  CK=$ROOT/r5C_fk_${name}_ckpt
  log "fk $name start"
  timeout 5400 $FKBASE save_and_load.save_model=True save_and_load.load_model=True \
    save_and_load.save_frequency=2500 save_and_load.model_directory="$CK" \
    logging.run_dir="$S/runs_fk_$name" "$@" > "$S/fk_${name}.log" 2>&1
  log "fk $name rc=$?"
  timeout 1800 python -u scripts/analyze_kmv.py "$CK" > "$S/analyze_fk_${name}.log" 2>&1
  log "analyze fk $name rc=$?"
}
fk_run tb110 pde_instance.init_broaden=1.10
fk_run tb120 pde_instance.init_broaden=1.20
fk_run tb15a pde_instance.init_broaden=1.5 \
  pde_instance.init_broaden_decay_steps=15000
fk_run tb115ema pde_instance.init_broaden=1.15 \
  train.optimizer.use_ema=True train.optimizer.ema_mode=track \
  train.optimizer.ema_switch_step=7500
timeout 1800 python -u scripts/analyze_kmv.py "$ROOT/r5C_fk_tb115ema_ckpt" --ema \
  > "$S/analyze_fk_tb115ema_ema.log" 2>&1
log "analyze tb115ema --ema rc=$?"
if [ "$(NOW)" -lt "$G_FK_EXTRA" ]; then
  fk_run tb115b4k pde_instance.init_broaden=1.15 solver.train.sample_per_time=4000
fi
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

# ---- 3: boundary A/B, Run-E 36k horizon (reboot-killed twice: r4D, r5B)
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
  CK=$ROOT/r5C_${name}_ckpt
  log "$name start"
  bash scripts/supervise.sh "$S/${name}.log" "$CK" 2700 8 -- \
    python -u -m pde_inverse_tpu.main $RUNE "$@" \
    save_and_load.model_directory="$CK" logging.run_dir="$S/runs_$name"
  log "$name rc=$?"
  timeout 2400 python -u scripts/analyze_np.py "$CK" neural_network.quadratic_head=True \
    > "$S/analyze_${name}.log" 2>&1
  log "analyze $name rc=$?"
}
np_variant npE36k_rot solver.train.boundary_refresh_chunks=5 \
  solver.train.boundary_rotate=True
if [ "$(NOW)" -lt "$G_RC1" ]; then
  np_variant npE36k_rc1 solver.train.boundary_refresh_chunks=1
else
  log "npE36k_rc1 skipped (past 01:00Z gate)"
fi

# ---- 4: mlpema15k resume from the committed ckpt (VERDICT #3)
if [ "$(NOW)" -lt "$G_MLP_START" ]; then
  CK=$ROOT/r5C_mlpema15k_ckpt
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
  bash scripts/supervise.sh "$S/mlpema15k.log" "$CK" 3600 8 -- $MLP
  log "mlpema15k rc=$?"
  MLPRUN() { PYTHONPATH="" JAX_PLATFORMS=cpu python -u scripts/analyze_kmv.py "$@"; }
  MEMBERS=$(seq 1000 1000 15000 | sed "s|^|$CK@|" | paste -sd,)
  MLPRUN "$MEMBERS" --fit-weights --probe-seed=7 \
    --save-preds=$S/preds_mlpema_7.npz > "$S/mlpema_stack_seed7.log" 2>&1
  log "stack fit rc=$?"
  MLPRUN "$CK" --ema > "$S/mlpema_ema_eval.log" 2>&1
  log "ema eval rc=$?"
else
  log "mlpema15k skipped (past 04:45Z gate)"
fi

# ---- 5: on-chip TPU-gated tests at HEAD (VERDICT #6)
log "tpu gates start"
PDE_INVERSE_TPU_TEST_TPU=1 timeout 4500 python -m pytest \
  tests/test_pallas.py tests/test_pallas_packed.py tests/test_langevin.py -q \
  > "$S/tpu_gates.log" 2>&1
log "tpu gates rc=$?"

# ---- 6: bench warm for the driver's round-end run
if [ "$(NOW)" -lt "$G_BENCH_HARD" ]; then
  log "bench start"
  timeout 4500 python -u bench.py > "$S/bench_warm.json" 2> "$S/bench_warm.log"
  log "bench rc=$?"
  if [ -f "$S/packed_prod_ok" ]; then
    log "bench --mlp-packed warm start"
    timeout 3600 python -u bench.py --mlp-packed \
      > "$S/bench_warm_packed.json" 2> "$S/bench_warm_packed.log"
    log "bench --mlp-packed rc=$?"
  fi
else
  log "bench skipped (past 06:25Z hard gate — driver will run cold)"
fi
cp -f "$S"/*.log "$S"/bench_warm.json "$ART/" 2>/dev/null
for ck in "$ROOT"/r5C_*_ckpt; do
  [ -d "$ck" ] && { rm -rf "$ART/$(basename "$ck")"; cp -r "$ck" "$ART/"; }
done
touch "$S/done"
log "chain_r5C complete"
