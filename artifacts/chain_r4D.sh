#!/bin/bash
# chain_r4D (overnight, queued at ~20:55Z Aug 19): boundary-reservoir
# decorrelation A/B at the full Run-E horizon — the round-5 dose-response
# experiment, run while the chip is otherwise idle.
#   Control (already committed): reservoir refresh_chunks=5 -> 1.94e-2
#   (artifacts/r4A/analyze_npE36k.log); per-step refresh -> 1.06e-2.
#   A: streaming rotation (boundary_rotate=True, N=5): 20% of the pool
#      fresh every 100-step chunk, same amortized sim cost as control.
#   B: refresh_chunks=1 (full host redraw every chunk): boundary fresh
#      every 100 steps at ~0.5 ms/step amortized.
#   C (gated <07:00Z): rotation at refresh_chunks=2 (half pool per chunk).
# All three reuse the SAME compiled program as the control (the reservoir
# is the same donated-arg shape), so compiles are warm.
set -u
ROOT=/root/runs
S=$ROOT/r4D
ART=/root/repo/artifacts/r4D
REPO=$ROOT/repo_r4D
mkdir -p "$S" "$ART" "$REPO"
log() { echo "[chain] $(date -u +%H:%M:%S) $*" >> "$S/chain.log"; cp -f "$S/chain.log" "$ART/" 2>/dev/null; }

tar -C /root/repo --exclude=.git --exclude=artifacts -cf - . | tar -C "$REPO" -xf -
cd "$REPO" || exit 1
log "snapshot ready at $REPO ($(git -C /root/repo rev-parse --short HEAD))"

while [ ! -f "$ROOT/r4B/done" ]; do sleep 120; done
log "r4C done, chip free"

( while true; do
    cp -f "$S"/*.log "$ART/" 2>/dev/null
    for ck in "$ROOT"/r4D_*_ckpt; do
      [ -d "$ck" ] && { rm -rf "$ART/$(basename "$ck").tmp"; \
        cp -r "$ck" "$ART/$(basename "$ck").tmp" 2>/dev/null && \
        rm -rf "$ART/$(basename "$ck")" && \
        mv "$ART/$(basename "$ck").tmp" "$ART/$(basename "$ck")"; }
    done
    sleep 300
  done ) & echo $! > "$S/copier.pid"

RUNE="preset=KGMM-nonparametric-online neural_network.quadratic_head=True \
  train.optimizer.weight_decay=0.0 solver.train.batch_size_0T=10000 \
  pde_instance.n_steps=400 train.number_of_iterations=36000 \
  train.optimizer.learning_rate.cosine_decay_steps=36000 \
  train.optimizer.ema_switch_step=20000 solver.train.boundary_reservoir=10000 \
  test.frequency=4000 test.verbose=True logging.writer=none train.data_seed=0 \
  save_and_load.save_model=True save_and_load.load_model=True \
  save_and_load.save_frequency=4000"

run_variant() {
  name=$1; shift
  CK=$ROOT/r4D_${name}_ckpt
  log "$name start"
  bash scripts/supervise.sh "$S/${name}.log" "$CK" 7200 8 -- \
    python -u -m pde_inverse_tpu.main $RUNE "$@" \
    save_and_load.model_directory="$CK" logging.run_dir="$S/runs_$name"
  log "$name rc=$?"
  python -u scripts/analyze_np.py "$CK" neural_network.quadratic_head=True \
    > "$S/analyze_${name}.log" 2>&1
  log "analyze $name rc=$?"
}

# A: streaming rotation, same amortized sim cost as the 1.94e-2 control
run_variant npE36k_rot solver.train.boundary_refresh_chunks=5 \
  solver.train.boundary_rotate=True

# B: full redraw every chunk (fresh boundary every 100 steps)
run_variant npE36k_rc1 solver.train.boundary_refresh_chunks=1

# C (time-gated): rotation at N=2 — half the pool fresh per chunk.
# Runs only if it can start before 07:00Z (hour < 7 = pre-dawn Aug 20,
# hour >= 21 = still evening Aug 19 — handles the midnight rollover).
NOW_H=$((10#$(date -u +%H)))
if [ "$NOW_H" -lt 7 ] || [ "$NOW_H" -ge 21 ]; then
  run_variant npE36k_rot2 solver.train.boundary_refresh_chunks=2 \
    solver.train.boundary_rotate=True
else
  log "npE36k_rot2 skipped (past 07:00Z gate)"
fi

kill "$(cat "$S/copier.pid")" 2>/dev/null
cp -f "$S"/*.log "$ART/" 2>/dev/null
for ck in "$ROOT"/r4D_*_ckpt; do
  [ -d "$ck" ] && { rm -rf "$ART/$(basename "$ck")"; cp -r "$ck" "$ART/"; }
done
touch "$S/done"
log "chain_r4D complete"
