#!/bin/bash
# chain_r4F (queued ~02:15Z Aug 20, after the 5th VM re-image at ~01:57Z):
# recovery chain for the round-4 tail / round-5 head.
#   0. bench.py rewarm is already running (PID in /root/runs/r4F/bench.pid)
#      — the re-image wiped the XLA cache; the driver's round-end bench
#      replays these programs warm.  Deadline-killed at 03:10Z so it can
#      never contend with the driver's own bench process.
#   1. packed pairwise kernel v3 chip validation (morning plan from
#      a3f5e90): cmp512 timing probe (v1 vs packed at 7x512x512), then the
#      full 7x2000 --packed probe (grad-equality + 3-mode timing).  Both
#      are deferred past 04:10Z if the driver bench window (~03:05-04:00Z)
#      is near.
#   2. mlpema15k leg2 resume: EMA-track production MLP KMV run, resumed
#      from the committed step-8000 ckpt (artifacts/r4B/r4B_mlpema15k_ckpt)
#      to 15000; ckpts + logs stream to artifacts/r4F every 5 min.
#   3. analyze_kmv on the final ckpt (iterate stacking is round-5 CPU work).
#   4. touch r4B/done and exec the committed chain_r4D.sh (boundary
#      decorrelation A/B at the 36k Run-E horizon; its <07:00Z gate for
#      leg C still applies).
set -u
ROOT=/root/runs
S=$ROOT/r4F
ART=/root/repo/artifacts/r4F
REPO=$ROOT/repo_r4F
mkdir -p "$S" "$ART" "$REPO"
log() { echo "[chain] $(date -u +%H:%M:%S) $*" >> "$S/chain.log"; cp -f "$S/chain.log" "$ART/" 2>/dev/null; }

tar -C /root/repo --exclude=.git --exclude=artifacts -cf - . | tar -C "$REPO" -xf -
cd "$REPO" || exit 1
log "snapshot ready at $REPO ($(git -C /root/repo rev-parse --short HEAD))"

# --- stage 0: wait for the bench rewarm, deadline 03:10Z -------------------
BPID=$(cat "$S/bench.pid" 2>/dev/null || echo 0)
while kill -0 "$BPID" 2>/dev/null; do
  H=$((10#$(date -u +%H))); M=$((10#$(date -u +%M)))
  if [ $((H * 60 + M)) -ge 190 ] && [ $((H * 60 + M)) -lt 300 ]; then
    log "03:10Z deadline: killing bench rewarm PID $BPID (driver bench imminent)"
    kill "$BPID" 2>/dev/null
    break
  fi
  sleep 60
done
cp -f "$S/bench_rewarm.log" "$ART/" 2>/dev/null
log "bench rewarm stage done"

# --- gate helper: don't own the chip during ~03:05-04:10Z ------------------
wait_out_driver_window() {
  while true; do
    H=$((10#$(date -u +%H))); M=$((10#$(date -u +%M))); T=$((H * 60 + M))
    # window 03:00Z (180) .. 04:10Z (250); outside it (incl. >=1 day wrap) go
    if [ "$T" -ge 180 ] && [ "$T" -lt 250 ]; then sleep 120; else break; fi
  done
}

# --- stage 1: packed kernel probes -----------------------------------------
wait_out_driver_window
log "cmp512 probe start (v1 vs packed vs jnp at 7x512x512)"
timeout 2400 python -u scripts/probe_pairwise_train_bwd.py --packed 7 512 512 \
  > "$S/cmp512.log" 2>&1
log "cmp512 rc=$? (log -> artifacts)"
cp -f "$S/cmp512.log" "$ART/"

wait_out_driver_window
log "full 7x2000 --packed probe start"
timeout 3600 python -u scripts/probe_pairwise_train_bwd.py --packed \
  > "$S/packed7x2000.log" 2>&1
log "packed7x2000 rc=$?"
cp -f "$S/packed7x2000.log" "$ART/"

# --- stage 2: mlpema15k resume to 15k ---------------------------------------
CK=$ROOT/r4F_mlpema15k_ckpt
rm -rf "$CK"; cp -r /root/repo/artifacts/r4B/r4B_mlpema15k_ckpt "$CK"
log "mlpema15k ckpt seeded from artifacts (steps: $(ls "$CK" | sort -n | tail -1))"

( while true; do
    cp -f "$S"/*.log "$ART/" 2>/dev/null
    [ -d "$CK" ] && { rm -rf "$ART/r4F_mlpema15k_ckpt.tmp"; \
      cp -r "$CK" "$ART/r4F_mlpema15k_ckpt.tmp" 2>/dev/null && \
      rm -rf "$ART/r4F_mlpema15k_ckpt" && \
      mv "$ART/r4F_mlpema15k_ckpt.tmp" "$ART/r4F_mlpema15k_ckpt"; }
    sleep 300
  done ) & echo $! > "$S/copier.pid"

wait_out_driver_window
log "mlpema15k resume start"
bash scripts/supervise.sh "$S/mlpema15k.log" "$CK" 7200 8 -- \
  python -u -m pde_inverse_tpu.main preset=KMV-nonparametric-fourier \
  neural_network.model=mlp neural_network.fourier_features=0 \
  neural_network.fourier_trainable=False neural_network.quadratic_head=True \
  solver.train.kmv_field_reg=0.0 train.optimizer.weight_decay=1e-1 \
  train.steps_per_chunk=5 train.optimizer.use_ema=True \
  train.optimizer.ema_mode=track train.optimizer.ema_switch_step=7500 \
  test.frequency=1000 test.verbose=True logging.writer=none \
  train.data_seed=0 save_and_load.save_model=True \
  save_and_load.load_model=True save_and_load.save_frequency=1000 \
  save_and_load.model_directory="$CK" logging.run_dir="$S/runs_mlpema15k"
log "mlpema15k rc=$?"

# --- stage 3: analyze final ckpt (+EMA Polyak track read) -------------------
python -u scripts/analyze_kmv.py "$CK" > "$S/analyze_mlpema15k.log" 2>&1
log "analyze mlpema15k rc=$?"
python -u scripts/analyze_kmv.py "$CK" --ema > "$S/analyze_mlpema15k_ema.log" 2>&1
log "analyze mlpema15k --ema rc=$?"

kill "$(cat "$S/copier.pid")" 2>/dev/null
cp -f "$S"/*.log "$ART/" 2>/dev/null
rm -rf "$ART/r4F_mlpema15k_ckpt"; cp -r "$CK" "$ART/r4F_mlpema15k_ckpt"
touch "$S/done"
log "chain_r4F complete; handing off to chain_r4D"

# --- stage 4: relaunch chain_r4D (it waits on r4B/done) ---------------------
mkdir -p "$ROOT/r4B"; touch "$ROOT/r4B/done"
exec bash /root/repo/artifacts/chain_r4D.sh
