#!/bin/bash
# chain_r3G (chip): waits for chain_r3F, then runs the non-parametric MLP
# KMV recovery at the PRODUCTION geometry (7x2000) through the Pallas
# blockwise pairwise path — the MLP cell's best number is 0.255 at 7x200
# and batch size was the decisive FK lever (0.23 -> 0.09). Recipe is the
# validated 7x200 one: pure MLP, wd=1e-1, cosine lr, kmv_field_reg=0,
# steps_per_chunk=5 (chunk>10 over this path crashes the tunneled worker).
#   1 mlp15k       pure MLP, 15k cosine
#   2 mlpquad15k   + quadratic_head (semiparametric tail lever, FK-proven)
set -u
ROOT=/root/runs
REPO=$ROOT/repo_r3G
S=$ROOT/r3G
ART=/root/repo/artifacts/r3G
mkdir -p "$S" "$ART"
cd "$REPO" || exit 1

while [ ! -f "$ROOT/r3F/done" ]; do sleep 60; done

stage() {
  local name="$1"; shift; [ "$1" = "--" ] && shift
  echo "[chain] $(date -u +%H:%M:%S) start $name" >> "$S/chain.log"
  "$@" > "$S/$name.log" 2>&1
  echo "[chain] $(date -u +%H:%M:%S) end $name rc=$?" >> "$S/chain.log"
  cp -f "$S/$name.log" "$ART/" 2>/dev/null
}

MLP="python -u -m pde_inverse_tpu.main preset=KMV-nonparametric-fourier \
  neural_network.model=mlp neural_network.fourier_features=0 \
  neural_network.fourier_trainable=False \
  solver.train.kmv_field_reg=0.0 train.optimizer.weight_decay=1e-1 \
  train.steps_per_chunk=5 test.frequency=2500 test.verbose=True \
  logging.writer=none"

mlp_run() {  # mlp_run NAME CKPT extra-overrides...
  local name="$1" ck="$2"; shift 2
  echo "[chain] $(date -u +%H:%M:%S) start $name" >> "$S/chain.log"
  bash scripts/supervise.sh "$S/$name.log" "$ck" 7200 4 -- \
    $MLP "$@" \
    save_and_load.save_model=True save_and_load.load_model=True \
    save_and_load.save_frequency=2500 save_and_load.model_directory="$ck" \
    logging.run_dir="$S/runs_$name"
  echo "[chain] $(date -u +%H:%M:%S) end $name rc=$?" >> "$S/chain.log"
  cp -f "$S/$name.log" "$ART/"
  rm -rf "$ART/$(basename "$ck")"; cp -r "$ck" "$ART/" 2>/dev/null
  stage analyze_$name -- python -u scripts/analyze_kmv.py "$ck" \
    neural_network.model=mlp neural_network.fourier_features=0 \
    neural_network.fourier_trainable=False
}

mlp_run mlp15k "$ROOT/r3G_mlp15k_ckpt" train.data_seed=0
mlp_run mlpquad15k "$ROOT/r3G_mlpquad15k_ckpt" train.data_seed=0 \
  neural_network.quadratic_head=True

touch "$S/done"
cp -f "$S/chain.log" "$ART/"
