#!/bin/bash
# Round-5 mega-stack refresh: the 27-member r4 pool (committed artifact
# ckpts) + the 8 new round-5 FK members (incl. the sub-1e-2 b4k/b8k
# cells).  Protocol = artifacts/r4cpu/mega2.sh: eval on probe seeds
# 7/11/123, select members+ridge on 7/11, report ONCE on 123.
set -u
cd /root/repo
R=/root/runs/r5cpu
mkdir -p $R
MEMBERS="artifacts/r3F/r3F_fk_s0_fonly_ckpt@15000,artifacts/r3F/r3F_fk_s0_fonly_ckpt@10000,artifacts/r3F/r3F_fk_s0_fonly_ckpt@5000,artifacts/r3L/r3L_tb13_s0_ckpt@15000,artifacts/r3L/r3L_tb15_s0_ckpt@15000,artifacts/r3F/r3F_fk_s0_ps3_ckpt@15000,artifacts/r3C/r3_fk_tpu_s0_quad_ckpt@15000,artifacts/r3C/r3_fk_tpu_s0_quad_ckpt@8000,artifacts/r3F/r3F_fk_s0_40k_ckpt@40000,artifacts/r3F/r3F_fk_s0_40k_ckpt@10000,artifacts/r3F/r3F_fk_s0_40k_ckpt@5000,artifacts/r3C/r3_fk_tpu_s1_quad_ckpt@15000,artifacts/r3C/r3_fk_tpu_s2_quad_ckpt@15000,artifacts/r4A/r4A_fk_k1024_ckpt@15000,artifacts/r4A/r4A_fk_tbps_ckpt@15000,artifacts/r4A/r4A_fk_sc10_ckpt@15000,artifacts/r4A/r4A_fk_sc025_ckpt@15000,artifacts/r4A/r4A_fk_tb115_ckpt@15000,artifacts/r3N/r3N_mlp15k_ckpt@2500,artifacts/r3N/r3N_mlp15k_ckpt@5000,artifacts/r3N/r3N_mlp15k_ckpt@7500,artifacts/r3N/r3N_mlp15k_ckpt@10000,artifacts/r3N/r3N_mlp15k_ckpt@12500,artifacts/r3N/r3N_mlp15k_ckpt@15000,artifacts/r3N/r3N_mlpquad15k_ckpt@10000,artifacts/r3N/r3N_mlpquad15k_ckpt@12500,artifacts/r3N/r3N_mlpquad15k_ckpt@15000,/root/runs/r5C_fk_tb115b4k_ckpt@15000,/root/runs/r5C_fk_tb115b4k_ckpt@7500,/root/runs/r5C_fk_tb115b4kema_ckpt@15000,/root/runs/r5C_fk_tb115b8k_ckpt@15000,/root/runs/r5C_fk_tb115b16k_ckpt@15000,/root/runs/r5C_fk_tb115b16k_ckpt@7500,/root/runs/r5C_fk_tb110_ckpt@15000,/root/runs/r5C_fk_tb120_ckpt@15000,/root/runs/r5C_fk_tb15a_ckpt@15000,/root/runs/r5C_fk_tb115ema_ckpt@15000"
for seed in 7 11 123; do
  PYTHONPATH="" JAX_PLATFORMS=cpu nice -n 15 python -u scripts/analyze_kmv.py "$MEMBERS" \
    --probe-seed=$seed --save-preds=$R/preds_mega4_$seed.npz \
    > $R/mega4_cache_$seed.log 2>&1
done
nice -n 15 python artifacts/r4cpu/mega_select.py $R/preds_mega4_7.npz $R/preds_mega4_11.npz \
  > $R/mega4_select.log 2>&1
W=$(grep -oP 'weights-raw: \K.*' $R/mega4_select.log)
PYTHONPATH="" JAX_PLATFORMS=cpu nice -n 15 python -u scripts/analyze_kmv.py cache \
  --load-preds=$R/preds_mega4_123.npz --weights-raw=$W \
  > $R/mega4_report_123.log 2>&1
mkdir -p /root/repo/artifacts/r5cpu
cp -f $R/mega4_*.log /root/runs/mega4.sh /root/repo/artifacts/r5cpu/ 2>/dev/null
touch $R/mega4.done
