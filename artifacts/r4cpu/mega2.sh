#!/bin/bash
set -u
cd /root/repo
R=/root/runs/r4cpu
# wait for the LAST fk variant's analyze log (chain writes sequentially)
while [ ! -f /root/runs/r4A/analyze_fk_tb115.log ]; do sleep 60; done
sleep 120
for seed in 7 11 123; do
  PYTHONPATH="" JAX_PLATFORMS=cpu nice -n 5 python -u scripts/analyze_kmv.py "artifacts/r3F/r3F_fk_s0_fonly_ckpt@15000,artifacts/r3F/r3F_fk_s0_fonly_ckpt@10000,artifacts/r3F/r3F_fk_s0_fonly_ckpt@5000,artifacts/r3L/r3L_tb13_s0_ckpt@15000,artifacts/r3L/r3L_tb15_s0_ckpt@15000,artifacts/r3F/r3F_fk_s0_ps3_ckpt@15000,artifacts/r3C/r3_fk_tpu_s0_quad_ckpt@15000,artifacts/r3C/r3_fk_tpu_s0_quad_ckpt@8000,artifacts/r3F/r3F_fk_s0_40k_ckpt@40000,artifacts/r3F/r3F_fk_s0_40k_ckpt@10000,artifacts/r3F/r3F_fk_s0_40k_ckpt@5000,artifacts/r3C/r3_fk_tpu_s1_quad_ckpt@15000,artifacts/r3C/r3_fk_tpu_s2_quad_ckpt@15000,/root/runs/r4A_fk_k1024_ckpt@15000,/root/runs/r4A_fk_tbps_ckpt@15000,/root/runs/r4A_fk_sc10_ckpt@15000,/root/runs/r4A_fk_sc025_ckpt@15000,/root/runs/r4A_fk_tb115_ckpt@15000,/root/runs/r3N_mlp15k_ckpt@2500,/root/runs/r3N_mlp15k_ckpt@5000,/root/runs/r3N_mlp15k_ckpt@7500,/root/runs/r3N_mlp15k_ckpt@10000,/root/runs/r3N_mlp15k_ckpt@12500,/root/runs/r3N_mlp15k_ckpt@15000,/root/runs/r3N_mlpquad15k_ckpt@10000,/root/runs/r3N_mlpquad15k_ckpt@12500,/root/runs/r3N_mlpquad15k_ckpt@15000"     --probe-seed=$seed --save-preds=$R/preds_mega2_$seed.npz     > $R/mega2_cache_$seed.log 2>&1
done
python /root/runs/r4cpu/mega_select.py $R/preds_mega2_7.npz $R/preds_mega2_11.npz   > $R/mega2_select.log 2>&1
W=$(grep -oP 'weights-raw: \K.*' $R/mega2_select.log)
PYTHONPATH="" JAX_PLATFORMS=cpu python -u scripts/analyze_kmv.py cache   --load-preds=$R/preds_mega2_123.npz --weights-raw=$W   > $R/mega2_report_123.log 2>&1
touch $R/mega2.done
