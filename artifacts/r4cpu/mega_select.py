"""Mega-stack selection: fit LS stacking weights on the seed-7 cache over
member subsets x ridge grid, select by the seed-11 cache, print the
winner. Reporting on probe 123 happens OUTSIDE this script (one
analyze_kmv --load-preds --weights-raw call)."""
import numpy as np, sys

d7 = np.load(sys.argv[1]); d11 = np.load(sys.argv[2])
dirs = [str(s) for s in d7["dirs"]]
P7 = d7["P"].reshape(len(dirs), -1); t7 = d7["true"].reshape(-1)
P11 = d11["P"].reshape(len(dirs), -1); t11 = d11["true"].reshape(-1)
den11 = np.mean(np.sum(d11["true"]**2, -1))
n_fk = sum(1 for d in dirs if "mlp" not in d)
subsets = {
    "all": list(range(len(dirs))),
    "fk-only": list(range(n_fk)),
    "base6": [i for i, d in enumerate(dirs) if d.rstrip("0123456789@").endswith("ckpt@") and any(
        k in d for k in ["fonly_ckpt@15000", "tb13_s0_ckpt@15000", "tb15_s0_ckpt@15000",
                          "ps3_ckpt@15000", "s0_quad_ckpt@15000", "40k_ckpt@40000"])],
}
subsets["base6"] = [i for i, d in enumerate(dirs) if any(
    d.endswith(k) for k in ["fonly_ckpt@15000", "tb13_s0_ckpt@15000",
    "tb15_s0_ckpt@15000", "ps3_ckpt@15000", "s0_quad_ckpt@15000", "40k_ckpt@40000"])]
best = (1e9, None, None, None)
for name, idx in subsets.items():
    Ps, P11s = P7[idx], P11[idx]
    G = Ps @ Ps.T; r = Ps @ t7; md = np.mean(np.diag(G))
    for ridge in [0.0, 1e-5, 1e-4, 1e-3, 1e-2, 3e-2, 1e-1]:
        w = np.linalg.solve(G + ridge * md * np.eye(len(idx)), r)
        pred11 = w @ P11s
        rel = float(np.sqrt(np.mean(np.sum((pred11.reshape(d11["true"].shape) - d11["true"])**2, -1)) / den11))
        print(f"{name:8s} ridge={ridge:<7g} seed-11 rel-L2 {rel:.4e}  |w|max {np.abs(w).max():.1f}")
        if rel < best[0]:
            wfull = np.zeros(len(dirs)); wfull[idx] = w
            best = (rel, name, ridge, wfull)
print(f"\nWINNER: {best[1]} ridge={best[2]} seed-11 {best[0]:.4e}")
print("weights-raw:", ",".join(f"{x:.6f}" for x in best[3]))
