#!/usr/bin/env bash
# boot_recover.sh — post-reboot recovery bootstrapper (VERDICT r4 #7).
#
# The VM restores from a snapshot on reboot (5 observed wipes): /root/runs,
# /tmp, the XLA compile cache, and every live chain/supervised run are GONE;
# only what is committed to /root/repo survives (the driver restores it).
#
# Run this FIRST at session start after any suspected reboot:
#   bash artifacts/boot_recover.sh           # report only
#   bash artifacts/boot_recover.sh --launch <chain>   # relaunch a queue
#
# What it does:
#   1. Prints uptime + any surviving python/bash chain processes so you can
#      tell a live session from a wiped one (short uptime + no chains = wipe).
#   2. Recreates /root/runs and re-extracts a fresh HEAD snapshot to
#      /root/runs/repo_boot (chains must run from a snapshot, never the live
#      repo — see CLAUDE.md round-3 incident).
#   3. Lists the committed chain scripts (artifacts/chain_*.sh) and committed
#      checkpoints (artifacts/*/*_ckpt) that runs can resume from
#      (save_and_load.load_model=True resumes from the latest step).
#   4. With --launch NAME: relaunches artifacts/chain_NAME.sh from the fresh
#      snapshot under nohup, PID to /root/runs/chain_NAME.pid.
#
# Policy reminders (CLAUDE.md):
#   - One process owns the tunneled chip; check `ps` before launching.
#   - Every chain stage must copy logs + final ckpts into /root/repo/artifacts
#     and commit milestones — that is the only storage that survives.
#   - Long runs: save_and_load.save_model=True + frequency; recovery = kill
#     PID, relaunch same command + load_model=True.
set -u
cd /root/repo

echo "== uptime =="; uptime
echo "== surviving chains/runs =="
ps -eo pid,etime,cmd | grep -E "bash .*chain_|supervise|python .*main\.py|python .*bench|python .*probe_" | grep -v grep || echo "(none — assume wiped if uptime is short)"

mkdir -p /root/runs
if [ ! -d /root/runs/repo_boot ]; then
  echo "== extracting fresh HEAD snapshot to /root/runs/repo_boot =="
  git archive HEAD --prefix=repo_boot/ | tar -x -C /root/runs
  git rev-parse HEAD > /root/runs/repo_boot/.snapshot_rev
fi
echo "snapshot: /root/runs/repo_boot @ $(cat /root/runs/repo_boot/.snapshot_rev)"

echo "== committed chain scripts =="
ls -1 artifacts/chain_*.sh 2>/dev/null || echo "(none)"
echo "== committed checkpoints (resumable with save_and_load.load_model=True) =="
find artifacts -maxdepth 2 -type d -name "*ckpt*" 2>/dev/null || true

if [ "${1:-}" = "--launch" ] && [ -n "${2:-}" ]; then
  name="$2"
  script="artifacts/chain_${name}.sh"
  [ -f "$script" ] || { echo "no such chain script: $script"; exit 1; }
  echo "== relaunching $script from the fresh snapshot =="
  nohup bash "$script" > "/root/runs/chain_${name}_outer.log" 2>&1 &
  echo $! > "/root/runs/chain_${name}.pid"
  echo "launched PID $(cat /root/runs/chain_${name}.pid) (outer log /root/runs/chain_${name}_outer.log)"
fi
