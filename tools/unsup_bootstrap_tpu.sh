#!/bin/bash
# Round-5 at-scale unsupervised bootstrap (round-4 VERDICT item 1): the SMURF
# recipe (train/trainers.py::uflow_unsup_train_step — census + edge-aware
# smooth2 + wang occlusion + selfsup student/teacher, sequence-weighted over
# GRU iterations) trained on the REAL TPU at training scale, plus the
# photometric-only (selfsup-off) ablation on the same data stream.
#
# Crop 256x384 (32x48 correlation grid — 2.7x the round-3 escape run's area),
# bs 4, max_flow 8 (scaled with the crop like round 3's 6 @ 96x128). The
# gt-floor stage records the attainable census target + the zero-flow EPE
# reference line for THIS stream. Run in background:
#   bash tools/unsup_bootstrap_tpu.sh > /tmp/unsup_bootstrap.log 2>&1 &
set -u
cd "$(dirname "$0")/.."
echo "git_rev=$(git rev-parse --short HEAD)$(test -n "$(git status --porcelain)" && echo -dirty)"

STEPS=${STEPS:-6000}
CROP="--crop 256 384"
COMMON="--batch-size 4 --max-flow 8 --lr 2e-4 --traj-every 250 --steps $STEPS"

echo; echo "=== [$(date -u +%H:%M:%S)] census data floor + zero-flow EPE at 256x384 ==="
timeout 1800 python tools/unsup_convergence.py --gt-floor $CROP --batch-size 4 --max-flow 8 --steps 0
echo "gt_floor rc=$?"

echo; echo "=== [$(date -u +%H:%M:%S)] full SMURF recipe, $STEPS steps ==="
timeout 18000 python tools/unsup_convergence.py raft_uflow_unsup $CROP $COMMON
echo "full rc=$?"

echo; echo "=== [$(date -u +%H:%M:%S)] photometric-only ablation (no selfsup), $STEPS steps ==="
timeout 18000 python tools/unsup_convergence.py raft_uflow_photo $CROP $COMMON
echo "ablation rc=$?"

echo; echo "=== done ==="
