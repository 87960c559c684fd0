#!/bin/bash
# Round-4 HEAD re-validation on the real TPU (VERDICT item 1), in priority
# order, each stage bounded and printing incrementally. Run in background:
#   bash tools/revalidate_tpu.sh > /tmp/revalidate.log 2>&1 &
# Stage order matters: grad parity first (the flat-lane cotangent VJPs have
# never met the Mosaic compiler); a failure there makes later numbers moot.
set -u
cd "$(dirname "$0")/.."

stage() { echo; echo "=== [$(date -u +%H:%M:%S)] $1 ==="; }

# provenance: which tree is being validated (advisor round-4 finding)
echo "git_rev=$(git rev-parse --short HEAD)$(test -n "$(git status --porcelain)" && echo -dirty)"

stage "grad parity (tools/verify_grad_tpu.py)"
timeout 1800 python tools/verify_grad_tpu.py
echo "grad_parity rc=$?"

stage "headline bench + extended fidelity gate (bench.py)"
timeout 3600 python bench.py
echo "bench rc=$?"

stage "training throughput at HEAD (tools/bench_train.py)"
timeout 3600 python tools/bench_train.py
echo "bench_train rc=$?"

stage "family device times + MFU + KITTI bucket (tools/bench_families.py)"
timeout 3600 python tools/bench_families.py
echo "bench_families rc=$?"

stage "full-res fidelity incl. on-demand path (tools/verify_fullres_tpu.py --alt)"
timeout 3600 python tools/verify_fullres_tpu.py --alt
echo "verify_fullres rc=$?"

stage "done"
