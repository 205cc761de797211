#!/usr/bin/env bash
# Joint-protocol (5-frame window) evaluation — the reference documents this
# mode in eval_hybrid.py but its shipped eval_hybrid.sh actually launches the
# ESTM script (see SURVEY.md §3.2 note); this shim drives the Joint protocol
# directly. Pass DATAPATH=... and CKPT=...; omit both for a synthetic run.
set -euo pipefail
cd "$(dirname "$0")/.."
if [ -n "${DATAPATH:-}" ]; then
  DATA_ARGS=(--datapath "$DATAPATH" --testlist estdepth_tpu/data/splits/test_split.txt --eval-dataset scannet)
else
  DATA_ARGS=(--synthetic)
fi
CKPT_ARGS=()
[ -n "${CKPT:-}" ] && CKPT_ARGS=(--ckpt "$CKPT")
python tools/eval_joint.py "${DATA_ARGS[@]}" ${CKPT_ARGS[@]+"${CKPT_ARGS[@]}"} \
  --outdir "${EVALPATH:-./output/hybrid_EST_joint_ndepths64}" \
  --ndepths 64 --depth-min 0.1 --depth-max 10.0 \
  --save-maps "$@"
