#!/usr/bin/env bash
# The reference's ESTM streaming-eval recipe (/root/reference/eval_hybrid_seq.sh)
# mapped to the TPU build. Pass DATAPATH=... (ScanNet-test root) and
# CKPT=... (orbax dir or reference .ckpt — the converter handles both);
# omit both for a hermetic synthetic run.
set -euo pipefail
cd "$(dirname "$0")/.."
if [ -n "${DATAPATH:-}" ]; then
  DATA_ARGS=(--datapath "$DATAPATH" --testlist estdepth_tpu/data/splits/test_split.txt --eval-dataset scannet)
else
  DATA_ARGS=(--synthetic)
fi
CKPT_ARGS=()
[ -n "${CKPT:-}" ] && CKPT_ARGS=(--ckpt "$CKPT")
python tools/eval_estm.py "${DATA_ARGS[@]}" ${CKPT_ARGS[@]+"${CKPT_ARGS[@]}"} \
  --outdir "${EVALPATH:-./output/hybrid_EST_ndepths64}" \
  --ndepths 64 --depth-min 0.1 --depth-max 10.0 \
  --save-maps "$@"
