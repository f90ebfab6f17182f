#!/bin/bash
# Golden example recipe: the reference's run_example.sh (reference:
# run_example.sh:1-42) on the TPU-native stack.
#
# Stage 1 of the reference (ONNX x-vector extraction) needs the released
# final.onnx weights, which the reference snapshot does not ship
# (SURVEY.md C14); like the reference's own fallback, this recipe consumes
# the precomputed x-vectors in exp/ES2005a.{ark,seg}. When weights ARE
# available (torch .pth or exported .onnx — both import first-party,
# no onnxruntime), extract with:
#   python -m vbx_tpu.cli.extract --weights <ckpt.pth|final.onnx> \
#     --in-file-list list.txt --in-wav-dir example/audios/16k \
#     --in-lab-dir example/vad --out-ark-fn exp/ES2005a.ark \
#     --out-seg-fn exp/ES2005a.seg
#
# Usage: recipes/run_example.sh [REFERENCE_DIR] [OUT_DIR]
set -euo pipefail

REF=${1:-/root/reference}
OUT=${2:-exp_out}
MODELS=$REF/VBx/models/ResNet101_16kHz

mkdir -p "$OUT"

# hyperparameters of record: run_example.sh:30-34 (+ default smoothing 5.0)
python -m vbx_tpu.cli.diarize \
    --init AHC+VB \
    --out-rttm-dir "$OUT" \
    --xvec-ark-file "$REF/exp/ES2005a.ark" \
    --segments-file "$REF/exp/ES2005a.seg" \
    --xvec-transform "$MODELS/transform.h5" \
    --plda-file "$MODELS/plda" \
    --threshold -0.015 \
    --lda-dim 128 \
    --Fa 0.3 --Fb 17 --loopP 0.99

# forgiving protocol: collar 0.25, overlaps ignored (run_example.sh:40)
python -m vbx_tpu.cli.score \
    -r "$REF/example/rttm/ES2005a.rttm" \
    -s "$OUT/ES2005a.rttm" \
    --collar 0.25 --ignore_overlaps
# expected: DER 7.06 (reference README.md:55)
