#!/bin/bash
# AMI recipe (reference parity: AMI_run.sh:1-67) on the TPU-native stack.
#
# Usage: recipes/AMI_run.sh INSTRUCTION VARIANT DATA_DIR EXP_DIR MODEL_DIR [LIST_FILE]
#   INSTRUCTION: xvectors | diarization | score
#   VARIANT:     mixheadset | beamformed
#
# Hyperparameters of record (AMI_run.sh:6,45-49): threshold -0.015,
# smoothing 7.0, lda 128, Fa 0.4, Fb 68 (Mix-Headset) / 64 (beamformed),
# loopP 0.65; 16 kHz model. Where the reference fans one task line per
# recording to a grid engine (AMI_run.sh:30-33,53-58), this runs the
# batched TPU engine in one process (multi-host: see
# vbx_tpu.parallel.distributed).
set -euo pipefail

INSTRUCTION=$1; VARIANT=$2; DATA_DIR=$3; EXP_DIR=$4; MODEL_DIR=$5
LIST_FILE=${6:-$DATA_DIR/lists/dev.txt}

case $VARIANT in
  mixheadset) PRESET=ami_mixheadset ;;
  beamformed) PRESET=ami_beamformed ;;
  *) echo "VARIANT must be mixheadset|beamformed" >&2; exit 1 ;;
esac

python recipes/run_corpus.py "$INSTRUCTION" \
    --preset "$PRESET" \
    --list-file "$LIST_FILE" \
    --exp-dir "$EXP_DIR" \
    --wav-dir "$DATA_DIR/wav" \
    --lab-dir "$DATA_DIR/vad" \
    --weights "$MODEL_DIR/raw_81.pth" \
    --plda-file "$MODEL_DIR/plda" \
    --xvec-transform "$MODEL_DIR/transform.h5" \
    --ref-rttm-dir "$DATA_DIR/rttms" \
    "${@:7}"   # extra run_corpus flags pass through (--fb-impl, --mesh, --force)
