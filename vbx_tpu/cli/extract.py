"""x-vector extraction CLI: wav + VAD labels -> Kaldi ark + segments.

Argument parity with the reference extractor CLI (VBx/predict.py:82-100):
same flag names; `--weights` accepts the reference's torch .pth/.pt
checkpoints (converted on load, models.resnet.convert_torch_state_dict).
`--gpus` is accepted for compatibility and ignored — device selection is
JAX's (the TPU runtime replaces free_gpu.sh).
"""

from __future__ import annotations

import argparse
import logging
import os
import sys

from vbx_tpu.config import ExtractorConfig
from vbx_tpu.engine.extractor import XVectorExtractor, extract_to_ark


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(
        prog="vbx-tpu-extract",
        description="ResNet x-vector extraction (TPU-native)")
    p.add_argument("--gpus", type=str, default="",
                   help="ignored (JAX owns device selection)")
    p.add_argument("--model", type=str, default="ResNet101",
                   choices=["ResNet101", "ResNet34"])
    p.add_argument("--weights", required=True, type=str,
                   help="torch .pth/.pt checkpoint or exported .onnx "
                        "(reference formats)")
    p.add_argument("--model-file", type=str, default=None,
                   help="ignored (architecture selected via --model)")
    p.add_argument("--ndim", type=int, default=64)
    p.add_argument("--embed-dim", type=int, default=256)
    p.add_argument("--seg-len", type=int, default=144)
    p.add_argument("--seg-jump", type=int, default=24)
    p.add_argument("--in-file-list", required=True, type=str)
    p.add_argument("--in-lab-dir", required=True, type=str)
    p.add_argument("--in-wav-dir", required=True, type=str)
    p.add_argument("--out-ark-fn", required=True, type=str)
    p.add_argument("--out-seg-fn", required=True, type=str)
    p.add_argument("--backend", default="jax",
                   choices=["jax", "pytorch", "onnx"],
                   help="'pytorch' and 'onnx' are accepted for "
                        "reference-recipe compatibility (predict.py:96-97); "
                        "both map to the JAX model with imported weights "
                        "('onnx' reads the .onnx graph first-party, no "
                        "onnxruntime)")
    p.add_argument("--sample-rate", type=int, default=16000,
                   choices=[8000, 16000])
    p.add_argument("--dtype", default="float32",
                   choices=["float32", "bfloat16"],
                   help="model compute dtype; bfloat16 runs the ResNet on "
                        "the MXU's native precision (embeddings are "
                        "length-normalized downstream, cosine agreement "
                        "with float32 > 0.999)")
    p.add_argument("--batch-size", type=int, default=128,
                   help="extraction windows per device batch")
    return p


def main(argv=None) -> int:
    logging.basicConfig(level=logging.INFO, stream=sys.stderr)
    args = build_parser().parse_args(argv)

    from vbx_tpu.utils.compile_cache import enable as enable_compile_cache
    enable_compile_cache()
    import jax.numpy as jnp
    dtype = jnp.bfloat16 if args.dtype == "bfloat16" else jnp.float32
    if args.backend == "onnx" or args.weights.endswith(".onnx"):
        from vbx_tpu.models.onnx_import import load_onnx_checkpoint
        model, variables = load_onnx_checkpoint(
            args.weights, feat_dim=args.ndim, dtype=dtype)
        if model.embed_dim != args.embed_dim:
            raise SystemExit(
                f"--embed-dim {args.embed_dim} != ONNX model embedding "
                f"width {model.embed_dim}")
    else:
        from vbx_tpu.models.resnet import load_torch_checkpoint
        # --model-file (a whole pickled torch model) takes precedence over
        # --weights, like the reference (predict.py:117-119); the loader
        # extracts its state dict either way
        model, variables = load_torch_checkpoint(
            args.model_file or args.weights,
            feat_dim=args.ndim, embed_dim=args.embed_dim,
            dtype=dtype, arch=args.model)

    cfg = ExtractorConfig(feat_dim=args.ndim, embed_dim=args.embed_dim,
                          seg_len=args.seg_len, seg_jump=args.seg_jump)
    extractor = XVectorExtractor(model, variables, args.sample_rate,
                                 config=cfg, batch_size=args.batch_size)

    with open(args.in_file_list) as f:
        names = [line.strip() for line in f if line.strip()]
    wavs = [os.path.join(args.in_wav_dir, f"{n}.wav") for n in names]
    labs = [os.path.join(args.in_lab_dir, f"{n}.lab") for n in names]
    from vbx_tpu.utils.profiling import trace
    with trace():   # jax.profiler capture iff VBX_TPU_TRACE_DIR is set
        counts = extract_to_ark(wavs, labs, names, args.out_ark_fn,
                                args.out_seg_fn, extractor)
    for name, n in counts.items():
        print(f"{name}: {n} x-vectors", file=sys.stderr)
    failed = [n for n in names if n not in counts]
    if failed:
        print(f"{len(failed)} file(s) FAILED: {', '.join(failed)}",
              file=sys.stderr)
        return 1
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
