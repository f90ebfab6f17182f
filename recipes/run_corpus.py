"""Corpus recipe runner: the TPU-native equivalent of the reference's
per-dataset bash pipelines (AMI_run.sh / CALLHOME_run.sh / DIHARD2_run.sh).

Where the reference writes one task line per recording and fans them out to
a grid engine (AMI_run.sh:30-33,53-58 — zero inter-process communication),
this runner:
  - stage 'xvectors':    extracts every listed recording through the batched
                         JAX extractor (one process, windows batched on
                         device),
  - stage 'diarization': runs ALL recordings through the padded-batched
                         vmapped VB engine (bucketed by length), then writes
                         and concatenates RTTMs,
  - stage 'score':       scores the preset's protocols of record
                         (AMI_run.sh:63-65 forgiving/fair/full;
                         DIHARD2_run.sh:61-62 fair/full).

Idempotent re-entry like the reference (AMI_run.sh:51): stages skip work
whose outputs already exist unless --force.

Multi-host: launch one process per host with jax.distributed (see
vbx_tpu.parallel); recordings shard over hosts ('dp' over DCN).
"""

from __future__ import annotations

import argparse
import os
import shutil
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from vbx_tpu.config import get_preset
from vbx_tpu.metrics.der import score_corpus

PROTOCOLS = {          # AMI_run.sh:63-65
    "forgiving": dict(collar=0.25, ignore_overlaps=True),
    "fair": dict(collar=0.25, ignore_overlaps=False),
    "full": dict(collar=0.0, ignore_overlaps=False),
}


def build_parser():
    p = argparse.ArgumentParser(prog="vbx-tpu-run-corpus")
    p.add_argument("stage", choices=["xvectors", "diarization", "score"],
                   help="pipeline stage (reference INSTRUCTION arg)")
    p.add_argument("--preset", required=True,
                   help="dataset preset (vbx_tpu.config.DATASET_PRESETS) "
                        "or a .yaml/.yml/.json config file")
    p.add_argument("--list-file", required=True,
                   help="text file with one recording name per line")
    p.add_argument("--exp-dir", required=True)
    p.add_argument("--wav-dir")
    p.add_argument("--lab-dir")
    p.add_argument("--weights", help="torch checkpoint for extraction")
    p.add_argument("--plda-file")
    p.add_argument("--xvec-transform")
    p.add_argument("--ref-rttm-dir", help="reference RTTMs for scoring")
    p.add_argument("--force", action="store_true")
    p.add_argument("--fb-impl", default=None,
                   choices=["structured", "assoc", "pallas", "pallas_bf16"],
                   help="forward-backward engine for the diarization stage")
    p.add_argument("--mesh", default=None, metavar="DPxSP",
                   help="shard the diarization stage over a ('dp','sp') "
                        "device mesh, e.g. 4x2: recordings data-parallel, "
                        "frames sequence-parallel (the long-recording "
                        "path). Overrides --fb-impl.")
    return p


def _names(path):
    with open(path) as f:
        return [line.strip() for line in f if line.strip()]


def stage_xvectors(args):
    import jax

    from vbx_tpu.engine.extractor import XVectorExtractor, extract_to_ark
    from vbx_tpu.models.resnet import load_torch_checkpoint
    from vbx_tpu.parallel.distributed import initialize, local_recording_slice

    initialize()          # multi-host: no-op unless COORDINATOR_ADDRESS set
    cfg = get_preset(args.preset)
    ark = os.path.join(args.exp_dir, "xvectors.ark")
    seg = os.path.join(args.exp_dir, "xvectors.seg")
    # require BOTH stage outputs: extract_to_ark writes the ark before the
    # segments file, so a kill between the two must not look complete
    if os.path.exists(ark) and os.path.exists(seg) and not args.force:
        print(f"skip: {ark} exists", file=sys.stderr)
        return
    model, variables = load_torch_checkpoint(args.weights)
    ex = XVectorExtractor(model, variables, cfg.sample_rate,
                          config=cfg.extractor)
    names = _names(args.list_file)
    os.makedirs(args.exp_dir, exist_ok=True)
    multi = jax.process_count() > 1
    if multi:
        # recordings shard over hosts ('dp' over DCN, like the
        # diarization stage); each host writes its own ark/seg shard,
        # then host 0 concatenates after the barrier (ark and segments
        # are plain record streams, so concatenation is exact)
        names = names[local_recording_slice(len(names))]
        ark_out = f"{ark}.{jax.process_index()}"
        seg_out = f"{seg}.{jax.process_index()}"
    else:
        ark_out, seg_out = ark, seg
    wavs = [os.path.join(args.wav_dir, f"{n}.wav") for n in names]
    labs = [os.path.join(args.lab_dir, f"{n}.lab") for n in names]
    extract_to_ark(wavs, labs, names, ark_out, seg_out, ex)
    if multi:
        from jax.experimental import multihost_utils
        multihost_utils.sync_global_devices("xvector_shards_written")
        if jax.process_index() != 0:
            return
        for path in (ark, seg):
            with open(path, "wb") as out:
                for p in range(jax.process_count()):
                    shard = f"{path}.{p}"
                    if not os.path.exists(shard):
                        # every process wrote its shard before the
                        # barrier; a missing one means non-shared storage
                        # or a writer failure — silently skipping would
                        # produce an ark quietly missing that host's
                        # recordings
                        raise RuntimeError(
                            f"missing x-vector shard {shard}: stage "
                            f"output is on non-shared storage or process "
                            f"{p} failed to write")
                    with open(shard, "rb") as f:
                        # stream: a per-host ark shard can be multiple GB
                        shutil.copyfileobj(f, out)
        for path in (ark, seg):
            for p in range(jax.process_count()):
                os.remove(f"{path}.{p}")


def stage_diarization(args):
    import jax

    from vbx_tpu.engine.pipeline import diarize_ark
    from vbx_tpu.parallel.distributed import initialize

    initialize()          # multi-host: no-op unless COORDINATOR_ADDRESS set
    cfg = get_preset(args.preset)
    rttm_dir = os.path.join(args.exp_dir, "rttms")
    out_all = os.path.join(args.exp_dir, "all.rttm")
    if os.path.exists(out_all) and not args.force:
        print(f"skip: {out_all} exists", file=sys.stderr)
        return
    mesh = None
    if args.mesh:
        from vbx_tpu.parallel.mesh import parse_mesh_arg
        mesh = parse_mesh_arg(args.mesh)
    diarize_ark(os.path.join(args.exp_dir, "xvectors.ark"),
                os.path.join(args.exp_dir, "xvectors.seg"),
                rttm_dir, cfg, args.plda_file, args.xvec_transform,
                resume=True, shard_over_hosts=True, fb_impl=args.fb_impl,
                mesh=mesh,
                runlog_path=os.path.join(args.exp_dir, "diarization.jsonl"))
    if jax.process_count() > 1:
        # barrier: every host must have written its RTTM slice before
        # host 0 concatenates, or all.rttm silently drops recordings
        from jax.experimental import multihost_utils
        multihost_utils.sync_global_devices("diarization_rttms_written")
    if jax.process_index() != 0:
        return               # host 0 concatenates
    names = _names(args.list_file)
    with open(out_all, "w") as out:
        for n in names:
            path = os.path.join(rttm_dir, f"{n}.rttm")
            if os.path.exists(path):
                out.write(open(path).read())


def stage_score(args):
    from vbx_tpu.cli.score import _load_turns

    cfg = get_preset(args.preset)
    names = set(_names(args.list_file))
    ref = {k: v for k, v in _load_turns(
        [os.path.join(args.ref_rttm_dir, "*.rttm")]).items() if k in names}
    # filter the system side to the list too: a stale all.rttm from a run
    # over a larger list would otherwise score its extra recordings against
    # an empty reference (pure false alarm) and silently inflate DER
    sys_ = {k: v for k, v in _load_turns(
        [os.path.join(args.exp_dir, "all.rttm")]).items() if k in names}
    for rec in set(ref) - set(sys_):
        sys_[rec] = []
    for proto in cfg.protocols:        # protocols of record per dataset
        kw = PROTOCOLS[proto]
        _, total = score_corpus(ref, sys_, **kw)
        print(f"{proto}: DER {total.der:.2f}  JER {total.jer:.2f}  "
              f"(miss {total.missed:.1f}s fa {total.falarm:.1f}s "
              f"conf {total.confusion:.1f}s / {total.scored_time:.1f}s)")


REQUIRED_BY_STAGE = {
    "xvectors": ("wav_dir", "lab_dir", "weights"),
    "diarization": ("plda_file", "xvec_transform"),
    "score": ("ref_rttm_dir",),
}


def main(argv=None):
    parser = build_parser()
    args = parser.parse_args(argv)
    missing = [f"--{opt.replace('_', '-')}"
               for opt in REQUIRED_BY_STAGE[args.stage]
               if getattr(args, opt) is None]
    if missing:
        parser.error(f"stage '{args.stage}' requires {' '.join(missing)}")
    {"xvectors": stage_xvectors,
     "diarization": stage_diarization,
     "score": stage_score}[args.stage](args)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
