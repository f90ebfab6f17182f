#!/usr/bin/env bash
# One-shot measurement battery for when the tunnel chip is healthy:
# preflight, kernel A/B (f32 vs bf16 streams), golden-on-TPU, bench.py,
# serving load test. Each step under its own timeout; one TPU process at
# a time (CLAUDE.md). Results land in $OUT (default /tmp/tpu_battery).
set -u
cd "$(dirname "$0")/.."
OUT=${1:-/tmp/tpu_battery}
mkdir -p "$OUT"
log() { echo "== $* ==" | tee -a "$OUT/summary.log"; }

log "preflight"
timeout 120 python -c "
import jax, numpy as np, jax.numpy as jnp
print('preflight OK:', np.asarray(jax.jit(lambda a: a@a)(jnp.ones((512,512))))[0,0])
" 2>&1 | tail -1 | tee -a "$OUT/summary.log" || { log "CHIP DEAD - abort"; exit 1; }

log "chain_bench B=256 iters=10 (structured, pallas, pallas_bf16)"
timeout 590 python scripts/chain_bench.py 256 10 \
    2>"$OUT/chain_bench.err" | tee "$OUT/chain_bench.log" -a "$OUT/summary.log"

log "golden ES2005a on TPU (default + pallas_bf16)"
timeout 590 python - <<'EOF' 2>"$OUT/golden_tpu.err" | tee "$OUT/golden_tpu.log" -a "$OUT/summary.log"
import tempfile, os
from vbx_tpu.config import get_preset
from vbx_tpu.engine.pipeline import diarize_ark
from vbx_tpu.metrics.der import der_from_rttm_files
REF = "/root/reference"
for impl in (None, "pallas_bf16"):
    with tempfile.TemporaryDirectory() as d:
        diarize_ark(f"{REF}/exp/ES2005a.ark", f"{REF}/exp/ES2005a.seg", d,
                    get_preset("example"), f"{REF}/VBx/models/ResNet101_16kHz/plda",
                    f"{REF}/VBx/models/ResNet101_16kHz/transform.h5",
                    verbose=False, fb_impl=impl)
        _, tot = der_from_rttm_files(f"{REF}/example/rttm/ES2005a.rttm",
                                     os.path.join(d, "ES2005a.rttm"),
                                     collar=0.25, ignore_overlaps=True)
        print(f"TPU golden fb_impl={impl}: DER={tot.der:.2f}")
EOF

log "bench.py (headline, same-process f32/bf16 A/B)"
timeout 590 python bench.py 2>"$OUT/bench.err" | tee "$OUT/bench.json" -a "$OUT/summary.log"
tail -8 "$OUT/bench.err" >> "$OUT/summary.log"

log "serving_bench 256 requests / 16 clients (shipped default engine)"
timeout 590 python scripts/serving_bench.py 256 16 \
    2>"$OUT/serving_bench.err" | tee -a "$OUT/summary.log"

log "serving engine-of-record A/B (f32 vs bf16-max vs bf16-cap12)"
timeout 590 python scripts/serving_bench.py 96 16 --engines \
    2>>"$OUT/serving_bench.err" | tee -a "$OUT/summary.log"

log "profiler trace of the headline workload (measured HBM/op times)"
VBX_TPU_TRACE_DIR="$OUT/trace" timeout 590 python scripts/trace_headline.py \
    2>"$OUT/trace.err" | tee -a "$OUT/summary.log"

log "long-recording AHC front half N=10k/20k (host; both linkage modes)"
PALLAS_AXON_POOL_IPS= JAX_PLATFORMS=cpu timeout 590 \
    python scripts/linkage_scale_bench.py 10000 20000 \
    2>"$OUT/linkage.err" | tee -a "$OUT/summary.log"
PALLAS_AXON_POOL_IPS= JAX_PLATFORMS=cpu timeout 590 \
    python scripts/linkage_scale_bench.py --ondemand 10000 20000 50000 \
    2>>"$OUT/linkage.err" | tee -a "$OUT/summary.log"

log "S>128 fallback pricing (chip A/B)"
timeout 560 python scripts/ab_s_gt_128.py \
    2>"$OUT/s_gt_128.err" | tee -a "$OUT/summary.log"

log "plateau-stop A/B at AMI scale (chip)"
timeout 560 python scripts/ab_plateau.py pallas_bf16 18 \
    2>"$OUT/ab_plateau.err" | tee -a "$OUT/summary.log"

log "corpus-preset engine A/B vs the frozen AMI-scale oracle (chip)"
timeout 590 python scripts/ab_corpus_engine.py \
    2>"$OUT/ab_corpus_engine.err" | tee -a "$OUT/summary.log"

log "AMI-scale 18-meeting e2e corpus wall (chip; device mid-N linkage)"
timeout 570 python scripts/ami_scale_bench.py \
    2>"$OUT/ami_scale.err" | tee -a "$OUT/summary.log"

log "extractor throughput + conv-precision A/B (chip)"
timeout 560 python scripts/extractor_bench.py 4 \
    2>"$OUT/extractor_bench.err" | tee -a "$OUT/summary.log"

log "long-recording AHC device front half N=50k (chip)"
timeout 560 python scripts/ab_ahc_device.py \
    2>"$OUT/ab_ahc_device.err" | tee -a "$OUT/summary.log"

log "SP blockwise A/B at T=32768 (chip)"
timeout 560 python scripts/ab_sp_blockwise.py \
    2>"$OUT/ab_sp.err" | tee -a "$OUT/summary.log"

log "AMI-scale 18-meeting corpus parity vs the frozen reference oracle"
PALLAS_AXON_POOL_IPS= VBX_TPU_RUN_SLOW=1 timeout 1500 \
    python -m pytest tests/test_ami_scale_parity.py -q -s \
    2>"$OUT/ami_parity.err" | tail -25 | tee -a "$OUT/summary.log"

log "done - see $OUT"
