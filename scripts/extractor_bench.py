"""x-vector extractor throughput + MXU-precision A/B on the device.

The extractor is the FLOPs-heavy stage of the pipeline (ResNet101 over
144-frame windows every 0.24 s of speech — reference predict.py:179-193);
no throughput number existed for it and its convs run at the backend's
DEFAULT MXU precision (bf16-rounded inputs on TPU — the same class as the
TF32 the reference's own cuDNN path allows by default). This bench:

1. runs the full extractor (fbank -> CMVN -> windows -> jitted ResNet101
   forward, random weights) on synthetic speech and reports windows/s and
   the real-time factor,
2. A/Bs DEFAULT vs HIGHEST conv precision: embedding agreement (cosine
   and max-abs after l2 norm — the AHC chain consumes l2-normalized
   embeddings) and the throughput cost,
3. checks the downstream effect: AHC labels on the two embedding sets.

    timeout 560 python scripts/extractor_bench.py [minutes_of_audio]
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np  # noqa: E402

MINUTES = float(sys.argv[1]) if len(sys.argv) > 1 else 4.0


def main():
    import jax

    from vbx_tpu.config import ExtractorConfig
    from vbx_tpu.engine.extractor import XVectorExtractor
    from vbx_tpu.models.resnet import resnet101

    fs = 16000
    n = int(MINUTES * 60 * fs)
    rng = np.random.default_rng(0)
    # speech-ish synthetic signal: AR(1)-filtered noise with energy
    # modulation so fbank/CMVN see realistic dynamic range
    sig = rng.standard_normal(n).astype(np.float32)
    sig = np.convolve(sig, [1.0, 0.7, 0.4], mode="same")
    sig *= 0.1 * (1.0 + 0.5 * np.sin(np.arange(n) * 2e-4))
    vad = np.array([[0.0, n / fs]])

    print(f"device: {jax.devices()[0]}  audio={MINUTES:.1f} min", flush=True)

    results = {}
    for label, prec in (("default", None), ("highest", "highest")):
        model = resnet101(precision=prec)
        params = model.init(jax.random.PRNGKey(0),
                            np.zeros((1, 64, 144), np.float32))
        ext = XVectorExtractor(model, params, fs, config=ExtractorConfig(),
                               batch_size=64)
        t0 = time.perf_counter()
        segs = ext.extract_file(sig, vad, "bench")      # compile + run
        t_cold = time.perf_counter() - t0
        t0 = time.perf_counter()
        segs = ext.extract_file(sig, vad, "bench")
        t_warm = time.perf_counter() - t0
        emb = np.stack([s.xvector for s in segs])
        audio_s = MINUTES * 60
        print(f"precision={label:8s}: {len(segs)} windows, "
              f"warm {t_warm:.2f}s ({len(segs) / t_warm:.0f} windows/s, "
              f"{audio_s / t_warm:.0f}x realtime; cold {t_cold:.1f}s)",
              flush=True)
        results[label] = emb

    a = results["default"] / np.linalg.norm(results["default"], axis=1,
                                            keepdims=True)
    b = results["highest"] / np.linalg.norm(results["highest"], axis=1,
                                            keepdims=True)
    cos = np.sum(a * b, axis=1)
    print(f"embedding agreement (l2-normalized): cos min/mean = "
          f"{cos.min():.6f}/{cos.mean():.6f}, max|diff| = "
          f"{np.abs(a - b).max():.2e}", flush=True)

    from vbx_tpu.engine.ahc import ahc_labels
    lab_a = ahc_labels(a.astype(np.float64), 0.0, compute_backend="host")
    lab_b = ahc_labels(b.astype(np.float64), 0.0, compute_backend="host")
    same = np.array_equal(lab_a, lab_b)
    print(f"downstream AHC labels identical: {same} "
          f"(clusters {len(np.unique(lab_a))}/{len(np.unique(lab_b))})",
          flush=True)


if __name__ == "__main__":
    main()
