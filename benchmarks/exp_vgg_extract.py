"""VGG16 fc7 extraction throughput: f32 vs bfloat16 compute path.

The extraction stage is where the pipeline's raw FLOPs live (~15.5
GFLOP/image — three orders of magnitude beyond a greedy decode step),
and the reference runs it offline in torchvision before training ever
starts. The bf16 path (FeatureExtractor compute_dtype /
--bf16/--vgg_bf16) halves the activation + weight HBM traffic; this
harness measures what that buys on device-resident preprocessed
batches (host->device upload over the tunnel is an environment
artifact, reported separately by the serving numbers).

Protocol per CLAUDE.md: one process, interleaved round-robin,
per-variant minimum, >=500 ms timing windows, host-readback sync.
"""

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np
import jax
import jax.numpy as jnp

from image_captioning_through_rl_tpu.models import vgg
from image_captioning_through_rl_tpu.utils.io import enable_persistent_compile_cache
from rooflines import MXU_BF16, HBM, path_vgg

VARIANTS = (
    ("f32@1", 1, None),
    ("bf16@1", 1, jnp.bfloat16),
    ("f32@64", 64, None),
    ("bf16@64", 64, jnp.bfloat16),
    ("f32@128", 128, None),
    ("bf16@128", 128, jnp.bfloat16),
    ("bf16@256", 256, jnp.bfloat16),
)


def main():
    enable_persistent_compile_cache()
    params = vgg.init(jax.random.PRNGKey(0))
    rng = np.random.default_rng(0)

    runners = {}
    for name, n, dt in VARIANTS:
        p = vgg.cast_params(params, dt) if dt is not None else params
        imgs = jnp.asarray(
            rng.standard_normal((n, 224, 224, 3)).astype(np.float32))
        fn = jax.jit(lambda p, im, dt=dt: vgg.features_fc7(
            p, im, preprocessed=True, compute_dtype=dt))
        runners[name] = (fn, p, imgs, n)

    for name, (fn, p, imgs, n) in runners.items():
        t0 = time.perf_counter()
        out = fn(p, imgs)
        np.asarray(out)
        print(f"compiled {name} in {time.perf_counter()-t0:.1f}s", flush=True)
        for _ in range(10):
            out = fn(p, imgs)
        np.asarray(out)

    best = {name: float("inf") for name, *_ in VARIANTS}
    for _ in range(5):
        for name, (fn, p, imgs, n) in runners.items():
            # size the window >= 500 ms (tunnel RTT floor)
            iters, t = 4, 0.0
            while True:
                t0 = time.perf_counter()
                for _ in range(iters):
                    out = fn(p, imgs)
                np.asarray(out)
                t = time.perf_counter() - t0
                if t >= 0.5:
                    break
                iters *= 2
            best[name] = min(best[name], t / iters * 1e3)

    print(f"\n{'variant':<10} {'ms/batch':>9} {'images/s':>9} "
          f"{'SOL ms':>7} {'%SOL':>5} {'MFU':>5}")
    for name, n, dt in VARIANTS:
        flops, hbm = path_vgg(n, dtype_bytes=2 if dt is not None else 4)
        sol = max(flops / MXU_BF16, hbm / HBM) * 1e3
        ms = best[name]
        print(f"{name:<10} {ms:9.2f} {n / ms * 1e3:9,.0f} {sol:7.2f} "
              f"{100 * sol / ms:4.0f}% {flops / (ms * 1e-3) / MXU_BF16 * 100:4.0f}%")


if __name__ == "__main__":
    main()
