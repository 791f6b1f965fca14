"""Full-frame A/B of presort modes at the viewer workload (1080p/1M,
tile 32x64): exact 2-array presort vs fast quantized u32 presort vs no
presort (2-key pair sort). Decides the viewer default; also a cross-check on
the e2e profiler's +101 ms presort attribution (isolated presort measures
12 ms — scripts/bench_presort.py)."""
import jax
import jax.numpy as jnp

from tpugs.ops.render import RasterConfig, render
from tpugs.utils.profiling import device_time
from tpugs.utils.synthetic import synthetic_intrinsics, synthetic_params

img_w, img_h = 1920, 1088
n = 1_000_000
params = synthetic_params(n, seed=0, scale_range=(0.002, 0.015))
alive = jnp.ones((n,), bool)
viewmat = jnp.eye(4)
intr = synthetic_intrinsics(img_w, img_h)
bg = jnp.zeros((3,))
cfg = RasterConfig(img_h=img_h, img_w=img_w, tile_h=32, tile_w=64,
                   pair_capacity=2_621_440, max_hits_per_tile=8192)


def bench(mode):
    def frame(c, it):
        z, p = c
        out = render(p["means"] + z, p["quats"], p["log_scales"],
                     p["opacity_logits"], p["sh"], alive, viewmat, intr,
                     cfg, 3, bg, presort=mode)
        return (jnp.tanh(jnp.sum(out.color)) * 1e-20, p)

    ms = device_time(frame, (jnp.zeros(()), params), k=6, rounds=2) * 1e3
    print(f"presort={mode!s:8s}: {ms:7.2f} ms = {1e3/ms:4.1f} FPS", flush=True)


bench("exact")
bench("fast")
bench(False)
