"""Viewer-workload knob sweep: pair capacity right-sizing + per-tile hit cap.

Measures FPS and the image error each lossy setting introduces vs the
uncapped render (1080p, 1M Gaussians, converged-scene footprints)."""
import jax
import jax.numpy as jnp
import numpy as np

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


def make_cfg(cap, hits):
    return RasterConfig(img_h=img_h, img_w=img_w, tile_h=32, tile_w=32,
                        pair_capacity=cap, max_hits_per_tile=hits)


def render_once(cfg, p):
    return render(p["means"], p["quats"], p["log_scales"],
                  p["opacity_logits"], p["sh"], alive, viewmat, intr,
                  cfg, 3, bg).color


ref_cfg = make_cfg(1 << 22, 4096)
ref_img = jax.jit(render_once, static_argnums=0)(ref_cfg, params)
ref_np = np.asarray(ref_img)


def bench(cap, hits):
    cfg = make_cfg(cap, hits)

    def frame(c, it):
        z, p = c
        out = render(p["means"] + z, p["quats"], p["log_scales"],
                     p["opacity_logits"], p["sh"], alive, viewmat, intr,
                     cfg, 3, bg)
        return (jnp.tanh(jnp.sum(out.color)) * 1e-20, p)

    ms = device_time(frame, (jnp.zeros(()), params), k=8, rounds=2) * 1e3
    img = np.asarray(jax.jit(render_once, static_argnums=0)(cfg, params))
    err = np.abs(img - ref_np).mean()
    emax = np.abs(img - ref_np).max()
    print(f"cap {cap:>9} hits {hits:>5}: {ms:7.2f} ms = {1e3/ms:4.1f} FPS  "
          f"mean|dC| {err:.2e}  max {emax:.2e}", flush=True)


bench(1 << 22, 4096)          # baseline
bench(3_407_872, 4096)        # right-sized capacity (1.3x actual)
bench(3_407_872, 1024)        # + hit cap 1024
bench(3_407_872, 512)         # + hit cap 512
bench(3_407_872, 256)         # + hit cap 256
