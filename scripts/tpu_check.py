"""On-device correctness check: Pallas kernels vs the scan reference compositor
on the real TPU (forward pixels + backward grads). Run after any kernel change
— interpret-mode tests don't exercise DMA/semaphore behavior."""
import jax
import jax.numpy as jnp
import numpy as np

from tpugs.ops.render import RasterConfig, render
from tpugs.utils.synthetic import synthetic_intrinsics, synthetic_params

img_w, img_h = 489, 272
n = 20_000
cfg = RasterConfig(img_h=img_h, img_w=img_w, tile_h=32, tile_w=32,
                   pair_capacity=1 << 17, max_hits_per_tile=2048)
params = synthetic_params(n, seed=0)
alive = jnp.ones((n,), bool)
viewmat = jnp.eye(4)
intr = synthetic_intrinsics(img_w, img_h)
bg = jnp.asarray([0.1, 0.2, 0.3])
target = jax.random.uniform(jax.random.PRNGKey(0), (img_h, img_w, 3))


def run(compositor):
    def loss_fn(p):
        out = render(p["means"], p["quats"], p["log_scales"],
                     p["opacity_logits"], p["sh"], alive, viewmat, intr,
                     cfg, 3, bg, compositor=compositor)
        return jnp.mean((out.color - target) ** 2), out
    (loss, out), grads = jax.value_and_grad(loss_fn, has_aux=True)(params)
    return jax.device_get((loss, out.color, out.final_T, out.n_contrib, grads))


lp, cp, tp, np_p, gp = jax.jit(lambda: run("pallas"))()
ls, cs, ts, np_s, gs = jax.jit(lambda: run("scan"))()

print(f"loss pallas {lp:.6f}  scan {ls:.6f}")
print(f"color   max|d| {np.abs(cp - cs).max():.3e}")
print(f"final_T max|d| {np.abs(tp - ts).max():.3e}")
print(f"n_contrib max|d| {np.abs(np_p - np_s).max()}")
ok = True
for k in gp:
    d = np.abs(np.asarray(gp[k]) - np.asarray(gs[k]))
    s = np.abs(np.asarray(gs[k])).max() + 1e-12
    rel = d.max() / s
    print(f"grad[{k:>14s}] max|d| {d.max():.3e}  rel {rel:.3e}")
    ok &= rel < 2e-3  # f32 accumulation-order noise across reduction strategies
print("OK" if ok and np.abs(cp - cs).max() < 1e-4 else "MISMATCH")
