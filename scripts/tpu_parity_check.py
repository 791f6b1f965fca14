"""On-TPU parity check: Pallas compositor vs the scan oracle, forward + gradients.

The CPU test suite runs the kernels in interpret mode only; this is the
on-hardware (Mosaic-compiled) counterpart of tests/test_pallas.py — run it
after any kernel change before trusting a bench number.

  python scripts/tpu_parity_check.py [tile_h tile_w]
"""
import sys

import jax
import jax.numpy as jnp
import numpy as np


from tpugs.ops.render import RasterConfig, render
from tpugs.utils.synthetic import synthetic_intrinsics, synthetic_params

th = int(sys.argv[1]) if len(sys.argv) > 2 else 32
tw = int(sys.argv[2]) if len(sys.argv) > 2 else 32
img_w, img_h = 512, 256
n = 20_000

cfg = RasterConfig(img_h=img_h, img_w=img_w, tile_h=th, tile_w=tw,
                   pair_capacity=1 << 19, max_hits_per_tile=2048)
params = synthetic_params(n, seed=0)
alive = jnp.ones((n,), bool)
viewmat = jnp.eye(4)
intr = synthetic_intrinsics(img_w, img_h)
bg = jnp.asarray([0.2, 0.1, 0.3])

print(f"backend={jax.default_backend()} geometry=transposed "
      f"tile={th}x{tw}")


def run(comp):
    def loss(p):
        out = render(p["means"], p["quats"], p["log_scales"],
                     p["opacity_logits"], p["sh"], alive, viewmat, intr,
                     cfg, 3, bg, compositor=comp)
        img = out.color
        return jnp.sum(img * img) + jnp.sum(out.final_T), img

    (l, img), g = jax.jit(jax.value_and_grad(loss, has_aux=True))(params)
    return l, img, g


l_p, img_p, g_p = run("pallas")
l_s, img_s, g_s = run("scan")

img_diff = float(jnp.max(jnp.abs(img_p - img_s)))
print(f"forward: max|pallas - scan| = {img_diff:.3e} "
      f"(loss {float(l_p):.6f} vs {float(l_s):.6f})")
# This scene stacks ~2k entries/tile: the kernels' prefix-product trees vs
# the scan's sequential products legitimately differ by ~1e-3 at the deepest
# pixels (measured identically for BOTH kernel geometries in interpret
# mode). The thresholds catch miscompilation (garbage/NaN/wrong indexing),
# not association rounding.
ok = img_diff < 5e-3
for k in g_p:
    gp, gs = np.asarray(g_p[k]), np.asarray(g_s[k])
    scale = max(np.abs(gs).max(), 1e-6)
    d = np.abs(gp - gs).max() / scale
    print(f"grad {k:16s}: rel max diff {d:.3e}")
    ok &= d < 2e-3
print("PARITY OK" if ok else "PARITY FAIL")
sys.exit(0 if ok else 1)
