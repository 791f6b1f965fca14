"""Dump the compiled HLO of the garden train step and print the definition
lines of named ops (to identify what xprof's top fusions ARE).

  python scripts/dump_train_hlo.py fusion.281 transpose_jvp___.18 ...
"""
import re
import sys

import jax
import jax.numpy as jnp

from tpugs.ops.render import RasterConfig, render
from tpugs.optim.adam import AdamConfig, adam_init, adam_step
from tpugs.train.loss import combined_loss
from tpugs.utils.synthetic import synthetic_intrinsics, synthetic_params

n, img_w, img_h = 1_000_000, 1297, 840
cfg = RasterConfig(img_h=img_h, img_w=img_w, tile_h=32, tile_w=32,
                   pair_capacity=2_453_504, max_hits_per_tile=8192)
K = 4
params = synthetic_params(n, seed=0, scale_range=(0.002, 0.015))
alive = jnp.ones((n,), bool)
viewmat = jnp.eye(4)
intr = synthetic_intrinsics(img_w, img_h)
bg = jnp.zeros((3,))
adam_cfg = AdamConfig()
adam_state = adam_init(params)
target = jax.random.uniform(jax.random.PRNGKey(0), (img_h, img_w, 3))


def train_step(params, adam_state, step):
    def loss_fn(p):
        out = render(
            p["means"], p["quats"], p["log_scales"], p["opacity_logits"],
            p["sh"], alive, viewmat, intr, cfg, 3, bg,
        )
        return combined_loss(out.color, target, 0.2)

    loss, grads = jax.value_and_grad(loss_fn)(params)
    params, adam_state = adam_step(adam_cfg, adam_state, params, grads, step)
    return params, adam_state, loss


def run_k(params, adam_state, step0):
    def body(c, i):
        p, a = c
        p, a, loss = train_step(p, a, i)
        return (p, a), loss

    (p, a), losses = jax.lax.scan(
        body, (params, adam_state),
        step0 + jnp.arange(K, dtype=jnp.float32),
    )
    return p, a, losses


txt = (
    jax.jit(run_k)
    .lower(params, adam_state, jnp.zeros(()))
    .compile()
    .as_text()
)
print(f"HLO: {len(txt.splitlines())} lines", file=sys.stderr)
want = sys.argv[1:]
lines = txt.splitlines()
for i, ln in enumerate(lines):
    s = ln.lstrip()
    for w in want:
        # definition line: "%fusion.281 = ..." or "fusion.281 = ..."
        if s.startswith(f"%{w} ") or s.startswith(f"{w} "):
            print(ln[:500])
            # for fusions, also print the fused computation's name (the
            # calls= operand) so it can be grepped in the full dump
            m = re.search(r"calls=(%?[\w.\-]+)", ln)
            if m:
                print(f"  -> fused computation: {m.group(1)}")
            break
