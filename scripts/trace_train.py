"""xprof trace of the full train step (fwd+bwd+adam) -> per-op report.

Same methodology as trace_report.py (the only trustworthy attribution in
this environment): capture a real profiler trace of K scanned steps and
aggregate device-track events by HLO op with source attribution.

  python scripts/trace_train.py [n pair_capacity max_hits]   # default 50k bench
"""
import collections
import glob
import gzip
import json
import os
import sys

import jax
import jax.numpy as jnp

from tpugs.ops.render import RasterConfig, render
from tpugs.optim.adam import AdamConfig, adam_init, adam_step
from tpugs.train.loss import combined_loss
from tpugs.utils.synthetic import synthetic_intrinsics, synthetic_params

if sys.argv[1:] and sys.argv[1] == "garden":
    n, img_w, img_h = 1_000_000, 1297, 840
    cfg = RasterConfig(img_h=img_h, img_w=img_w, tile_h=32, tile_w=32,
                       pair_capacity=2_453_504, max_hits_per_tile=8192)
    K = 4
    params = synthetic_params(n, seed=0, scale_range=(0.002, 0.015))
else:
    _a = [int(x) for x in sys.argv[1:]]
    n = _a[0] if _a else 50_000
    img_w, img_h = 489, 272
    cfg = RasterConfig(
        img_h=img_h, img_w=img_w, tile_h=32, tile_w=32,
        pair_capacity=_a[1] if len(_a) > 1 else 204800,
        max_hits_per_tile=_a[2] if len(_a) > 2 else 4096,
    )
    K = 8
    params = synthetic_params(n, seed=0)
alive = jnp.ones((n,), bool)
viewmat = jnp.eye(4)
intr = synthetic_intrinsics(img_w, img_h)
bg = jnp.zeros((3,))
adam_cfg = AdamConfig()
adam_state = adam_init(params)
target = jax.random.uniform(jax.random.PRNGKey(0), (img_h, img_w, 3))


def train_step(params, adam_state, step):
    def loss_fn(p):
        out = render(p["means"], p["quats"], p["log_scales"],
                     p["opacity_logits"], p["sh"], alive, viewmat, intr,
                     cfg, 3, bg)
        return combined_loss(out.color, target, 0.2)

    loss, grads = jax.value_and_grad(loss_fn)(params)
    params, adam_state = adam_step(adam_cfg, adam_state, params, grads, step)
    return params, adam_state, loss


@jax.jit
def run_k(params, adam_state, step0):
    def scan_step(carry, step):
        p, s = carry
        p, s, loss = train_step(p, s, step)
        return (p, s), loss

    (params, adam_state), losses = jax.lax.scan(
        scan_step, (params, adam_state),
        step0 + jnp.arange(K, dtype=jnp.float32))
    return params, adam_state, losses[-1]


params, adam_state, loss = run_k(params, adam_state, jnp.zeros(()))
float(loss)  # warmup
logdir = "/tmp/gs_trace_train"
os.system(f"rm -rf {logdir}")
with jax.profiler.trace(logdir):
    params, adam_state, loss = run_k(params, adam_state, jnp.ones(()))
    float(loss)

(path,) = glob.glob(f"{logdir}/**/*.trace.json.gz", recursive=True)
with gzip.open(path) as f:
    data = json.load(f)
ev = data["traceEvents"]
names = {e["pid"]: e["args"].get("name", "")
         for e in ev if e.get("ph") == "M" and e.get("name") == "process_name"}
durs, cnt, src = collections.Counter(), collections.Counter(), {}
total = 0.0
for e in ev:
    if e.get("ph") == "X" and names.get(e.get("pid"), "").startswith(
            "/device:TPU"):
        name = e["name"]
        if (name.startswith("jit_") or name.startswith("while")
                or name.isdigit()):
            continue  # containers double-count their children (bare-number
            #           names are XLA program/module region events — one
            #           spanned the whole window and doubled the r4 total)
        durs[name] += e["dur"]
        cnt[name] += 1
        total += e["dur"]
        a = e.get("args") or {}
        if name not in src and "source" in a:
            src[name] = a["source"]
print(f"device op time {total / 1e3 / K:.2f} ms/step "
      f"({sum(cnt.values())} events / {K} steps)")
for name, d in durs.most_common(30):
    print(f"{d / 1e3 / K:8.2f} ms  n={cnt[name]:<5d} {name[:40]:40s} "
          f"{src.get(name, '')}")
