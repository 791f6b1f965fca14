"""xprof trace of the viewer frame -> per-op device-time report.

The ONLY trustworthy stage attribution in this environment (r3 lesson,
docs/PERF_NOTES.md): cumulative-prefix profiling lets XLA DCE inputs the fed
stage doesn't consume, so whole subsystems migrate between stages. This
captures a real profiler trace (works over the tunneled runtime) and
aggregates device-track events by HLO op with source attribution.

  python scripts/trace_report.py [tile_h tile_w pair_capacity max_hits]
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
from tpugs.utils.synthetic import synthetic_intrinsics, synthetic_params

img_w, img_h = 1920, 1088
n = 1_000_000
_a = [int(x) for x in sys.argv[1:]]
cfg = RasterConfig(img_h=img_h, img_w=img_w,
                   tile_h=_a[0] if _a else 64, tile_w=_a[1] if _a else 32,
                   pair_capacity=_a[2] if len(_a) > 2 else 2_129_920,
                   max_hits_per_tile=_a[3] if len(_a) > 3 else 8192)
K = 4
params = synthetic_params(n, seed=0, scale_range=(0.002, 0.015))
alive = jnp.ones((n,), bool)
viewmat = jnp.eye(4)
intr = synthetic_intrinsics(img_w, img_h)
bg = jnp.zeros((3,))


def frame(c, it):
    z, p = c
    out = render(p["means"] + z, p["quats"], p["log_scales"],
                 p["opacity_logits"], p["sh"], alive, viewmat, intr,
                 cfg, 3, bg, need_grads=False,
                 presort=os.environ.get("PRESORT", "fastest"),
                 carry_attrs=os.environ.get("CARRY_ATTRS", "0") == "1")
    return (jnp.tanh(jnp.sum(out.color)) * 1e-20, p)


@jax.jit
def run_k(c):
    c, _ = jax.lax.scan(lambda cc, it: (frame(cc, it), jnp.zeros(())),
                        c, jnp.arange(K, dtype=jnp.float32))
    return c


c = run_k((jnp.zeros(()), params))
float(c[0])  # warmup
logdir = "/tmp/gs_trace"
os.system(f"rm -rf {logdir}")
with jax.profiler.trace(logdir):
    c = run_k(c)
    float(c[0])

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
print(f"device op time {total / 1e3 / K:.2f} ms/frame "
      f"({sum(cnt.values())} events / {K} frames)")
for name, d in durs.most_common(25):
    print(f"{d / 1e3 / K:8.2f} ms  x{cnt[name] // K:<3d} {name[:40]:40s} "
          f"{src.get(name, '')}")
