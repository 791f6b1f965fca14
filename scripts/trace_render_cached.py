"""xprof trace of one cached viewer frame (ops/render_cached.py) -> per-op
device-time report. Same aggregation as trace_report.py."""
import collections
import glob
import gzip
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

from tpugs.ops.render import RasterConfig
from tpugs.ops.render_cached import build_frame_cache, render_cached
from tpugs.utils.synthetic import synthetic_intrinsics, synthetic_params

img_w, img_h = 1920, 1088
n = 1_000_000
cfg = RasterConfig(img_h=img_h, img_w=img_w, tile_h=64, tile_w=32,
                   pair_capacity=2_129_920, max_hits_per_tile=8192)
K = 4
params = synthetic_params(n, seed=0, scale_range=(0.002, 0.015))
alive = jnp.ones((n,), bool)
viewmat = jnp.eye(4)
intr = synthetic_intrinsics(img_w, img_h)
bg = jnp.zeros((3,))

cache = jax.jit(
    lambda p: build_frame_cache(
        p["means"], p["quats"], p["log_scales"], p["opacity_logits"],
        p["sh"], alive, viewmat, intr, cfg, 3,
    )
)(params)


def frame(c, it):
    z, cc = c
    color, _ = render_cached(cc, viewmat + z, intr, cfg, bg)
    return (jnp.tanh(jnp.sum(color)) * 1e-20, cc)


@jax.jit
def run_k(c):
    c, _ = jax.lax.scan(lambda cc, it: (frame(cc, it), jnp.zeros(())),
                        c, jnp.arange(K, dtype=jnp.float32))
    return c


c = run_k((jnp.zeros(()), cache))
float(c[0])  # warmup
logdir = "/tmp/gs_trace_cached"
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
            continue
        durs[name] += e["dur"]
        cnt[name] += 1
        total += e["dur"]
        a = e.get("args") or {}
        if name not in src and "source" in a:
            src[name] = a["source"]
print(f"device op time {total / 1e3 / K:.2f} ms/frame "
      f"({sum(cnt.values())} events / {K} frames)")
for name, d in durs.most_common(20):
    print(f"{d / 1e3 / K:8.2f} ms  x{cnt[name] // K:<3d} {name[:40]:40s} "
          f"{src.get(name, '')}")
