"""Device / toolchain sanity check (reference: apps/hello_cuda.cpp — GPU
property dump + trivial kernel smoke test; here: JAX backend + device dump,
one tiny jitted matmul, and a 1-tile Pallas compositor smoke run)."""
from __future__ import annotations

import argparse
import json


def main(argv=None):
    ap = argparse.ArgumentParser(description="tpugs device info / smoke test")
    ap.add_argument("--json", action="store_true", help="machine-readable output")
    args = ap.parse_args(argv)

    import jax
    import jax.numpy as jnp

    info = {
        "jax_version": jax.__version__,
        "backend": jax.default_backend(),
        "device_count": jax.device_count(),
        "local_device_count": jax.local_device_count(),
        "devices": [
            {
                "id": d.id,
                "platform": d.platform,
                "kind": getattr(d, "device_kind", "?"),
                "process": d.process_index,
            }
            for d in jax.devices()
        ],
    }
    from tpugs.utils.memory import device_memory_stats

    stats = device_memory_stats()
    if stats:
        info["hbm_limit_mb"] = round(stats.get("bytes_limit", 0) / 2**20, 1)
        info["hbm_in_use_mb"] = round(stats.get("bytes_in_use", 0) / 2**20, 1)

    # Smoke 1: tiny jitted matmul (MXU / compile path).
    x = jnp.ones((128, 128), jnp.float32)
    y = jax.jit(lambda a: a @ a)(x)
    info["matmul_ok"] = bool(jnp.allclose(y[0, 0], 128.0))

    # Smoke 2: one-tile render through the full pipeline (Pallas on TPU,
    # interpreted scan path elsewhere).
    try:
        from tpugs.ops.render import RasterConfig, render
        from tpugs.utils.synthetic import synthetic_intrinsics, synthetic_params

        cfg = RasterConfig(img_h=16, img_w=16, tile_h=16, tile_w=16,
                           pair_capacity=1 << 10, max_hits_per_tile=64)
        p = synthetic_params(64, seed=0)
        out = render(
            p["means"], p["quats"], p["log_scales"], p["opacity_logits"],
            p["sh"], jnp.ones((64,), bool), jnp.eye(4),
            synthetic_intrinsics(16, 16), cfg, 0, jnp.zeros((3,)),
        )
        info["render_ok"] = bool(jnp.all(jnp.isfinite(out.color)))
    except Exception as e:  # pragma: no cover - smoke diagnostics
        info["render_ok"] = False
        info["render_error"] = str(e)

    if args.json:
        print(json.dumps(info, indent=2))
    else:
        print(f"jax {info['jax_version']}  backend={info['backend']}  "
              f"devices={info['device_count']}")
        for d in info["devices"]:
            print(f"  [{d['id']}] {d['platform']} {d['kind']} "
                  f"(process {d['process']})")
        if "hbm_limit_mb" in info:
            print(f"HBM: {info['hbm_in_use_mb']:.0f} / "
                  f"{info['hbm_limit_mb']:.0f} MB in use")
        print(f"matmul smoke: {'OK' if info['matmul_ok'] else 'FAIL'}")
        err = info.get("render_error")
        print(f"render smoke: {'OK' if info['render_ok'] else 'FAIL'}"
              + (f" ({err})" if err else ""))
    return 0 if info["matmul_ok"] and info["render_ok"] else 1


if __name__ == "__main__":
    raise SystemExit(main())
