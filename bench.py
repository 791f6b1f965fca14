"""Benchmark: train-step throughput (fwd + bwd + Adam) on the real chip.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline", "extra"}.

Primary metric / baseline: the reference's only measured end-to-end number is
0.4 it/s at 489x272 with 50k Gaussians SH3 on an RTX 3060 (BASELINE.md)
= 0.0532 Mpix/s of forward+backward training throughput. We report Mpix/s on
the same workload shape and vs_baseline against that.

"extra" carries a second, garden-30k-shaped configuration (1297x840 ~1.09
Mpix, 1M Gaussians, ~1.2M pairs/Mpix with converged-scene footprints) — the
at-scale regime the reference targets but never measured (ROADMAP.md:644).
"""
from __future__ import annotations

import json
import os
import time

import jax
import jax.numpy as jnp

# A/B knob: carry compositor attrs through the pair sort. Default off — the
# sliced pack gather beats the sort payloads at both bench scales
# (docs/PERF_NOTES.md r4: 201.7x vs 192.9x at 50k).
_CARRY = os.environ.get("TPUGS_TRAIN_CARRY", "0") == "1"


def measure_config(img_w, img_h, n, pair_capacity, max_hits, scale_range=None,
                   k=10, rounds=3):
    """Train-step Mpix/s for one workload shape (honest scan-block clock)."""
    from tpugs.ops.render import RasterConfig, render
    from tpugs.optim.adam import AdamConfig, adam_init, adam_step
    from tpugs.train.loss import combined_loss
    from tpugs.utils.synthetic import synthetic_intrinsics, synthetic_params

    cfg = RasterConfig(
        img_h=img_h, img_w=img_w, tile_h=32, tile_w=32,
        pair_capacity=pair_capacity, max_hits_per_tile=max_hits,
    )
    kw = {"scale_range": scale_range} if scale_range else {}
    params = synthetic_params(n, seed=0, **kw)
    alive = jnp.ones((n,), bool)
    viewmat = jnp.eye(4)
    intr = synthetic_intrinsics(img_w, img_h)
    bg = jnp.zeros((3,))
    adam_cfg = AdamConfig()
    adam_state = adam_init(params)
    target = jax.random.uniform(jax.random.PRNGKey(0), (img_h, img_w, 3))

    # NOTE: deliberately NOT @jax.jit — a nested jit inside lax.scan becomes a
    # closed_call the runtime dispatches per iteration (~40x slowdown here);
    # only the outer run_k is jitted.
    def train_step(params, adam_state, step):
        def loss_fn(p):
            out = render(
                p["means"], p["quats"], p["log_scales"], p["opacity_logits"],
                p["sh"], alive, viewmat, intr, cfg, 3, bg, carry_attrs=_CARRY,
            )
            return combined_loss(out.color, target, 0.2)

        loss, grads = jax.value_and_grad(loss_fn)(params)
        params, adam_state = adam_step(adam_cfg, adam_state, params, grads, step)
        return params, adam_state, loss

    # K steps inside one jitted lax.scan: measures device time, not dispatch.
    # (The session's tunneled runtime has ~30 ms per-call round-trip overhead
    # and block_until_ready does not reliably block — a scalar fetch after a
    # scanned multi-step call is the only honest clock. This is also the
    # production shape: the host only intervenes at logging boundaries.)
    def scan_step(carry, step):
        params, adam_state = carry
        params, adam_state, loss = train_step(params, adam_state, step)
        return (params, adam_state), loss

    @jax.jit
    def run_k(params, adam_state, step0):
        (params, adam_state), losses = jax.lax.scan(
            scan_step, (params, adam_state),
            step0 + jnp.arange(k, dtype=jnp.float32),
        )
        return params, adam_state, losses[-1]

    params, adam_state, loss = run_k(params, adam_state, jnp.zeros(()))
    float(loss)  # warmup + compile barrier

    t0 = time.perf_counter()
    for r in range(rounds):
        # NB: explicit dtype — a weak-typed scalar here would retrace run_k
        # and put a recompile inside the measured region.
        step0 = jnp.asarray(k * (r + 1), jnp.float32)
        params, adam_state, loss = run_k(params, adam_state, step0)
        float(loss)
    dt = time.perf_counter() - t0

    # Integrity check: a tight pair capacity must not have overflowed (an
    # overflow silently drops pairs and the benchmark would measure less work
    # than the comparison assumes). Checked on the final (most drifted)
    # parameters.
    out = jax.jit(lambda p: render(
        p["means"], p["quats"], p["log_scales"], p["opacity_logits"],
        p["sh"], alive, viewmat, intr, cfg, 3, bg,
    ))(params)
    assert not bool(out.pair_overflow), (
        f"pair capacity {cfg.pair_capacity} overflowed "
        f"({int(out.num_pairs)} pairs)"
    )
    assert not bool(out.hit_overflow), (
        f"max_hits {cfg.max_hits_per_tile} overflowed "
        f"({int(out.max_tile_hits)} in busiest tile)"
    )

    its = rounds * k / dt
    return its * img_w * img_h / 1e6, its


def main():
    # Primary: the reference benchmark shape (Truck r=4). 32x32 tiles:
    # 8x128-lane-shaped, ~174k rect pairs (2.2x fewer than 16x16); capacity
    # leaves ~18% headroom; overflow asserted after the run.
    # max_hits must exceed the busiest tile (3578 entries on this scene) or
    # the front-K clamp truncates the measured workload — asserted above.
    mpix_s, its = measure_config(489, 272, 50_000,
                                 pair_capacity=204800, max_hits=4096)
    baseline_mpix_s = 0.4 * 489 * 272 / 1e6  # reference: 0.4 it/s, same view

    # Secondary: garden-30k scale (1297x840, 1M Gaussians, converged-scene
    # footprints). No reference number exists at this scale.
    # TPUGS_BENCH_SKIP_GARDEN=1 (preflight --fast) skips it.
    if os.environ.get("TPUGS_BENCH_SKIP_GARDEN", "0") == "1":
        g_mpix_s, g_its = float("nan"), float("nan")
    else:
        g_mpix_s, g_its = measure_config(
            1297, 840, 1_000_000, pair_capacity=2_453_504, max_hits=8192,
            scale_range=(0.002, 0.015), k=5, rounds=2,
        )  # capacity = 1.16x the scene's 2.106M pairs (512-multiple)

    print(
        json.dumps(
            {
                "metric": "train_step_throughput_50k_sh3_489x272",
                "value": round(mpix_s, 4),
                "unit": "Mpix/s (fwd+bwd+adam)",
                "vs_baseline": round(mpix_s / baseline_mpix_s, 2),
                "extra": {
                    "garden30k_shape_1297x840_1M_sh3": {
                        "value": round(g_mpix_s, 4),
                        "unit": "Mpix/s (fwd+bwd+adam)",
                        "it_per_s": round(g_its, 2),
                    }
                } if g_mpix_s == g_mpix_s else {"garden": "skipped"},
            }
        )
    )


if __name__ == "__main__":
    main()
