"""Benchmark: train-step throughput (fwd + bwd + Adam) on the real chip.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

Baseline: the reference's only measured end-to-end number is 0.4 it/s at
489x272 with 50k Gaussians SH3 on an RTX 3060 (BASELINE.md) = 0.0532 Mpix/s of
forward+backward training throughput. We report Mpix/s on the same workload
shape (50k Gaussians, SH degree 3, ~0.13 Mpix view) and vs_baseline against
0.0532 Mpix/s.
"""
from __future__ import annotations

import json
import time

import jax
import jax.numpy as jnp


def main():
    from tpugs.ops.render import RasterConfig, render
    from tpugs.optim.adam import AdamConfig, adam_init, adam_step
    from tpugs.train.loss import combined_loss
    from tpugs.utils.synthetic import synthetic_intrinsics, synthetic_params

    img_w, img_h = 489, 272  # the reference benchmark resolution (Truck r=4)
    n = 50_000
    # 32x32 tiles: 8x128-lane-shaped, ~174k rect pairs on this scene (2.2x
    # fewer than 16x16) — every pair-list op scales with capacity, so bigger
    # tiles + a tight capacity win ~27% (docs/PERF_NOTES.md). Capacity leaves
    # ~18% headroom over the rect count; overflow is asserted after the run.
    cfg = RasterConfig(
        img_h=img_h, img_w=img_w, tile_h=32, tile_w=32,
        pair_capacity=204800, max_hits_per_tile=1024,
    )
    params = synthetic_params(n, seed=0)
    alive = jnp.ones((n,), bool)
    viewmat = jnp.eye(4)
    intr = synthetic_intrinsics(img_w, img_h)
    bg = jnp.zeros((3,))
    adam_cfg = AdamConfig()
    adam_state = adam_init(params)
    rng = jax.random.PRNGKey(0)
    target = jax.random.uniform(rng, (img_h, img_w, 3))

    # NOTE: deliberately NOT @jax.jit — a nested jit inside lax.scan becomes a
    # closed_call the runtime dispatches per iteration (~40x slowdown here);
    # only the outer run_k is jitted.
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

    # K steps inside one jitted lax.scan: measures device time, not dispatch.
    # (The session's tunneled runtime has ~30 ms per-call round-trip overhead
    # and block_until_ready does not reliably block — a scalar fetch after a
    # scanned multi-step call is the only honest clock. This is also the
    # production shape: the host only intervenes at logging boundaries.)
    K = 10

    def scan_step(carry, step):
        params, adam_state = carry
        params, adam_state, loss = train_step(params, adam_state, step)
        return (params, adam_state), loss

    @jax.jit
    def run_k(params, adam_state, step0):
        (params, adam_state), losses = jax.lax.scan(
            scan_step, (params, adam_state), step0 + jnp.arange(K, dtype=jnp.float32)
        )
        return params, adam_state, losses[-1]

    params, adam_state, loss = run_k(params, adam_state, jnp.zeros(()))
    float(loss)  # warmup + compile barrier

    rounds = 3
    t0 = time.perf_counter()
    for r in range(rounds):
        # NB: explicit dtype — a weak-typed scalar here would retrace run_k
        # and put a recompile inside the measured region.
        step0 = jnp.asarray(K * (r + 1), jnp.float32)
        params, adam_state, loss = run_k(params, adam_state, step0)
        float(loss)
    dt = time.perf_counter() - t0

    # Integrity check: the tight pair capacity must not have overflowed (an
    # overflow silently drops pairs and the benchmark would measure less work
    # than the baseline comparison assumes). Checked on the final (most
    # drifted) parameters.
    out = jax.jit(lambda p: render(
        p["means"], p["quats"], p["log_scales"], p["opacity_logits"],
        p["sh"], alive, viewmat, intr, cfg, 3, bg,
    ))(params)
    assert not bool(out.pair_overflow), (
        f"pair capacity {cfg.pair_capacity} overflowed ({int(out.num_pairs)} pairs)"
    )

    its = rounds * K / dt
    mpix_s = its * img_w * img_h / 1e6
    baseline_mpix_s = 0.4 * img_w * img_h / 1e6  # reference: 0.4 it/s, same view
    print(
        json.dumps(
            {
                "metric": "train_step_throughput_50k_sh3_489x272",
                "value": round(mpix_s, 4),
                "unit": "Mpix/s (fwd+bwd+adam)",
                "vs_baseline": round(mpix_s / baseline_mpix_s, 2),
            }
        )
    )


if __name__ == "__main__":
    main()
