"""Finite-difference gradient verification of the tiled renderer.

Mirrors the reference's crown-jewel suite (test_backward.cpp:266-336): perturb
parameter elements +-eps, re-render, compare (L+ - L-)/2eps against the
analytic/custom-VJP gradients with mixed relative+absolute tolerance and an
80% pass-rate gate. Positions use relaxed tolerances because tile binning
makes the loss discontinuous in screen position (test_backward.cpp:351-356).
"""
import jax
import jax.numpy as jnp
import numpy as np

from tpugs.ops.render import RasterConfig, render
from tpugs.train.loss import l1_loss

W, H = 48, 32
CFG = RasterConfig(img_h=H, img_w=W, tile_h=16, tile_w=16,
                   pair_capacity=1 << 12, max_hits_per_tile=64)
# numpy at import time: jnp arrays must not be created before conftest forces
# the CPU backend (CLAUDE.md hard rule).
INTR = np.asarray([40.0, 40.0, W / 2.0, H / 2.0], np.float32)


def make_params(n=12, seed=5):
    rng = np.random.default_rng(seed)
    return {
        "means": jnp.asarray(np.concatenate([
            rng.uniform(-0.5, 0.5, (n, 2)), rng.uniform(2.0, 4.0, (n, 1))
        ], axis=1), jnp.float32),
        "quats": jnp.asarray(rng.normal(size=(n, 4)), jnp.float32),
        "log_scales": jnp.asarray(np.log(rng.uniform(0.05, 0.2, (n, 3))),
                                  jnp.float32),
        "opacity_logits": jnp.asarray(rng.uniform(-1, 2, n), jnp.float32),
        "sh": jnp.asarray(rng.normal(size=(n, 3, 4)) * 0.3, jnp.float32),
    }


def loss_fn(params, target):
    out = render(params["means"], params["quats"], params["log_scales"],
                 params["opacity_logits"], params["sh"],
                 jnp.ones((params["means"].shape[0],), bool),
                 jnp.eye(4), jnp.asarray(INTR), CFG, 1, jnp.zeros((3,)))
    return l1_loss(out.color, target)


def finite_diff_check(params, key, eps, rel_tol, abs_tol, pass_rate,
                      n_samples=24, seed=9):
    target = jax.random.uniform(jax.random.PRNGKey(1), (H, W, 3))
    f = jax.jit(lambda p: loss_fn(p, target))
    analytic = jax.jit(jax.grad(lambda p: loss_fn(p, target)))(params)[key]

    rng = np.random.default_rng(seed)
    flat = np.asarray(params[key]).ravel()
    idxs = rng.choice(flat.size, size=min(n_samples, flat.size), replace=False)

    passed = 0
    for i in idxs:
        for sign, store in ((+1, "p"), (-1, "m")):
            pert = flat.copy()
            pert[i] += sign * eps
            pp = dict(params)
            pp[key] = jnp.asarray(pert.reshape(params[key].shape))
            if sign > 0:
                lp = float(f(pp))
            else:
                lm = float(f(pp))
        fd = (lp - lm) / (2 * eps)
        an = float(np.asarray(analytic).ravel()[i])
        tol = abs_tol + rel_tol * max(abs(fd), abs(an))
        if abs(fd - an) <= tol:
            passed += 1
    assert passed >= pass_rate * len(idxs), (
        f"{key}: only {passed}/{len(idxs)} finite-diff checks passed"
    )


class TestFiniteDifferences:
    # eps balances truncation vs f32 roundoff: the loss carries ~1e-7
    # relative noise, so central differences need eps >= 1e-2 on O(1)
    # parameters for the quotient noise to stay below the tolerances.
    def test_opacity_grads(self):
        finite_diff_check(make_params(), "opacity_logits",
                          eps=1e-2, rel_tol=0.08, abs_tol=3e-5, pass_rate=0.8)

    def test_sh_grads(self):
        finite_diff_check(make_params(), "sh",
                          eps=1e-2, rel_tol=0.08, abs_tol=3e-5, pass_rate=0.8)

    def test_scale_grads(self):
        finite_diff_check(make_params(), "log_scales",
                          eps=1e-2, rel_tol=0.1, abs_tol=3e-5, pass_rate=0.8)

    def test_quat_grads(self):
        finite_diff_check(make_params(), "quats",
                          eps=1e-2, rel_tol=0.1, abs_tol=3e-5, pass_rate=0.8)

    def test_position_grads_relaxed(self):
        # Reference uses eps=2e-3, rel 15%, abs 1e-3 for positions: tile
        # binning makes the loss discontinuous in screen position
        # (test_backward.cpp:351-356, docs/issues.md:78-98).
        finite_diff_check(make_params(), "means",
                          eps=5e-3, rel_tol=0.15, abs_tol=1e-3, pass_rate=0.8)
