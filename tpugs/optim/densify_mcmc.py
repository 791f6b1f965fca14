"""MCMC densification (Kheradmand et al., NeurIPS 2024) — fixed-N relocation.

Behavioral equivalent of reference src/optimizer/mcmc_densification.cpp:75-186.
This strategy is *naturally* shape-stable (N never changes), which makes it the
flagship densifier for the TPU build (SURVEY.md §7):

- relocate: dead (sigmoid(op) < 0.005) Gaussians teleport to sources sampled
  from alive ones with probability ∝ opacity; SH + rotation copied, position =
  source + randn * 0.01 * extent, scale = source - log(10), opacity =
  inverse_sigmoid(0.01); at most 5% of N per event;
- noise injection every iteration (paper eq. 9): pos += noise_lr *
  xyz_lr(t) * Sigma @ (gate * randn), gate = sigmoid(-100 (sigmoid(op) -
  0.995)), Sigma the full 3D covariance. NOTE: this deliberately diverges
  from the reference, whose formula (mcmc_densification.cpp:144-161)
  `noise_lr(t) * exp(scales) * gate * randn` with noise_lr(0)=5e5 drops the
  paper's xyz-learning-rate factor and uses sigma instead of Sigma —
  displacements of ~5e5*sigma destroy any scene in the first steps (measured:
  pair count 13k -> 392 within 25 iterations). The paper/upstream
  3dgs-mcmc semantics used here keep displacements at ~80*sigma^2 early,
  decaying with the position LR;
- regularization 0.01*mean(sigmoid(op)) + 0.01*mean(exp(scales)) — here simply
  added to the jitted loss (autodiff replaces the reference's detached-clone
  gradient-injection machinery, mcmc_densification.cpp:167-186).
"""
from __future__ import annotations

import dataclasses
import functools
import math

import jax
import jax.numpy as jnp
import numpy as np

from tpugs.core import transforms as tf
from tpugs.optim.lr_schedule import PositionLRConfig, position_lr

RELOCATE_OPACITY = -4.59511985013459  # inverse_sigmoid(0.01)
RELOCATE_SCALE_SHRINK = 10.0


@dataclasses.dataclass(frozen=True)
class MCMCConfig:
    """reference: mcmc_densification.hpp:27-51."""

    relocate_from: int = 500
    relocate_until: int = 15000
    relocate_every: int = 100
    dead_opacity_threshold: float = 0.005
    relocate_cap: float = 0.05
    # Paper semantics: noise scale = noise_lr * xyz_lr(step), with xyz_lr the
    # decaying position learning rate (5e5 * 1.6e-4 = 80 at step 0). The
    # reference's separate 5e5->1e3 schedule is its (scene-destroying)
    # mis-translation of the same upstream default — see module docstring.
    noise_lr: float = 5e5
    # Must track the OPTIMIZER's position LR schedule (the Trainer syncs this
    # from AdamConfig.position_lr at construction so the two cannot drift).
    position_lr: PositionLRConfig = dataclasses.field(
        default_factory=PositionLRConfig
    )
    noise_gate_k: float = 100.0
    noise_gate_t: float = 0.995
    # Per-step displacement cap, in units of the Gaussian's own largest axis
    # stddev. The Sigma-scaled paper noise is calibrated for converged splat
    # sizes; at SfM init the sparse-point scales are ~10x larger and the same
    # formula yields ~20*sigma per step, which destroys the scene during
    # warmup. Calibrated on the GT quality benchmark (1.5k iters): cap
    # 0.5/0.2/0.05 -> PSNR 14.95/17.01/18.73 vs 18.99 with noise off.
    noise_max_sigma: float = 0.05
    # Stop noise injection when the relocation window closes (relocate_until).
    # The reference injects noise every iteration forever
    # (trainer.cpp:246-266), but exploration without relocation only damages
    # the converged scene: the 30k GT run declined monotonically after
    # relocate_until=15000 (24.93 dB @15k -> 23.66 @25k) under a ~0.04 sigma/
    # step residual random walk. False = reference-faithful noise-forever.
    noise_stop_after_relocation: bool = True
    # Optional release step for the cap (0 = clamp forever, the default).
    # ABLATED on the GT quality benchmark: releasing at step 5000 starts a
    # death spiral within ~100 steps (dead count 62 -> 3410 -> 17k, train
    # loss 0.033 -> 0.18) — at mid-schedule the unclamped displacement is
    # still ~0.4 sigma/step of random walk, which overwhelms re-anchoring on
    # this scene. The clamp is load-bearing here; revisit only with a real
    # capture where converged splat statistics may differ.
    noise_clamp_until: int = 0
    lambda_opacity: float = 0.01
    lambda_scale: float = 0.01
    # Fraction of N added into free capacity per relocate event, enabled by
    # default (upstream 3dgs-mcmc behavior, +0.5 dB on the quality benchmark);
    # 0 = reference-faithful strictly-fixed N.
    grow_factor: float = 0.05
    # Exact relocation (Kheradmand et al. §3.2 / upstream 3dgs-mcmc
    # compute_relocation): when a source Gaussian is cloned into n copies,
    # opacity and scale are corrected so the n overlapping copies render the
    # same image as the original — o' = 1-(1-o)^(1/n) and sigma scaled by the
    # binomial moment-matching factor (see relocation_correction). The
    # reference instead resets targets to opacity 0.01 / scale/10
    # (mcmc_densification.cpp:113-135), which perturbs the rendered state at
    # every relocation event. False = reference-faithful behavior.
    exact_relocation: bool = True
    # Cap on the per-source copy count in the binomial sum (upstream: 51).
    relocation_n_max: int = 51

    def should_relocate(self, step: int) -> bool:
        return (
            self.relocate_from <= step <= self.relocate_until
            and step % self.relocate_every == 0
        )


def noise_scale(step, cfg: MCMCConfig = MCMCConfig()):
    """Effective noise magnitude: noise_lr * decaying position LR (paper
    semantics; the factor the reference drops — see module docstring)."""
    return cfg.noise_lr * position_lr(step, cfg.position_lr)


def inject_noise(cfg: MCMCConfig, params: dict, alive: jnp.ndarray, step, key):
    """Per-iteration position noise (paper eq. 9 / upstream 3dgs-mcmc):
    pos += noise_scale(step) * Sigma @ (gate * randn)."""
    lr = noise_scale(step, cfg)
    opac = jax.nn.sigmoid(params["opacity_logits"])
    gate = jax.nn.sigmoid(-cfg.noise_gate_k * (opac - cfg.noise_gate_t))
    eps = gate[:, None] * jax.random.normal(key, params["means"].shape)
    cov3d = tf.compute_cov3d(params["log_scales"], params["quats"])  # [N,3,3]
    noise = lr * jnp.einsum("nij,nj->ni", cov3d, eps)
    # Warmup norm clamp at noise_max_sigma * sigma_max (see config comment);
    # released after noise_clamp_until.
    sigma_max = jnp.exp(jnp.max(params["log_scales"], axis=-1))
    norm = jnp.sqrt(jnp.sum(noise * noise, axis=-1) + 1e-20)
    factor = jnp.minimum(1.0, cfg.noise_max_sigma * sigma_max / norm)
    if cfg.noise_clamp_until > 0:
        factor = jnp.where(
            jnp.asarray(step) < cfg.noise_clamp_until, factor, 1.0
        )
    if cfg.noise_stop_after_relocation:
        factor = factor * jnp.where(
            jnp.asarray(step) <= cfg.relocate_until, 1.0, 0.0
        )
    noise = noise * factor[:, None]
    out = dict(params)
    out["means"] = params["means"] + jnp.where(alive[:, None], noise, 0.0)
    return out


def regularization(cfg: MCMCConfig, params: dict, alive: jnp.ndarray):
    """Added directly to the training loss (replaces reference grad injection)."""
    n = jnp.maximum(jnp.sum(alive.astype(jnp.float32)), 1.0)
    opac = jnp.where(alive, jax.nn.sigmoid(params["opacity_logits"]), 0.0)
    scales = jnp.where(alive[:, None], jnp.exp(params["log_scales"]), 0.0)
    return (
        cfg.lambda_opacity * jnp.sum(opac) / n
        + cfg.lambda_scale * jnp.sum(scales) / (3.0 * n)
    )


@functools.lru_cache(maxsize=4)
def _binom_table(n_max: int) -> np.ndarray:
    """Lower-triangular binomial coefficients B[j, k] = C(j, k)."""
    b = np.zeros((n_max, n_max), np.float32)
    for j in range(n_max):
        for k in range(j + 1):
            b[j, k] = math.comb(j, k)
    return b


def relocation_correction(opac, scales, ratio, n_max: int = 51):
    """Exact multi-sample relocation (Kheradmand et al., NeurIPS 2024, §3.2;
    upstream 3dgs-mcmc compute_relocation kernel): splitting a Gaussian of
    opacity o and stddev sigma into n identical overlapping copies preserves
    the rendered image when

        o' = 1 - (1 - o)^(1/n)
        sigma' = sigma * o / sum_{i=1..n} sum_{k=0..i-1}
                              C(i-1,k) (-1)^k o'^(k+1) / sqrt(k+1)

    opac [N] activated opacity, scales [N, 3] linear stddevs, ratio [N] int
    copy counts (>= 1; rows with ratio == 1 pass through unchanged).
    Returns (new_opac [N], new_scales [N, 3])."""
    ratio = jnp.clip(ratio, 1, n_max)
    o = jnp.clip(opac, 1e-6, 1.0 - 1e-6)
    new_o = 1.0 - jnp.power(1.0 - o, 1.0 / ratio.astype(jnp.float32))

    k = jnp.arange(n_max, dtype=jnp.float32)
    # term[:, k] = (-1)^k / sqrt(k+1) * o'^(k+1)
    sign = jnp.where(k.astype(jnp.int32) % 2 == 0, 1.0, -1.0)
    powers = jnp.power(new_o[:, None], k[None, :] + 1.0)
    term = powers * (sign / jnp.sqrt(k + 1.0))[None, :]
    binoms = jnp.asarray(_binom_table(n_max))
    inner = term @ binoms.T  # inner[:, j] = sum_k C(j,k) term_k
    j_mask = jnp.arange(n_max)[None, :] < ratio[:, None]
    denom = jnp.sum(jnp.where(j_mask, inner, 0.0), axis=1)
    factor = o / jnp.maximum(denom, 1e-12)
    # ratio == 1 must be an exact no-op (denom analytically equals o there;
    # enforce it against rounding).
    one = ratio == 1
    new_o = jnp.where(one, opac, jnp.clip(new_o, 0.005, 1.0 - 1e-5))
    new_scales = jnp.where(one[:, None], scales, scales * factor[:, None])
    return new_o, new_scales


def _place_copies(cfg: MCMCConfig, params: dict, opac, living, targets, grant,
                  src, key_jit, scene_extent: float):
    """Write source copies into target slots. Shared by relocate() and grow().

    exact_relocation=True (default): targets become EXACT copies of their
    source (same position) and both source and targets get the binomial
    opacity/scale correction so the rendered image is preserved
    (relocation_correction). Sources are included in the changed mask —
    their Adam moments are stale for the corrected values (upstream 3dgs-mcmc
    resets optimizer state for sampled sources too).

    exact_relocation=False: the reference's heuristic placement — position
    jittered by 0.01*extent, scale/10, opacity reset to 0.01
    (mcmc_densification.cpp:113-135)."""
    nc = params["means"].shape[0]
    out = dict(params)
    out["sh"] = params["sh"].at[targets].set(params["sh"][src], mode="drop")
    out["quats"] = params["quats"].at[targets].set(params["quats"][src], mode="drop")

    if cfg.exact_relocation:
        src_used = jnp.where(grant, src, nc)
        extra = jnp.zeros((nc,), jnp.int32).at[src_used].add(1, mode="drop")
        ratio = 1 + extra
        new_op, new_sc = relocation_correction(
            opac, jnp.exp(params["log_scales"]), ratio, cfg.relocation_n_max
        )
        new_logit = jnp.log(new_op) - jnp.log1p(-new_op)
        new_logsc = jnp.log(jnp.maximum(new_sc, 1e-30))
        touched_src = living & (extra > 0)

        out["means"] = params["means"].at[targets].set(
            params["means"][src], mode="drop"
        )
        op_new = jnp.where(touched_src, new_logit, params["opacity_logits"])
        out["opacity_logits"] = op_new.at[targets].set(
            new_logit[src], mode="drop"
        )
        sc_new = jnp.where(touched_src[:, None], new_logsc, params["log_scales"])
        out["log_scales"] = sc_new.at[targets].set(new_logsc[src], mode="drop")
        changed = touched_src | jnp.zeros((nc,), bool).at[targets].set(
            True, mode="drop"
        )
    else:
        jitter = jax.random.normal(key_jit, (nc, 3)) * (0.01 * scene_extent)
        out["means"] = params["means"].at[targets].set(
            params["means"][src] + jitter, mode="drop"
        )
        out["log_scales"] = params["log_scales"].at[targets].set(
            params["log_scales"][src] - jnp.log(RELOCATE_SCALE_SHRINK),
            mode="drop",
        )
        out["opacity_logits"] = params["opacity_logits"].at[targets].set(
            RELOCATE_OPACITY, mode="drop"
        )
        changed = jnp.zeros((nc,), bool).at[targets].set(True, mode="drop")
    return out, changed


def sample_sources(key, opac, living, shape):
    """Opacity-weighted multinomial WITH replacement over living sources
    (the jittable equivalent of torch::multinomial with replacement,
    mcmc_densification.cpp:107-112), via inverse-CDF: one [Nc] cumsum +
    |shape| binary-search queries = O(Nc + k log Nc).

    Replaces gumbel-max `jax.random.categorical(logits, shape=(k,))`, whose
    (k, Nc) gumbel matrix is O(k*Nc) compute — 10^12-scale at the 1M-gaussian
    production capacity with k=Nc draws. (The searchsorted here is k queries
    at event cadence — every relocate_every steps — not the per-frame
    [P]-sized pattern docs/PERF_NOTES.md measured 35x slow.) Dead sources
    have zero-width CDF intervals and are never selected.

    The CDF is built hierarchically (1024-entry blocks, block-offset +
    within-block cumsum): a flat f32 cumsum's rounding is one ULP of the
    TOTAL mass per element — at Nc=1e6, opac~0.3 that is ~0.02 absolute,
    badly distorting interval widths near the 0.005 dead threshold. The
    two-level form keeps per-item width error at one ULP of a BLOCK's mass
    (<=1024) ~ 6e-5."""
    w = jnp.where(living, opac, 0.0).astype(jnp.float32)
    nc = w.shape[0]
    nb = min(1024, nc)
    npad = -(-nc // nb) * nb
    wpad = jnp.pad(w, (0, npad - nc)).reshape(npad // nb, nb)
    within = jnp.cumsum(wpad, axis=1)
    block_tot = within[:, -1]
    offs = jnp.cumsum(block_tot) - block_tot
    c = (within + offs[:, None]).reshape(-1)
    u = jax.random.uniform(key, shape, dtype=jnp.float32) * c[-1]
    idx = jnp.searchsorted(c, u, side="right")
    return jnp.clip(idx, 0, nc - 1).astype(jnp.int32)


def relocate(cfg: MCMCConfig, params: dict, alive: jnp.ndarray, key, scene_extent: float):
    """One relocation event; shape-stable. Returns (params, changed_mask, stats).

    Dead slots are *within the alive population* here (opacity collapsed) —
    MCMC never changes the alive mask itself.
    """
    nc = alive.shape[0]
    opac = jax.nn.sigmoid(params["opacity_logits"])
    dead = alive & (opac < cfg.dead_opacity_threshold)
    living = alive & ~dead

    n_total = jnp.sum(alive.astype(jnp.int32))
    n_dead = jnp.sum(dead.astype(jnp.int32))
    n_living = n_total - n_dead
    cap = (cfg.relocate_cap * n_total.astype(jnp.float32)).astype(jnp.int32)
    n_relocate = jnp.minimum(n_dead, cap)
    # Nothing to do if no dead or no alive sources.
    n_relocate = jnp.where((n_dead == 0) | (n_living == 0), 0, n_relocate)

    # Target list: first n_relocate dead slots (reference takes dead indices in
    # order, mcmc_densification.cpp:99-105).
    dead_order = jnp.argsort(jnp.where(dead, 0, 1), stable=True)
    grant = jnp.arange(nc) < n_relocate
    targets = jnp.where(grant, dead_order, nc)

    # Opacity-weighted multinomial sampling over living sources.
    key_src, key_jit = jax.random.split(key)
    src = sample_sources(key_src, opac, living, (nc,))  # [Nc] source ids

    out, changed = _place_copies(
        cfg, params, opac, living, targets, grant, src, key_jit, scene_extent
    )
    stats = {"num_relocated": n_relocate, "num_dead": n_dead, "num_total": n_total}
    return out, changed, stats


def grow(cfg: MCMCConfig, params: dict, alive: jnp.ndarray, key,
         scene_extent: float, max_gaussians: int = 0):
    """Add up to grow_factor*N new Gaussians into free capacity slots,
    initialized exactly like relocation targets (sampled from alive sources
    with probability proportional to opacity).

    The upstream 3dgs-mcmc grows N toward a target cap this way each event;
    the reference is strictly fixed-N (mcmc_densification.hpp:15-16). Growth
    is ON by default (grow_factor=0.05, +0.5 dB on the quality benchmark);
    set MCMCConfig.grow_factor=0 for the reference-faithful fixed-N behavior.
    Returns (params, alive, changed_mask, num_added)."""
    nc = alive.shape[0]
    opac = jax.nn.sigmoid(params["opacity_logits"])
    living = alive & (opac >= cfg.dead_opacity_threshold)
    n_alive = jnp.sum(alive.astype(jnp.int32))
    n_free = nc - n_alive
    cap = max_gaussians if max_gaussians > 0 else nc
    budget = jnp.maximum(cap - n_alive, 0)
    n_new = jnp.minimum(
        (cfg.grow_factor * n_alive.astype(jnp.float32)).astype(jnp.int32),
        jnp.minimum(n_free, budget),
    )
    n_new = jnp.where(jnp.sum(living.astype(jnp.int32)) == 0, 0, n_new)

    free_order = jnp.argsort(jnp.where(alive, 1, 0), stable=True)
    grant = jnp.arange(nc) < n_new
    targets = jnp.where(grant, free_order, nc)

    key_src, key_jit = jax.random.split(key)
    src = sample_sources(key_src, opac, living, (nc,))

    out, changed = _place_copies(
        cfg, params, opac, living, targets, grant, src, key_jit, scene_extent
    )
    written = jnp.zeros((nc,), bool).at[targets].set(True, mode="drop")
    return out, alive | written, changed | written, n_new
