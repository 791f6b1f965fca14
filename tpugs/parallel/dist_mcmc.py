"""Globally-faithful MCMC densification events under a gaussian-sharded mesh.

The shard-local sampler this replaces (round 2) drew relocation/growth
sources from each shard's LOCAL opacity distribution — whenever opacity mass
is unevenly sharded (it always is: splats cluster spatially), the realized
source distribution diverged from the opacity-weighted global multinomial
the single-device path samples (reference semantics:
src/optimizer/mcmc_densification.cpp:99-112, torch::multinomial over all
alive opacities).

Exact global semantics with bounded collectives (all over the "gauss" axis):

  1. shard-mass histogram: psum/all_gather each shard's living opacity mass
     -> [g] masses. For each granted target slot, its owner draws a SOURCE
     SHARD ~ categorical(masses) — the correct marginal over shards.
  2. candidate pools: every shard s draws C i.i.d. samples from its local
     opacity categorical for every destination shard i (independent keys per
     (s, i)); the all_gathered count matrix says how many of each pool were
     actually consumed, so shard s knows the realized per-source copy counts
     (the binomial `ratio` of the exact-relocation correction) without a
     second round-trip.
  3. one all_to_all ships the (correction-applied) source attribute rows;
     each destination writes its targets as exact copies, target j consuming
     the rank(j)-th candidate of its chosen shard's pool.

Composing (1) i.i.d. within-shard draws with (2) shard choice proportional
to shard mass IS the global multinomial-with-replacement: P(source = k) =
P(shard(k)) * P(k | shard(k)) = (M_s / M) * (o_k / M_s) = o_k / M.

The candidate-pool capacity C is the static worst case — every granted
target in one shard choosing the same source shard — so nothing is ever
dropped: C = min(nc_local, ceil(frac * g * nc_local)) where frac bounds the
global grant (relocate_cap / grow_factor). The event runs every
relocate_every=100 steps, so the pool all_to_all (C * attrs floats per
(src,dst) pair) is off the hot path.

Target granting is also global: the global grant n = min(global dead,
relocate_cap * global N) is allocated to shards in global slot order
(exclusive cumsum of per-shard dead counts), matching the single-device
"first n dead slots in order" semantics (densify_mcmc.relocate).
"""
from __future__ import annotations

import math

import jax
import jax.numpy as jnp

from tpugs.optim.densify_mcmc import (
    MCMCConfig,
    RELOCATE_OPACITY,
    RELOCATE_SCALE_SHRINK,
    relocation_correction,
    sample_sources,
)


def candidate_capacity(nc_local: int, g: int, frac: float) -> int:
    """Static per-(src,dst) candidate-pool size covering the worst case (all
    of one shard's grant drawn from a single source shard)."""
    return max(1, min(nc_local, int(math.ceil(frac * g * nc_local))))


def _global_place(cfg: MCMCConfig, params: dict, living, opac, slot_order,
                  grant, key, g: int, frac: float, scene_extent: float,
                  axis: str):
    """Copy globally-sampled sources into this shard's granted target slots.

    living/opac: local [nc]; slot_order: local target slot ids (first
    sum(grant) entries are the granted targets); grant: [nc] bool prefix
    mask. Returns (params, changed_mask)."""
    nc = living.shape[0]
    my = jax.lax.axis_index(axis)
    C = candidate_capacity(nc, g, frac)

    # (1) destination side: source-shard choice per target ~ shard masses.
    mass_loc = jnp.sum(jnp.where(living, opac, 0.0))
    masses = jax.lax.all_gather(mass_loc, axis)  # [g]
    shard_logits = jnp.where(
        masses > 0.0, jnp.log(jnp.maximum(masses, 1e-30)), -1e30
    )
    key_s = jax.random.fold_in(jax.random.fold_in(key, 1), my)
    s = jax.random.categorical(key_s, shard_logits, shape=(nc,))  # [nc]
    onehot = (s[:, None] == jnp.arange(g)[None, :]) & grant[:, None]
    cum = jnp.cumsum(onehot.astype(jnp.int32), axis=0)  # [nc, g]
    counts_my = cum[-1]  # [g] granted targets per source shard
    rank = jnp.take_along_axis(cum, s[:, None], axis=1)[:, 0] - 1  # [nc]
    cmat = jax.lax.all_gather(counts_my, axis)  # [g_dest, g_src]

    # (2) source side: candidate pools + realized copy counts. One inverse-CDF
    # multinomial draw for all g pools (densify_mcmc.sample_sources — the
    # gumbel-max categorical it replaces cost O(g*C*nc) at production nc).
    key_c = jax.random.fold_in(jax.random.fold_in(key, 2), my)
    cand = sample_sources(key_c, opac, living, (g, C))  # [g_dest, C] local ids
    used = jnp.arange(C)[None, :] < cmat[:, my][:, None]  # [g_dest, C]
    extra = jnp.zeros((nc,), jnp.int32).at[
        jnp.where(used, cand, nc)
    ].add(1, mode="drop")

    if cfg.exact_relocation:
        ratio = 1 + extra
        new_op, new_sc = relocation_correction(
            opac, jnp.exp(params["log_scales"]), ratio, cfg.relocation_n_max
        )
        new_logit = jnp.log(new_op) - jnp.log1p(-new_op)
        new_logsc = jnp.log(jnp.maximum(new_sc, 1e-30))
        touched = living & (extra > 0)
        op_col = jnp.where(touched, new_logit, params["opacity_logits"])
        sc_rows = jnp.where(touched[:, None], new_logsc, params["log_scales"])
    else:
        touched = jnp.zeros((nc,), bool)
        op_col = params["opacity_logits"]
        sc_rows = params["log_scales"]

    # (3) ship the corrected source rows; write targets as exact copies.
    sh_flat = params["sh"].reshape(nc, -1)
    k3 = sh_flat.shape[1]
    tab = jnp.concatenate(
        [params["means"], params["quats"], sh_flat, op_col[:, None], sc_rows],
        axis=1,
    )  # [nc, 11 + k3]
    send = tab[cand]  # [g_dest, C, A] — one packed row-table gather
    recv = jax.lax.all_to_all(send, axis, split_axis=0, concat_axis=0)
    flat = recv.reshape(g * C, tab.shape[1])
    take = flat[jnp.clip(s * C + rank, 0, g * C - 1)]  # [nc, A]

    targets = jnp.where(grant, slot_order, nc)
    src_means = take[:, 0:3]
    src_quats = take[:, 3:7]
    src_sh = take[:, 7:7 + k3].reshape((nc,) + params["sh"].shape[1:])
    src_op = take[:, 7 + k3]
    src_logsc = take[:, 8 + k3:11 + k3]

    out = dict(params)
    out["sh"] = params["sh"].at[targets].set(src_sh, mode="drop")
    out["quats"] = params["quats"].at[targets].set(src_quats, mode="drop")
    if cfg.exact_relocation:
        out["means"] = params["means"].at[targets].set(src_means, mode="drop")
        out["opacity_logits"] = op_col.at[targets].set(src_op, mode="drop")
        out["log_scales"] = sc_rows.at[targets].set(src_logsc, mode="drop")
    else:
        key_j = jax.random.fold_in(jax.random.fold_in(key, 3), my)
        jitter = jax.random.normal(key_j, (nc, 3)) * (0.01 * scene_extent)
        out["means"] = params["means"].at[targets].set(
            src_means + jitter, mode="drop"
        )
        out["log_scales"] = params["log_scales"].at[targets].set(
            src_logsc - jnp.log(RELOCATE_SCALE_SHRINK), mode="drop"
        )
        out["opacity_logits"] = params["opacity_logits"].at[targets].set(
            RELOCATE_OPACITY, mode="drop"
        )
    changed = touched | jnp.zeros((nc,), bool).at[targets].set(
        True, mode="drop"
    )
    return out, changed


def _shard_grant(local_count, n_global, axis):
    """Allocate a global grant to shards in global slot order: this shard's
    share = clip(n_global - (dead/free slots on earlier shards), 0, local)."""
    counts = jax.lax.all_gather(local_count, axis)  # [g]
    my = jax.lax.axis_index(axis)
    before = jnp.cumsum(counts) - counts
    return jnp.clip(n_global - before[my], 0, local_count)


def dist_relocate(cfg: MCMCConfig, params: dict, alive, key,
                  scene_extent: float, g: int, axis: str = "gauss"):
    """Sharded relocation event with globally-faithful source sampling and
    global target granting. Same contract as densify_mcmc.relocate, run
    inside shard_map over `axis`. Stats are LOCAL counts (callers psum)."""
    nc = alive.shape[0]
    opac = jax.nn.sigmoid(params["opacity_logits"])
    dead = alive & (opac < cfg.dead_opacity_threshold)
    living = alive & ~dead

    n_dead_loc = jnp.sum(dead.astype(jnp.int32))
    n_total_g = jax.lax.psum(jnp.sum(alive.astype(jnp.int32)), axis)
    n_living_g = jax.lax.psum(jnp.sum(living.astype(jnp.int32)), axis)
    n_dead_g = jax.lax.psum(n_dead_loc, axis)
    cap = (cfg.relocate_cap * n_total_g.astype(jnp.float32)).astype(jnp.int32)
    n_rel_g = jnp.minimum(n_dead_g, cap)
    n_rel_g = jnp.where((n_dead_g == 0) | (n_living_g == 0), 0, n_rel_g)

    t = _shard_grant(n_dead_loc, n_rel_g, axis)
    dead_order = jnp.argsort(jnp.where(dead, 0, 1), stable=True)
    grant = jnp.arange(nc) < t

    out, changed = _global_place(
        cfg, params, living, opac, dead_order, grant, key, g,
        cfg.relocate_cap, scene_extent, axis,
    )
    n_alive_loc = jnp.sum(alive.astype(jnp.int32))
    stats = {"num_relocated": t, "num_dead": n_dead_loc,
             "num_total": n_alive_loc}
    return out, changed, stats


def dist_grow(cfg: MCMCConfig, params: dict, alive, key,
              scene_extent: float, g: int, axis: str = "gauss"):
    """Sharded growth event (globally-faithful sources, global budget
    allocated to free slots in global order). Same contract as
    densify_mcmc.grow; returns (params, alive, changed, n_new_local)."""
    nc = alive.shape[0]
    opac = jax.nn.sigmoid(params["opacity_logits"])
    living = alive & (opac >= cfg.dead_opacity_threshold)

    n_alive_loc = jnp.sum(alive.astype(jnp.int32))
    n_free_loc = nc - n_alive_loc
    n_alive_g = jax.lax.psum(n_alive_loc, axis)
    n_free_g = jax.lax.psum(n_free_loc, axis)
    n_living_g = jax.lax.psum(jnp.sum(living.astype(jnp.int32)), axis)
    n_new_g = jnp.minimum(
        (cfg.grow_factor * n_alive_g.astype(jnp.float32)).astype(jnp.int32),
        n_free_g,
    )
    n_new_g = jnp.where(n_living_g == 0, 0, n_new_g)

    t = _shard_grant(n_free_loc, n_new_g, axis)
    free_order = jnp.argsort(jnp.where(alive, 1, 0), stable=True)
    grant = jnp.arange(nc) < t

    out, changed = _global_place(
        cfg, params, living, opac, free_order, grant, key, g,
        cfg.grow_factor, scene_extent, axis,
    )
    written = jnp.zeros((nc,), bool).at[
        jnp.where(grant, free_order, nc)
    ].set(True, mode="drop")
    return out, alive | written, changed | written, t
