"""Globally-faithful sharded MCMC sampling (parallel/dist_mcmc.py).

Pins the property the round-2 shard-local sampler violated: relocation
sources must follow the opacity-weighted GLOBAL multinomial regardless of
how opacity mass is distributed across shards (VERDICT r2 item 5). The
statistical test compares the sharded sampler's empirical source
distribution against both the analytic probabilities and the single-device
sampler's empirical distribution on the identical global state."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import PartitionSpec as P

from tpugs.optim.densify_mcmc import MCMCConfig, relocate, relocation_correction
from tpugs.parallel.dist_mcmc import dist_grow, dist_relocate
from tpugs.parallel.mesh import make_mesh

G = 8          # gauss shards
NC = 64        # global capacity
NLOC = NC // G

GSPEC = {"means": P("gauss"), "quats": P("gauss"), "log_scales": P("gauss"),
         "opacity_logits": P("gauss"), "sh": P("gauss")}


def _params(opac_by_slot: dict, dead_slots, default_logit=-20.0):
    """Global params: means[i] = (i, 0, 0) so sources are identifiable by x.
    Slots in opac_by_slot are living with the given activated opacity; slots
    in dead_slots are alive-but-dead (tiny opacity)."""
    op = np.full((NC,), default_logit, np.float32)  # not alive -> dont care
    alive = np.zeros((NC,), bool)
    for slot, o in opac_by_slot.items():
        op[slot] = np.log(o) - np.log1p(-o)
        alive[slot] = True
    for slot in dead_slots:
        op[slot] = -10.0  # sigmoid ~ 4.5e-5 < 0.005 -> dead
        alive[slot] = True
    params = {
        "means": np.stack([np.arange(NC, dtype=np.float32),
                           np.zeros(NC, np.float32),
                           np.zeros(NC, np.float32)], axis=1),
        "quats": np.tile(np.asarray([1, 0, 0, 0], np.float32), (NC, 1)),
        "log_scales": np.full((NC, 3), -2.0, np.float32),
        "opacity_logits": op,
        "sh": np.zeros((NC, 1, 3), np.float32),
    }
    return ({k: jnp.asarray(v) for k, v in params.items()},
            jnp.asarray(alive))


@pytest.fixture(scope="module")
def mesh():
    return make_mesh(axis_sizes=(1, G))


def _mapped_relocate(mesh, cfg):
    def run(params, alive, key):
        out, changed, stats = dist_relocate(cfg, params, alive, key, 1.0, G)
        n_rel = jax.lax.psum(stats["num_relocated"], "gauss")
        return out, changed, n_rel

    return jax.jit(jax.shard_map(
        run, mesh=mesh,
        in_specs=(GSPEC, P("gauss"), P()),
        out_specs=(GSPEC, P("gauss"), P()),
        check_vma=False,
    ))


class TestCrossShardRelocation:
    def test_dead_shards_relocate_from_remote_mass(self, mesh):
        """All living mass on shard 0, all dead slots on shards 4..7: the
        round-2 shard-local sampler could NEVER relocate these (no local
        sources); the global sampler must teleport them to shard-0 copies."""
        cfg = MCMCConfig(relocate_cap=1.0)
        sources = {0: 0.9, 1: 0.8, 2: 0.7}           # shard 0
        dead = list(range(32, 48))                    # shards 4 and 5
        params, alive = _params(sources, dead)
        out, changed, n_rel = _mapped_relocate(mesh, cfg)(
            params, alive, jax.random.PRNGKey(0)
        )
        assert int(n_rel) == len(dead)
        means = np.asarray(out["means"])[dead]
        assert np.all(np.isin(means[:, 0], list(sources))), means[:, 0]
        assert bool(np.all(np.asarray(changed)[dead]))

    def test_source_distribution_matches_global_multinomial(self, mesh):
        """Sources spread over different shards with unequal mass: empirical
        pick frequencies must match opacity weights (and the single-device
        sampler) within 4-sigma of the sample size."""
        cfg = MCMCConfig(relocate_cap=1.0)
        sources = {0: 0.8, 9: 0.4, 18: 0.2, 27: 0.1}  # shards 0..3
        dead = list(range(32, 56))                     # 24 targets
        params, alive = _params(sources, dead)
        probs = np.asarray(list(sources.values()))
        probs = probs / probs.sum()

        events = 60
        step = _mapped_relocate(mesh, cfg)
        picks = []
        for i in range(events):
            out, _, n_rel = step(params, alive, jax.random.PRNGKey(100 + i))
            assert int(n_rel) == len(dead)
            picks.append(np.asarray(out["means"])[dead, 0])
        picks = np.concatenate(picks)
        n = picks.size
        emp_sharded = np.asarray(
            [(picks == s).mean() for s in sources]
        )
        assert emp_sharded.sum() == pytest.approx(1.0), "non-source pick"

        # Single-device reference distribution on the same global state.
        sd_picks = []
        for i in range(events):
            sd_out, _, _ = relocate(
                cfg, {k: jnp.asarray(v) for k, v in params.items()},
                alive, jax.random.PRNGKey(500 + i), 1.0,
            )
            sd_picks.append(np.asarray(sd_out["means"])[dead, 0])
        sd_picks = np.concatenate(sd_picks)
        emp_single = np.asarray([(sd_picks == s).mean() for s in sources])

        tol = 4.0 * np.sqrt(probs * (1 - probs) / n)
        np.testing.assert_allclose(emp_sharded, probs, atol=tol.max())
        np.testing.assert_allclose(emp_single, probs, atol=tol.max())
        np.testing.assert_allclose(emp_sharded, emp_single,
                                   atol=2 * tol.max())

    def test_exact_correction_applied_globally(self, mesh):
        """A source copied n times across REMOTE shards must get the same
        binomial opacity correction as the single-device exact relocation:
        o' = 1 - (1-o)^(1/(n+1)) on source and all copies."""
        cfg = MCMCConfig(relocate_cap=1.0)
        src_slot, src_op = 5, 0.9
        dead = list(range(16, 28))
        params, alive = _params({src_slot: src_op}, dead)
        out, _, n_rel = _mapped_relocate(mesh, cfg)(
            params, alive, jax.random.PRNGKey(7)
        )
        n_copies = int(n_rel)  # single source -> all targets copy it
        assert n_copies == len(dead)
        exp_op, _ = relocation_correction(
            jnp.asarray([src_op]), jnp.full((1, 3), 0.1),
            jnp.asarray([1 + n_copies]),
        )
        got = np.asarray(jax.nn.sigmoid(out["opacity_logits"]))
        np.testing.assert_allclose(got[src_slot], exp_op[0], rtol=1e-5)
        np.testing.assert_allclose(got[dead], float(exp_op[0]), rtol=1e-5)

    def test_global_grant_respects_cap_in_slot_order(self, mesh):
        """relocate_cap limits the GLOBAL grant; granted targets are the
        first dead slots in global order (reference takes dead indices in
        order, mcmc_densification.cpp:99-105)."""
        cfg = MCMCConfig(relocate_cap=0.1)  # 0.1 * 28 alive = 2 grants
        sources = {0: 0.9}
        dead = list(range(8, 35))  # 27 dead across shards 1..4
        params, alive = _params(sources, dead)
        out, changed, n_rel = _mapped_relocate(mesh, cfg)(
            params, alive, jax.random.PRNGKey(3)
        )
        assert int(n_rel) == 2
        ch = np.asarray(changed)
        assert bool(np.all(ch[[8, 9]])), "first dead slots must be granted"
        assert not np.any(ch[10:35]), "only the granted prefix may change"
        assert ch[0], "the copied source gets the exact-relocation correction"


class TestDistGrow:
    @staticmethod
    def _mapped_grow(mesh, cfg):
        def run(params, alive, key):
            out, alive2, changed, t = dist_grow(
                cfg, params, alive, key, 1.0, G
            )
            return out, alive2, jax.lax.psum(t, "gauss")

        return jax.jit(jax.shard_map(
            run, mesh=mesh,
            in_specs=(GSPEC, P("gauss"), P()),
            out_specs=(GSPEC, P("gauss"), P()),
            check_vma=False,
        ))

    def test_grow_budget_and_sources_global(self, mesh):
        sources = {3: 0.9, 12: 0.6}  # shards 0 and 1
        params, alive = _params(sources, [])

        _, _, n_new = self._mapped_grow(mesh, MCMCConfig(grow_factor=0.25))(
            params, alive, jax.random.PRNGKey(11)
        )
        assert int(n_new) == 0  # int(0.25 * 2 alive) = 0

        out, alive2, n_new = self._mapped_grow(
            mesh, MCMCConfig(grow_factor=3.0)
        )(params, alive, jax.random.PRNGKey(12))
        alive2 = np.asarray(alive2)
        assert int(n_new) == 6
        assert alive2.sum() == 8
        new_slots = np.nonzero(alive2 & ~np.asarray(alive))[0]
        # Growth fills the first free slots in global order.
        np.testing.assert_array_equal(new_slots, [0, 1, 2, 4, 5, 6])
        means = np.asarray(out["means"])[new_slots, 0]
        assert np.all(np.isin(means, [3, 12])), means
