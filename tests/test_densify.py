"""Densification tests (mirrors reference tests/test_densification.cpp and
test_mcmc.cpp) — schedule boundaries, clone/split/prune triggers on hand-built
models, MCMC invariants."""
import jax
import jax.numpy as jnp
import numpy as np

from tpugs.optim.adam import adam_init
from tpugs.optim.densify_adc import (
    ADCConfig,
    ADCState,
    adc_accumulate,
    adc_densify,
    adc_init,
    reset_opacity,
    RESET_OPACITY,
)
from tpugs.optim.densify_mcmc import (
    MCMCConfig,
    inject_noise,
    noise_scale,
    regularization,
    relocate,
)

EXTENT = 10.0


def hand_model(nc=16, n=8):
    """Capacity-16 model with 8 alive Gaussians."""
    rng = np.random.default_rng(0)
    params = {
        "means": jnp.asarray(rng.normal(size=(nc, 3)).astype(np.float32)),
        "quats": jnp.tile(jnp.array([1.0, 0, 0, 0], jnp.float32), (nc, 1)),
        "log_scales": jnp.log(jnp.full((nc, 3), 0.01)),  # small => clone-eligible
        "opacity_logits": jnp.full((nc,), 2.0),
        "sh": jnp.zeros((nc, 3, 1)),
    }
    alive = jnp.arange(nc) < n
    return params, alive


class TestSchedule:
    def test_densify_window(self):
        cfg = ADCConfig()
        assert not cfg.should_densify(499)
        assert cfg.should_densify(500)
        assert not cfg.should_densify(550)
        assert cfg.should_densify(600)
        assert cfg.should_densify(15000)
        assert not cfg.should_densify(15100)

    def test_opacity_reset_schedule(self):
        cfg = ADCConfig()
        assert not cfg.should_reset_opacity(0)
        assert cfg.should_reset_opacity(3000)
        assert cfg.should_reset_opacity(6000)
        assert not cfg.should_reset_opacity(3001)
        assert not cfg.should_reset_opacity(15001 + 2999)  # past densify_until

    def test_final_reset_skipped_by_default(self):
        """A reset landing at densify_until leaves no densify events to
        recover the near-transparent model (measured 13 dB crater,
        docs/PERF_NOTES.md) — skipped unless skip_final_reset=False."""
        cfg = ADCConfig()
        assert cfg.should_reset_opacity(12000)
        assert not cfg.should_reset_opacity(15000)  # == densify_until
        ref = ADCConfig(skip_final_reset=False)
        assert ref.should_reset_opacity(15000)  # reference schedule
        # A non-multiple densify_until keeps every full-period reset.
        cfg2 = ADCConfig(densify_until=16000)
        assert cfg2.should_reset_opacity(12000)
        assert not cfg2.should_reset_opacity(15000)  # only 1000 steps left


class TestADC:
    def _adc_with_grads(self, nc, grads, counts=None, radii=None):
        adc = adc_init(nc)
        return ADCState(
            grad_accum=jnp.asarray(grads, jnp.float32),
            grad_count=jnp.asarray(
                counts if counts is not None else np.ones(nc), jnp.float32
            ),
            max_radii=jnp.asarray(
                radii if radii is not None else np.zeros(nc), jnp.float32
            ),
        )

    def test_accumulate_only_visible(self):
        adc = adc_init(4)
        d2d = jnp.array([[3.0, 4.0], [1.0, 0.0], [5.0, 12.0], [8.0, 6.0]])
        radii = jnp.array([2, 0, 1, 0])
        adc = adc_accumulate(adc, d2d, radii)
        np.testing.assert_allclose(np.asarray(adc.grad_accum), [5.0, 0.0, 13.0, 0.0])
        np.testing.assert_allclose(np.asarray(adc.grad_count), [1, 0, 1, 0])
        np.testing.assert_allclose(np.asarray(adc.max_radii), [2, 0, 1, 0])

    def test_clone_high_grad_small(self):
        params, alive = hand_model()
        nc = 16
        grads = np.zeros(nc)
        grads[2] = 1.0  # only gaussian 2 has high grad; all scales small
        adc = self._adc_with_grads(nc, grads)
        key = jax.random.PRNGKey(0)
        p2, alive2, changed, _, stats = adc_densify(
            ADCConfig(), params, alive, adc, key, EXTENT, size_pruning_active=False
        )
        assert int(stats["num_cloned"]) == 1
        assert int(stats["num_split"]) == 0
        assert int(jnp.sum(alive2)) == 9  # 8 + 1 clone
        # The clone landed in a previously-dead slot with identical params.
        new_slots = np.asarray(alive2 & ~alive)
        assert new_slots.sum() == 1
        j = int(np.nonzero(new_slots)[0][0])
        np.testing.assert_allclose(np.asarray(p2["means"][j]), np.asarray(params["means"][2]))

    def test_split_high_grad_large(self):
        params, alive = hand_model()
        params["log_scales"] = params["log_scales"].at[3].set(jnp.log(0.5))  # large
        nc = 16
        grads = np.zeros(nc)
        grads[3] = 1.0
        adc = self._adc_with_grads(nc, grads)
        p2, alive2, changed, _, stats = adc_densify(
            ADCConfig(), params, alive, adc, jax.random.PRNGKey(1), EXTENT, False
        )
        assert int(stats["num_split"]) == 1
        assert int(jnp.sum(alive2)) == 9  # 8 - 1 parent + 2 children
        # Parent slot now holds child 1 with reduced scale.
        np.testing.assert_allclose(
            np.asarray(p2["log_scales"][3]),
            np.log(0.5) - np.log(1.6),
            rtol=1e-4,
        )

    def test_prune_low_opacity(self):
        params, alive = hand_model()
        params["opacity_logits"] = params["opacity_logits"].at[1].set(-10.0)
        adc = adc_init(16)
        p2, alive2, changed, _, stats = adc_densify(
            ADCConfig(), params, alive, adc, jax.random.PRNGKey(2), EXTENT, False
        )
        assert int(stats["num_pruned"]) == 1
        assert not bool(alive2[1])
        assert int(jnp.sum(alive2)) == 7

    def test_size_prune_gated(self):
        params, alive = hand_model()
        adc_state = adc_init(16)
        adc_state = adc_state.replace(
            max_radii=adc_state.max_radii.at[0].set(100.0)  # huge on screen
        )
        # Before first opacity reset: size pruning off -> survives.
        _, alive_a, _, _, _ = adc_densify(
            ADCConfig(), params, alive, adc_state, jax.random.PRNGKey(3), EXTENT, False
        )
        assert bool(alive_a[0])
        # After: pruned.
        _, alive_b, _, _, _ = adc_densify(
            ADCConfig(), params, alive, adc_state, jax.random.PRNGKey(3), EXTENT, True
        )
        assert not bool(alive_b[0])

    def test_capacity_budget_respected(self):
        params, alive = hand_model(nc=8, n=8)  # full capacity
        grads = np.ones(8)  # everyone wants to clone
        adc = self._adc_with_grads(8, grads)
        p2, alive2, _, _, stats = adc_densify(
            ADCConfig(), params, alive, adc, jax.random.PRNGKey(4), EXTENT, False
        )
        assert int(stats["num_cloned"]) == 0  # no free slots
        assert int(jnp.sum(alive2)) == 8

    def test_reset_opacity_value(self):
        params, _ = hand_model()
        p2 = reset_opacity(params)
        np.testing.assert_allclose(np.asarray(p2["opacity_logits"]), RESET_OPACITY)
        assert abs(1.0 / (1.0 + np.exp(-RESET_OPACITY)) - 0.01) < 1e-6


class TestMCMC:
    def test_constant_n(self):
        params, alive = hand_model()
        params["opacity_logits"] = params["opacity_logits"].at[0].set(-10.0)
        p2, changed, stats = relocate(
            MCMCConfig(relocate_cap=1.0, exact_relocation=False),
            params, alive, jax.random.PRNGKey(0), EXTENT
        )
        assert int(stats["num_total"]) == 8
        assert int(stats["num_dead"]) == 1
        assert int(stats["num_relocated"]) == 1
        assert bool(changed[0])
        # Relocated slot got the low-opacity logit.
        np.testing.assert_allclose(float(p2["opacity_logits"][0]), -4.5951, rtol=1e-4)

    def test_relocate_cap(self):
        params, alive = hand_model()
        # 4 dead of 8 alive; cap 25% of 8 = 2.
        for i in range(4):
            params["opacity_logits"] = params["opacity_logits"].at[i].set(-10.0)
        _, changed, stats = relocate(
            MCMCConfig(relocate_cap=0.25, exact_relocation=False),
            params, alive, jax.random.PRNGKey(1), EXTENT
        )
        assert int(stats["num_relocated"]) == 2
        assert int(np.asarray(changed).sum()) == 2

    def test_no_dead_noop(self):
        params, alive = hand_model()
        p2, changed, stats = relocate(
            MCMCConfig(), params, alive, jax.random.PRNGKey(2), EXTENT
        )
        assert int(stats["num_relocated"]) == 0
        np.testing.assert_array_equal(np.asarray(p2["means"]), np.asarray(params["means"]))

    def test_noise_gate_selectivity(self):
        """Low-opacity Gaussians get >2x the noise of high-opacity ones
        (reference: test_mcmc.cpp noise-gate test)."""
        nc = 2048
        params = {
            "means": jnp.zeros((nc, 3)),
            "quats": jnp.tile(jnp.array([1.0, 0, 0, 0]), (nc, 1)),
            # converged-size splats: below the displacement clamp, so the
            # opacity gate (not the clamp) determines the noise ratio
            "log_scales": jnp.full((nc, 3), jnp.log(0.001)),
            "opacity_logits": jnp.concatenate(
                [jnp.full((nc // 2,), -6.0), jnp.full((nc // 2,), 6.0)]
            ),
            "sh": jnp.zeros((nc, 3, 1)),
        }
        alive = jnp.ones((nc,), bool)
        p2 = inject_noise(MCMCConfig(), params, alive, jnp.asarray(15000.0),
                          jax.random.PRNGKey(3))
        disp = np.linalg.norm(np.asarray(p2["means"] - params["means"]), axis=-1)
        low = disp[: nc // 2].mean()
        high = disp[nc // 2 :].mean()
        assert low > 2.0 * max(high, 1e-12)

    def test_noise_scale_decay(self):
        """Paper semantics: noise magnitude = noise_lr * decaying xyz LR
        (5e5 * 1.6e-4 = 80 at step 0, 100x smaller by 30k). Guards against
        regressing to the reference's scene-destroying 5e5*sigma formula."""
        cfg = MCMCConfig()
        assert abs(float(noise_scale(0, cfg)) - 5e5 * 1.6e-4) < 1e-3
        assert abs(float(noise_scale(30000, cfg)) - 5e5 * 1.6e-6) < 1e-4
        assert float(noise_scale(15000, cfg)) < float(noise_scale(0, cfg))

    def test_noise_displacement_is_sane(self):
        """One injection at step 0 must not move Gaussians by more than a
        fraction of their own scale envelope (the exploded formula moved them
        by ~5e5 * sigma)."""
        params, alive = hand_model()
        p2 = inject_noise(MCMCConfig(), params, alive, jnp.asarray(0.0),
                          jax.random.PRNGKey(7))
        disp = np.linalg.norm(np.asarray(p2["means"] - params["means"]), axis=-1)
        sigma = np.exp(np.asarray(params["log_scales"])).max(axis=-1)
        assert (disp <= 100.0 * sigma**2 * 3.5).all()

    def test_regularization_value(self):
        params, alive = hand_model()
        r = float(regularization(MCMCConfig(), params, alive))
        opac = 1.0 / (1.0 + np.exp(-2.0))
        expected = 0.01 * opac + 0.01 * 0.01  # exp(log 0.01) scales
        np.testing.assert_allclose(r, expected, rtol=1e-4)

    def test_regularization_differentiable(self):
        params, alive = hand_model()
        g = jax.grad(lambda p: regularization(MCMCConfig(), p, alive))(params)
        assert np.isfinite(np.asarray(g["opacity_logits"])).all()
        assert np.abs(np.asarray(g["log_scales"])[:8]).max() > 0


class TestExactRelocation:
    """Kheradmand binomial opacity/scale correction (exact relocation):
    n overlapping copies of a Gaussian render (approximately) the same image
    as the original."""

    def test_correction_ratio_one_noop(self):
        from tpugs.optim.densify_mcmc import relocation_correction

        opac = jnp.asarray([0.1, 0.5, 0.9])
        scales = jnp.full((3, 3), 0.02)
        ratio = jnp.asarray([1, 1, 1])
        o2, s2 = relocation_correction(opac, scales, ratio)
        np.testing.assert_array_equal(np.asarray(o2), np.asarray(opac))
        np.testing.assert_array_equal(np.asarray(s2), np.asarray(scales))

    def test_correction_opacity_formula(self):
        from tpugs.optim.densify_mcmc import relocation_correction

        o = 0.8
        o2, _ = relocation_correction(
            jnp.asarray([o]), jnp.ones((1, 3)), jnp.asarray([2])
        )
        # 1 - (1-o)^(1/2)
        np.testing.assert_allclose(float(o2[0]), 1 - np.sqrt(1 - o), rtol=1e-5)

    def test_correction_n2_denominator(self):
        """n=2 closed form: denom = 2*(o' - o'^2/sqrt(2))... check scale
        against a hand-evaluated double sum."""
        from tpugs.optim.densify_mcmc import relocation_correction

        o = 0.6
        op = 1 - np.sqrt(1 - o)
        # i=1: k=0: C(0,0)*o' ; i=2: k=0: C(1,0)*o', k=1: -C(1,1)*o'^2/sqrt(2)
        denom = op + (op - op**2 / np.sqrt(2.0))
        _, s2 = relocation_correction(
            jnp.asarray([o]), jnp.ones((1, 3)), jnp.asarray([2])
        )
        np.testing.assert_allclose(float(s2[0, 0]), o / denom, rtol=1e-5)

    def test_relocate_preserves_image(self):
        """Rendering before vs after an exact relocation event must be close:
        the event teleports dead splats onto sources and the binomial
        correction makes the n overlapping copies composite to (approximately)
        the source's original contribution. The control is a NAIVE verbatim
        copy, which doubles each sampled source's contribution — the
        correction must beat it by a wide margin."""
        from tpugs.ops.render import RasterConfig, render
        from tpugs.utils.synthetic import synthetic_intrinsics, synthetic_params

        n = 48
        params = synthetic_params(n, seed=3, sh_coeffs=1)
        # Kill a third of them (dead: opacity below threshold).
        dead_idx = jnp.arange(0, n, 3)
        params["opacity_logits"] = params["opacity_logits"].at[dead_idx].set(-8.0)
        alive = jnp.ones((n,), bool)
        cfg = RasterConfig(img_h=48, img_w=64, tile_h=16, tile_w=16,
                           pair_capacity=1 << 13, max_hits_per_tile=128)
        intr = synthetic_intrinsics(64, 48)
        vm = jnp.eye(4)

        def img(p):
            return render(p["means"], p["quats"], p["log_scales"],
                          p["opacity_logits"], p["sh"], alive, vm, intr,
                          cfg, 0, jnp.zeros((3,))).color

        before = np.asarray(img(params))
        p_exact, _, stats = relocate(
            MCMCConfig(relocate_cap=1.0), params, alive,
            jax.random.PRNGKey(5), EXTENT,
        )
        assert int(stats["num_relocated"]) == len(dead_idx)

        # Control: verbatim copy of the exact-relocation sources into the
        # same target slots, no opacity/scale correction.
        p_naive = dict(params)
        tgt = np.asarray(dead_idx)
        src_of = {}
        # identify each target's source by its (exactly copied) position
        means_after = np.asarray(p_exact["means"])
        src_means = np.asarray(params["means"])
        for t in tgt:
            s = int(np.argmin(np.linalg.norm(src_means - means_after[t], axis=1)))
            src_of[t] = s
        for k in ("means", "quats", "log_scales", "opacity_logits", "sh"):
            arr = np.asarray(params[k]).copy()
            for t, s in src_of.items():
                arr[t] = np.asarray(params[k])[s]
            p_naive[k] = jnp.asarray(arr)

        err_exact = np.abs(np.asarray(img(p_exact)) - before).mean()
        err_naive = np.abs(np.asarray(img(p_naive)) - before).mean()
        assert err_exact < 0.01, err_exact
        assert err_exact < 0.35 * err_naive, (err_exact, err_naive)

    def test_relocate_sources_in_changed_mask(self):
        """Corrected sources must have their Adam moments zeroed too."""
        params, alive = hand_model()
        params["opacity_logits"] = params["opacity_logits"].at[0].set(-10.0)
        _, changed, stats = relocate(
            MCMCConfig(relocate_cap=1.0), params, alive,
            jax.random.PRNGKey(0), EXTENT,
        )
        assert int(stats["num_relocated"]) == 1
        # target slot 0 plus at least one source
        assert bool(changed[0])
        assert int(np.asarray(changed).sum()) >= 2

    def test_grow_exact_preserves_alive_invariants(self):
        from tpugs.optim.densify_mcmc import grow

        params, alive = hand_model()
        p2, alive2, changed, n_new = grow(
            MCMCConfig(grow_factor=0.5), params, alive,
            jax.random.PRNGKey(1), EXTENT,
        )
        assert int(n_new) == 4  # 50% of 8
        assert int(jnp.sum(alive2)) == 12
        # new slots are exact copies of living sources (same position).
        new_slots = np.asarray(alive2 & ~alive)
        means2 = np.asarray(p2["means"])[new_slots]
        src_means = np.asarray(params["means"][:8])
        for m in means2:
            assert np.any(np.all(np.isclose(m, src_means, atol=1e-6), axis=1))


class TestNoiseWindow:
    def test_noise_stops_after_relocation_window(self):
        params, alive = hand_model()
        cfg = MCMCConfig(relocate_until=100)
        p_in = inject_noise(cfg, params, alive, jnp.asarray(50.0),
                            jax.random.PRNGKey(3))
        p_out = inject_noise(cfg, params, alive, jnp.asarray(101.0),
                             jax.random.PRNGKey(3))
        assert np.abs(np.asarray(p_in["means"] - params["means"])).max() > 0
        np.testing.assert_array_equal(np.asarray(p_out["means"]),
                                      np.asarray(params["means"]))

    def test_noise_forever_when_disabled(self):
        params, alive = hand_model()
        cfg = MCMCConfig(relocate_until=100,
                         noise_stop_after_relocation=False)
        p_out = inject_noise(cfg, params, alive, jnp.asarray(101.0),
                             jax.random.PRNGKey(3))
        assert np.abs(np.asarray(p_out["means"] - params["means"])).max() > 0


class TestSampleSources:
    """Inverse-CDF multinomial sampler (densify_mcmc.sample_sources) — the
    O(Nc + k log Nc) replacement for the gumbel-max categorical (reference:
    torch::multinomial with replacement, mcmc_densification.cpp:107-112)."""

    def test_dead_never_selected(self):
        from tpugs.optim.densify_mcmc import sample_sources
        nc = 64
        rng = np.random.default_rng(1)
        opac = jnp.asarray(rng.uniform(0.1, 1.0, nc).astype(np.float32))
        living = jnp.asarray(rng.uniform(size=nc) < 0.5)
        idx = sample_sources(jax.random.PRNGKey(0), opac, living, (4096,))
        picked = np.unique(np.asarray(idx))
        assert np.asarray(living)[picked].all()

    def test_frequencies_match_opacity(self):
        from tpugs.optim.densify_mcmc import sample_sources
        opac = jnp.asarray([0.1, 0.2, 0.0, 0.7], jnp.float32)
        living = jnp.array([True, True, True, True])
        n = 200_000
        idx = np.asarray(sample_sources(jax.random.PRNGKey(7), opac, living, (n,)))
        freq = np.bincount(idx, minlength=4) / n
        np.testing.assert_allclose(freq, [0.1, 0.2, 0.0, 0.7], atol=0.01)

    def test_large_n_uniformity(self):
        # Two-level cumsum: at Nc >> block size, per-item interval widths must
        # stay accurate (a flat f32 cumsum distorts them by the total-mass ULP).
        from tpugs.optim.densify_mcmc import sample_sources
        nc = 300_000
        opac = jnp.full((nc,), 0.3, jnp.float32)
        living = jnp.ones((nc,), bool)
        idx = np.asarray(
            sample_sources(jax.random.PRNGKey(3), opac, living, (100_000,)))
        assert idx.min() >= 0 and idx.max() < nc
        # Uniform weights => halves get ~equal mass.
        lo = (idx < nc // 2).mean()
        assert 0.48 < lo < 0.52

    def test_multidim_shape(self):
        from tpugs.optim.densify_mcmc import sample_sources
        opac = jnp.asarray([0.5, 0.5], jnp.float32)
        living = jnp.array([True, True])
        idx = sample_sources(jax.random.PRNGKey(0), opac, living, (3, 5))
        assert idx.shape == (3, 5)
