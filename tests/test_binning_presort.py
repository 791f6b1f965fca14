"""Depth-presorted single-key binning (binning.presort_by_depth +
bin_gaussians(presorted=True)) must be BIT-IDENTICAL to the direct
(tile, depth) 2-key path — including equal-depth tie-breaks (both resolve to
original index order) and the >32-bit id fallback — through binning segments,
the rendered image, and every gradient.
"""
import functools

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import tpugs.ops.binning as binning_mod
from tpugs.ops.binning import bin_gaussians, presort_by_depth
from tpugs.ops.projection import ProjectionOutput
from tpugs.ops.render import render
from tpugs.ops.rasterize_tiled import RasterConfig

W, H, TILE = 96, 64, 16
CAP = 8192


def _proj(n=300, seed=0, with_ties=True):
    rng = np.random.default_rng(seed)
    means2d = rng.uniform(-10, [W + 10, H + 10], (n, 2)).astype(np.float32)
    depths = rng.uniform(0.5, 20, n).astype(np.float32)
    if with_ties:
        depths[50:60] = depths[40]  # exact-tie block spanning random tiles
    conic = np.abs(rng.normal(0.1, 0.05, (n, 3))).astype(np.float32)
    conic[:, 1] *= 0.1
    visible = rng.uniform(0, 1, n) > 0.1
    radii = np.where(visible, rng.integers(1, 25, n), 0).astype(np.int32)
    return ProjectionOutput(
        means2d=jnp.asarray(means2d),
        depths=jnp.asarray(depths),
        conic=jnp.asarray(conic),
        radii=jnp.asarray(radii),
        rgb=jnp.asarray(rng.uniform(0, 1, (n, 3)).astype(np.float32)),
        opac=jnp.asarray(rng.uniform(0.05, 0.95, n).astype(np.float32)),
        visible=jnp.asarray(visible),
    )


def _segments_match(b_ref, b_new, perm):
    """Per-tile segment contents (in original gaussian ids) must be equal."""
    np.testing.assert_array_equal(
        np.asarray(b_ref.tile_start), np.asarray(b_new.tile_start)
    )
    np.testing.assert_array_equal(
        np.asarray(b_ref.tile_stop), np.asarray(b_new.tile_stop)
    )
    g_new_orig = np.asarray(perm)[np.asarray(b_new.pair_gauss)]
    g_ref = np.asarray(b_ref.pair_gauss)
    ts, te = np.asarray(b_ref.tile_start), np.asarray(b_ref.tile_stop)
    for t in range(ts.shape[0]):
        np.testing.assert_array_equal(
            g_ref[ts[t]:te[t]], g_new_orig[ts[t]:te[t]], err_msg=f"tile {t}"
        )


class TestPresortedBinning:
    def test_segment_parity_with_ties(self):
        proj = _proj()
        b_ref = bin_gaussians(proj, W, H, TILE, TILE, CAP)
        perm, proj_p = presort_by_depth(proj)
        b_new = bin_gaussians(proj_p, W, H, TILE, TILE, CAP, presorted=True)
        assert int(b_ref.num_pairs) == int(b_new.num_pairs)
        _segments_match(b_ref, b_new, perm)

    def test_u32_unfit_fallback_parity(self, monkeypatch):
        """When tile + gaussian ids exceed 32 bits the 2-array int sort must
        produce the same segments."""
        proj = _proj(seed=3)
        b_ref = bin_gaussians(proj, W, H, TILE, TILE, CAP)
        perm, proj_p = presort_by_depth(proj)
        monkeypatch.setattr(binning_mod, "_packed_key_shift", lambda *a: None)
        b_fb = bin_gaussians(proj_p, W, H, TILE, TILE, CAP, presorted=True)
        _segments_match(b_ref, b_fb, perm)

    def test_packed_key_shift_budget(self):
        assert binning_mod._packed_key_shift(1 << 20, 2040) == 20
        # 4096 tiles x 2^20 ids = 2^32 > u32 max -> unfit
        assert binning_mod._packed_key_shift(1 << 20, 1 << 12) is None
        assert binning_mod._packed_key_shift(1, 1) == 1


class TestPresortedRender:
    @pytest.fixture(scope="class")
    def scene(self):
        rng = np.random.default_rng(1)
        n = 200
        means = rng.normal(0, 1.2, (n, 3)).astype(np.float32)
        means[:, 2] += 4
        alive = np.ones(n, bool)
        alive[::17] = False
        return dict(
            n=n,
            means=jnp.asarray(means),
            quats=jnp.asarray(rng.normal(0, 1, (n, 4)).astype(np.float32)),
            log_scales=jnp.asarray(
                rng.uniform(-3.2, -1.8, (n, 3)).astype(np.float32)
            ),
            opac=jnp.asarray(rng.normal(0, 1.5, n).astype(np.float32)),
            sh=jnp.asarray(rng.normal(0, 0.3, (n, 3, 4)).astype(np.float32)),
            alive=jnp.asarray(alive),
            kw=dict(
                viewmat=jnp.eye(4),
                intrinsics=jnp.asarray([60.0, 60.0, 48.0, 32.0]),
                cfg=RasterConfig(
                    img_h=H, img_w=W, tile_h=TILE, tile_w=TILE,
                    pair_capacity=CAP, max_hits_per_tile=256,
                ),
                sh_degree=1,
                background=jnp.zeros(3),
                compositor="scan",
            ),
        )

    def test_forward_bit_identical(self, scene):
        s = scene
        a = render(s["means"], s["quats"], s["log_scales"], s["opac"],
                   s["sh"], s["alive"], **s["kw"], presort=True)
        b = render(s["means"], s["quats"], s["log_scales"], s["opac"],
                   s["sh"], s["alive"], **s["kw"], presort=False)
        np.testing.assert_array_equal(np.asarray(a.color), np.asarray(b.color))
        np.testing.assert_array_equal(
            np.asarray(a.final_T), np.asarray(b.final_T)
        )
        np.testing.assert_array_equal(
            np.asarray(a.n_contrib), np.asarray(b.n_contrib)
        )
        assert int(a.num_pairs) == int(b.num_pairs)

    def test_gradient_parity_including_probe(self, scene):
        s = scene

        def loss(presort, m, q, sc, o, shc, probe):
            out = render(m, q, sc, o, shc, s["alive"],
                         means2d_probe=probe, **s["kw"], presort=presort)
            return jnp.sum(out.color ** 2) + jnp.sum(out.final_T)

        probe = jnp.zeros((s["n"], 2), jnp.float32)
        args = (s["means"], s["quats"], s["log_scales"], s["opac"], s["sh"],
                probe)
        ga = jax.grad(functools.partial(loss, True), argnums=tuple(range(6)))(
            *args
        )
        gb = jax.grad(functools.partial(loss, False), argnums=tuple(range(6)))(
            *args
        )
        for a, b, name in zip(
            ga, gb, ["means", "quats", "log_scales", "opac", "sh", "probe"]
        ):
            np.testing.assert_allclose(
                np.asarray(a), np.asarray(b), rtol=1e-6, atol=1e-7,
                err_msg=name,
            )


class TestFastPresort:
    """Quantized single-u32 presort (quant_bits > 0): bit-identical to the
    exact presort when every visible depth lands in a distinct bin; stable
    index tie-break inside a bin; invisible gaussians sort to the back."""

    def test_distinct_bins_bit_identical(self):
        # Depths on a coarse grid so 12-bit bins are injective over them.
        proj = _proj(with_ties=False)
        nlevels = 64
        q = jnp.round(
            (proj.depths - 0.5) / 19.5 * (nlevels - 1)
        ) / (nlevels - 1) * 19.5 + 0.5
        proj = proj.replace(depths=q)
        perm_e, pe = presort_by_depth(proj)
        perm_f, pf = presort_by_depth(proj, quant_bits=12)
        np.testing.assert_array_equal(np.asarray(perm_e), np.asarray(perm_f))
        for a, b in zip(jax.tree.leaves(pe), jax.tree.leaves(pf)):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    def test_ties_break_by_index_and_invisible_last(self):
        proj = _proj(with_ties=True)
        _, pf = presort_by_depth(proj, quant_bits=12)
        d = np.asarray(jnp.where(pf.visible, pf.depths, np.inf))
        nvis = int(np.asarray(proj.visible).sum())
        # visible block first, then invisible
        assert np.all(np.isfinite(d[:nvis])) and np.all(~np.isfinite(d[nvis:]))
        # quantized order: depths non-decreasing up to one bin width
        binw = (d[:nvis].max() - d[:nvis].min()) / (2**12 - 2)
        assert np.all(np.diff(d[:nvis]) > -binw - 1e-6)

    def test_fast_render_close_to_exact(self):
        # Random depths (ties within bins reorder) — the image must stay
        # within a loose tolerance of the exact path (bounded reorder error).
        rng = np.random.default_rng(7)
        n = 300
        means = rng.normal(0, 1.2, (n, 3)).astype(np.float32)
        means[:, 2] += 4
        kw = dict(
            viewmat=jnp.eye(4),
            intrinsics=jnp.asarray([60.0, 60.0, 48.0, 32.0]),
            cfg=RasterConfig(img_h=H, img_w=W, tile_h=TILE, tile_w=TILE,
                             pair_capacity=CAP, max_hits_per_tile=256),
            sh_degree=1,
            background=jnp.zeros(3),
            compositor="scan",
        )
        args = (jnp.asarray(means),
                jnp.asarray(rng.normal(0, 1, (n, 4)).astype(np.float32)),
                jnp.asarray(rng.uniform(-3.2, -1.8, (n, 3)).astype(np.float32)),
                jnp.asarray(rng.normal(0, 1.5, n).astype(np.float32)),
                jnp.asarray(rng.normal(0, 0.3, (n, 3, 4)).astype(np.float32)),
                jnp.ones(n, bool))
        a = render(*args, **kw, presort="exact")
        b = render(*args, **kw, presort="fast")
        assert int(a.num_pairs) == int(b.num_pairs)
        np.testing.assert_allclose(
            np.asarray(a.color), np.asarray(b.color), atol=0.05
        )
