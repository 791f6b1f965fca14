"""Pallas pair-expansion kernel (ops/pallas/expand.py +
binning.bin_gaussians_expand_kernel) must reproduce the XLA expansion's
sorted segments BIT-IDENTICALLY — same per-tile contents in the same
(depth, original-index) order — including overflow truncation, invisible
gaussians, clamped rects, and the corner cull. Interpret mode on CPU."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tpugs.ops.binning import (
    bin_gaussians,
    bin_gaussians_expand_kernel,
    clamp_tile_segments,
)
from tpugs.ops.pallas.expand import GC, expand_capacity
from tpugs.ops.projection import ProjectionOutput
from tpugs.ops.rasterize_tiled import RasterConfig
from tpugs.ops.render import render

W, H, TILE = 96, 64, 16
CAP = 8192


def _proj(n=300, seed=0, big_rects=False):
    rng = np.random.default_rng(seed)
    means2d = rng.uniform(-10, [W + 10, H + 10], (n, 2)).astype(np.float32)
    depths = rng.uniform(0.5, 20, n).astype(np.float32)
    depths[50:60] = depths[40]  # exact ties
    conic = np.abs(rng.normal(0.1, 0.05, (n, 3))).astype(np.float32)
    conic[:, 1] *= 0.1
    visible = rng.uniform(0, 1, n) > 0.1
    hi = 80 if big_rects else 25
    radii = np.where(visible, rng.integers(1, hi, n), 0).astype(np.int32)
    return ProjectionOutput(
        means2d=jnp.asarray(means2d),
        depths=jnp.asarray(depths),
        conic=jnp.asarray(conic),
        radii=jnp.asarray(radii),
        rgb=jnp.asarray(rng.uniform(0, 1, (n, 3)).astype(np.float32)),
        opac=jnp.asarray(rng.uniform(0.05, 0.95, n).astype(np.float32)),
        visible=jnp.asarray(visible),
    )


def _assert_segments_equal(b_ref, b_new):
    ts_r, te_r = np.asarray(b_ref.tile_start), np.asarray(b_ref.tile_stop)
    ts_n, te_n = np.asarray(b_new.tile_start), np.asarray(b_new.tile_stop)
    np.testing.assert_array_equal(te_r - ts_r, te_n - ts_n)
    g_r, g_n = np.asarray(b_ref.pair_gauss), np.asarray(b_new.pair_gauss)
    for t in range(ts_r.shape[0]):
        np.testing.assert_array_equal(
            g_r[ts_r[t]:te_r[t]], g_n[ts_n[t]:te_n[t]], err_msg=f"tile {t}"
        )
    assert int(b_ref.num_pairs) == int(b_new.num_pairs)
    assert bool(b_ref.overflow) == bool(b_new.overflow)


class TestExpandKernelParity:
    @pytest.mark.parametrize("seed", [0, 3])
    def test_segments_bit_identical(self, seed):
        proj = _proj(seed=seed)
        b_ref = bin_gaussians(proj, W, H, TILE, TILE, CAP)
        b_new = bin_gaussians_expand_kernel(
            proj, W, H, TILE, TILE, CAP, interpret=True
        )
        assert b_new.pair_gauss.shape[0] == expand_capacity(
            CAP, -(-proj.depths.shape[0] // GC) * GC
        )
        _assert_segments_equal(b_ref, b_new)

    def test_big_rects_many_blocks(self):
        # Radii up to 80 px -> rects spanning many tiles; chunk output spans
        # exceed one OB block, exercising the multi-block DMA loop.
        proj = _proj(seed=5, big_rects=True)
        b_ref = bin_gaussians(proj, W, H, TILE, TILE, 1 << 15)
        b_new = bin_gaussians_expand_kernel(
            proj, W, H, TILE, TILE, 1 << 15, interpret=True
        )
        _assert_segments_equal(b_ref, b_new)

    def test_overflow_truncation_matches(self):
        proj = _proj(seed=7, big_rects=True)
        cap = 1024  # far below the true pair count
        b_ref = bin_gaussians(proj, W, H, TILE, TILE, cap)
        b_new = bin_gaussians_expand_kernel(
            proj, W, H, TILE, TILE, cap, interpret=True
        )
        assert bool(b_new.overflow)
        _assert_segments_equal(b_ref, b_new)

    def test_all_invisible(self):
        proj = _proj(seed=1)
        proj = proj.replace(visible=jnp.zeros_like(proj.visible))
        b_new = bin_gaussians_expand_kernel(
            proj, W, H, TILE, TILE, CAP, interpret=True
        )
        assert int(b_new.num_pairs) == 0
        np.testing.assert_array_equal(
            np.asarray(b_new.tile_start), np.asarray(b_new.tile_stop)
        )

    def test_clamped_segments_match(self):
        proj = _proj(seed=2, big_rects=True)
        b_ref, mh_ref = clamp_tile_segments(
            bin_gaussians(proj, W, H, TILE, TILE, 1 << 15), 64
        )
        b_new, mh_new = clamp_tile_segments(
            bin_gaussians_expand_kernel(
                proj, W, H, TILE, TILE, 1 << 15, interpret=True
            ),
            64,
        )
        assert int(mh_ref) == int(mh_new)
        _assert_segments_equal(b_ref, b_new)


class TestExpandKernelRender:
    def test_render_parity_vs_scan(self):
        """compositor='pallas' + presort=False routes binning through the
        expand kernel (interpret on CPU); the image must match the scan
        reference path bit-for-bit."""
        rng = np.random.default_rng(11)
        n = 400
        means = rng.normal(0, 1.2, (n, 3)).astype(np.float32)
        means[:, 2] += 4
        kw = dict(
            viewmat=jnp.eye(4),
            intrinsics=jnp.asarray([60.0, 60.0, 48.0, 32.0]),
            cfg=RasterConfig(img_h=H, img_w=W, tile_h=TILE, tile_w=TILE,
                             pair_capacity=CAP, max_hits_per_tile=256),
            sh_degree=1,
            background=jnp.asarray([0.1, 0.2, 0.3]),
        )
        args = (jnp.asarray(means),
                jnp.asarray(rng.normal(0, 1, (n, 4)).astype(np.float32)),
                jnp.asarray(rng.uniform(-3.2, -1.8, (n, 3)).astype(np.float32)),
                jnp.asarray(rng.normal(0, 1.5, n).astype(np.float32)),
                jnp.asarray(rng.normal(0, 0.3, (n, 3, 4)).astype(np.float32)),
                jnp.ones(n, bool))
        a = render(*args, **kw, compositor="scan", presort=False)
        b = render(*args, **kw, compositor="pallas", presort=False)
        np.testing.assert_allclose(
            np.asarray(a.color), np.asarray(b.color), rtol=2e-6, atol=2e-6
        )
        np.testing.assert_allclose(
            np.asarray(a.final_T), np.asarray(b.final_T), rtol=2e-6, atol=2e-6
        )
        assert int(a.num_pairs) == int(b.num_pairs)

    def test_gradients_flow(self):
        """jax.grad through the expand-kernel path (stop_gradient inside the
        binning plumbing; gradients flow via the compositor) must match the
        XLA-binning pallas path exactly."""
        rng = np.random.default_rng(13)
        n = 200
        means = rng.normal(0, 1.2, (n, 3)).astype(np.float32)
        means[:, 2] += 4
        kw = dict(
            viewmat=jnp.eye(4),
            intrinsics=jnp.asarray([60.0, 60.0, 48.0, 32.0]),
            cfg=RasterConfig(img_h=H, img_w=W, tile_h=TILE, tile_w=TILE,
                             pair_capacity=CAP, max_hits_per_tile=256),
            sh_degree=1,
            background=jnp.zeros(3),
        )
        args = (jnp.asarray(means),
                jnp.asarray(rng.normal(0, 1, (n, 4)).astype(np.float32)),
                jnp.asarray(rng.uniform(-3.2, -1.8, (n, 3)).astype(np.float32)),
                jnp.asarray(rng.normal(0, 1.5, n).astype(np.float32)),
                jnp.asarray(rng.normal(0, 0.3, (n, 3, 4)).astype(np.float32)))
        alive = jnp.ones(n, bool)

        def loss(compositor, m, q, s, o, sh):
            out = render(m, q, s, o, sh, alive, **kw,
                         compositor=compositor, presort=False)
            return jnp.sum(out.color ** 2)

        import functools
        ga = jax.grad(functools.partial(loss, "pallas"),
                      argnums=(0, 1, 2, 3, 4))(*args)
        gb = jax.grad(functools.partial(loss, "scan"),
                      argnums=(0, 1, 2, 3, 4))(*args)
        for a, b, name in zip(ga, gb, ["means", "quats", "ls", "op", "sh"]):
            # pallas vs scan differ by f32 accumulation order only.
            np.testing.assert_allclose(
                np.asarray(a), np.asarray(b), rtol=5e-5, atol=5e-6,
                err_msg=name,
            )


class TestExpandKernelPresorted:
    """presorted=True: single packed u32 key built from the kernel's
    tile/gid rows must give the same segments as the XLA presorted path —
    including the >32-bit fallback."""

    def test_segments_bit_identical(self):
        from tpugs.ops.binning import presort_by_depth

        proj = _proj(seed=4)
        _, proj_p = presort_by_depth(proj)
        b_ref = bin_gaussians(proj_p, W, H, TILE, TILE, CAP, presorted=True)
        b_new = bin_gaussians_expand_kernel(
            proj_p, W, H, TILE, TILE, CAP, interpret=True, presorted=True
        )
        _assert_segments_equal(b_ref, b_new)

    def test_u32_unfit_fallback(self, monkeypatch):
        import tpugs.ops.binning as binning_mod
        from tpugs.ops.binning import presort_by_depth

        proj = _proj(seed=6)
        _, proj_p = presort_by_depth(proj)
        b_ref = bin_gaussians(proj_p, W, H, TILE, TILE, CAP, presorted=True)
        monkeypatch.setattr(binning_mod, "_packed_key_shift", lambda *a: None)
        b_new = bin_gaussians_expand_kernel(
            proj_p, W, H, TILE, TILE, CAP, interpret=True, presorted=True
        )
        _assert_segments_equal(b_ref, b_new)

    def test_render_presorted_kernel_parity(self):
        rng = np.random.default_rng(17)
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
        )
        args = (jnp.asarray(means),
                jnp.asarray(rng.normal(0, 1, (n, 4)).astype(np.float32)),
                jnp.asarray(rng.uniform(-3.2, -1.8, (n, 3)).astype(np.float32)),
                jnp.asarray(rng.normal(0, 1.5, n).astype(np.float32)),
                jnp.asarray(rng.normal(0, 0.3, (n, 3, 4)).astype(np.float32)),
                jnp.ones(n, bool))
        a = render(*args, **kw, compositor="scan", presort="exact")
        b = render(*args, **kw, compositor="pallas", presort="exact")
        np.testing.assert_allclose(
            np.asarray(a.color), np.asarray(b.color), rtol=2e-6, atol=2e-6
        )
        assert int(a.num_pairs) == int(b.num_pairs)


class TestExpandKernelSlice:
    """Slice mode (num_tile_rows > 0, tile_row_lo possibly traced): the
    tile-sharded distribution path. Segments must be bit-identical to
    bin_gaussians' slice path, with LOCAL tile ids."""

    @pytest.mark.parametrize("presorted", [False, True])
    @pytest.mark.parametrize("row_lo,rows", [(0, 2), (1, 2), (2, 2), (3, 1)])
    def test_slice_segments_bit_identical(self, presorted, row_lo, rows):
        from tpugs.ops.binning import presort_by_depth

        proj = _proj(seed=10)
        if presorted:
            _, proj = presort_by_depth(proj)
        b_ref = bin_gaussians(
            proj, W, H, TILE, TILE, CAP, presorted=presorted,
            tile_row_lo=row_lo, num_tile_rows=rows,
        )
        b_new = bin_gaussians_expand_kernel(
            proj, W, H, TILE, TILE, CAP, interpret=True,
            presorted=presorted, tile_row_lo=row_lo, num_tile_rows=rows,
        )
        _assert_segments_equal(b_ref, b_new)

    def test_slice_traced_row_lo(self):
        proj = _proj(seed=12)
        b_ref = bin_gaussians(
            proj, W, H, TILE, TILE, CAP, tile_row_lo=2, num_tile_rows=2
        )

        @jax.jit
        def run(lo):
            return bin_gaussians_expand_kernel(
                proj, W, H, TILE, TILE, CAP, interpret=True,
                tile_row_lo=lo, num_tile_rows=2,
            )

        b_new = run(jnp.asarray(2, jnp.int32))
        _assert_segments_equal(b_ref, b_new)

    def test_slice_carry_attrs(self):
        from tpugs.ops.pallas import pack

        proj = _proj(seed=13)
        b = bin_gaussians_expand_kernel(
            proj, W, H, TILE, TILE, CAP, interpret=True, carry_attrs=True,
            tile_row_lo=1, num_tile_rows=2,
        )
        p_out = b.pair_gauss.shape[0]
        expected = pack.pack_compact_attrs(
            b.pair_gauss, proj.means2d, proj.conic, proj.rgb, proj.opac,
            p_out + pack.CHUNK + pack.LANE_ALIGN,
        )[:11, :p_out]
        ts, te = np.asarray(b.tile_start), np.asarray(b.tile_stop)
        got, exp = np.asarray(b.attr_c), np.asarray(expected)
        for t in range(ts.shape[0]):
            np.testing.assert_array_equal(
                got[:, ts[t]:te[t]], exp[:, ts[t]:te[t]], err_msg=f"tile {t}"
            )


class TestQuantKey:
    """quant_key_bits > 0: single-u32 (tile << bits | depth_bin) unstable
    sort. With all depths in distinct bins the segments must be bit-identical
    to the exact 2-key path up to same-bin order — here depths are made
    distinct, so order is fully pinned."""

    def _proj_distinct(self, n=300, seed=21):
        p = _proj(n=n, seed=seed)
        rng = np.random.default_rng(99)
        d = np.linspace(0.5, 20.0, n).astype(np.float32)
        rng.shuffle(d)
        return p.replace(depths=jnp.asarray(d))

    def test_segments_match_exact(self):
        proj = self._proj_distinct()
        b_ref = bin_gaussians_expand_kernel(
            proj, W, H, TILE, TILE, CAP, interpret=True
        )
        b_new = bin_gaussians_expand_kernel(
            proj, W, H, TILE, TILE, CAP, interpret=True, quant_key_bits=32
        )
        ts, te = np.asarray(b_ref.tile_start), np.asarray(b_ref.tile_stop)
        tsn, ten = np.asarray(b_new.tile_start), np.asarray(b_new.tile_stop)
        np.testing.assert_array_equal(te - ts, ten - tsn)
        g_r, g_n = np.asarray(b_ref.pair_gauss), np.asarray(b_new.pair_gauss)
        for t in range(ts.shape[0]):
            np.testing.assert_array_equal(
                g_r[ts[t]:te[t]], g_n[tsn[t]:ten[t]], err_msg=f"tile {t}"
            )

    def test_render_qkey_matches(self):
        rng = np.random.default_rng(23)
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
        )
        args = (jnp.asarray(means),
                jnp.asarray(rng.normal(0, 1, (n, 4)).astype(np.float32)),
                jnp.asarray(rng.uniform(-3.2, -1.8, (n, 3)).astype(np.float32)),
                jnp.asarray(rng.normal(0, 1.5, n).astype(np.float32)),
                jnp.asarray(rng.normal(0, 0.3, (n, 3, 4)).astype(np.float32)),
                jnp.ones(n, bool))
        a = render(*args, **kw, compositor="pallas", presort=False)
        b = render(*args, **kw, compositor="pallas", presort="qkey")
        # Random continuous depths: distinct bins at 22+ effective bits with
        # overwhelming probability -> identical composite.
        np.testing.assert_allclose(
            np.asarray(a.color), np.asarray(b.color), rtol=2e-6, atol=2e-6
        )
        assert int(a.num_pairs) == int(b.num_pairs)


class TestCarryAttrs:
    """carry_attrs=True: the expand kernel's streamed attribute rows, after
    riding the pair sort as payload, must be BIT-IDENTICAL within every tile
    segment to pack.pack_compact_attrs gathered from the same pair_gauss
    (the contract three docstrings claim — pinned directly here, not just
    via render parity at rtol 2e-6)."""

    @pytest.mark.parametrize("presorted", [False, True])
    def test_attr_c_bit_identical_to_pack(self, presorted):
        from tpugs.ops.binning import presort_by_depth
        from tpugs.ops.pallas import pack

        proj = _proj(seed=8)
        if presorted:
            _, proj = presort_by_depth(proj)
        b = bin_gaussians_expand_kernel(
            proj, W, H, TILE, TILE, CAP, interpret=True,
            presorted=presorted, carry_attrs=True,
        )
        assert b.attr_c is not None and b.attr_c.shape[0] == 11
        p_out = b.pair_gauss.shape[0]
        expected = pack.pack_compact_attrs(
            b.pair_gauss, proj.means2d, proj.conic, proj.rgb, proj.opac,
            p_out + pack.CHUNK + pack.LANE_ALIGN,
        )[:11, :p_out]
        got = np.asarray(b.attr_c)
        exp = np.asarray(expected)
        ts, te = np.asarray(b.tile_start), np.asarray(b.tile_stop)
        for t in range(ts.shape[0]):
            np.testing.assert_array_equal(
                got[:, ts[t]:te[t]], exp[:, ts[t]:te[t]], err_msg=f"tile {t}"
            )
        # Validity row: exactly the real (non-sentinel) slots.
        num_tiles = -(-W // TILE) * -(-H // TILE)
        np.testing.assert_array_equal(
            got[10] > 0.5, np.asarray(b.pair_tile) < num_tiles
        )


class TestNeedGradsWiring:
    """render(need_grads=False) must emit NO reduction metadata, and the
    forward-only callers must actually pass it (ops/render.py:81-85 was a
    documented-but-unwired contract in round 3)."""

    def test_reduce_meta_off(self):
        proj = _proj(seed=9)
        b = bin_gaussians_expand_kernel(
            proj, W, H, TILE, TILE, CAP, interpret=True, reduce_meta=False
        )
        assert b.exp_slot is None and b.red_start is None
        b2 = bin_gaussians_expand_kernel(
            proj, W, H, TILE, TILE, CAP, interpret=True, reduce_meta=True
        )
        assert b2.exp_slot is not None and b2.red_start is not None

    def test_render_forwards_need_grads(self, monkeypatch):
        import tpugs.ops.binning as binning_mod

        seen = {}
        orig = binning_mod.bin_gaussians_expand_kernel

        def spy(*a, **kw):
            seen.update(kw)
            return orig(*a, **kw)

        monkeypatch.setattr(binning_mod, "bin_gaussians_expand_kernel", spy)
        rng = np.random.default_rng(3)
        n = 50
        means = rng.normal(0, 1.0, (n, 3)).astype(np.float32)
        means[:, 2] += 4
        cfg = RasterConfig(img_h=H, img_w=W, tile_h=TILE, tile_w=TILE,
                           pair_capacity=CAP, max_hits_per_tile=256)
        out = render(
            jnp.asarray(means),
            jnp.asarray(rng.normal(0, 1, (n, 4)).astype(np.float32)),
            jnp.full((n, 3), -2.5, jnp.float32),
            jnp.zeros((n,), jnp.float32),
            jnp.zeros((n, 3, 1), jnp.float32),
            jnp.ones(n, bool), jnp.eye(4),
            jnp.asarray([60.0, 60.0, 48.0, 32.0]), cfg, 0, jnp.zeros(3),
            compositor="pallas", presort=False, need_grads=False,
        )
        assert seen.get("reduce_meta") is False
        assert out.color.shape == (H, W, 3)

    def test_offline_renderer_is_forward_only(self, monkeypatch):
        import tpugs.viewer.offline as offline_mod
        from tpugs.ops.render import render as real_render
        from tpugs.viewer.offline import OfflineRenderer

        seen = {}

        def spy(*a, **kw):
            seen.update(kw)
            return real_render(*a, **kw)

        monkeypatch.setattr(offline_mod, "render", spy)
        rng = np.random.default_rng(5)
        n = 40
        means = rng.normal(0, 1.0, (n, 3)).astype(np.float32)
        means[:, 2] += 4
        params = dict(
            means=means,
            quats=rng.normal(0, 1, (n, 4)).astype(np.float32),
            log_scales=np.full((n, 3), -2.5, np.float32),
            opacity_logits=np.zeros((n,), np.float32),
            sh=np.zeros((n, 3, 1), np.float32),
        )
        r = OfflineRenderer(params, tile=16, pair_capacity=4096, max_hits=256)
        color, _, _ = r.render_arrays(
            32, 48, jnp.eye(4), jnp.asarray([60.0, 60.0, 24.0, 16.0]),
            jnp.zeros(3),
        )
        assert seen.get("need_grads") is False
        assert color.shape == (32, 48, 3)
