"""Kernel-hardening checks (SURVEY.md §5.2, the CUDA_SYNC_CHECK analogue):
poisoned compositor inputs must trip a named checkify assertion — on both
backends, with Pallas in interpret mode — instead of producing silent
garbage."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.experimental.checkify import JaxRuntimeError

from tpugs.ops.binning import bin_gaussians
from tpugs.ops.projection import project_gaussians
from tpugs.ops.rasterize_tiled import RasterConfig
from tpugs.utils.checks import checked_composite
from tpugs.utils.synthetic import synthetic_intrinsics, synthetic_params

W, H = 64, 48
CFG = RasterConfig(img_h=H, img_w=W, tile_h=16, tile_w=16,
                   pair_capacity=1 << 12, max_hits_per_tile=128)
N = 32


@pytest.fixture(scope="module")
def inputs():
    params = synthetic_params(N, seed=0, sh_coeffs=1)
    alive = jnp.ones((N,), bool)
    proj = project_gaussians(
        params["means"], params["quats"], params["log_scales"],
        params["opacity_logits"], params["sh"], alive,
        jnp.eye(4), synthetic_intrinsics(W, H), W, H, 0,
    )
    b = bin_gaussians(proj, W, H, 16, 16, CFG.pair_capacity)
    return dict(
        tile_start=b.tile_start, tile_stop=b.tile_stop,
        pair_gauss=b.pair_gauss, means2d=proj.means2d, conic=proj.conic,
        rgb=proj.rgb, opac=proj.opac, background=jnp.zeros((3,)),
    )


def _run(inputs, compositor="scan", **poison):
    args = dict(inputs)
    args.update(poison)
    return checked_composite(
        CFG, args["tile_start"], args["tile_stop"], args["pair_gauss"],
        args["means2d"], args["conic"], args["rgb"], args["opac"],
        args["background"], compositor=compositor,
    )


class TestCheckedComposite:
    def test_clean_inputs_pass(self, inputs):
        color, final_t, _ = _run(inputs)
        assert np.isfinite(np.asarray(color)).all()

    def test_nan_means_trips(self, inputs):
        bad = inputs["means2d"].at[3, 0].set(jnp.nan)
        with pytest.raises(JaxRuntimeError, match="non-finite means2d"):
            _run(inputs, means2d=bad)

    def test_nan_conic_trips(self, inputs):
        bad = inputs["conic"].at[0, 1].set(jnp.inf)
        with pytest.raises(JaxRuntimeError, match="non-finite conic"):
            _run(inputs, conic=bad)

    def test_oob_pair_index_trips(self, inputs):
        bad = inputs["pair_gauss"].at[0].set(N + 7)
        with pytest.raises(JaxRuntimeError, match="index out of bounds"):
            _run(inputs, pair_gauss=bad)

    def test_inverted_segment_trips(self, inputs):
        bad = inputs["tile_start"].at[0].set(inputs["tile_stop"][0] + 5)
        with pytest.raises(JaxRuntimeError, match="stop < start"):
            _run(inputs, tile_start=bad)

    def test_opacity_range_trips(self, inputs):
        bad = inputs["opac"].at[2].set(1.5)
        with pytest.raises(JaxRuntimeError, match="opacity outside"):
            _run(inputs, opac=bad)

    def test_pallas_interpret_trips(self, inputs):
        """The same checks guard the Pallas kernels (interpret mode on CPU)."""
        bad = inputs["rgb"].at[1, 2].set(jnp.nan)
        with pytest.raises(JaxRuntimeError, match="non-finite rgb"):
            _run(inputs, compositor="pallas", rgb=bad)

    def test_pallas_clean_pass(self, inputs):
        color_p, _, _ = _run(inputs, compositor="pallas")
        color_s, _, _ = _run(inputs, compositor="scan")
        np.testing.assert_allclose(
            np.asarray(color_p), np.asarray(color_s), atol=1e-5
        )
