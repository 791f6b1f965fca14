"""ViewerServer request handling: SH-degree + FOV controls (reference viewer
parity, viewer.cpp:751-820), render modes, and half-res drag snapping — all
through render_jpeg without a live HTTP socket.
"""
import io

import numpy as np
import pytest
from PIL import Image


def _params(n=64, seed=0):
    rng = np.random.default_rng(seed)
    means = rng.normal(0, 1.0, (n, 3)).astype(np.float32)
    return {
        "means": means,
        "quats": rng.normal(0, 1, (n, 4)).astype(np.float32),
        "log_scales": rng.uniform(-2.5, -1.5, (n, 3)).astype(np.float32),
        "opacity_logits": rng.normal(1.0, 0.5, n).astype(np.float32),
        "sh": rng.normal(0, 0.3, (n, 3, 9)).astype(np.float32),  # degree 2
    }


@pytest.fixture(scope="module")
def server():
    from tpugs.viewer.server import ViewerServer

    return ViewerServer(_params(), width=64, height=64, tile=16,
                        pair_capacity=4096, max_hits=256)


def _decode(jpg):
    return np.asarray(Image.open(io.BytesIO(jpg)))


class TestViewerControls:
    def test_info_reports_max_sh_degree(self, server):
        assert server.renderer.max_sh_degree == 2

    def test_sh_degree_changes_image(self, server):
        base = _decode(server.render_jpeg({"sh": 2}))
        deg0 = _decode(server.render_jpeg({"sh": 0}))
        assert base.shape == deg0.shape
        assert not np.array_equal(base, deg0), (
            "SH degree 0 vs 2 must change view-dependent color"
        )
        # Over-asking is capped at the model's stored degree.
        deg9 = _decode(server.render_jpeg({"sh": 9}))
        np.testing.assert_array_equal(base, deg9)

    def test_fov_changes_image(self, server):
        narrow = _decode(server.render_jpeg({"fov": 30}))
        wide = _decode(server.render_jpeg({"fov": 110}))
        assert not np.array_equal(narrow, wide)
        # Out-of-range FOV is clamped, not an error.
        server.render_jpeg({"fov": 1.0})
        server.render_jpeg({"fov": 400.0})

    def test_modes_and_halfres(self, server):
        rgb = _decode(server.render_jpeg({"mode": "rgb"}))
        depth = _decode(server.render_jpeg({"mode": "depth"}))
        heat = _decode(server.render_jpeg({"mode": "heatmap"}))
        assert rgb.shape == depth.shape == heat.shape == (64, 64, 3)
        low = _decode(server.render_jpeg({"scale": 2}))
        assert low.shape == (32, 32, 3)

    def test_drag_frames_use_cached_path(self, server):
        """scale != 1 rgb requests route through render_interactive (the
        frame-coherent cached path) and track the exact render closely."""
        server.renderer._icache = None
        drag = _decode(server.render_jpeg({"scale": 2, "azimuth": 0.1}))
        assert server.renderer._icache is not None  # cached path was taken
        assert drag.shape == (32, 32, 3)
        # A nearby drag frame (0.002 rad = 0.11 deg < the 0.25 deg
        # re-anchor threshold) reuses the anchor.
        st = server.renderer._icache
        drag2 = _decode(server.render_jpeg({"scale": 2, "azimuth": 0.102}))
        assert server.renderer._icache is st
        assert not np.array_equal(drag, drag2)  # camera delta is rendered
        # Depth/heatmap and full-res requests stay on the exact path.
        age = st["age"]
        server.render_jpeg({"scale": 2, "mode": "depth", "azimuth": 0.102})
        server.render_jpeg({"azimuth": 0.102})
        assert server.renderer._icache["age"] == age
