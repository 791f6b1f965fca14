"""Offline viewer: render camera trajectories to image files.

An interactive CUDA-GL window (reference: src/viewer/viewer.cpp) makes no sense
on a headless TPU pod; the TPU-native equivalents are (a) this offline
trajectory renderer and (b) the interactive web viewer (tpugs.viewer.server)
that streams JPEG frames over HTTP. All three of the reference's render modes
are kept: RGB, depth (1 - final_T opacity proxy with turbo colormap), and
contributor-count heatmap (reference: viewer.hpp:26-30, viewer.cpp:647-670).
"""
from __future__ import annotations

import os
from typing import Iterable

import jax
import jax.numpy as jnp
import numpy as np
from PIL import Image

from tpugs.core.camera import CameraInfo
from tpugs.ops.render import RasterConfig, render

# Polynomial fit of the Turbo colormap (Google AI blog, 2019) — cheap, no LUT.
_TURBO_COEFFS = np.array(
    [
        [0.13572138, 4.61539260, -42.66032258, 132.13108234, -152.94239396, 59.28637943],
        [0.09140261, 2.19418839, 4.84296658, -14.18503333, 4.27729857, 2.82956604],
        [0.10667330, 12.64194608, -60.58204836, 110.36276771, -89.90310912, 27.34824973],
    ]
)


def turbo_colormap(x: np.ndarray) -> np.ndarray:
    """x in [0,1] -> rgb [.., 3]."""
    x = np.clip(x, 0.0, 1.0)
    powers = np.stack([np.ones_like(x), x, x**2, x**3, x**4, x**5], axis=-1)
    rgb = powers @ _TURBO_COEFFS.T
    return np.clip(rgb, 0.0, 1.0)


def _stderr_log(msg: str):
    import sys

    print(f"[tpugs.viewer] {msg}", file=sys.stderr)


class OfflineRenderer:
    """Forward-only renderer with the Trainer's overflow honesty: the pair
    list and per-tile hit count are fixed at jit time, so an undersized
    capacity silently truncates the image — here every frame's
    pair_overflow/hit_overflow flags are checked and the renderer either
    auto-grows + re-jits ("grow", default — the forward analogue of the
    reference's exact realloc, src/rasterizer/sorting.cu:82-109) or warns
    loudly ("warn"), never renders silently wrong.

    tile defaults to 32 (the tuned train/eval default; 16 renders ~2.2x more
    pairs)."""

    def __init__(self, params: dict, sh_degree: int = -1,
                 tile: int = 32, pair_capacity: int = 1 << 21,
                 max_hits: int = 2048, on_overflow: str = "grow",
                 log=None, presort: str = "fastest",
                 reanchor_deg: float = 0.25, reanchor_shift_frac: float = 0.01,
                 reanchor_frames: int = 0):
        self.params = {k: jnp.asarray(v) for k, v in params.items()}
        n = self.params["means"].shape[0]
        self.alive = jnp.ones((n,), bool)
        self.max_sh_degree = int(round(self.params["sh"].shape[-1] ** 0.5)) - 1
        self.sh_degree = (
            self.max_sh_degree if sh_degree < 0
            else min(sh_degree, self.max_sh_degree)
        )
        self.tile = tile
        self.pair_capacity = pair_capacity
        self.max_hits = max_hits
        if on_overflow not in ("grow", "warn", "error"):
            raise ValueError(f"unknown on_overflow policy {on_overflow!r}")
        self.on_overflow = on_overflow
        # "fastest": exact presort below N=2^18, quantized single-u32 pair
        # key above (BOUNDED same-bin depth reorder at ~22 bits — invisible
        # for display; r4 A/B 63.7 vs 68.9 ms at 1080p/1M). Pass "auto" for
        # fully exact rendering (eval paths always use exact modes).
        self.presort = presort
        self.log = log if log is not None else _stderr_log
        self._render_jit = {}
        self._warned = set()
        # Frame-coherent cached path (ops/render_cached.py): re-anchor when
        # the camera rotated > reanchor_deg degrees or its center moved
        # > reanchor_shift_frac of its distance-to-target since the anchor
        # (or after reanchor_frames cached frames; 0 = no frame limit).
        # Default 0.25 deg from the r5 drift ladder (scripts/
        # quantify_cached_drift.py, docs/PERF_NOTES.md): the dominant error
        # is ANCHOR TILE MEMBERSHIP going stale, which kicks in at screen
        # shifts of ~half a tile — 0.25 deg ~= 7 px at the 1080p bench
        # geometry holds >=35 dB vs exact, 0.5 deg ~= 15 px drops to 27 dB
        # and 1 deg ~= a full 32 px tile collapses to 15 dB. Faster drags
        # simply re-anchor every frame (throughput degrades toward the
        # exact-frame rate; quality never does).
        self.reanchor_deg = reanchor_deg
        self.reanchor_shift_frac = reanchor_shift_frac
        self.reanchor_frames = reanchor_frames
        self._cache_jit = {}
        self._icache = None  # {"key", "cache", "vm", "intr", "age"}

    def _get_render(self, h: int, w: int, sh_degree: int):
        key = (h, w, sh_degree)
        if key not in self._render_jit:
            cfg = RasterConfig(
                img_h=h, img_w=w, tile_h=self.tile, tile_w=self.tile,
                pair_capacity=self.pair_capacity, max_hits_per_tile=self.max_hits,
            )
            p = self.params
            alive = self.alive

            @jax.jit
            def fn(viewmat, intr, bg):
                # Forward-only: skip the reduce metadata (iota sort payload +
                # interval math) that only the backward's segment-sum
                # reduction consumes (ops.render need_grads contract), and
                # gather attrs instead of carrying them through the sort
                # (payload columns lose at viewer pair counts, r4 A/B).
                out = render(
                    p["means"], p["quats"], p["log_scales"], p["opacity_logits"],
                    p["sh"], alive, viewmat, intr, cfg, sh_degree, bg,
                    presort=self.presort, need_grads=False, carry_attrs=False,
                )
                return (out.color, out.final_T, out.n_contrib, out.num_pairs,
                        out.pair_overflow, out.max_tile_hits, out.hit_overflow)

            self._render_jit[key] = fn
        return self._render_jit[key]

    def _handle_overflow(self, h, w, num_pairs, pair_of, tile_hits, hit_of):
        """Returns True if capacities grew (caller should re-render)."""
        msg = (
            f"render {w}x{h} OVERFLOW: pairs {num_pairs}/{self.pair_capacity}"
            f", busiest tile {tile_hits}/{self.max_hits} "
            f"(back-most pairs dropped — image truncated)"
        )
        if self.on_overflow == "error":
            raise RuntimeError(msg)
        new_pairs, new_hits = self.pair_capacity, self.max_hits
        if self.on_overflow == "grow":
            if pair_of:
                new_pairs = max(new_pairs, -(-int(1.3 * num_pairs) // 512) * 512)
            if hit_of:
                new_hits = max(new_hits, -(-int(1.2 * tile_hits) // 128) * 128)
        if (new_pairs, new_hits) == (self.pair_capacity, self.max_hits):
            if (h, w) not in self._warned:
                self._warned.add((h, w))
                self.log(msg)
            return False
        self.log(
            msg + f" -> growing pair_capacity {self.pair_capacity}->"
            f"{new_pairs}, max_hits {self.max_hits}->{new_hits} (re-jit)"
        )
        self.pair_capacity, self.max_hits = new_pairs, new_hits
        self._render_jit.clear()  # capacities are shared across resolutions
        self._cache_jit.clear()
        self._icache = None  # cached aligned layout sized for old capacities
        return True

    def render_arrays(self, h: int, w: int, viewmat, intr, background,
                      sh_degree: int = -1):
        """Overflow-checked render -> (color, final_T, n_contrib) jnp arrays.

        sh_degree >= 0 overrides the default evaluation degree for this frame
        (the reference viewer's SH slider, viewer.cpp:751-764); capped at the
        model's stored degree."""
        deg = self.sh_degree if sh_degree < 0 else min(
            sh_degree, self.max_sh_degree
        )
        for _ in range(8):  # growth converges: capacities only increase
            fn = self._get_render(h, w, deg)
            color, final_t, n_contrib, num_pairs, pair_of, tile_hits, hit_of \
                = fn(viewmat, intr, background)
            if not (bool(pair_of) or bool(hit_of)):
                break
            if not self._handle_overflow(
                h, w, int(num_pairs), bool(pair_of), int(tile_hits),
                bool(hit_of),
            ):
                break
        return color, final_t, n_contrib

    def _get_cache_fns(self, h: int, w: int, sh_degree: int):
        """Jitted (build_frame_cache, render_cached) pair per resolution/SH
        degree. Shares the exact path's capacities (grown together)."""
        from tpugs.ops.render_cached import build_frame_cache, render_cached

        key = (h, w, sh_degree)
        if key not in self._cache_jit:
            cfg = RasterConfig(
                img_h=h, img_w=w, tile_h=self.tile, tile_w=self.tile,
                pair_capacity=self.pair_capacity,
                max_hits_per_tile=self.max_hits,
            )
            p = self.params
            alive = self.alive

            @jax.jit
            def build(viewmat, intr):
                return build_frame_cache(
                    p["means"], p["quats"], p["log_scales"],
                    p["opacity_logits"], p["sh"], alive, viewmat, intr,
                    cfg, sh_degree,
                )

            @jax.jit
            def draw(cache, viewmat, intr, bg):
                return render_cached(cache, viewmat, intr, cfg, bg)

            self._cache_jit[key] = (build, draw)
        return self._cache_jit[key]

    def _needs_reanchor(self, state, vm: np.ndarray, intr: np.ndarray) -> bool:
        if not np.array_equal(state["intr"], intr):
            return True  # FOV slider moved: footprints/binning changed
        if self.reanchor_frames and state["age"] >= self.reanchor_frames:
            return True
        a, b = state["vm"], vm
        ra, rb = a[:3, :3], b[:3, :3]
        cos = np.clip((np.trace(ra.T @ rb) - 1.0) * 0.5, -1.0, 1.0)
        if np.degrees(np.arccos(cos)) > self.reanchor_deg:
            return True
        ca, cb = -ra.T @ a[:3, 3], -rb.T @ b[:3, 3]
        return bool(
            np.linalg.norm(ca - cb)
            > self.reanchor_shift_frac * (np.linalg.norm(ca) + 1e-9)
        )

    def render_interactive(self, h: int, w: int, viewmat, intr, background,
                           sh_degree: int = -1):
        """Frame-coherent fast path for continuous camera motion -> (color,
        final_T) jnp arrays.

        Renders through ops/render_cached.py: the (tile, gaussian) pair list
        is built once at an ANCHOR camera and reused while the camera stays
        within the re-anchor thresholds; each frame re-projects every pair
        exactly for the current camera and runs only the compositor kernel —
        39.4 FPS cached / 31.6 amortized (re-anchor every 8) vs 17.7 exact
        at 1080p/1M (scripts/bench_render_cached.py, 32x32 tiles).
        Bounded approximation (anchor tile membership / compositing order /
        SH view direction — module docstring); display-only, never used by
        eval or training."""
        deg = self.sh_degree if sh_degree < 0 else min(
            sh_degree, self.max_sh_degree
        )
        key = (h, w, deg)
        vm = np.asarray(viewmat, np.float32)
        intr_np = np.asarray(intr, np.float32)
        bg = jnp.asarray(background, jnp.float32)
        st = self._icache
        if (st is None or st["key"] != key
                or self._needs_reanchor(st, vm, intr_np)):
            for _ in range(8):  # overflow growth converges (only increases)
                build, _ = self._get_cache_fns(h, w, deg)
                cache = build(jnp.asarray(vm), jnp.asarray(intr_np))
                hit_of = int(cache.max_tile_hits) > self.max_hits
                if not (bool(cache.pair_overflow) or hit_of):
                    break
                if not self._handle_overflow(
                    h, w, int(cache.num_pairs), bool(cache.pair_overflow),
                    int(cache.max_tile_hits), hit_of,
                ):
                    break
            st = {"key": key, "cache": cache, "vm": vm, "intr": intr_np,
                  "age": 0}
            self._icache = st
        _, draw = self._get_cache_fns(h, w, deg)
        color, final_t = draw(st["cache"], jnp.asarray(vm),
                              jnp.asarray(intr_np), bg)
        st["age"] += 1
        return color, final_t

    def render_camera(self, cam: CameraInfo, mode: str = "rgb",
                      background=(0.0, 0.0, 0.0),
                      sh_degree: int = -1) -> np.ndarray:
        color, final_t, n_contrib = self.render_arrays(
            cam.height, cam.width,
            jnp.asarray(cam.world_to_camera(), jnp.float32),
            jnp.asarray(cam.intrinsics_array()),
            jnp.asarray(background, jnp.float32),
            sh_degree=sh_degree,
        )
        if mode == "rgb":
            return np.clip(np.asarray(color), 0.0, 1.0)
        if mode == "depth":  # opacity proxy: 1 - final transmittance
            return turbo_colormap(1.0 - np.asarray(final_t))
        if mode == "heatmap":
            nc = np.asarray(n_contrib, np.float32)
            return turbo_colormap(nc / max(nc.max(), 1.0))
        raise ValueError(f"unknown mode {mode}")

    def render_trajectory(self, cameras: Iterable[CameraInfo], out_dir: str,
                          mode: str = "rgb", background=(0.0, 0.0, 0.0)) -> list:
        os.makedirs(out_dir, exist_ok=True)
        paths = []
        for i, cam in enumerate(cameras):
            img = self.render_camera(cam, mode, background)
            path = os.path.join(out_dir, f"frame_{i:04d}.png")
            Image.fromarray((img * 255).astype(np.uint8)).save(path)
            paths.append(path)
        return paths
