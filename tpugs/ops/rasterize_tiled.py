"""Stage 3 — tiled front-to-back compositor with analytic custom VJP.

This is the TPU re-design of the reference's two hottest kernels
(k_rasterize_forward, reference: src/rasterizer/forward.cu:26-180, and
k_rasterize_backward, reference: src/rasterizer/backward.cu:40-232).

The CUDA design is 256 threads = 256 pixels per 16x16 tile, each thread
sequentially walking the tile's depth-sorted Gaussian list from shared-memory
batches. The TPU design transposes that: the *pixels of a tile* are the vector
lanes (a tile is tile_h x tile_w pixels, flattened to a VPU-shaped vector) and
the depth-sorted Gaussian list is walked sequentially by a `lax.scan`, all
tiles advancing in lockstep. Early termination becomes masked continuation
(per-pixel transmittance gate), exactly preserving the reference semantics:

- skip entry if power > 0;
- alpha = min(opac * exp(power), 0.99); skip if alpha < 1/255;
- a pixel composites while its pre-update transmittance >= 1/255;
- color = sum(alpha_i T_i rgb_i) + T_final * background.

The backward pass replaces the CUDA atomicAdd pixel->gaussian scatter
(reference: backward.cu:214-228) with a reverse scan that reconstructs
transmittance from final_T (the suffix-sum S_after trick, backward.cu:161-173,
collapsed here to a scalar per pixel by dotting with the incoming color
cotangent) followed by a deterministic XLA scatter-add over gaussian ids.

This jnp/scan implementation is the semantics-defining one; the Pallas kernels
in tpugs/ops/pallas/ implement the same contract for speed and are tested
against it.
"""
from __future__ import annotations

import dataclasses
import functools

import jax
import jax.numpy as jnp
import numpy as np

ALPHA_CLAMP = 0.99
ALPHA_MIN = 1.0 / 255.0
T_THRESHOLD = 1.0 / 255.0


@dataclasses.dataclass(frozen=True)
class RasterConfig:
    """Static rasterization geometry (hashable: used as a nondiff custom_vjp arg).

    tile_w/tile_h: pixel tile size. The reference hard-codes 16x16 (256 CUDA
    threads); on TPU the flattened tile is the vector width, so 16x16=256 =
    2 VPU sublanes x 128 lanes. 32x32=1024 (8x128) is often better — it is a
    tuning knob here, not a constant.
    pair_capacity: fixed (tile, gaussian) pair list length P.
    max_hits_per_tile: K, the scan length = max Gaussians composited per tile.
    """

    img_h: int
    img_w: int
    tile_h: int = 16
    tile_w: int = 16
    pair_capacity: int = 1 << 18
    max_hits_per_tile: int = 1024

    @property
    def ntx(self) -> int:
        return -(-self.img_w // self.tile_w)

    @property
    def nty(self) -> int:
        return -(-self.img_h // self.tile_h)

    @property
    def num_tiles(self) -> int:
        return self.ntx * self.nty

    @property
    def pix(self) -> int:
        return self.tile_h * self.tile_w

    @property
    def padded_h(self) -> int:
        return self.nty * self.tile_h

    @property
    def padded_w(self) -> int:
        return self.ntx * self.tile_w


def _pixel_coords(cfg: RasterConfig, row_offset=0):
    """Per-tile flattened pixel coordinates: two [num_tiles, pix] float arrays.

    row_offset (traced int scalar): global tile-row index of tile 0 — nonzero
    only under tile-sharded distribution (parallel/tile_shard.py), where each
    device composites a slice of the tile grid but pixel coordinates must stay
    in the global image frame for bit-exact parity with single-device."""
    t = jnp.arange(cfg.num_tiles, dtype=jnp.int32)
    tx = (t % cfg.ntx)[:, None]
    ty = (t // cfg.ntx)[:, None] + row_offset
    i = jnp.arange(cfg.pix, dtype=jnp.int32)[None, :]
    px = (tx * cfg.tile_w + i % cfg.tile_w).astype(jnp.float32)
    py = (ty * cfg.tile_h + i // cfg.tile_w).astype(jnp.float32)
    return px, py


def tiles_to_image(cfg: RasterConfig, tiled: jnp.ndarray) -> jnp.ndarray:
    """[num_tiles, pix, ...] -> [padded_h, padded_w, ...]."""
    extra = tiled.shape[2:]
    x = tiled.reshape((cfg.nty, cfg.ntx, cfg.tile_h, cfg.tile_w) + extra)
    x = jnp.swapaxes(x, 1, 2)
    return x.reshape((cfg.padded_h, cfg.padded_w) + extra)


def image_to_tiles(cfg: RasterConfig, img: jnp.ndarray) -> jnp.ndarray:
    """[padded_h, padded_w, ...] -> [num_tiles, pix, ...]."""
    extra = img.shape[2:]
    x = img.reshape((cfg.nty, cfg.tile_h, cfg.ntx, cfg.tile_w) + extra)
    x = jnp.swapaxes(x, 1, 2)
    return x.reshape((cfg.num_tiles, cfg.pix) + extra)


def _gather_entry(cfg, k, tile_start, tile_stop, pair_gauss, means2d, conic, rgb, opac, px, py):
    """Gather the k-th list entry of every tile and evaluate alpha at each pixel."""
    idx = tile_start + k
    valid = idx < tile_stop  # [T]
    p = jnp.minimum(idx, pair_gauss.shape[0] - 1)
    g = pair_gauss[p]  # [T]
    xy = means2d[g]  # [T, 2]
    con = conic[g]  # [T, 3]
    col = rgb[g]  # [T, 3]
    op = opac[g]  # [T]

    dx = px - xy[:, 0:1]  # [T, pix]
    dy = py - xy[:, 1:2]
    a, b, c = con[:, 0:1], con[:, 1:2], con[:, 2:3]
    power = -0.5 * (a * dx * dx + c * dy * dy) - b * dx * dy
    gauss = jnp.exp(jnp.minimum(power, 0.0))
    alpha_raw = op[:, None] * gauss
    alpha = jnp.minimum(alpha_raw, ALPHA_CLAMP)
    passes = valid[:, None] & (power <= 0.0) & (alpha >= ALPHA_MIN)
    return g, valid, col, dx, dy, con, op, gauss, alpha_raw, alpha, passes


def _composite_fwd_impl(cfg: RasterConfig, tile_start, tile_stop, pair_gauss,
                        means2d, conic, rgb, opac, background, row_offset=0):
    px, py = _pixel_coords(cfg, row_offset)
    T0 = jnp.ones((cfg.num_tiles, cfg.pix), jnp.float32)
    C0 = jnp.zeros((cfg.num_tiles, cfg.pix, 3), jnp.float32)
    nc0 = jnp.zeros((cfg.num_tiles, cfg.pix), jnp.int32)
    klast0 = jnp.full((cfg.num_tiles, cfg.pix), -1, jnp.int32)

    def step(carry, k):
        T, C, nc, klast = carry
        g, valid, col, dx, dy, con, op, gauss, alpha_raw, alpha, passes = _gather_entry(
            cfg, k, tile_start, tile_stop, pair_gauss, means2d, conic, rgb, opac, px, py
        )
        contrib = passes & (T >= T_THRESHOLD)
        a_eff = jnp.where(contrib, alpha, 0.0)
        C = C + (a_eff * T)[..., None] * col[:, None, :]
        T = T * (1.0 - a_eff)
        nc = nc + contrib.astype(jnp.int32)
        klast = jnp.where(contrib, k, klast)
        return (T, C, nc, klast), None

    (T, C, nc, klast), _ = jax.lax.scan(
        step, (T0, C0, nc0, klast0), jnp.arange(cfg.max_hits_per_tile, dtype=jnp.int32)
    )
    color = C + T[..., None] * background[None, None, :]
    return color, T, nc, klast


def _composite_bwd_impl(cfg: RasterConfig, tile_start, tile_stop, pair_gauss,
                        means2d, conic, rgb, opac, background,
                        final_T, klast, d_color, d_finalT, row_offset=0):
    """Analytic reverse-order backward. Returns grads for
    (means2d, conic, rgb, opac, background)."""
    px, py = _pixel_coords(cfg, row_offset)
    n = means2d.shape[0]

    # Scalar suffix term per pixel: R = sum_c dC_c * S_after_c + d_finalT * T_N
    # where S_after includes the background blend (reference: backward.cu:80-87,
    # 161-173). Initialized at the back: S_after = T_N * bg.
    dC_dot_bg = jnp.einsum("tpc,c->tp", d_color, background)
    R0 = (dC_dot_bg + d_finalT) * final_T

    d_means2d0 = jnp.zeros((n, 2), jnp.float32)
    d_conic0 = jnp.zeros((n, 3), jnp.float32)
    d_rgb0 = jnp.zeros((n, 3), jnp.float32)
    d_opac0 = jnp.zeros((n,), jnp.float32)

    def step(carry, k):
        T, R, dm, dcn, drgb, dop = carry
        g, valid, col, dx, dy, con, op, gauss, alpha_raw, alpha, passes = _gather_entry(
            cfg, k, tile_start, tile_stop, pair_gauss, means2d, conic, rgb, opac, px, py
        )
        contrib = passes & (k <= klast)  # [T, pix]
        one_minus = jnp.maximum(1.0 - alpha, 1e-5)
        T_before = jnp.where(contrib, T / one_minus, T)

        w = jnp.where(contrib, alpha * T_before, 0.0)  # [T, pix]
        # dL/drgb_c = sum_pix w * dC_c
        g_rgb = jnp.einsum("tp,tpc->tc", w, d_color)

        dC_dot_rgb = jnp.einsum("tpc,tc->tp", d_color, col)  # [T, pix]
        g_alpha = jnp.where(contrib, T_before * dC_dot_rgb - R / one_minus, 0.0)

        # Suffix update AFTER using R for this entry.
        R_new = R + w * dC_dot_rgb

        # Clamp gate: zero grad to opacity/position when alpha hit 0.99
        # (reference: backward.cu:179-191).
        clamp_ok = (alpha_raw < ALPHA_CLAMP).astype(jnp.float32)
        g_op_pix = g_alpha * gauss * clamp_ok
        g_power = g_alpha * alpha * clamp_ok  # d alpha/d power = alpha (pre-clamp)

        a, b, c = con[:, 0:1], con[:, 1:2], con[:, 2:3]
        g_dx = g_power * (-(a * dx + b * dy))
        g_dy = g_power * (-(b * dx + c * dy))
        g_mean_x = -jnp.sum(g_dx, axis=1)
        g_mean_y = -jnp.sum(g_dy, axis=1)
        g_a = jnp.sum(g_power * (-0.5 * dx * dx), axis=1)
        g_b = jnp.sum(g_power * (-dx * dy), axis=1)
        g_c = jnp.sum(g_power * (-0.5 * dy * dy), axis=1)
        g_op = jnp.sum(g_op_pix, axis=1)

        # Deterministic scatter-add over gaussian ids (invalid entries -> row 0
        # with zero values). Replaces CUDA atomicAdd.
        safe_g = jnp.where(valid, g, 0)
        vf = valid.astype(jnp.float32)
        dm = dm.at[safe_g].add(
            jnp.stack([g_mean_x, g_mean_y], axis=-1) * vf[:, None]
        )
        dcn = dcn.at[safe_g].add(jnp.stack([g_a, g_b, g_c], axis=-1) * vf[:, None])
        drgb = drgb.at[safe_g].add(g_rgb * vf[:, None])
        dop = dop.at[safe_g].add(g_op * vf)

        return (T_before, R_new, dm, dcn, drgb, dop), None

    ks = jnp.arange(cfg.max_hits_per_tile - 1, -1, -1, dtype=jnp.int32)
    (T, R, dm, dcn, drgb, dop), _ = jax.lax.scan(
        step, (final_T, R0, d_means2d0, d_conic0, d_rgb0, d_opac0), ks
    )

    d_bg = jnp.einsum("tpc,tp->c", d_color, final_T)
    return dm, dcn, drgb, dop, d_bg


@functools.partial(jax.custom_vjp, nondiff_argnums=(0,))
def composite_tiles(cfg: RasterConfig, tile_start, tile_stop, pair_gauss,
                    means2d, conic, rgb, opac, background, row_offset=0):
    """Composite sorted tile lists. Returns (color [T,pix,3], final_T [T,pix],
    n_contrib [T,pix]) in tile layout — use tiles_to_image() to assemble.

    row_offset: global tile-row index of tile 0 (see _pixel_coords) — nonzero
    only on the tile-sharded distribution path."""
    color, T, nc, _ = _composite_fwd_impl(
        cfg, tile_start, tile_stop, pair_gauss, means2d, conic, rgb, opac,
        background, row_offset
    )
    return color, T, nc


def _composite_fwd(cfg, tile_start, tile_stop, pair_gauss, means2d, conic, rgb,
                   opac, background, row_offset=0):
    color, T, nc, klast = _composite_fwd_impl(
        cfg, tile_start, tile_stop, pair_gauss, means2d, conic, rgb, opac,
        background, row_offset
    )
    res = (tile_start, tile_stop, pair_gauss, means2d, conic, rgb, opac,
           background, T, klast, row_offset)
    return (color, T, nc), res


def _composite_bwd(cfg, res, cot):
    (tile_start, tile_stop, pair_gauss, means2d, conic, rgb, opac, background,
     final_T, klast, row_offset) = res
    d_color, d_finalT, _d_nc = cot
    dm, dcn, drgb, dop, d_bg = _composite_bwd_impl(
        cfg, tile_start, tile_stop, pair_gauss, means2d, conic, rgb, opac,
        background, final_T, klast, d_color, d_finalT, row_offset
    )
    zero_i32 = lambda x: np.zeros(np.shape(x), jax.dtypes.float0)
    return (
        zero_i32(tile_start),
        zero_i32(tile_stop),
        zero_i32(pair_gauss),
        dm,
        dcn,
        drgb,
        dop,
        d_bg,
        zero_i32(row_offset),
    )


composite_tiles.defvjp(_composite_fwd, _composite_bwd)
