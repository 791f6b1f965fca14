"""Multi-device training tests on the virtual 8-CPU mesh (SURVEY.md §4):
camera-batch DP and Gaussian-sharded (shard_map) steps must match the
single-device batched reference step exactly."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tpugs.ops.render import RasterConfig, render
from tpugs.optim.adam import AdamConfig, adam_init, adam_step
from tpugs.parallel.mesh import make_mesh
from tpugs.parallel.sharded_train import make_dp_train_step, replicate, shard_batch
from tpugs.train.loss import combined_loss
from tpugs.utils.synthetic import synthetic_intrinsics, synthetic_params

W, H = 64, 48
CFG = RasterConfig(img_h=H, img_w=W, tile_h=16, tile_w=16,
                   pair_capacity=1 << 13, max_hits_per_tile=128)
N = 64


@pytest.fixture(scope="module")
def scene():
    params = synthetic_params(N, seed=0, sh_coeffs=4)
    alive = jnp.ones((N,), bool)
    rng = np.random.default_rng(1)
    b = 8
    images = jnp.asarray(rng.uniform(0, 1, (b, H, W, 3)), jnp.float32)
    viewmats = jnp.tile(jnp.eye(4)[None], (b, 1, 1))
    intr = jnp.tile(synthetic_intrinsics(W, H)[None], (b, 1))
    return params, alive, images, viewmats, intr


def reference_step(params, alive, images, viewmats, intr, step=0.0):
    """Single-device batched-mean reference."""
    acfg = AdamConfig()
    adam = adam_init(params)
    loss, grads = reference_grads(params, alive, images, viewmats, intr)
    new_params, _ = adam_step(acfg, adam, params, grads, jnp.asarray(step))
    return new_params, loss


def reference_grads(params, alive, images, viewmats, intr):
    """Single-device mean-over-views loss + raw gradients."""

    def loss_fn(p):
        def one(img, vm, it):
            out = render(p["means"], p["quats"], p["log_scales"],
                         p["opacity_logits"], p["sh"], alive, vm, it, CFG, 1,
                         jnp.zeros((3,)))
            return combined_loss(out.color, img, 0.2)

        return jnp.mean(jax.vmap(one)(images, viewmats, intr))

    return jax.value_and_grad(loss_fn)(params)


class TestDataParallel:
    def test_dp_matches_reference(self, scene):
        params, alive, images, viewmats, intr = scene
        mesh = make_mesh(axis_sizes=(8, 1))
        step_fn = make_dp_train_step(mesh, CFG, AdamConfig(), sh_degree=1)
        p_r, alive_r, adam_r = replicate(mesh, (params, alive, adam_init(params)))
        im, vm, it = shard_batch(mesh, images, viewmats, intr)
        new_params, _, loss = step_fn(p_r, alive_r, adam_r, im, vm, it,
                                      jnp.zeros(()))
        ref_params, ref_loss = reference_step(params, alive, images, viewmats, intr)
        np.testing.assert_allclose(float(loss), float(ref_loss), rtol=1e-5)
        for k in params:
            np.testing.assert_allclose(
                np.asarray(new_params[k]), np.asarray(ref_params[k]),
                atol=2e-6, err_msg=k,
            )


def _gauss_shard_grads(mesh, params, alive, images, viewmats, intr):
    """Raw-gradient variant of gauss_shard's step (same internals)."""
    from jax.sharding import PartitionSpec as P

    from tpugs.ops.projection import project_gaussians
    from tpugs.parallel.gauss_shard import _render_from_full

    g = mesh.shape["gauss"]

    def impl(params, alive, images, viewmats, intrinsics):
        def loss_fn(local_params):
            proj = project_gaussians(
                local_params["means"], local_params["quats"],
                local_params["log_scales"], local_params["opacity_logits"],
                local_params["sh"], alive,
                viewmats[0], intrinsics[0], CFG.img_w, CFG.img_h, 1,
            )
            full = jax.tree.map(
                lambda x: jax.lax.all_gather(x, "gauss", axis=0, tiled=True),
                proj,
            )
            color = _render_from_full(full, CFG, jnp.zeros((3,)), "scan")
            return combined_loss(color, images[0], 0.2)

        loss, grads = jax.value_and_grad(loss_fn)(params)
        loss = jax.lax.pmean(loss, "data")
        grads = jax.tree.map(lambda t: jax.lax.pmean(t, "data") / g, grads)
        return grads, loss

    gspec = {k: P("gauss") for k in params}
    mapped = jax.shard_map(
        impl, mesh=mesh,
        in_specs=(gspec, P("gauss"), P("data"), P("data"), P("data")),
        out_specs=(gspec, P()),
        check_vma=False,
    )
    return jax.jit(mapped)(params, alive, images, viewmats, intr)


class TestGaussSharded:
    def test_gauss_shard_grad_parity(self, scene):
        """Raw gradients (not post-Adam params — a fresh-state Adam step is
        gradient-scale-invariant and masks scaling bugs) must match the
        single-device mean-over-views gradient."""
        params, alive, images, viewmats, intr = scene
        mesh = make_mesh(axis_sizes=(2, 4))
        b = 2
        sh_grads, loss = _gauss_shard_grads(
            mesh, params, alive, images[:b], viewmats[:b], intr[:b]
        )
        ref_loss, ref_grads = reference_grads(
            params, alive, images[:b], viewmats[:b], intr[:b]
        )
        np.testing.assert_allclose(float(loss), float(ref_loss), rtol=1e-5)
        for k in params:
            np.testing.assert_allclose(
                np.asarray(sh_grads[k]), np.asarray(ref_grads[k]),
                rtol=2e-5, atol=1e-8, err_msg=k,
            )

    def test_gauss_shard_matches_reference(self, scene):
        from tpugs.parallel.gauss_shard import (
            make_gauss_sharded_train_step,
            shard_gauss_state,
        )

        params, alive, images, viewmats, intr = scene
        mesh = make_mesh(axis_sizes=(2, 4))  # 2-way data x 4-way gauss
        step_fn = make_gauss_sharded_train_step(
            mesh, CFG, AdamConfig(), sh_degree=1, compositor="scan"
        )
        p_s, alive_s, adam_s = shard_gauss_state(mesh, params, alive, adam_init(params))
        b = 2
        new_params, new_adam, loss = step_fn(
            p_s, alive_s, adam_s, images[:b], viewmats[:b], intr[:b], jnp.zeros(())
        )
        ref_params, ref_loss = reference_step(
            params, alive, images[:b], viewmats[:b], intr[:b]
        )
        np.testing.assert_allclose(float(loss), float(ref_loss), rtol=1e-5)
        for k in params:
            np.testing.assert_allclose(
                np.asarray(new_params[k]), np.asarray(ref_params[k]),
                atol=2e-6, err_msg=k,
            )


def _tile_shard_forward(mesh, params, alive, viewmat, intr, compositor="scan",
                        send_capacity=None):
    """shard_map'd tile-sharded forward render -> full image (replicated)."""
    from jax.sharding import PartitionSpec as P

    from tpugs.ops.projection import project_gaussians
    from tpugs.parallel.tile_shard import (
        assemble_image,
        exchange_and_render_local,
        local_raster_config,
    )

    g = mesh.shape["gauss"]
    local_cfg = local_raster_config(CFG, g, -(-CFG.pair_capacity // g))

    def impl(params, alive):
        proj = project_gaussians(
            params["means"], params["quats"], params["log_scales"],
            params["opacity_logits"], params["sh"], alive,
            viewmat, intr, CFG.img_w, CFG.img_h, 1,
        )
        cap = send_capacity if send_capacity is not None else alive.shape[0]
        color_t, _, _, diag = exchange_and_render_local(
            proj, CFG, local_cfg, g, cap, jnp.zeros((3,)), compositor
        )
        return assemble_image(CFG, g, color_t), diag

    gspec = {k: P("gauss") for k in params}
    mapped = jax.shard_map(
        impl, mesh=mesh, in_specs=(gspec, P("gauss")),
        out_specs=(P(), {k: P() for k in
                         ["send_overflow", "max_send_count", "pair_overflow",
                          "num_pairs", "max_tile_hits"]}),
        check_vma=False,
    )
    return jax.jit(mapped)(params, alive)


def _tile_shard_grads_fn(mesh, compositor="scan"):
    """Jitted shard_map'd raw-gradient fn (returned unexecuted so tests can
    also .lower() it for HLO inspection)."""
    from jax.sharding import PartitionSpec as P

    from tpugs.ops.projection import project_gaussians
    from tpugs.parallel.tile_shard import (
        assemble_image,
        exchange_and_render_local,
        local_raster_config,
    )

    g = mesh.shape["gauss"]
    local_cfg = local_raster_config(CFG, g, -(-CFG.pair_capacity // g))

    def impl(params, alive, images, viewmats, intrinsics):
        def loss_fn(p):
            proj = project_gaussians(
                p["means"], p["quats"], p["log_scales"], p["opacity_logits"],
                p["sh"], alive,
                viewmats[0], intrinsics[0], CFG.img_w, CFG.img_h, 1,
            )
            color_t, _, _, _ = exchange_and_render_local(
                proj, CFG, local_cfg, g, alive.shape[0], jnp.zeros((3,)),
                compositor,
            )
            color = assemble_image(CFG, g, color_t)
            return combined_loss(color, images[0], 0.2)

        loss, grads = jax.value_and_grad(loss_fn)(params)
        loss = jax.lax.pmean(loss, "data")
        grads = jax.tree.map(lambda t: jax.lax.pmean(t, "data") / g, grads)
        return grads, loss

    gspec = {k: P("gauss") for k in
             ["means", "quats", "log_scales", "opacity_logits", "sh"]}
    mapped = jax.shard_map(
        impl, mesh=mesh,
        in_specs=(gspec, P("gauss"), P("data"), P("data"), P("data")),
        out_specs=(gspec, P()),
        check_vma=False,
    )
    return jax.jit(mapped)


def _tile_shard_grads(mesh, params, alive, images, viewmats, intr,
                      compositor="scan"):
    fn = _tile_shard_grads_fn(mesh, compositor)
    return fn(params, alive, images, viewmats, intr)


class TestTileSharded:
    """Tile-sharded rasterization (SURVEY.md §5.7): gaussians AND tiles
    sharded over "gauss" with a destination-aware all_to_all exchange; each
    device bins + composites ONLY its tile rows."""

    # The sharded and single-device programs are separate XLA compilations;
    # fusion/FMA-contraction decisions differ, so "exact" here means within
    # 2 ulp of f32 around 1.0 — the same math on the same operand values, not
    # bitwise-identical executables. (Same pair enumeration, same per-tile
    # depth order, same global pixel coordinates via row_offset.)
    ULP2 = 5e-7

    def test_forward_exact(self, scene):
        params, alive, images, viewmats, intr = scene
        mesh = make_mesh(axis_sizes=(1, 8))
        color, diag = _tile_shard_forward(
            mesh, params, alive, viewmats[0], intr[0]
        )
        ref = render(params["means"], params["quats"], params["log_scales"],
                     params["opacity_logits"], params["sh"], alive,
                     viewmats[0], intr[0], CFG, 1, jnp.zeros((3,)))
        assert not bool(diag["send_overflow"])
        assert not bool(diag["pair_overflow"])
        np.testing.assert_allclose(
            np.asarray(color), np.asarray(ref.color), atol=self.ULP2, rtol=0
        )

    def test_forward_exact_2x4(self, scene):
        params, alive, images, viewmats, intr = scene
        mesh = make_mesh(axis_sizes=(2, 4))
        color, _ = _tile_shard_forward(
            mesh, params, alive, viewmats[0], intr[0]
        )
        ref = render(params["means"], params["quats"], params["log_scales"],
                     params["opacity_logits"], params["sh"], alive,
                     viewmats[0], intr[0], CFG, 1, jnp.zeros((3,)))
        np.testing.assert_allclose(
            np.asarray(color), np.asarray(ref.color), atol=self.ULP2, rtol=0
        )

    def test_grad_parity(self, scene):
        """Raw gradients match the single-device mean-over-views gradient."""
        params, alive, images, viewmats, intr = scene
        mesh = make_mesh(axis_sizes=(2, 4))
        b = 2
        sh_grads, loss = _tile_shard_grads(
            mesh, params, alive, images[:b], viewmats[:b], intr[:b]
        )
        ref_loss, ref_grads = reference_grads(
            params, alive, images[:b], viewmats[:b], intr[:b]
        )
        np.testing.assert_allclose(float(loss), float(ref_loss), rtol=1e-5)
        for k in params:
            np.testing.assert_allclose(
                np.asarray(sh_grads[k]), np.asarray(ref_grads[k]),
                rtol=2e-5, atol=1e-8, err_msg=k,
            )

    def test_train_step_matches_reference(self, scene):
        from tpugs.parallel.gauss_shard import shard_gauss_state
        from tpugs.parallel.tile_shard import make_tile_sharded_train_step

        params, alive, images, viewmats, intr = scene
        mesh = make_mesh(axis_sizes=(2, 4))
        step_fn = make_tile_sharded_train_step(
            mesh, CFG, AdamConfig(), sh_degree=1, compositor="scan"
        )
        p_s, alive_s, adam_s = shard_gauss_state(
            mesh, params, alive, adam_init(params)
        )
        b = 2
        new_params, new_adam, loss = step_fn(
            p_s, alive_s, adam_s, images[:b], viewmats[:b], intr[:b],
            jnp.zeros(()),
        )
        ref_params, ref_loss = reference_step(
            params, alive, images[:b], viewmats[:b], intr[:b]
        )
        np.testing.assert_allclose(float(loss), float(ref_loss), rtol=1e-5)
        for k in params:
            np.testing.assert_allclose(
                np.asarray(new_params[k]), np.asarray(ref_params[k]),
                atol=2e-6, err_msg=k,
            )

    def test_pallas_interpret(self, scene):
        """The sharded path must run the Pallas kernels (interpret mode on
        CPU) and agree with the scan compositor."""
        params, alive, images, viewmats, intr = scene
        mesh = make_mesh(axis_sizes=(1, 8))
        color_p, _ = _tile_shard_forward(
            mesh, params, alive, viewmats[0], intr[0], compositor="pallas"
        )
        color_s, _ = _tile_shard_forward(
            mesh, params, alive, viewmats[0], intr[0], compositor="scan"
        )
        np.testing.assert_allclose(
            np.asarray(color_p), np.asarray(color_s), atol=1e-5
        )

    def test_send_capacity_overflow_flag(self, scene):
        """A too-small exchange capacity must raise the send_overflow flag."""
        params, alive, images, viewmats, intr = scene
        mesh = make_mesh(axis_sizes=(1, 8))
        _, diag = _tile_shard_forward(
            mesh, params, alive, viewmats[0], intr[0], send_capacity=1
        )
        assert bool(diag["send_overflow"])

    def test_pallas_grad_parity(self, scene):
        """Raw gradients through the pallas compositor + segment-sum backward
        (composite_tiles_pallas_segred) match the single-device reference —
        the distributed path must not drift when it routes the pair->row
        reduction through ops/pallas/segreduce.py (VERDICT r4 item 4)."""
        params, alive, images, viewmats, intr = scene
        mesh = make_mesh(axis_sizes=(2, 4))
        b = 2
        sh_grads, loss = _tile_shard_grads(
            mesh, params, alive, images[:b], viewmats[:b], intr[:b],
            compositor="pallas",
        )
        ref_loss, ref_grads = reference_grads(
            params, alive, images[:b], viewmats[:b], intr[:b]
        )
        np.testing.assert_allclose(float(loss), float(ref_loss), rtol=1e-5)
        for k in params:
            np.testing.assert_allclose(
                np.asarray(sh_grads[k]), np.asarray(ref_grads[k]),
                rtol=2e-5, atol=1e-8, err_msg=k,
            )

    def test_pallas_backward_has_no_pair_scatter(self, scene):
        """The distributed backward must contain NO pair->gauss scatter-add:
        the old composite_tiles_pallas VJP reduced pair gradient rows with
        an f32[*,9] XLA scatter (225 ms of a 336 ms garden step,
        docs/PERF_NOTES.md r3); the segred path replaces it with interval
        one-hot MXU matmuls. Checked on the optimized CPU-mesh HLO."""
        import re

        params, alive, images, viewmats, intr = scene
        mesh = make_mesh(axis_sizes=(2, 4))
        b = 2
        fn = _tile_shard_grads_fn(mesh, compositor="pallas")
        hlo = fn.lower(
            params, alive, images[:b], viewmats[:b], intr[:b]
        ).compile().as_text()
        bad = [
            ln for ln in hlo.splitlines()
            if " scatter(" in ln and re.search(r"f32\[\d+,9\]", ln)
        ]
        assert not bad, f"pair->gauss scatter survived: {bad[:3]}"


class TestCommModel:
    """Pin the tile-shard communication model (VERDICT r4 item 10): the
    analytic per-device exchange accounting (tile_shard.comm_report) must
    match a mechanical host-side recount of the actual destination ranges on
    the bench-scene shape, so the >=80% ICI-scaling story has a checked
    communication model while real multi-chip stays hardware-blocked."""

    def test_exchange_volume_model(self):
        from jax.sharding import PartitionSpec as P

        from tpugs.ops.projection import project_gaussians
        from tpugs.parallel.tile_shard import (
            EXCHANGE_ATTRS,
            build_send_index,
            comm_report,
            destination_range,
            rows_per_device,
        )

        img_w, img_h, n, g = 489, 272, 50_000, 8
        cfg = RasterConfig(img_h=img_h, img_w=img_w, tile_h=32, tile_w=32,
                           pair_capacity=204800, max_hits_per_tile=1024)
        params = synthetic_params(n, seed=0)
        alive = jnp.ones((n,), bool)
        viewmat = jnp.eye(4)
        intr = synthetic_intrinsics(img_w, img_h)
        mesh = make_mesh(axis_sizes=(1, g))
        n_loc = n // g

        def impl(params, alive):
            proj = project_gaussians(
                params["means"], params["quats"], params["log_scales"],
                params["opacity_logits"], params["sh"], alive,
                viewmat, intr, img_w, img_h, 3,
            )
            d0, d1 = destination_range(proj, cfg, g)
            _, send_counts = build_send_index(d0, d1, g, n_loc)
            return jax.lax.pmax(jnp.max(send_counts), "gauss")

        gspec = {k: P("gauss") for k in params}
        mapped = jax.jit(jax.shard_map(
            impl, mesh=mesh, in_specs=(gspec, P("gauss")), out_specs=P(),
            check_vma=False,
        ))
        measured_max_send = int(mapped(params, alive))

        # Host recount: same projection on the FULL array, contiguous
        # shard_map blocks, exact per-(src, dst) membership counts.
        proj = project_gaussians(
            params["means"], params["quats"], params["log_scales"],
            params["opacity_logits"], params["sh"], alive,
            viewmat, intr, img_w, img_h, 3,
        )
        d0 = np.asarray(destination_range(proj, cfg, g)[0])
        d1 = np.asarray(destination_range(proj, cfg, g)[1])
        host_max = max(
            int(((d0[src * n_loc:(src + 1) * n_loc] <= dst)
                 & (dst <= d1[src * n_loc:(src + 1) * n_loc])).sum())
            for src in range(g) for dst in range(g)
        )
        assert measured_max_send == host_max

        # The analytic byte formulas are exact functions of the geometry.
        rep = comm_report(cfg, g, n, n_loc, host_max, 0)
        assert rep["all_to_all_bytes_per_device"] == (
            g * n_loc * EXCHANGE_ATTRS * 4
        )
        rpd = rows_per_device(cfg, g)
        assert rep["color_all_gather_bytes"] == (
            g * rpd * cfg.ntx * cfg.pix * 3 * 4
        )
        np.testing.assert_allclose(
            rep["all_to_all_padding_frac"], 1.0 - host_max / n_loc
        )

        # The design claim the docs make (docs/PERF_NOTES.md r2): at a tuned
        # 1.3x-max exchange capacity the all_to_all moves LESS than the
        # gauss_shard full-attribute all-gather it replaced.
        tuned_bytes = g * int(1.3 * host_max) * EXCHANGE_ATTRS * 4
        assert tuned_bytes < rep["gauss_shard_all_gather_bytes"], (
            tuned_bytes, rep["gauss_shard_all_gather_bytes"]
        )
