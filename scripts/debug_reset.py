"""Post-opacity-reset dynamics: train to the reset, apply it, and watch the
opacity distribution recover (or not) over the next densify window."""
import numpy as np
import jax
import jax.numpy as jnp

from tpugs.train.trainer import TrainConfig, Trainer, _reset_opacity_step
from tpugs.utils.gt_scene import make_gt_model, write_gt_dataset
import tempfile, os

workdir = tempfile.mkdtemp(prefix="dbg_reset_")
scene = os.path.join(workdir, "scene")
model = make_gt_model(3000, seed=0)
write_gt_dataset(scene, model, num_views=24, width=488, height=272)

cfg = TrainConfig(iterations=3000, capacity=1 << 15, sh_degree=3,
                  log_every=1000, save_every=0, densify_mode="adc",
                  output_dir=os.path.join(workdir, "out"))
tr = Trainer(scene, cfg)


def opac_stats(tag):
    p = tr.state.params
    alive = np.asarray(tr.state.alive)
    op = np.asarray(jax.nn.sigmoid(p["opacity_logits"]))[alive]
    print(f"{tag}: N={alive.sum()} op p5/p50/p95 = "
          f"{np.percentile(op, [5, 50, 95]).round(4)}  "
          f"below 0.005: {(op < 0.005).mean():.3f}", flush=True)


tr.train(2999)
opac_stats("pre-reset @2999")

tr.state = _reset_opacity_step(tr.state)
opac_stats("post-reset")

# run 100 more steps manually (no events)
images = tr._image_bank()
for blk in range(4):
    vi = tr._rng.integers(0, tr.dataset.num_train(), size=25)
    tr.state, losses, stats = tr._multi_step(
        tr.state, images, tr._viewmats, tr._intrinsics,
        jnp.asarray(vi, jnp.int32), jnp.asarray(3000 + blk * 25, jnp.float32), 3,
    )
    opac_stats(f"@{3000 + (blk + 1) * 25} loss={float(losses[-1]):.4f}")

# what would the next densify prune?
from tpugs.optim.densify_adc import adc_densify
p = tr.state.params
alive = np.asarray(tr.state.alive)
adc = tr.state.adc
avg_grad = np.asarray(adc.grad_accum / jnp.maximum(adc.grad_count, 1.0))[alive]
radii = np.asarray(adc.max_radii)[alive]
print(f"avg screen-grad p50/p95: {np.percentile(avg_grad, [50, 95])}")
print(f"max_radii p50/p95/max: {np.percentile(radii, [50, 95, 100])}")
print(f"radii>20: {(radii > 20).mean():.3f}")
