"""Ablate MCMC components (noise injection / regularization) on the GT scene."""
import dataclasses
import os
import tempfile

import jax.numpy as jnp

from tpugs.optim.densify_mcmc import MCMCConfig
from tpugs.train.trainer import TrainConfig, Trainer
from tpugs.utils.gt_scene import make_gt_model, write_gt_dataset

workdir = tempfile.mkdtemp(prefix="dbg_mcmc_")
scene = os.path.join(workdir, "scene")
model = make_gt_model(8000, seed=0)
write_gt_dataset(scene, model, num_views=24, width=488, height=272)

variants = {
    "cap 0.5": MCMCConfig(noise_max_sigma=0.5),
    "cap 0.2": MCMCConfig(noise_max_sigma=0.2),
    "cap 0.05": MCMCConfig(noise_max_sigma=0.05),
    "no noise": MCMCConfig(noise_lr=0.0),
}

for name, mcfg in variants.items():
    cfg = TrainConfig(iterations=1500, capacity=1 << 15, sh_degree=3,
                      log_every=0, save_every=0, densify_mode="mcmc",
                      mcmc=mcfg, output_dir=os.path.join(workdir, "out_" + name[:4]))
    tr = Trainer(scene, cfg, log_fn=lambda *a: None)
    tr.train(1500)
    res = tr.evaluate()
    alive_op = jnp.sum(
        (jnp.where(tr.state.alive,
                   jnp.asarray(1 / (1 + jnp.exp(-tr.state.params["opacity_logits"]))),
                   0.0) >= 0.005).astype(jnp.int32))
    print(f"{name:12s} PSNR {res.mean_psnr:6.2f}  SSIM {res.mean_ssim:.4f}  "
          f"op>=0.005: {int(alive_op)}", flush=True)
