"""Mesh-mode quality row (VERDICT r2 item 6): train the SAME GT scene with
the same seed/config single-device and under a data=2,gauss=4 mesh (8 virtual
CPU devices), and compare test-split PSNR. This is the correctness spine for
the sharded densification semantics (globally-faithful MCMC relocation,
per-shard ADC free lists): shard-local drift shows up as a PSNR gap.

Run on CPU (forced below — the real backend here is a single TPU chip, which
cannot host an 8-device mesh):

  python scripts/quality_mesh_row.py [--mcmc] [-i 5000]
"""
import argparse
import json
import os
import sys
import tempfile

import jax

jax.config.update("jax_platforms", "cpu")
os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "")
    + " --xla_force_host_platform_device_count=8"
)

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def run(scene_dir, outdir, iters, mcmc, mesh, capacity):
    from tpugs.train.trainer import TrainConfig, Trainer

    cfg = TrainConfig(
        iterations=iters,
        capacity=capacity,
        sh_degree=3,
        log_every=500,
        save_every=0,
        eval_every=0,
        densify_mode="mcmc" if mcmc else "adc",
        output_dir=outdir,
        mesh=mesh,
    )
    trainer = Trainer(scene_dir, cfg)
    trainer.train(iters)
    res = trainer.evaluate()
    return res.mean_psnr, res.mean_ssim, res.num_gaussians


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("-i", "--iterations", type=int, default=5000)
    p.add_argument("--mcmc", action="store_true")
    p.add_argument("--gaussians", type=int, default=6000)
    p.add_argument("--views", type=int, default=24)
    p.add_argument("--width", type=int, default=320)
    p.add_argument("--height", type=int, default=184)
    p.add_argument("--capacity", type=int, default=1 << 14)
    p.add_argument("-o", "--workdir", default=None)
    p.add_argument("--arm", choices=["single", "mesh", "both"],
                   default="both",
                   help="run one arm only (the GT scene is deterministic, "
                        "so arms recorded from separate invocations are "
                        "comparable)")
    args = p.parse_args(argv)

    from tpugs.utils.gt_scene import make_gt_model, write_gt_dataset

    workdir = args.workdir or tempfile.mkdtemp(prefix="tpugs_meshq_")
    scene = os.path.join(workdir, "scene")
    model = make_gt_model(args.gaussians, seed=0)
    write_gt_dataset(scene, model, num_views=args.views, width=args.width,
                     height=args.height, jitter=0.6, elevation_rings=2)

    arms = [("single", ""), ("mesh", "data=2,gauss=4")]
    if args.arm != "both":
        arms = [a for a in arms if a[0] == args.arm]
    rows = {}
    for name, mesh in arms:
        psnr, ssim, n = run(scene, os.path.join(workdir, name),
                            args.iterations, args.mcmc, mesh, args.capacity)
        rows[name] = {"psnr": round(psnr, 2), "ssim": round(ssim, 4), "n": n}
        print(f"[{name}] PSNR {psnr:.2f} SSIM {ssim:.4f} N {n}", flush=True)

    out = {"mode": "mcmc" if args.mcmc else "adc",
           "iterations": args.iterations, **rows}
    if len(rows) == 2:
        out["delta_db"] = round(rows["mesh"]["psnr"] - rows["single"]["psnr"], 2)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
