"""train CLI (reference: apps/train_main.cpp).

  python -m tpugs.apps.train -d <colmap_dir> -o <out_dir> [options]
"""
from __future__ import annotations

import argparse
import dataclasses
import sys


def build_parser():
    p = argparse.ArgumentParser("tpugs-train", description="Train 3D Gaussian Splatting on TPU")
    p.add_argument("-d", "--data", required=True, help="COLMAP dataset dir")
    p.add_argument("-o", "--output", default="output", help="output dir")
    p.add_argument("-i", "--iterations", type=int, default=30000)
    p.add_argument("-r", "--resolution-scale", type=int, default=1)
    p.add_argument("--sh-degree", type=int, default=3)
    p.add_argument("--capacity", type=int, default=1 << 17,
                   help="fixed Gaussian capacity (replaces --max-gaussians)")
    p.add_argument("--save-every", type=int, default=7000)
    p.add_argument("--log-every", type=int, default=100)
    p.add_argument("--lambda", dest="lambda_ssim", type=float, default=0.2)
    p.add_argument("--random-bg", action="store_true")
    p.add_argument("--seed", type=int, default=42)
    p.add_argument("--no-densify", action="store_true")
    p.add_argument("--mcmc", action="store_true")
    p.add_argument("--tile", type=int, default=32, help="tile size (pixels; 32 = 8x128-lane VPU shape, ~2x fewer pairs than 16)")
    p.add_argument("--pair-capacity", type=int, default=1 << 21)
    p.add_argument("--max-hits", type=int, default=2048)
    p.add_argument("--densify-from", type=int, default=500)
    p.add_argument("--densify-until", type=int, default=15000)
    p.add_argument("--densify-every", type=int, default=100)
    p.add_argument("--grad-threshold", type=float, default=2e-4)
    p.add_argument("--resume", default=None, help="resume from a ckpt_*.npz")
    p.add_argument("--mesh", default="",
                   help="device mesh spec for distributed training, e.g. "
                        "'data=2,gauss=4' (axis product = device count; "
                        "gaussians+tiles sharded over gauss, views over data)")
    p.add_argument("--trace-dir", default=None,
                   help="capture a jax.profiler trace of the run (xprof dir)")
    return p


def main(argv=None):
    args = build_parser().parse_args(argv)
    if args.mcmc and args.no_densify:
        print("--mcmc and --no-densify are mutually exclusive", file=sys.stderr)
        return 2

    # Multi-host entry (one process per host; SURVEY.md §5.8). No-op unless
    # TPUGS_DISTRIBUTED=1. Must run before any other JAX use.
    from tpugs.parallel.distributed import maybe_init_distributed

    maybe_init_distributed()

    from tpugs.optim.densify_adc import ADCConfig
    from tpugs.train.trainer import TrainConfig, Trainer

    mode = "mcmc" if args.mcmc else ("none" if args.no_densify else "adc")
    cfg = TrainConfig(
        iterations=args.iterations,
        resolution_scale=args.resolution_scale,
        sh_degree=args.sh_degree,
        lambda_ssim=args.lambda_ssim,
        save_every=args.save_every,
        log_every=args.log_every,
        capacity=args.capacity,
        random_background=args.random_bg,
        seed=args.seed,
        densify_mode=mode,
        adc=ADCConfig(
            densify_from=args.densify_from,
            densify_until=args.densify_until,
            densify_every=args.densify_every,
            grad_threshold=args.grad_threshold,
        ),
        tile_h=args.tile,
        tile_w=args.tile,
        pair_capacity=args.pair_capacity,
        max_hits_per_tile=args.max_hits,
        output_dir=args.output,
        mesh=args.mesh,
    )
    trainer = Trainer(args.data, cfg, resume_from=args.resume)
    # history.jsonl (step/loss records; SURVEY.md §5.5) is written
    # incrementally by Trainer.train so a crash mid-run keeps the prefix.
    if args.trace_dir:
        from tpugs.utils.profiling import trace

        with trace(args.trace_dir):
            trainer.train()
    else:
        trainer.train()
    return 0


if __name__ == "__main__":
    sys.exit(main())
