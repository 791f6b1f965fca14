"""train CLI (reference: apps/train_main.cpp).

  python -m tpugs.apps.train -d <colmap_dir> -o <out_dir> [options]
"""
from __future__ import annotations

import argparse
import sys


def build_parser():
    p = argparse.ArgumentParser("tpugs-train", description="Train 3D Gaussian Splatting on TPU")
    p.add_argument("-d", "--data", required=True, help="COLMAP dataset dir")
    p.add_argument("-c", "--config", default=None,
                   help="JSON TrainConfig file (trainer.load_train_config); "
                        "explicitly-passed CLI flags override its values")
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
    p.add_argument("--final-opacity-reset", action="store_true",
                   help="keep the reference schedule's opacity reset at "
                        "densify_until (default skips resets that leave no "
                        "densify window to recover; ADCConfig.skip_final_reset)")
    p.add_argument("--resume", default=None, help="resume from a ckpt_*.npz")
    p.add_argument("--mesh", default="",
                   help="device mesh spec for distributed training, e.g. "
                        "'data=2,gauss=4' (axis product = device count; "
                        "gaussians+tiles sharded over gauss, views over data)")
    p.add_argument("--trace-dir", default=None,
                   help="capture a jax.profiler trace of the run (xprof dir)")
    return p


def _given_args(argv):
    """Parse with SUPPRESS defaults: the namespace holds ONLY the options the
    user explicitly passed (so a --config file's values are overridden only
    by flags actually present on the command line)."""
    p = build_parser()
    for a in p._actions:
        a.default = argparse.SUPPRESS
        a.required = False
    return set(vars(p.parse_known_args(argv)[0]))


def config_from_args(args, given):
    import dataclasses as dc

    from tpugs.train.trainer import TrainConfig, load_train_config

    cfg = load_train_config(args.config) if args.config else TrainConfig()

    field_map = {  # arg dest -> TrainConfig field
        "iterations": "iterations", "resolution_scale": "resolution_scale",
        "sh_degree": "sh_degree", "lambda_ssim": "lambda_ssim",
        "save_every": "save_every", "log_every": "log_every",
        "capacity": "capacity", "random_bg": "random_background",
        "seed": "seed", "pair_capacity": "pair_capacity",
        "max_hits": "max_hits_per_tile", "output": "output_dir",
        "mesh": "mesh",
    }
    over = {f: getattr(args, a) for a, f in field_map.items() if a in given}
    if "tile" in given:
        over["tile_h"] = over["tile_w"] = args.tile
    if "mcmc" in given or "no_densify" in given or not args.config:
        over["densify_mode"] = (
            "mcmc" if args.mcmc else ("none" if args.no_densify else "adc")
        )
    adc_map = {"densify_from": "densify_from", "densify_until": "densify_until",
               "densify_every": "densify_every",
               "grad_threshold": "grad_threshold"}
    adc_over = {f: getattr(args, a) for a, f in adc_map.items() if a in given}
    if "final_opacity_reset" in given:
        adc_over["skip_final_reset"] = not args.final_opacity_reset
    if adc_over:
        over["adc"] = dc.replace(cfg.adc, **adc_over)
    return dc.replace(cfg, **over)


def main(argv=None):
    args = build_parser().parse_args(argv)
    if args.mcmc and args.no_densify:
        print("--mcmc and --no-densify are mutually exclusive", file=sys.stderr)
        return 2

    # Multi-host entry (one process per host; SURVEY.md §5.8). No-op unless
    # TPUGS_DISTRIBUTED=1. Must run before any other JAX use.
    from tpugs.parallel.distributed import maybe_init_distributed

    maybe_init_distributed()

    from tpugs.train.trainer import Trainer

    cfg = config_from_args(args, _given_args(argv))
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
