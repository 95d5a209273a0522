"""Batch benchmark driver — the reference `full_eval.py` for the human
pipeline: trains + renders + aggregates metrics over a list of scenes."""
from __future__ import annotations

import argparse
import json
import os


def main(argv=None) -> dict:
    p = argparse.ArgumentParser(description="mygauhuman_tpu full evaluation")
    p.add_argument("--scenes", nargs="+", required=True,
                   help="dataset paths (type auto-detected per path)")
    p.add_argument("--output_root", type=str, default="output/full_eval")
    p.add_argument("--iterations", type=int, default=1200)
    p.add_argument("--skip_training", action="store_true")
    p.add_argument("--skip_rendering", action="store_true")
    p.add_argument("--smpl_model_path", type=str,
                   default="assets/SMPL_NEUTRAL_renderpeople.pkl")
    args = p.parse_args(argv)

    from mygauhuman_tpu.cli.render import main as render_main
    from mygauhuman_tpu.cli.train import main as train_main

    results = {}
    for scene in args.scenes:
        name = os.path.basename(scene.rstrip("/"))
        out_dir = os.path.join(args.output_root, name)
        if not args.skip_training:
            train_main([
                "-s", scene, "--model_path", out_dir,
                "--iterations", str(args.iterations),
                "--test_iterations", str(args.iterations),
                "--save_iterations", str(args.iterations),
                "--smpl_model_path", args.smpl_model_path,
            ])
        if not args.skip_rendering:
            results[name] = render_main([
                "-m", out_dir, "-s", scene,
                "--iteration", str(args.iterations),
                "--smpl_model_path", args.smpl_model_path,
            ])
    summary_path = os.path.join(args.output_root, "full_eval.json")
    os.makedirs(args.output_root, exist_ok=True)
    with open(summary_path, "w") as f:
        json.dump(results, f, indent=2)
    print(json.dumps(
        {k: {m: v[m] for m in ("psnr", "ssim", "lpips", "lpips_rand", "fps")
             if m in v}
         for k, v in results.items()}, indent=2))
    return results


if __name__ == "__main__":
    main()
