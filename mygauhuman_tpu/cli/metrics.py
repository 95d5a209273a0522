"""Offline metrics CLI — the reference `metrics.py`: PSNR/SSIM/LPIPS over
saved render directories -> results.json."""
from __future__ import annotations

import argparse


def main(argv=None) -> dict:
    p = argparse.ArgumentParser(description="mygauhuman_tpu metrics")
    p.add_argument("--renders_dir", "-r", type=str, required=True)
    p.add_argument("--gt_dir", "-g", type=str, required=True)
    p.add_argument("--out", "-o", type=str, default="results.json")
    args = p.parse_args(argv)

    from mygauhuman_tpu.eval.metrics import evaluate_dirs
    from mygauhuman_tpu.utils.compile_cache import enable_persistent_cache

    enable_persistent_cache()

    result = evaluate_dirs(args.renders_dir, args.gt_dir, args.out)
    lkey = "lpips" if "lpips" in result else "lpips_rand"
    print(f"PSNR {result['psnr']:.2f}  SSIM {result['ssim']:.4f}  "
          f"{lkey.upper()} {result[lkey]:.4f}")
    return result


if __name__ == "__main__":
    main()
