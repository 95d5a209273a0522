"""Benchmark: render FPS at 512x512 on the flagship articulated-human model.

Prints ONE JSON line {"metric", "value", "unit", "vs_baseline"}.
Baseline: the reference claims "up to 189 FPS" at 512x512 on an NVIDIA GPU
(/root/reference/README.md:18, render.py:262-285 measurement method:
len(views) / total wall time, post-warmup).
"""
from __future__ import annotations

import json
import time

BASELINE_FPS = 189.0


def main() -> None:
    import jax
    import jax.numpy as jnp

    from mygauhuman_tpu.data.synthetic import make_synthetic_scene
    from mygauhuman_tpu.ops.rasterize import RasterizerConfig
    from mygauhuman_tpu.render import render_frame

    # ZJU-MoCap-refine scale: 512x512, ~7k Gaussians after short training
    # (6,890 SMPL-vertex init, scene/dataset_readers.py:737).
    cfg = RasterizerConfig(tile_capacity=1024, chunk_tiles=64)
    scene = make_synthetic_scene(
        n_views=4, width=512, height=512, n_verts=2048, capacity=8192,
        raster_config=cfg,
    )
    state = scene.gt_state
    model = scene.smpl_model

    @jax.jit
    def render_one(params, camera, frame):
        st = state._replace(params=params)
        out = render_frame(
            st, camera, frame, model,
            bg=jnp.zeros(3), active_sh_degree=0, config=cfg,
        )
        return out.render

    views = [(b.camera, b.frame) for b in scene.batches]

    # Eval replay parity: render.py measures pure render throughput with
    # cached transforms; we measure the full deform+render path (harder).
    img = render_one(state.params, *views[0])
    img.block_until_ready()  # compile

    n_frames = 0
    start = time.perf_counter()
    while True:
        for cam, frame in views:
            render_one(state.params, cam, frame).block_until_ready()
            n_frames += 1
        if time.perf_counter() - start > 5.0 and n_frames >= 8:
            break
    elapsed = time.perf_counter() - start
    fps = n_frames / elapsed

    print(json.dumps({
        "metric": "render_fps_512",
        "value": round(fps, 2),
        "unit": "frames/s",
        "vs_baseline": round(fps / BASELINE_FPS, 3),
    }))


if __name__ == "__main__":
    main()
