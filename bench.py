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

    from mygauhuman_tpu.utils.compile_cache import enable_persistent_cache

    enable_persistent_cache()

    from mygauhuman_tpu.data.synthetic import make_synthetic_scene
    from mygauhuman_tpu.ops.rasterize import RasterizerConfig
    from mygauhuman_tpu.render import render_frame

    # ZJU-MoCap-refine scale: 512x512, 6,890 Gaussians — the honest
    # operating point (SMPL vertex-cloud init, scene/dataset_readers.py:737;
    # densification under the 1,200-iter budget stays in this regime).
    import sys

    import jax as _jax
    on_tpu = _jax.devices()[0].platform != "cpu"
    N_VERTS = 6890
    CAPACITY = 8192
    cfg = RasterizerConfig(tile_capacity=1024, chunk_tiles=64,
                           use_pallas=on_tpu,
                           instance_capacity=8 * CAPACITY)
    scene = make_synthetic_scene(
        n_views=32, width=512, height=512, n_verts=N_VERTS, capacity=CAPACITY,
        raster_config=cfg,
    )
    state = scene.gt_state
    model = scene.smpl_model

    # Reference measurement parity: render.py evaluates with CACHED per-pose
    # LBS transforms (skipping the MLPs + deform, render.py:169-195) — its
    # "up to 189 FPS" is that replay path. Pre-compute the caches once.
    @jax.jit
    def render_one(params, camera, frame, transforms, translation):
        st = state._replace(params=params)
        out = render_frame(
            st, camera, frame, model,
            bg=jnp.zeros(3), active_sh_degree=0, config=cfg,
            transforms=transforms, translation=translation,
        )
        return out.render

    views = []
    for b in scene.batches:
        full = render_frame(
            state, b.camera, b.frame, model,
            bg=jnp.zeros(3), active_sh_degree=0, config=cfg,
        )
        views.append((b.camera, b.frame, full.transforms, full.translation))

    # Pre-stage all view data on device: per-call numpy uploads would
    # measure the host link, not the renderer.
    views = jax.device_put(views)
    params = jax.device_put(state.params)

    img = render_one(params, *views[0])
    img.block_until_ready()  # compile

    # Reference-style measurement: wall time over whole view sweeps
    # (render.py:262-285 divides len(views) by total elapsed). Sync once per
    # sweep — per-frame readiness polls would measure the control-link round
    # trip (~25 ms through the remote-TPU tunnel), not render speed.
    n_frames = 0
    start = time.perf_counter()
    while True:
        last = None
        for _ in range(4):   # amortize the readiness poll over 4 sweeps
            for cam, frame, tfs, tls in views:
                last = render_one(params, cam, frame, tfs, tls)
                n_frames += 1
        last.block_until_ready()
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
