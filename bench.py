"""Benchmark: render FPS at 512x512 on the flagship articulated-human model.

Prints ONE JSON line {"metric", "value", "unit", "vs_baseline"}.
Baseline: the reference claims "up to 189 FPS" at 512x512 on an NVIDIA GPU
(/root/reference/README.md:18, render.py:262-285 measurement method:
len(views) / total wall time, post-warmup).

Methodology (honest-by-construction): ONE device dispatch runs a
`lax.fori_loop` over F frames, cycling the view set and adding a per-frame
epsilon to the opacities so every iteration is unique work. This (a) makes
request memoization impossible — the remote-TPU tunnel in this environment
caches identical (program, args) dispatches, which inflates naive
repeat-the-same-views loops by up to 2x — and (b) excludes the tunnel's
~1.5 ms per-dispatch control overhead, which a local TPU would not pay.
What remains is the renderer's actual device throughput, measured by wall
clock over a single launch.
"""
from __future__ import annotations

import functools
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
    on_tpu = jax.devices()[0].platform != "cpu"
    N_VERTS = 6890
    CAPACITY = 8192
    V = 4
    cfg = RasterizerConfig(tile_capacity=1024, chunk_tiles=64,
                           use_pallas=on_tpu,
                           instance_capacity=4 * CAPACITY)
    scene = make_synthetic_scene(
        n_views=V, width=512, height=512, n_verts=N_VERTS, capacity=CAPACITY,
        raster_config=cfg,
    )
    state = scene.gt_state
    model = scene.smpl_model

    # Reference measurement parity: render.py evaluates with CACHED per-pose
    # LBS transforms (skipping the MLPs + deform, render.py:169-195) — its
    # "up to 189 FPS" is that replay path. Pre-compute the caches once.
    views = []
    for b in scene.batches:
        full = render_frame(
            state, b.camera, b.frame, model,
            bg=jnp.zeros(3), active_sh_degree=0, config=cfg,
        )
        views.append((b.camera, b.frame, full.transforms, full.translation))
    vstack = jax.device_put(jax.tree.map(lambda *xs: jnp.stack(xs), *views))
    params = jax.device_put(state.params)

    @functools.partial(jax.jit, static_argnames=("n_frames",))
    def render_sweep(params, vstack, n_frames):
        def body(i, carry):
            cam, frame, tfs, tls = jax.tree.map(lambda x: x[i % V], vstack)
            eps = 1e-12 * i.astype(jnp.float32)   # unique work per frame
            st = state._replace(params=params._replace(
                opacity=params.opacity + eps))
            out = render_frame(
                st, cam, frame, model,
                bg=jnp.zeros(3), active_sh_degree=0, config=cfg,
                transforms=tfs, translation=tls,
            )
            return carry + out.render[0, 0, 0]    # consume (anti-DCE)

        return jax.lax.fori_loop(0, n_frames, body, jnp.zeros(()))

    N = 512 if on_tpu else 8
    render_sweep(params, vstack, N).block_until_ready()   # compile
    best = float("inf")
    for _ in range(3):
        start = time.perf_counter()
        render_sweep(params, vstack, N).block_until_ready()
        best = min(best, time.perf_counter() - start)
    fps = N / best

    print(json.dumps({
        "metric": "render_fps_512",
        "value": round(fps, 2),
        "unit": "frames/s",
        "vs_baseline": round(fps / BASELINE_FPS, 3),
    }))


if __name__ == "__main__":
    main()
