"""FPS sweep after SoA rewrite + instance compaction, 512^2 replay render."""
import os as _os, sys as _sys
_sys.path.insert(0, _os.path.abspath(_os.path.join(_os.path.dirname(__file__), "..", "..")))

import time
import jax, jax.numpy as jnp, numpy as np
from mygauhuman_tpu.ops.rasterize import RasterizerConfig
from mygauhuman_tpu.data.synthetic import make_synthetic_scene
from mygauhuman_tpu.render import render_frame

W = H = 512
for n_verts, cap, icap in [(8192, 16384, None), (8192, 16384, 131072),
                           (32768, 65536, None), (32768, 65536, 262144)]:
    cfg = RasterizerConfig(tile_capacity=1024, chunk_tiles=64, use_pallas=True,
                           instance_capacity=icap)
    scene = make_synthetic_scene(n_views=4, width=W, height=H, n_verts=n_verts,
                                 capacity=cap, raster_config=cfg)
    state, model, b = scene.gt_state, scene.smpl_model, scene.batches[0]
    full = render_frame(state, b.camera, b.frame, model, bg=jnp.zeros(3),
                        active_sh_degree=0, config=cfg)
    tfs, tls = full.transforms, full.translation
    print(f"n={n_verts} cap={cap} icap={icap}: overflow_inst="
          f"{int(full.overflow_inst)} overflow_tiles={int(full.overflow_tiles)}",
          flush=True)

    @jax.jit
    def render_one(params, camera, frame):
        st = state._replace(params=params)
        out = render_frame(st, camera, frame, model, bg=jnp.zeros(3),
                          active_sh_degree=0, config=cfg,
                          transforms=tfs, translation=tls)
        return out.render
    out = jax.block_until_ready(render_one(state.params, b.camera, b.frame))
    start = time.perf_counter(); reps = 0
    while True:
        for _ in range(128):
            out = render_one(state.params, b.camera, b.frame); reps += 1
        jax.block_until_ready(out)
        if time.perf_counter() - start > 4.0: break
    dt = (time.perf_counter() - start) / reps * 1e3
    print(f"  {dt:.3f} ms/frame = {1000/dt:.1f} FPS  (vs 189 baseline: "
          f"{1000/dt/189:.2f}x)", flush=True)
