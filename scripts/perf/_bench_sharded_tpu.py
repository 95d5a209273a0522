"""Sharded-raster code path on the real TPU (1-device mesh): compiled
Pallas kernel + degenerate collectives; rays/s for the PERF table."""
import os as _os, sys as _sys
_sys.path.insert(0, _os.path.abspath(_os.path.join(_os.path.dirname(__file__), "..", "..")))

import time
import jax, jax.numpy as jnp, numpy as np
from jax.sharding import Mesh
from mygauhuman_tpu.ops.rasterize import RasterizerConfig, rasterize
from mygauhuman_tpu.parallel.raster import rasterize_sharded
from mygauhuman_tpu.data.synthetic import make_synthetic_scene
from mygauhuman_tpu.models.gaussians import get_covariance6, get_opacity

W = H = 512
for n_verts, cap in [(6890, 8192), (32768, 65536)]:
    cfg = RasterizerConfig(use_pallas=True, instance_capacity=4 * cap)
    scene = make_synthetic_scene(n_views=2, width=W, height=H,
                                 n_verts=n_verts, capacity=cap,
                                 raster_config=cfg)
    b = scene.batches[0]
    p = scene.gt_state.params
    feats = jnp.clip(p.features_dc[:, 0] + 0.5, 0)
    mesh = Mesh(np.asarray(jax.devices()[:1]).reshape(1, 1),
                ("gauss", "tiles"))
    cov6 = get_covariance6(p)
    opac = get_opacity(p)[:, 0]

    @jax.jit
    def render_sharded(xyz, cov6, opac, feats):
        out = rasterize_sharded(
            xyz, cov6, opac, feats, jnp.asarray(b.camera.w2c),
            jnp.asarray(b.camera.full_proj), jnp.zeros(3), mesh=mesh,
            width=W, height=H, tan_fovx=float(b.camera.tan_fovx),
            tan_fovy=float(b.camera.tan_fovy), config=cfg,
            alive=scene.gt_state.alive, exchange_capacity=4 * cap)
        return out.image

    img = jax.block_until_ready(render_sharded(p.xyz, cov6, opac, feats))
    start = time.perf_counter(); reps = 0
    while True:
        for _ in range(64):
            img = render_sharded(p.xyz, cov6, opac, feats); reps += 1
        jax.block_until_ready(img)
        if time.perf_counter() - start > 3.0: break
    dt = (time.perf_counter() - start) / reps * 1e3
    rays = W * H / (dt / 1e3)
    print(f"sharded 1-chip {n_verts}G: {dt:.3f} ms = {1000/dt:.1f} FPS "
          f"= {rays/1e6:.0f} Mrays/s", flush=True)
