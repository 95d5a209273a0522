import time, jax, jax.numpy as jnp, numpy as np
from mygauhuman_tpu.data.synthetic import make_synthetic_scene
from mygauhuman_tpu.ops.rasterize import RasterizerConfig
from mygauhuman_tpu.render import render_frame

cfg = RasterizerConfig(use_pallas=True)
scene = make_synthetic_scene(n_views=8, width=512, height=512, n_verts=2048, capacity=8192, raster_config=cfg)
state, model = scene.gt_state, scene.smpl_model

# replay-path render of one view
def render_one(camera, frame, tfs, tls):
    return render_frame(state, camera, frame, model, bg=jnp.zeros(3),
                        active_sh_degree=0, config=cfg,
                        transforms=tfs, translation=tls).render

views = []
for b in scene.batches:
    full = render_frame(state, b.camera, b.frame, model, bg=jnp.zeros(3), active_sh_degree=0, config=cfg)
    views.append((b.camera, b.frame, full.transforms, full.translation))
batch = jax.tree_util.tree_map(lambda *xs: jnp.stack(xs), *views)

try:
    vr = jax.jit(jax.vmap(render_one))
    imgs = vr(*batch)
    imgs.block_until_ready()
    print("vmap render works:", imgs.shape, flush=True)
    t0=time.perf_counter(); n=20
    for _ in range(n):
        r = vr(*batch)
    r.block_until_ready()
    dt = (time.perf_counter()-t0)/n*1000
    print("vmap batch=8: %.2f ms total -> %.2f ms/frame (%.0f FPS)" % (dt, dt/8, 8000/dt), flush=True)
except Exception as e:
    print("vmap failed:", type(e).__name__, str(e)[:300], flush=True)
