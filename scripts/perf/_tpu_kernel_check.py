"""TPU parity + timing for the prefetch-pipelined blend kernel."""
import os as _os, sys as _sys
_sys.path.insert(0, _os.path.abspath(_os.path.join(_os.path.dirname(__file__), "..", "..")))

import time
import jax, jax.numpy as jnp, numpy as np
from mygauhuman_tpu.utils.compile_cache import enable_persistent_cache
enable_persistent_cache()
from mygauhuman_tpu.data.synthetic import make_synthetic_scene
from mygauhuman_tpu.ops.rasterize import RasterizerConfig
from mygauhuman_tpu.render import render_frame

for n_verts, cap in [(6890, 8192), (32768, 65536)]:
    cfgp = RasterizerConfig(tile_capacity=1024, chunk_tiles=64,
                            use_pallas=True, instance_capacity=8 * cap)
    cfgj = cfgp._replace(use_pallas=False)
    scene = make_synthetic_scene(n_views=2, width=512, height=512,
                                 n_verts=n_verts, capacity=cap,
                                 raster_config=cfgp)
    st, b, model = scene.gt_state, scene.batches[0], scene.smpl_model
    full = render_frame(st, b.camera, b.frame, model, bg=jnp.zeros(3),
                        active_sh_degree=0, config=cfgp)
    tfs, tls = full.transforms, full.translation

    def render(cfg):
        @jax.jit
        def f(params):
            out = render_frame(st._replace(params=params), b.camera, b.frame,
                               model, bg=jnp.zeros(3), active_sh_degree=0,
                               config=cfg, transforms=tfs, translation=tls)
            return out.render
        return f
    fp, fj = render(cfgp), render(cfgj)
    ip = np.asarray(fp(st.params)); ij = np.asarray(fj(st.params))
    err = np.abs(ip - ij).max()
    print(f"{n_verts}G parity pallas-vs-jnp maxerr: {err:.2e}")
    assert err < 2e-3, err
    # timing
    fp(st.params).block_until_ready()
    t0 = time.perf_counter(); reps = 0
    while True:
        for _ in range(64): o = fp(st.params); reps += 1
        o.block_until_ready()
        if time.perf_counter() - t0 > 3: break
    dt = (time.perf_counter() - t0) / reps * 1e3
    print(f"{n_verts}G render: {dt:.2f} ms = {1000/dt:.0f} FPS")


# --- TPU-vs-f32 numerics drift (run the CPU half with JAX_PLATFORMS unset
# in a separate process; see PERF.md "Numerics (round 2b)").
# Usage: python scripts/perf/_tpu_kernel_check.py          (TPU: saves .npy)
#        python scripts/perf/_tpu_kernel_check.py --cpu    (CPU: compares)
# Expected drift after the Precision.HIGHEST fixes: max < 5e-3 (in-kernel
# bf16 color accumulation only). Before the fixes it was 0.099.
