"""On-HARDWARE gradient parity: Pallas fwd+bwd kernels vs the jnp spec's
autodiff, same RasterizerConfig (CI covers interpret mode only; this runs
the real Mosaic kernels). Round-4 result: fwd image max|diff| 3.8e-3
(the jnp path's MXU matmuls run at default precision on TPU — the kernel
accumulates in f32 and is the more accurate side), opacity grad rel
2.1e-4, feature grad rel 3.8e-5."""
import os as _os, sys as _sys
_sys.path.insert(0, _os.path.abspath(_os.path.join(_os.path.dirname(__file__), "..", "..")))

import jax, jax.numpy as jnp, numpy as np
from mygauhuman_tpu.utils.compile_cache import enable_persistent_cache
enable_persistent_cache()
from mygauhuman_tpu.data.camera import make_camera
from mygauhuman_tpu.ops.projection import compute_cov3d
from mygauhuman_tpu.ops.rasterize import RasterizerConfig, rasterize

rng = np.random.default_rng(7)
n = 700
cam = make_camera(R=np.eye(3), t=np.zeros(3), width=256, height=256,
                  fovx=np.deg2rad(60), fovy=np.deg2rad(50))
pts = np.concatenate([rng.uniform(-0.8, 0.8, (n, 2)),
                      2.0 + rng.uniform(size=(n, 1))], -1).astype(np.float32)
cov6 = compute_cov3d(
    jnp.asarray(np.exp(rng.uniform(np.log(0.02), np.log(0.1), (n, 3))).astype(np.float32)),
    jnp.asarray(rng.normal(size=(n, 4)).astype(np.float32)))
opac = jnp.asarray(rng.uniform(0.2, 0.95, n).astype(np.float32))
feat = jnp.asarray(rng.uniform(size=(n, 3)).astype(np.float32))
tgt = jnp.asarray(rng.uniform(size=(256, 256, 3)).astype(np.float32))

def fwd(op, ft, cfg):
    return rasterize(jnp.asarray(pts), cov6, op, ft,
                     jnp.asarray(cam.w2c), jnp.asarray(cam.full_proj),
                     jnp.zeros(3), width=256, height=256,
                     tan_fovx=float(cam.tan_fovx), tan_fovy=float(cam.tan_fovy),
                     config=cfg)

def loss(op, ft, cfg):
    out = fwd(op, ft, cfg)
    return jnp.sum((out.image - tgt) ** 2) + jnp.sum(out.alpha ** 2)

cfg_k = RasterizerConfig(use_pallas=True)
cfg_j = RasterizerConfig(use_pallas=False)
o_k = jax.jit(lambda o, f: fwd(o, f, cfg_k).image)(opac, feat)
o_j = jax.jit(lambda o, f: fwd(o, f, cfg_j).image)(opac, feat)
print("fwd image max|diff|:", float(jnp.abs(o_k - o_j).max()), flush=True)
g_k = jax.jit(jax.grad(loss, argnums=(0, 1)), static_argnums=2)(opac, feat, cfg_k)
g_j = jax.jit(jax.grad(loss, argnums=(0, 1)), static_argnums=2)(opac, feat, cfg_j)
ok = True
for a, b, name in zip(g_k, g_j, ("opacity", "features")):
    d = float(jnp.abs(a - b).max())
    r = d / (float(jnp.abs(b).max()) + 1e-12)
    print(f"{name}: max|diff| {d:.3e}  rel {r:.3e}", flush=True)
    ok &= r < 1e-3
print("TPU gradient parity", "OK" if ok else "FAILED")
