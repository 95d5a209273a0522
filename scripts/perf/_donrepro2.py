import os as _os, sys as _sys
_sys.path.insert(0, _os.path.abspath(_os.path.join(_os.path.dirname(__file__), "..", "..")))

import jax, collections
from mygauhuman_tpu.config import OptimizationConfig
from mygauhuman_tpu.data.synthetic import make_synthetic_scene
from mygauhuman_tpu.ops.rasterize import RasterizerConfig
from mygauhuman_tpu.train.trainer import create_train_state
from mygauhuman_tpu.models.mlps import init_lbs_offset, init_pose_refiner

scene = make_synthetic_scene(n_views=2, width=64, height=64, n_verts=100,
                             capacity=256,
                             raster_config=RasterizerConfig(use_pallas=False))
cfg = OptimizationConfig()
ts, tx = create_train_state(cfg, scene.init_state,
                            init_pose_refiner(jax.random.PRNGKey(0)),
                            init_lbs_offset(jax.random.PRNGKey(1)))
leaves, treedef = jax.tree_util.tree_flatten_with_path(ts)
byid = collections.defaultdict(list)
for path, leaf in leaves:
    if hasattr(leaf, "unsafe_buffer_pointer"):
        try:
            byid[leaf.unsafe_buffer_pointer()].append(jax.tree_util.keystr(path))
        except Exception:
            byid[id(leaf)].append(jax.tree_util.keystr(path))
for ptr, paths in byid.items():
    if len(paths) > 1:
        print("SHARED:", paths)
print("total leaves:", len(leaves))
