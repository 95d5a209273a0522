from mygauhuman_tpu.ops.sh import eval_sh, rgb2sh, sh2rgb  # noqa: F401
from mygauhuman_tpu.ops.knn import knn, mean_knn_dist2  # noqa: F401
