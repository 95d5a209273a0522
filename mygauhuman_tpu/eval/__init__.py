from mygauhuman_tpu.eval.lpips import LPIPS  # noqa: F401
from mygauhuman_tpu.eval.metrics import evaluate_images  # noqa: F401
