import os as _os, sys as _sys
_sys.path.insert(0, _os.path.abspath(_os.path.join(_os.path.dirname(__file__), "..", "..")))

import jax
jax.config.update("jax_explain_cache_misses", True)
from mygauhuman_tpu.cli.train import main
r = main(["--synthetic", "--synthetic_size", "64", "--synthetic_verts", "100",
          "--iterations", "12", "--test_iterations", "12",
          "--save_iterations", "12", "--exp_name", "_cmiss",
          "--scan_chunk", "10", "--skip_galleries"])
print("OK", r["elapsed_s"])
