import os as _os, sys as _sys
_sys.path.insert(0, _os.path.abspath(_os.path.join(_os.path.dirname(__file__), "..", "..")))

import os
os.environ["XLA_FLAGS"] = os.environ.get("XLA_FLAGS", "") + " --xla_force_host_platform_device_count=8"
import jax; jax.config.update("jax_platforms", "cpu")
import time
import __graft_entry__ as g
t0 = time.time()
g.dryrun_multichip(8)
print(f"took {time.time()-t0:.1f}s")
