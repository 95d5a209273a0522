"""Multi-host (multi-process) execution: the one SURVEY §5.8 axis a
single-process test cannot cover. Drives scripts/run_multihost.py — two OS
processes, each with 4 virtual CPU devices, jax.distributed.initialize over
a local coordinator, the DCN-aware hybrid mesh (data axis across
processes), and the tile-sharded train step — and asserts parity with the
identical single-process (2, 2, 2)-mesh run."""
import json
import os
import subprocess
import sys

REPO = os.path.abspath(os.path.join(os.path.dirname(__file__), ".."))


def test_two_process_step_matches_single_process(tmp_path):
    out = str(tmp_path / "MULTIHOST.json")
    r = subprocess.run(
        [sys.executable, os.path.join(REPO, "scripts", "run_multihost.py"),
         "--nprocs", "2", "--steps", "1", "--port", "12687", "--out", out],
        capture_output=True, text=True, timeout=1500,
        env={**os.environ, "JAX_PLATFORMS": "cpu"},
    )
    assert r.returncode == 0, r.stdout[-3000:] + r.stderr[-3000:]
    row = json.loads(open(out).read())
    assert row["ok"] is True
    assert row["mesh"] == {"data": 2, "gauss": 2, "tiles": 2}
    assert all(d < 1e-4 for d in row["rel_diffs"].values())
