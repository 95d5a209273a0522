"""Multi-host validation runner (SURVEY §5.8, BASELINE "N>=2 hosts" row).

The reference is single-GPU/single-process; this exercises the one code
path no single-process test can reach: `jax.distributed.initialize` + the
DCN-aware hybrid mesh (`parallel/mesh.py::make_hybrid_mesh` with
process_count > 1) + the tile-sharded SPMD train step spanning processes,
with the "data" axis laid across hosts and the raster axes inside each
host's device domain.

Topology (default): 2 processes x 4 virtual CPU devices each ->
mesh (data=2 over DCN, gauss=2, tiles=2). The same (2, 2, 2) mesh is then
built inside ONE process over 8 virtual devices and the run repeated;
losses and global parameter checksums must agree to fp tolerance (the
multi-host program is the same SPMD program — only the process boundary
and the Gloo collectives differ).

Usage:
  python scripts/run_multihost.py            # orchestrates everything
  python scripts/run_multihost.py --nprocs 2 --steps 2 --out MULTIHOST.json

Exit code 0 and an `"ok": true` row in MULTIHOST.json on success.
"""
from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys

REPO = os.path.abspath(os.path.join(os.path.dirname(__file__), ".."))


def build_parser():
    p = argparse.ArgumentParser()
    p.add_argument("--nprocs", type=int, default=2)
    p.add_argument("--devices_per_proc", type=int, default=4)
    p.add_argument("--steps", type=int, default=2)
    p.add_argument("--port", type=int, default=12631)
    p.add_argument("--out", type=str, default=os.path.join(REPO, "MULTIHOST.json"))
    # internal: >=0 worker in the distributed run, -1 single-process reference
    p.add_argument("--proc_id", type=int, default=None)
    return p


def run_case(args, distributed: bool) -> dict:
    """Build the scene, the (data, gauss, tiles) mesh, and run `steps`
    tile-sharded train steps; return replicated scalars as floats.

    Runs inside a worker process (after jax.distributed.initialize when
    distributed) or inside the reference process (single-process, same
    global device count)."""
    import jax
    import jax.numpy as jnp
    import numpy as np
    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

    from mygauhuman_tpu.config import OptimizationConfig
    from mygauhuman_tpu.data.synthetic import make_synthetic_scene
    from mygauhuman_tpu.models.mlps import init_lbs_offset, init_pose_refiner
    from mygauhuman_tpu.ops.rasterize import RasterizerConfig
    from mygauhuman_tpu.parallel.mesh import make_hybrid_mesh
    from mygauhuman_tpu.parallel.train import (
        make_tile_sharded_train_step,
        stack_batches,
    )
    from mygauhuman_tpu.train.trainer import create_train_state

    dpp = args.devices_per_proc
    per_host_shape = (1, 2, dpp // 2)
    if distributed:
        mesh = make_hybrid_mesh(per_host_shape=per_host_shape)
    else:
        # the same global mesh shape, one process: data axis first
        arr = np.asarray(jax.devices()).reshape(
            args.nprocs, *per_host_shape[1:]
        )
        mesh = Mesh(arr, ("data", "gauss", "tiles"))

    cap = 512
    rc = RasterizerConfig(pallas_interpret=True, instance_capacity=4 * cap)
    scene = make_synthetic_scene(
        n_views=args.nprocs, width=64, height=64, n_verts=200,
        capacity=cap, raster_config=rc,
    )
    cfg = OptimizationConfig()
    ts, tx = create_train_state(
        cfg, scene.init_state,
        init_pose_refiner(jax.random.PRNGKey(0)),
        init_lbs_offset(jax.random.PRNGKey(1)),
    )
    step = make_tile_sharded_train_step(
        scene.smpl_model, tx, cfg, rc, bg=jnp.zeros(3), mesh=mesh,
        exchange_capacity=2048,
    )
    batch = stack_batches(scene.batches[: args.nprocs])

    # place every input as a GLOBAL array: per-Gaussian leaves over the
    # raster axes, batch leaves over data, everything else replicated —
    # each process holds the identical full value (deterministic seeds),
    # device_put extracts its addressable shards
    spec_g = NamedSharding(mesh, P(("gauss", "tiles")))
    repl = NamedSharding(mesh, P())
    spec_d = NamedSharding(mesh, P("data"))

    def put_state(leaf):
        if hasattr(leaf, "shape") and getattr(leaf, "ndim", 0) >= 1 \
                and leaf.shape[0] == cap:
            return jax.device_put(leaf, spec_g)
        return jax.device_put(leaf, repl)

    ts = jax.tree_util.tree_map(put_state, ts)
    batch = jax.tree_util.tree_map(
        lambda x: jax.device_put(x, spec_d)
        if getattr(x, "ndim", 0) >= 1 else jax.device_put(x, repl),
        batch,
    )

    loss = None
    for _ in range(args.steps):
        ts, metrics = step(ts, batch, 0)
        loss = metrics["loss"]

    @jax.jit
    def checksums(ts):
        p = ts.gauss.params
        return {
            "xyz_abs_sum": jnp.sum(jnp.abs(p.xyz)),
            "opacity_abs_sum": jnp.sum(jnp.abs(p.opacity)),
            "fdc_abs_sum": jnp.sum(jnp.abs(p.features_dc)),
            "pose_w0_abs_sum": jnp.sum(
                jnp.abs(ts.pose_refiner["layers"][0]["w"])),
            "accum_sum": jnp.sum(ts.gauss.xyz_grad_accum),
        }

    sums = jax.device_get(checksums(ts))
    out = {k: float(v) for k, v in sums.items()}
    out["loss"] = float(jax.device_get(loss))
    out["mesh"] = {k: int(v) for k, v in mesh.shape.items()}
    out["process_count"] = jax.process_count()
    out["global_devices"] = jax.device_count()
    return out


def worker_main(args):
    os.environ["XLA_FLAGS"] = (
        f"--xla_force_host_platform_device_count={args.devices_per_proc}"
        if args.proc_id >= 0
        else "--xla_force_host_platform_device_count="
             f"{args.devices_per_proc * args.nprocs}"
    )
    sys.path.insert(0, REPO)
    import jax

    jax.config.update("jax_platforms", "cpu")
    if args.proc_id >= 0:
        from mygauhuman_tpu.parallel.mesh import init_distributed

        init_distributed(
            coordinator_address=f"localhost:{args.port}",
            num_processes=args.nprocs,
            process_id=args.proc_id,
        )
        assert jax.process_count() == args.nprocs
        result = run_case(args, distributed=True)
    else:
        result = run_case(args, distributed=False)
    if args.proc_id <= 0:
        print("RESULT_JSON:" + json.dumps(result), flush=True)


def orchestrate(args) -> int:
    base = [sys.executable, os.path.abspath(__file__),
            "--nprocs", str(args.nprocs),
            "--devices_per_proc", str(args.devices_per_proc),
            "--steps", str(args.steps), "--port", str(args.port)]

    def extract(stdout: str) -> dict:
        for line in stdout.splitlines():
            if line.startswith("RESULT_JSON:"):
                return json.loads(line[len("RESULT_JSON:"):])
        raise RuntimeError("no RESULT_JSON in output:\n" + stdout[-4000:])

    print(f"[multihost] reference: 1 process x "
          f"{args.nprocs * args.devices_per_proc} devices", flush=True)
    ref = subprocess.run(base + ["--proc_id", "-1"], capture_output=True,
                         text=True, timeout=1800)
    if ref.returncode != 0:
        print(ref.stdout[-2000:] + ref.stderr[-4000:])
        return 1
    single = extract(ref.stdout)
    print(f"[multihost] single-process result: {single}", flush=True)

    print(f"[multihost] distributed: {args.nprocs} processes x "
          f"{args.devices_per_proc} devices", flush=True)
    procs = [
        subprocess.Popen(base + ["--proc_id", str(i)],
                         stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
                         text=True)
        for i in range(args.nprocs)
    ]
    outs = [p.communicate(timeout=1800)[0] for p in procs]
    rcs = [p.returncode for p in procs]
    if any(rc != 0 for rc in rcs):
        for i, o in enumerate(outs):
            print(f"--- proc {i} (rc {rcs[i]}) ---\n{o[-4000:]}")
        return 1
    multi = extract(outs[0])
    print(f"[multihost] distributed result:    {multi}", flush=True)

    keys = ["loss", "xyz_abs_sum", "opacity_abs_sum", "fdc_abs_sum",
            "pose_w0_abs_sum", "accum_sum"]
    diffs = {
        k: abs(multi[k] - single[k]) / max(abs(single[k]), 1e-12)
        for k in keys
    }
    ok = (
        all(d < 1e-4 for d in diffs.values())
        and multi["process_count"] == args.nprocs
        and multi["mesh"]["data"] == args.nprocs
    )
    row = {
        "ok": ok,
        "nprocs": args.nprocs,
        "devices_per_proc": args.devices_per_proc,
        "steps": args.steps,
        "mesh": multi["mesh"],
        "single": {k: single[k] for k in keys},
        "multi": {k: multi[k] for k in keys},
        "rel_diffs": diffs,
    }
    with open(args.out, "w") as f:
        json.dump(row, f, indent=2)
    print(f"[multihost] ok={ok} rel_diffs={diffs}", flush=True)
    print(f"[multihost] wrote {args.out}", flush=True)
    return 0 if ok else 1


def main(argv=None) -> int:
    args = build_parser().parse_args(argv)
    if args.proc_id is not None:
        worker_main(args)
        return 0
    return orchestrate(args)


if __name__ == "__main__":
    sys.exit(main())
