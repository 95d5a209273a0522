"""Determinism + multi-chip equivalence — requirements with no reference
analogue (SURVEY.md §4, §5.2): gradient reduction must be bitwise
reproducible (segment-sums, not atomics), and the sharded batched step must
match the unsharded one.
"""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from mygauhuman_tpu.config import OptimizationConfig
from mygauhuman_tpu.data.synthetic import make_synthetic_scene
from mygauhuman_tpu.models.mlps import init_lbs_offset, init_pose_refiner
from mygauhuman_tpu.parallel.mesh import (
    batch_sharding,
    make_mesh,
    shard_tree,
    state_sharding,
)
from mygauhuman_tpu.parallel.train import make_batched_train_step, stack_batches
from mygauhuman_tpu.train.trainer import create_train_state, make_train_step


@pytest.fixture(scope="module")
def setup():
    scene = make_synthetic_scene(n_views=2, width=32, height=32, n_verts=100,
                                 capacity=128)
    cfg = OptimizationConfig()
    k = jax.random.PRNGKey(0)
    ts, tx = create_train_state(
        cfg, scene.init_state,
        init_pose_refiner(k), init_lbs_offset(jax.random.PRNGKey(1)),
    )
    return scene, cfg, ts, tx


class TestDeterminism:
    def test_gradients_bitwise_reproducible(self, setup):
        """The same train step twice from the same state must produce
        BITWISE identical parameters (deterministic reductions — the CUDA
        reference's atomicAdd backward is order-nondeterministic)."""
        scene, cfg, ts, tx = setup
        step_fn = make_train_step(scene.smpl_model, tx, cfg,
                                  scene.raster_config, bg=jnp.zeros(3))
        ts1, m1 = step_fn(ts, scene.batches[0], 0)
        ts2, m2 = step_fn(ts, scene.batches[0], 0)
        for a, b in zip(jax.tree_util.tree_leaves(ts1.gauss.params),
                        jax.tree_util.tree_leaves(ts2.gauss.params)):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
        assert float(m1["loss"]) == float(m2["loss"])


class TestMultichipEquivalence:
    def test_sharded_step_matches_unsharded(self, setup):
        """One batched step on an 8-device mesh == the same step without
        sharding annotations (GSPMD must not change the math beyond fp
        reduction order)."""
        scene, cfg, ts, tx = setup
        step_fn = make_batched_train_step(
            scene.smpl_model, tx, cfg, scene.raster_config, bg=jnp.zeros(3)
        )
        batch = stack_batches(scene.batches)

        ts_plain, m_plain = step_fn(ts, batch, 0)

        mesh = make_mesh(n_data=2)
        ts_sh = shard_tree(mesh, ts, state_sharding(mesh, ts,
                                                    ts.gauss.capacity))
        batch_sh = shard_tree(mesh, batch, batch_sharding(mesh, batch))
        ts_mesh, m_mesh = step_fn(ts_sh, batch_sh, 0)

        np.testing.assert_allclose(
            float(m_mesh["loss"]), float(m_plain["loss"]), rtol=1e-5
        )
        np.testing.assert_allclose(
            np.asarray(ts_mesh.gauss.params.xyz),
            np.asarray(ts_plain.gauss.params.xyz),
            atol=1e-6,
        )
        np.testing.assert_allclose(
            np.asarray(ts_mesh.gauss.xyz_grad_accum),
            np.asarray(ts_plain.gauss.xyz_grad_accum),
            atol=1e-5, rtol=1e-4,
        )

    def test_batched_step_equals_sum_of_singles(self, setup):
        """Densify statistics from one batched step over B views equal the
        sum of B sequential single-view steps (parallel/train.py contract)."""
        scene, cfg, ts, tx = setup
        single = make_train_step(scene.smpl_model, tx, cfg,
                                 scene.raster_config, bg=jnp.zeros(3))
        batched = make_batched_train_step(
            scene.smpl_model, tx, cfg, scene.raster_config, bg=jnp.zeros(3)
        )
        ts_a, _ = single(ts, scene.batches[0], 0)
        ts_a, _ = single(
            ts_a._replace(gauss=ts_a.gauss, step=ts_a.step),
            scene.batches[1], 0,
        )
        ts_b, _ = batched(ts, stack_batches(scene.batches), 0)
        # stats accumulate identically (params differ: 2 Adam updates vs 1)
        np.testing.assert_allclose(
            np.asarray(ts_b.gauss.denom), np.asarray(ts_a.gauss.denom),
            atol=1e-6,
        )


class TestTileShardedStep:
    """The fully-SPMD tile-sharded step (shard_map + Pallas kernel +
    all_to_all exchange, parallel/train.py::make_tile_sharded_train_step)."""

    @pytest.fixture(scope="class")
    def tile_setup(self):
        from jax.sharding import Mesh

        from mygauhuman_tpu.ops.rasterize import RasterizerConfig
        from mygauhuman_tpu.parallel.train import (
            make_tile_sharded_train_step,
        )

        rc = RasterizerConfig(tile_capacity=128, max_tiles_per_gaussian=8,
                              pallas_interpret=True)
        scene = make_synthetic_scene(n_views=2, width=64, height=64,
                                     n_verts=100, capacity=256,
                                     raster_config=rc)
        cfg = OptimizationConfig()
        ts, tx = create_train_state(
            cfg, scene.init_state,
            init_pose_refiner(jax.random.PRNGKey(0)),
            init_lbs_offset(jax.random.PRNGKey(1)),
        )
        mesh = Mesh(
            np.asarray(jax.devices()[:8]).reshape(2, 2, 2),
            ("data", "gauss", "tiles"),
        )
        step = make_tile_sharded_train_step(
            scene.smpl_model, tx, cfg, rc, bg=jnp.zeros(3), mesh=mesh,
            exchange_capacity=512,
        )
        batch = stack_batches(scene.batches[:2])
        return scene, cfg, ts, tx, step, batch, rc

    def test_matches_single_device_mean(self, tile_setup):
        """Sharded loss == mean of per-view single-device losses; sharded
        param update finite and nontrivial."""
        scene, cfg, ts, tx, step, batch, rc = tile_setup
        new_ts, metrics = step(ts, batch, 0)
        rc1 = rc._replace(pallas_interpret=False, use_pallas=False)
        sstep = make_train_step(scene.smpl_model, tx, cfg, rc1,
                                bg=jnp.zeros(3))
        _, m1 = sstep(ts, scene.batches[0], 0)
        _, m2 = sstep(ts, scene.batches[1], 0)
        ref = 0.5 * (float(m1["loss"]) + float(m2["loss"]))
        assert abs(ref - float(metrics["loss"])) < 2e-3 * max(1.0, abs(ref))
        d = float(jnp.abs(new_ts.gauss.params.xyz - ts.gauss.params.xyz).max())
        assert 0 < d < 1

    def test_bitwise_reproducible(self, tile_setup):
        """The tile-sharded step twice from the same state -> bitwise
        identical params (deterministic exchange + segment reductions)."""
        scene, cfg, ts, tx, step, batch, rc = tile_setup
        ts1, m1 = step(ts, batch, 0)
        ts2, m2 = step(ts, batch, 0)
        for a, b in zip(jax.tree_util.tree_leaves(ts1.gauss.params),
                        jax.tree_util.tree_leaves(ts2.gauss.params)):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
        assert float(m1["loss"]) == float(m2["loss"])


class TestTileShardedLoop:
    """The full training LOOP over the tile-sharded step (the cli/train.py
    --multichip wiring): densify events and capacity growth must work on
    globally-sharded state — densify's argsort/scatter over the sharded
    capacity axis and grow_capacity's concat + Adam-slot growth are exactly
    where GSPMD could silently mis-shard (VERDICT r3 #4)."""

    def test_loop_with_densify_and_growth_matches_single_device(self):
        from jax.sharding import Mesh

        from mygauhuman_tpu.ops.rasterize import RasterizerConfig
        from mygauhuman_tpu.parallel.train import (
            make_tile_sharded_train_step,
            stack_batches,
        )
        from mygauhuman_tpu.train.trainer import train_loop

        # both paths run the SAME kernel math (interpret-mode Pallas) so
        # loop divergence can only come from the sharded exchange/reductions
        rc = RasterizerConfig(tile_capacity=128, max_tiles_per_gaussian=8,
                              use_pallas=True, pallas_interpret=True)
        scene = make_synthetic_scene(n_views=2, width=64, height=64,
                                     n_verts=100, capacity=128,
                                     raster_config=rc)
        # capacity 128 with min_free=max(256, cap//8) forces grow_capacity
        # (128 -> 256 -> 512) at the first densify events: growth of the
        # sharded state + Adam moments is exercised, not just densify
        cfg = OptimizationConfig(
            iterations=22, densify_from_iter=5, densify_until_iter=21,
            densification_interval=7,
        )

        def run(step_builder):
            init = jax.tree_util.tree_map(jnp.copy, scene.init_state)
            ts, tx = create_train_state(
                cfg, init,
                init_pose_refiner(jax.random.PRNGKey(0)),
                init_lbs_offset(jax.random.PRNGKey(1)),
            )
            step_fn = step_builder(tx)
            events = []
            ts, m = train_loop(
                ts, tx, step_fn, scene.batches, cfg,
                extent=scene.extent, smpl_vertices=scene.big_pose_verts,
                max_sh_degree=0, seed=11,
                callback=lambda it, ts2, m2: events.append(
                    (it, int(ts2.gauss.capacity), int(ts2.gauss.num_alive))
                ),
            )
            return ts, m, events

        def single_builder(tx):
            return make_train_step(scene.smpl_model, tx, cfg, rc,
                                   bg=jnp.zeros(3))

        def sharded_builder(tx):
            # the cli/train.py --multichip wiring: data axis degenerate on
            # one host, raster axes over the 8 virtual devices, one view
            # per iteration stacked to B=1
            mesh = Mesh(
                np.asarray(jax.devices()[:8]).reshape(1, 2, 4),
                ("data", "gauss", "tiles"),
            )
            base = make_tile_sharded_train_step(
                scene.smpl_model, tx, cfg, rc, bg=jnp.zeros(3), mesh=mesh,
                exchange_capacity=1024,
            )

            def step_fn(ts, batch, deg):
                return base(ts, stack_batches([batch]), deg)

            return step_fn

        ts_s, m_s, ev_s = run(single_builder)
        ts_m, m_m, ev_m = run(sharded_builder)

        # the schedule replayed identically: same densify/growth trajectory
        assert ev_s == ev_m, (ev_s, ev_m)
        caps = [c for _, c, _ in ev_s]
        assert caps[0] == 128 and caps[-1] >= 512          # growth happened
        alive = [a for _, _, a in ev_s]
        # densify/prune actually fired (on this tiny synthetic scene prune
        # dominates; the point is the event ran on sharded state)
        assert alive[-1] != alive[0]
        assert abs(float(m_s["loss"]) - float(m_m["loss"])) \
            < 2e-3 * max(1.0, abs(float(m_s["loss"])))
        np.testing.assert_allclose(
            np.asarray(ts_m.gauss.params.xyz),
            np.asarray(ts_s.gauss.params.xyz), atol=5e-3)
        np.testing.assert_array_equal(
            np.asarray(ts_m.gauss.alive), np.asarray(ts_s.gauss.alive))


class TestTileShardedPbr:
    """Phase B under the mesh (parallel/train.py::make_tile_sharded_pbr_step,
    VERDICT r4 missing #2): the sharded PBR step must match the
    single-device step, and the full A->B loop must run on globally-sharded
    state (replicated bake included)."""

    def _scene(self):
        from mygauhuman_tpu.ops.rasterize import RasterizerConfig

        rc = RasterizerConfig(tile_capacity=128, max_tiles_per_gaussian=8,
                              use_pallas=True, pallas_interpret=True)
        scene = make_synthetic_scene(n_views=2, width=64, height=64,
                                     n_verts=100, capacity=256,
                                     raster_config=rc)
        cfg = OptimizationConfig(pbr_iteration=0)
        ts, tx = create_train_state(
            cfg, scene.init_state,
            init_pose_refiner(jax.random.PRNGKey(0)),
            init_lbs_offset(jax.random.PRNGKey(1)),
        )
        return scene, cfg, ts, tx, rc

    def test_sharded_pbr_step_matches_single_device(self):
        from jax.sharding import Mesh

        from mygauhuman_tpu.parallel.train import (
            make_tile_sharded_pbr_step,
        )
        from mygauhuman_tpu.pbr.light import prefilter_weight_set
        from mygauhuman_tpu.train.pbr import (
            compute_knn3,
            create_pbr_state,
            make_pbr_train_step,
        )

        scene, cfg, ts, tx, rc = self._scene()
        pbr_state, light_tx = create_pbr_state(cfg, base_res=16)
        knn3 = compute_knn3(ts.gauss)
        occ = jnp.full((ts.gauss.capacity, 3), 0.5)
        pw = jax.tree_util.tree_map(
            jnp.asarray, prefilter_weight_set(16))

        rc1 = rc._replace(pallas_interpret=False, use_pallas=False)
        sstep = make_pbr_train_step(scene.smpl_model, tx, light_tx, cfg,
                                    rc1, bg=jnp.zeros(3))
        ts1, pbr1, m1 = sstep(ts, pbr_state, scene.batches[0], knn3, occ,
                              pw, 0)

        mesh = Mesh(
            np.asarray(jax.devices()[:8]).reshape(1, 2, 4),
            ("data", "gauss", "tiles"),
        )
        mstep = make_tile_sharded_pbr_step(
            scene.smpl_model, tx, light_tx, cfg, rc, bg=jnp.zeros(3),
            mesh=mesh, exchange_capacity=1024,
        )
        ts2, pbr2, m2 = mstep(ts, pbr_state, stack_batches(
            [scene.batches[0]]), knn3, occ[None], pw, 0)

        assert abs(float(m1["loss"]) - float(m2["loss"])) \
            < 2e-3 * max(1.0, abs(float(m1["loss"])))
        np.testing.assert_allclose(
            np.asarray(pbr2.light["base"]), np.asarray(pbr1.light["base"]),
            atol=5e-5)
        np.testing.assert_allclose(
            np.asarray(ts2.gauss.params.albedo),
            np.asarray(ts1.gauss.params.albedo), atol=5e-4)
        np.testing.assert_allclose(
            np.asarray(ts2.gauss.params.roughness),
            np.asarray(ts1.gauss.params.roughness), atol=5e-4)
        # geometry stays frozen in phase B on both paths
        np.testing.assert_array_equal(
            np.asarray(ts2.gauss.params.xyz), np.asarray(ts.gauss.params.xyz))

    def test_a_to_b_loop_on_mesh_matches_single_device(self):
        """The cli --multichip A->B wiring end-to-end on the 8-device
        virtual mesh: phase-A tile-sharded steps, then train_loop_pbr with
        the sharded PBR step (replicated full-coverage bake on sharded
        state), vs the same schedule single-device."""
        from jax.sharding import Mesh

        from mygauhuman_tpu.parallel.train import (
            make_tile_sharded_pbr_step,
            make_tile_sharded_train_step,
            stack_batches,
        )
        from mygauhuman_tpu.train.pbr import (
            create_pbr_state,
            make_pbr_train_step,
            train_loop_pbr,
        )
        from mygauhuman_tpu.train.trainer import make_train_step, train_loop

        scene, _, _, _, rc = self._scene()
        cfg = OptimizationConfig(
            iterations=8, pbr_iteration=4,
            densify_from_iter=2, densify_until_iter=4,
            densification_interval=2,
        )

        def run(sharded):
            init = jax.tree_util.tree_map(jnp.copy, scene.init_state)
            ts, tx = create_train_state(
                cfg, init,
                init_pose_refiner(jax.random.PRNGKey(0)),
                init_lbs_offset(jax.random.PRNGKey(1)),
            )
            pbr_state, light_tx = create_pbr_state(cfg, base_res=16)
            if sharded:
                mesh = Mesh(
                    np.asarray(jax.devices()[:8]).reshape(1, 2, 4),
                    ("data", "gauss", "tiles"),
                )
                base_a = make_tile_sharded_train_step(
                    scene.smpl_model, tx, cfg, rc, bg=jnp.zeros(3),
                    mesh=mesh, exchange_capacity=1024)
                step_a = lambda t, b, d: base_a(t, stack_batches([b]), d)  # noqa: E731
                base_b = make_tile_sharded_pbr_step(
                    scene.smpl_model, tx, light_tx, cfg, rc,
                    bg=jnp.zeros(3), mesh=mesh, exchange_capacity=1024)
                step_b = lambda t, p, b, k, o, w, d: base_b(  # noqa: E731
                    t, p, stack_batches([b]), k, o[None], w, d)
            else:
                rc1 = rc._replace(pallas_interpret=False, use_pallas=False)
                step_a = make_train_step(scene.smpl_model, tx, cfg, rc1,
                                         bg=jnp.zeros(3))
                step_b = make_pbr_train_step(
                    scene.smpl_model, tx, light_tx, cfg, rc1,
                    bg=jnp.zeros(3))
            ts, _ = train_loop(
                ts, tx, step_fn=step_a, batches=scene.batches, cfg=cfg,
                extent=scene.extent, smpl_vertices=scene.big_pose_verts,
                max_sh_degree=0, seed=11, num_iterations=cfg.pbr_iteration,
            )
            ts, pbr_state, m = train_loop_pbr(
                ts, pbr_state, step_b, scene.batches, scene.smpl_model,
                cfg, start_iteration=cfg.pbr_iteration,
                num_iterations=cfg.iterations - cfg.pbr_iteration,
                max_sh_degree=0, seed=11, bake_max_cells=16,
            )
            return ts, pbr_state, m

        ts_s, pbr_s, m_s = run(sharded=False)
        ts_m, pbr_m, m_m = run(sharded=True)
        assert int(m_s["bake_out_of_budget"]) == 0
        assert int(m_m["bake_out_of_budget"]) == 0
        assert abs(float(m_s["loss"]) - float(m_m["loss"])) \
            < 5e-3 * max(1.0, abs(float(m_s["loss"])))
        np.testing.assert_allclose(
            np.asarray(pbr_m.light["base"]), np.asarray(pbr_s.light["base"]),
            atol=5e-4)
        np.testing.assert_allclose(
            np.asarray(ts_m.gauss.params.albedo),
            np.asarray(ts_s.gauss.params.albedo), atol=5e-3)
