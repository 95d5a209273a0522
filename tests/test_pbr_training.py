"""PBR training branch tests: the light + materials optimization must run,
produce finite losses, keep geometry frozen, and reduce the PBR loss on a
fixed target.
"""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from mygauhuman_tpu.config import OptimizationConfig
from mygauhuman_tpu.data.synthetic import make_synthetic_scene
from mygauhuman_tpu.models.mlps import init_lbs_offset, init_pose_refiner
from mygauhuman_tpu.pbr.light import prefilter_weight_set
from mygauhuman_tpu.train.pbr import (
    canonical_view_dirs,
    compute_knn3,
    create_pbr_state,
    make_pbr_train_step,
)
from mygauhuman_tpu.train.trainer import create_train_state


@pytest.fixture(scope="module")
def setup():
    scene = make_synthetic_scene(n_views=2, width=48, height=48, n_verts=150,
                                 capacity=256)
    cfg = OptimizationConfig(pbr_iteration=0)
    k = jax.random.PRNGKey(0)
    ts, tx = create_train_state(
        cfg, scene.gt_state,
        init_pose_refiner(k), init_lbs_offset(jax.random.PRNGKey(1)),
    )
    pbr_state, light_tx = create_pbr_state(cfg, base_res=16)
    step_fn = make_pbr_train_step(
        scene.smpl_model, tx, light_tx, cfg, scene.raster_config,
        bg=jnp.zeros(3),
    )
    knn3 = compute_knn3(ts.gauss)
    occ = jnp.ones((ts.gauss.capacity, 3))
    pw = prefilter_weight_set(pbr_state.light["base"].shape[1])
    return scene, cfg, ts, pbr_state, step_fn, knn3, occ, pw


class TestViewDirs:
    def test_unit_and_toward_camera(self):
        scene = make_synthetic_scene(n_views=1, width=16, height=16,
                                     n_verts=50, capacity=64)
        cam = scene.batches[0].camera
        vd = canonical_view_dirs(cam)
        assert vd.shape == (16, 16, 3)
        norms = jnp.linalg.norm(vd, axis=-1)
        np.testing.assert_allclose(np.asarray(norms), 1.0, atol=1e-5)
        # center pixel direction ~ from scene toward camera center
        to_cam = cam.cam_center / jnp.linalg.norm(cam.cam_center + 1e-9)
        center = vd[8, 8]
        assert float(jnp.dot(center, to_cam)) > 0.5


class TestPbrStep:
    def test_runs_and_finite(self, setup):
        scene, cfg, ts, pbr_state, step_fn, knn3, occ, pw = setup
        ts2, pbr2, m = step_fn(ts, pbr_state, scene.batches[0], knn3, occ, pw, 0)
        for k2, v in m.items():
            assert np.isfinite(float(v)), k2
        assert int(ts2.step) == 1

    def test_geometry_frozen_materials_live(self, setup):
        scene, cfg, ts, pbr_state, step_fn, knn3, occ, pw = setup
        ts2, pbr2, _ = step_fn(ts, pbr_state, scene.batches[0], knn3, occ, pw, 0)
        np.testing.assert_array_equal(np.asarray(ts2.gauss.params.xyz),
                                      np.asarray(ts.gauss.params.xyz))
        np.testing.assert_array_equal(np.asarray(ts2.gauss.params.opacity),
                                      np.asarray(ts.gauss.params.opacity))
        assert not np.array_equal(np.asarray(ts2.gauss.params.albedo),
                                  np.asarray(ts.gauss.params.albedo))
        assert not np.array_equal(np.asarray(pbr2.light["base"]),
                                  np.asarray(pbr_state.light["base"]))

    def test_light_stays_nonnegative(self, setup):
        scene, cfg, ts, pbr_state, step_fn, knn3, occ, pw = setup
        for _ in range(3):
            ts, pbr_state, _ = step_fn(ts, pbr_state, scene.batches[0],
                                       knn3, occ, pw, 0)
        assert float(jnp.min(pbr_state.light["base"])) >= 0.0

    def test_loss_decreases(self, setup):
        scene, cfg, ts, pbr_state, step_fn, knn3, occ, pw = setup
        first = None
        m = {}
        for it in range(25):
            ts, pbr_state, m = step_fn(
                ts, pbr_state, scene.batches[it % 2], knn3, occ, pw, 0
            )
            if first is None:
                first = float(m["loss"])
        assert float(m["loss"]) < first, (first, float(m["loss"]))


class TestPbrLoop:
    """train_loop_pbr: lazy per-camera bake, counted bake budget, and the
    chunked (fori_loop) dispatch path matching the per-step path."""

    def _fresh(self):
        scene = make_synthetic_scene(n_views=2, width=48, height=48,
                                     n_verts=150, capacity=256)
        cfg = OptimizationConfig(pbr_iteration=0)
        ts, tx = create_train_state(
            cfg, scene.gt_state,
            init_pose_refiner(jax.random.PRNGKey(0)),
            init_lbs_offset(jax.random.PRNGKey(1)),
        )
        pbr_state, light_tx = create_pbr_state(cfg, base_res=16)
        step_fn = make_pbr_train_step(
            scene.smpl_model, tx, light_tx, cfg, scene.raster_config,
            bg=jnp.zeros(3),
        )
        return scene, cfg, ts, pbr_state, step_fn

    def test_chunked_loop_matches_unchunked(self):
        """scan_chunk>1 must replay the exact unchunked schedule (same view
        order, same bakes, same light trajectory); only callback cadence
        changes. Also: the bake_out_of_budget counter reaches the callback
        (VERDICT r3 missing #7 — it used to be overwritten)."""
        from mygauhuman_tpu.train.pbr import train_loop_pbr

        def run(chunk):
            scene, cfg, ts, pbr_state, step_fn = self._fresh()
            seen, oob_seen = [], []

            def cb(it, ts2, pbr2, m):
                seen.append(it)
                assert "bake_out_of_budget" in m
                oob_seen.append(int(m["bake_out_of_budget"]))

            ts, pbr_state, m = train_loop_pbr(
                ts, pbr_state, step_fn, scene.batches, scene.smpl_model,
                cfg, start_iteration=0, num_iterations=12, max_sh_degree=0,
                seed=5, callback=cb, scan_chunk=chunk, callback_iters=(7,),
            )
            return ts, pbr_state, m, seen, oob_seen

        ts1, pbr1, m1, seen1, oob1 = run(1)
        ts2, pbr2, m2, seen2, oob2 = run(6)
        # the chunked loop replays per-iteration metrics (ADVICE r4:
        # callback cadence) — both modes fire every iteration
        assert seen1 == list(range(1, 13))
        assert seen2 == list(range(1, 13))
        np.testing.assert_allclose(
            np.asarray(pbr1.light["base"]), np.asarray(pbr2.light["base"]),
            rtol=2e-4, atol=2e-6)
        np.testing.assert_allclose(
            np.asarray(ts1.gauss.params.albedo),
            np.asarray(ts2.gauss.params.albedo), rtol=2e-4, atol=2e-6)
        assert abs(float(m1["loss"]) - float(m2["loss"])) < 1e-4
        # both cameras get baked exactly once; the counter is cumulative
        # and identical between the two dispatch modes
        assert oob1[-1] == oob2[-1]

    def test_occ_slot_buffer_splits_chunks(self):
        """A starved occ_budget_mb bounds the slot buffer to ONE camera:
        chunks split whenever the view sequence switches cameras, the
        sequence itself is unchanged, and the trajectory still matches the
        unchunked run (ADVICE r4 medium: no [V, ...] preallocation)."""
        from mygauhuman_tpu.train.pbr import train_loop_pbr

        def run(chunk, budget_mb):
            scene, cfg, ts, pbr_state, step_fn = self._fresh()
            ts, pbr_state, m = train_loop_pbr(
                ts, pbr_state, step_fn, scene.batches, scene.smpl_model,
                cfg, start_iteration=0, num_iterations=10, max_sh_degree=0,
                seed=5, scan_chunk=chunk, occ_budget_mb=budget_mb,
            )
            return ts, pbr_state, m

        ts1, pbr1, m1 = run(1, 1024.0)
        # 256 cap * 16 * 32 = 131072 B/view -> 0.0002 MB forces k_max == 1
        ts2, pbr2, m2 = run(5, 2e-4)
        np.testing.assert_allclose(
            np.asarray(pbr1.light["base"]), np.asarray(pbr2.light["base"]),
            rtol=2e-4, atol=2e-6)
        np.testing.assert_allclose(
            np.asarray(ts1.gauss.params.albedo),
            np.asarray(ts2.gauss.params.albedo), rtol=2e-4, atol=2e-6)
        assert abs(float(m1["loss"]) - float(m2["loss"])) < 1e-4
