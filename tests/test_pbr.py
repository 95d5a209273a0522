"""PBR stack tests: cubemap sampling round-trips, prefilter physics,
split-sum shading behavior, BRDF LUT sanity, BSDF reference properties.

The reference's only test suite is CUDA-vs-python relative error eyeballing
(pbr/renderutils/tests, SURVEY.md §4); here the invariants are asserted.
"""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from mygauhuman_tpu.pbr import bsdf as B
from mygauhuman_tpu.pbr import cubemap as C
from mygauhuman_tpu.pbr import light as L
from mygauhuman_tpu.pbr import shade as S
from mygauhuman_tpu.pbr.prefilter import diffuse_cubemap, specular_cubemap


class TestCubemap:
    def test_dir_uv_round_trip(self):
        # every texel's direction must map back to its own face/texel
        R = 16
        dirs = C.face_directions(R)
        face, gx, gy = C.dir_to_cube_uv(dirs)
        exp_face = np.broadcast_to(np.arange(6)[:, None, None], (6, R, R))
        np.testing.assert_array_equal(np.asarray(face), exp_face)
        egx, egy = C.face_grid(R)
        np.testing.assert_allclose(np.asarray(gx), np.broadcast_to(egx, (6, R, R)), atol=1e-5)
        np.testing.assert_allclose(np.asarray(gy), np.broadcast_to(egy, (6, R, R)), atol=1e-5)

    def test_sample_at_texel_centers_exact(self):
        R = 8
        rng = np.random.RandomState(0)
        cm = jnp.asarray(rng.rand(6, R, R, 3), jnp.float32)
        dirs = C.face_directions(R)
        got = C.sample_cubemap(cm, dirs)
        np.testing.assert_allclose(np.asarray(got), np.asarray(cm), atol=1e-5)

    def test_constant_cubemap_samples_constant(self):
        cm = jnp.full((6, 8, 8, 3), 0.7)
        rng = np.random.RandomState(1)
        dirs = rng.randn(100, 3).astype(np.float32)
        dirs /= np.linalg.norm(dirs, axis=1, keepdims=True)
        got = C.sample_cubemap(cm, jnp.asarray(dirs))
        np.testing.assert_allclose(np.asarray(got), 0.7, atol=1e-6)

    def test_solid_angles_sum_to_4pi(self):
        w = C.texel_solid_angles(16)
        np.testing.assert_allclose(float(jnp.sum(w)), 4 * np.pi, rtol=1e-3)

    def test_latlong_round_trip(self):
        rng = np.random.RandomState(0)
        # smooth cubemap (constant per face) survives latlong round trip
        cm = jnp.asarray(
            np.broadcast_to(rng.rand(6, 1, 1, 3), (6, 16, 16, 3)).copy(),
            jnp.float32,
        )
        ll = C.cubemap_to_latlong(cm, 64, 128)
        back = C.latlong_to_cubemap(ll, 16)
        # interior texels of each face should match the face color
        np.testing.assert_allclose(
            np.asarray(back[:, 6:10, 6:10]), np.asarray(cm[:, 6:10, 6:10]),
            atol=0.05,
        )

    def test_gradients_flow_to_texels(self):
        cm = jnp.ones((6, 8, 8, 3))
        dirs = jnp.asarray([[0.3, 0.5, 0.8]]) / np.linalg.norm([0.3, 0.5, 0.8])
        g = jax.grad(lambda c: jnp.sum(C.sample_cubemap(c, dirs)))(cm)
        assert float(jnp.sum(jnp.abs(g))) > 0
        # bilinear weights sum to 1 per channel
        np.testing.assert_allclose(float(jnp.sum(g)), 3.0, rtol=1e-5)


class TestPrefilter:
    def test_diffuse_constant_env_is_constant(self):
        cm = jnp.full((6, 16, 16, 3), 2.0)
        out = diffuse_cubemap(cm)
        # irradiance of constant radiance L: integral L*cos/pi domega = L
        np.testing.assert_allclose(np.asarray(out), 2.0, rtol=2e-2)

    def test_specular_constant_env_is_constant(self):
        cm = jnp.full((6, 16, 16, 3), 1.5)
        out = specular_cubemap(cm, roughness=0.3)
        np.testing.assert_allclose(np.asarray(out), 1.5, rtol=1e-3)

    def test_specular_high_roughness_blurs(self):
        rng = np.random.RandomState(0)
        cm = jnp.asarray(rng.rand(6, 16, 16, 3), jnp.float32)
        sharp = specular_cubemap(cm, roughness=0.08)
        blurry = specular_cubemap(cm, roughness=1.0)
        assert float(jnp.std(blurry)) < float(jnp.std(sharp))


class TestLight:
    def test_build_mips_shapes(self):
        params = L.init_cubemap_light(32)
        light = L.build_mips(params)
        assert light.diffuse.shape == (6, 32, 32, 3)
        sizes = [s.shape[1] for s in light.specular]
        assert sizes == [32, 16, 8]

    def test_get_mip_range(self):
        n = 3
        assert float(L.get_mip(jnp.asarray(0.08), n)) == 0.0
        np.testing.assert_allclose(float(L.get_mip(jnp.asarray(0.5), n)), n - 2)
        np.testing.assert_allclose(float(L.get_mip(jnp.asarray(1.0), n)), n - 1)

    def test_export_envmap(self):
        params = L.init_cubemap_light(16, init_value=0.25)
        env = L.export_envmap(params, 16, 32)
        assert env.shape == (16, 32, 3)
        np.testing.assert_allclose(np.asarray(env), 0.25, atol=1e-5)

    def test_light_gradients(self):
        params = L.init_cubemap_light(16)

        def f(p):
            light = L.build_mips(p)
            return jnp.sum(light.diffuse) + sum(jnp.sum(s) for s in light.specular)

        g = jax.grad(f)(params)
        assert bool(jnp.all(jnp.isfinite(g["base"])))
        assert float(jnp.sum(jnp.abs(g["base"]))) > 0


class TestBrdfLut:
    def test_lut_properties(self):
        lut = S.compute_brdf_lut(res=64, n_samples=128)
        a = np.asarray(lut[..., 0])
        b = np.asarray(lut[..., 1])
        assert np.all(a >= 0) and np.all(a <= 1.001)
        assert np.all(b >= 0) and np.all(b <= 1.001)
        # single-scatter energy conservation
        assert np.all(a + b <= 1.001)
        # low roughness, high NoV: A -> ~1, B -> ~0 (perfect mirror)
        assert a[0, -1] > 0.9
        assert b[0, -1] < 0.05


class TestShading:
    def test_shading_shapes_and_mask(self):
        params = L.init_cubemap_light(16, init_value=0.5)
        light = L.build_mips(params)
        H = W = 8
        nrm = jnp.broadcast_to(jnp.array([0.0, 0.0, 1.0]), (H, W, 3))
        view = nrm
        albedo = jnp.full((H, W, 3), 0.8)
        rough = jnp.full((H, W, 1), 0.5)
        mask = jnp.ones((H, W, 1)).at[0, 0].set(0.0)
        out = S.pbr_shading(light, nrm, view, albedo, rough, mask,
                            S.get_brdf_lut())
        rgb = out["render_rgb"]
        assert rgb.shape == (H, W, 3)
        np.testing.assert_allclose(np.asarray(rgb[0, 0]), 0.0, atol=1e-6)
        assert float(jnp.mean(rgb)) > 0.1
        # brighter light -> brighter shading
        params2 = L.init_cubemap_light(16, init_value=1.0)
        out2 = S.pbr_shading(L.build_mips(params2), nrm, view, albedo, rough,
                             jnp.ones((H, W, 1)), S.get_brdf_lut())
        assert float(jnp.mean(out2["render_rgb"])) > float(jnp.mean(rgb))

    def test_occlusion_darkens_diffuse(self):
        params = L.init_cubemap_light(16, init_value=0.5)
        light = L.build_mips(params)
        H = W = 4
        nrm = jnp.broadcast_to(jnp.array([0.0, 1.0, 0.0]), (H, W, 3))
        args = (nrm, nrm, jnp.full((H, W, 3), 0.9), jnp.full((H, W, 1), 0.8),
                jnp.ones((H, W, 1)), S.get_brdf_lut())
        full = S.pbr_shading(light, *args, occlusion=jnp.ones((H, W, 1)))
        half = S.pbr_shading(light, *args, occlusion=jnp.full((H, W, 1), 0.5))
        assert float(jnp.mean(half["diffuse_rgb"])) < float(
            jnp.mean(full["diffuse_rgb"])
        )

    def test_planar_shading_matches_channel_minor(self):
        """pbr_shading_planar is a TPU-layout rewrite of pbr_shading —
        identical math, planar [C,H,W] images, per-channel flat-table
        gathers (PERF.md round-5 PBR anatomy)."""
        rng = np.random.RandomState(0)
        params = {"base": jnp.asarray(rng.rand(6, 8, 8, 3), jnp.float32)}
        light = L.build_mips(params)
        H = W = 16
        nrm = rng.randn(H, W, 3).astype(np.float32)
        nrm /= np.linalg.norm(nrm, axis=-1, keepdims=True)
        view = rng.randn(H, W, 3).astype(np.float32)
        view /= np.linalg.norm(view, axis=-1, keepdims=True)
        albedo = rng.rand(H, W, 3).astype(np.float32)
        rough = rng.rand(H, W, 1).astype(np.float32)
        mask = (rng.rand(H, W, 1) > 0.3).astype(np.float32)
        occ = rng.rand(H, W, 1).astype(np.float32)
        lut = S.get_brdf_lut()

        ref = S.pbr_shading(light, jnp.asarray(nrm), jnp.asarray(view),
                            jnp.asarray(albedo), jnp.asarray(rough),
                            jnp.asarray(mask), lut,
                            occlusion=jnp.asarray(occ))
        p = lambda x: tuple(  # noqa: E731
            jnp.asarray(x[..., c]) for c in range(3))
        got = S.pbr_shading_planar(
            light, p(nrm), p(view), p(albedo),
            jnp.asarray(rough[..., 0]), jnp.asarray(mask[..., 0]), lut,
            occlusion=jnp.asarray(occ[..., 0]))
        for k in ("render_rgb", "diffuse_rgb", "specular_rgb",
                  "diffuse_light"):
            np.testing.assert_allclose(
                np.asarray(jnp.stack(got[k], axis=-1)),
                np.asarray(ref[k]), atol=2e-6, err_msg=k)

    def test_planar_shading_gradients(self):
        """Light + material gradients flow through the planar samplers."""
        params = {"base": jnp.full((6, 8, 8, 3), 0.5)}
        H = W = 8
        nrm = (jnp.zeros((H, W)), jnp.zeros((H, W)), jnp.ones((H, W)))
        alb = jnp.full((3, H, W), 0.8)

        def f(base, a):
            light = L.build_mips({"base": base})
            out = S.pbr_shading_planar(
                light, nrm, nrm, tuple(a), jnp.full((H, W), 0.4),
                jnp.ones((H, W)), S.get_brdf_lut())
            return sum(jnp.sum(c) for c in out["render_rgb"])

        gb, ga = jax.grad(f, argnums=(0, 1))(params["base"], alb)
        assert float(jnp.sum(jnp.abs(gb))) > 0
        assert float(jnp.sum(jnp.abs(ga))) > 0

    def test_tone_and_gamma(self):
        x = jnp.asarray([[0.0, 0.5, 4.0]])
        assert float(jnp.max(S.aces_film(x))) <= 1.0
        sg = S.linear_to_srgb(jnp.asarray([0.5]))
        np.testing.assert_allclose(float(sg[0]), 0.7354, atol1 := 1e-3)


class TestBsdf:
    def test_lambert(self):
        n = jnp.array([[0.0, 0.0, 1.0]])
        wi = jnp.array([[0.0, 0.0, 1.0]])
        np.testing.assert_allclose(float(B.lambert(n, wi)[0, 0]), 1 / np.pi,
                                   rtol=1e-6)
        wi_back = jnp.array([[0.0, 0.0, -1.0]])
        assert float(B.lambert(n, wi_back)[0, 0]) == 0.0

    def test_pbr_specular_frontfacing_only(self):
        n = jnp.array([[0.0, 0.0, 1.0]])
        wo = jnp.array([[0.0, 0.0, 1.0]])
        wi_back = jnp.array([[0.0, 0.0, -1.0]])
        col = jnp.array([[0.5, 0.5, 0.5]])
        out = B.pbr_specular(col, n, wo, wi_back, jnp.asarray([[0.2]]))
        np.testing.assert_allclose(np.asarray(out), 0.0)

    def test_pbr_bsdf_energy(self):
        rng = np.random.RandomState(0)
        kd = jnp.asarray(rng.rand(10, 3), jnp.float32)
        arm = jnp.asarray(rng.rand(10, 3), jnp.float32)
        pos = jnp.zeros((10, 3))
        nrm = jnp.broadcast_to(jnp.array([0.0, 0.0, 1.0]), (10, 3))
        view = jnp.broadcast_to(jnp.array([0.0, 0.0, 2.0]), (10, 3))
        lightp = jnp.broadcast_to(jnp.array([1.0, 1.0, 2.0]), (10, 3))
        for mode in ["lambert", "frostbite"]:
            out = B.pbr_bsdf(kd, arm, pos, nrm, view, lightp, bsdf=mode)
            assert out.shape == (10, 3)
            assert bool(jnp.all(jnp.isfinite(out))) and bool(jnp.all(out >= 0))

    def test_prepare_shading_normal_identity(self):
        # unperturbed normal (0,0,1) with aligned view keeps smooth normal
        pos = jnp.zeros((1, 3))
        view_pos = jnp.array([[0.0, 0.0, 5.0]])
        pn = jnp.array([[0.0, 0.0, 1.0]])
        sn = jnp.array([[0.0, 0.0, 1.0]])
        tng = jnp.array([[1.0, 0.0, 0.0]])
        gn = jnp.array([[0.0, 0.0, 1.0]])
        out = B.prepare_shading_normal(pos, view_pos, pn, sn, tng, gn)
        np.testing.assert_allclose(np.asarray(out), [[0.0, 0.0, 1.0]],
                                   atol=1e-6)

    def test_xfm(self):
        pts = jnp.asarray(np.random.RandomState(0).rand(1, 5, 3), jnp.float32)
        m = jnp.eye(4)[None]
        out = B.xfm_points(pts, m)
        np.testing.assert_allclose(np.asarray(out[..., :3]), np.asarray(pts),
                                   atol=1e-6)

    def test_image_loss_modes(self):
        rng = np.random.RandomState(0)
        a = jnp.asarray(rng.rand(8, 8, 3), jnp.float32)
        b = jnp.asarray(rng.rand(8, 8, 3), jnp.float32)
        for loss in ["l1", "mse", "smape", "relmse"]:
            for tm in ["none", "log_srgb"]:
                v = float(B.image_loss(a, b, loss=loss, tonemapper=tm))
                assert np.isfinite(v) and v >= 0
        assert float(B.image_loss(a, a)) == 0.0
