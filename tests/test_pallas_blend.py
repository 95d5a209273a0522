"""Pallas blend kernel vs jnp reference blend — the reference's own test
oracle pattern (CUDA vs use_python twins, SURVEY.md §4) made explicit:
interpret-mode kernel output and gradients must match the pure-jnp blend.
"""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from mygauhuman_tpu.ops.binning import bin_gaussians
from mygauhuman_tpu.ops.blend import blend
from mygauhuman_tpu.ops.pallas_blend import blend_pallas, build_instance_data, blend_pallas_raw
from mygauhuman_tpu.ops.projection import preprocess
from mygauhuman_tpu.ops.rasterize import RasterizerConfig, rasterize
from mygauhuman_tpu.utils.transforms import covariance_from_scaling_rotation, strip_symmetric
from mygauhuman_tpu.data.camera import make_camera

W = H = 64
N = 120
C = 5
K = 256


def make_inputs(seed=0):
    rng = np.random.RandomState(seed)
    means3d = rng.randn(N, 3).astype(np.float32) * 0.4
    scales = np.exp(rng.randn(N, 3).astype(np.float32) * 0.3 - 2.2)
    quats = rng.randn(N, 4).astype(np.float32)
    cov = covariance_from_scaling_rotation(
        jnp.asarray(scales), jnp.asarray(quats)
    )
    cov6 = strip_symmetric(cov)
    opac = jnp.asarray(rng.rand(N).astype(np.float32)) * 0.9 + 0.05
    feats = jnp.asarray(rng.rand(N, C).astype(np.float32))
    cam = make_camera(R=np.eye(3), t=np.array([0.0, 0.0, 3.0]),
                      width=W, height=H, fovx=1.0, fovy=1.0)
    return jnp.asarray(means3d), cov6, opac, feats, cam


def run_both(seed=0, bg_val=0.3):
    means3d, cov6, opac, feats, cam = make_inputs(seed)
    proj = preprocess(means3d, cov6, cam.w2c, cam.full_proj, W, H,
                      cam.tan_fovx, cam.tan_fovy)
    bins = bin_gaussians(proj.means2d, proj.radii, proj.depths, proj.visible,
                         width=W, height=H, tile_capacity=K)
    bg = jnp.full((C,), bg_val)
    args = (proj.means2d, proj.conics, opac, feats, proj.depths, bg)

    ref = blend(bins.idx, bins.valid, *args, width=W, height=H)
    counts = jnp.minimum(bins.counts, K)
    got = blend_pallas(
        bins.sorted_rank, bins.order, bins.rank, bins.starts, counts, *args,
        W, H, 16, 16, 64, K, True, True,   # interpret, kernel_bwd
    )
    return ref, got, (bins, args)


class TestPallasForwardParity:
    def test_image_alpha_depth_final_t(self):
        ref, got, _ = run_both()
        np.testing.assert_allclose(np.asarray(got.image),
                                   np.asarray(ref.image), atol=1e-5)
        np.testing.assert_allclose(np.asarray(got.alpha),
                                   np.asarray(ref.alpha), atol=1e-5)
        np.testing.assert_allclose(np.asarray(got.depth),
                                   np.asarray(ref.depth), atol=1e-4)
        np.testing.assert_allclose(np.asarray(got.final_t),
                                   np.asarray(ref.final_t), atol=1e-5)
        assert float(jnp.max(got.alpha)) > 0.1, "nothing blended"

    def test_multiple_seeds(self):
        for seed in [1, 2]:
            ref, got, _ = run_both(seed)
            np.testing.assert_allclose(np.asarray(got.image),
                                       np.asarray(ref.image), atol=1e-5)


class TestPallasGradParity:
    @pytest.mark.parametrize("kernel_bwd", [False, True])
    def test_grads_match_jnp(self, kernel_bwd):
        means3d, cov6, opac, feats, cam = make_inputs(0)
        proj = preprocess(means3d, cov6, cam.w2c, cam.full_proj, W, H,
                          cam.tan_fovx, cam.tan_fovy)
        bins = bin_gaussians(proj.means2d, proj.radii, proj.depths,
                             proj.visible, width=W, height=H, tile_capacity=K)
        bg = jnp.zeros((C,))
        counts = jnp.minimum(bins.counts, K)

        def loss_ref(m2, con, op, feat):
            out = blend(bins.idx, bins.valid, m2, con, op, feat, proj.depths,
                        bg, width=W, height=H)
            return jnp.sum(out.image**2) + jnp.sum(out.alpha)

        def loss_pal(m2, con, op, feat):
            out = blend_pallas(bins.sorted_rank, bins.order, bins.rank, bins.starts, counts,
                               m2, con, op, feat,
                               proj.depths, bg, W, H, 16, 16, 64, K,
                               True, kernel_bwd)
            return jnp.sum(out.image**2) + jnp.sum(out.alpha)

        args = (proj.means2d, proj.conics, opac, feats)
        g_ref = jax.grad(loss_ref, argnums=(0, 1, 2, 3))(*args)
        g_pal = jax.grad(loss_pal, argnums=(0, 1, 2, 3))(*args)
        for a, b in zip(g_ref, g_pal):
            np.testing.assert_allclose(np.asarray(b), np.asarray(a),
                                       atol=1e-4, rtol=1e-4)


class TestRasterizePallasPath:
    def test_rasterize_flag_parity(self):
        means3d, cov6, opac, feats, cam = make_inputs(0)
        common = dict(width=W, height=H, tan_fovx=cam.tan_fovx,
                      tan_fovy=cam.tan_fovy)
        bg = jnp.zeros((C,))
        ref = rasterize(means3d, cov6, opac, feats, cam.w2c, cam.full_proj,
                        bg, config=RasterizerConfig(tile_capacity=K),
                        **common)
        got = rasterize(means3d, cov6, opac, feats, cam.w2c, cam.full_proj,
                        bg,
                        config=RasterizerConfig(tile_capacity=K,
                                                use_pallas=True,
                                                pallas_interpret=True),
                        **common)
        np.testing.assert_allclose(np.asarray(got.image),
                                   np.asarray(ref.image), atol=1e-5)


class TestKernelBwdFullCotangents:
    @pytest.mark.parametrize("kernel_bwd", [False, True])
    def test_all_output_paths(self, kernel_bwd):
        """Loss touches image, alpha, depth AND final_t, with bg != 0, so
        every cotangent path (incl. the bg coupling) is exercised."""
        means3d, cov6, opac, feats, cam = make_inputs(3)
        proj = preprocess(means3d, cov6, cam.w2c, cam.full_proj, W, H,
                          cam.tan_fovx, cam.tan_fovy)
        bins = bin_gaussians(proj.means2d, proj.radii, proj.depths,
                             proj.visible, width=W, height=H, tile_capacity=K)
        counts = jnp.minimum(bins.counts, K)
        bg0 = jnp.linspace(0.1, 0.9, C)

        def loss_ref(m2, con, op, feat, dep, bgc):
            out = blend(bins.idx, bins.valid, m2, con, op, feat, dep, bgc,
                        width=W, height=H)
            return (jnp.sum(out.image**2) + jnp.sum(out.alpha**2)
                    + jnp.sum(out.depth**2) + jnp.sum(out.final_t**2))

        def loss_pal(m2, con, op, feat, dep, bgc):
            out = blend_pallas(bins.sorted_rank, bins.order, bins.rank, bins.starts, counts,
                               m2, con, op, feat, dep, bgc,
                               W, H, 16, 16, 64, K, True, kernel_bwd)
            return (jnp.sum(out.image**2) + jnp.sum(out.alpha**2)
                    + jnp.sum(out.depth**2) + jnp.sum(out.final_t**2))

        args = (proj.means2d, proj.conics, opac, feats, proj.depths, bg0)
        g_ref = jax.grad(loss_ref, argnums=tuple(range(6)))(*args)
        g_pal = jax.grad(loss_pal, argnums=tuple(range(6)))(*args)
        for name, a, b in zip(
            ["means2d", "conics", "opac", "feats", "depths", "bg"],
            g_ref, g_pal,
        ):
            np.testing.assert_allclose(
                np.asarray(b), np.asarray(a), atol=2e-4, rtol=2e-4,
                err_msg=name,
            )


class TestRowModeKernel:
    """The row-staged planar kernel (blend_rows_raw) vs the jnp blend at an
    image size that activates it (128^2 -> tiles_x = 8, TB = 8)."""

    def _inputs(self, seed=0, w=128, h=128):
        rng = np.random.RandomState(seed)
        n = 200
        means3d = jnp.asarray(rng.randn(n, 3).astype(np.float32) * 0.5)
        scales = np.exp(rng.randn(n, 3).astype(np.float32) * 0.3 - 2.0)
        quats = rng.randn(n, 4).astype(np.float32)
        cov6 = strip_symmetric(covariance_from_scaling_rotation(
            jnp.asarray(scales), jnp.asarray(quats)))
        opac = jnp.asarray(rng.rand(n).astype(np.float32)) * 0.9 + 0.05
        feats = jnp.asarray(rng.rand(n, C).astype(np.float32))
        cam = make_camera(R=np.eye(3), t=np.array([0.0, 0.0, 3.0]),
                          width=w, height=h, fovx=1.0, fovy=1.0)
        return means3d, cov6, opac, feats, cam

    def test_row_mode_selected_and_matches(self):
        from mygauhuman_tpu.ops.pallas_blend import row_mode_supported
        w = h = 128
        assert row_mode_supported((w // 16) * (h // 16), w // 16, 16, 16) > 0
        means3d, cov6, opac, feats, cam = self._inputs(0, w, h)
        common = dict(width=w, height=h, tan_fovx=cam.tan_fovx,
                      tan_fovy=cam.tan_fovy)
        bg = jnp.linspace(0.1, 0.9, C)
        ref = rasterize(means3d, cov6, opac, feats, cam.w2c, cam.full_proj,
                        bg, config=RasterizerConfig(tile_capacity=K),
                        **common)
        got = rasterize(means3d, cov6, opac, feats, cam.w2c, cam.full_proj,
                        bg,
                        config=RasterizerConfig(tile_capacity=K,
                                                use_pallas=True,
                                                pallas_interpret=True),
                        **common)
        np.testing.assert_allclose(np.asarray(got.image),
                                   np.asarray(ref.image), atol=1e-5)
        np.testing.assert_allclose(np.asarray(got.alpha),
                                   np.asarray(ref.alpha), atol=1e-5)
        np.testing.assert_allclose(np.asarray(got.depth),
                                   np.asarray(ref.depth), atol=1e-4)
        np.testing.assert_allclose(np.asarray(got.final_t),
                                   np.asarray(ref.final_t), atol=1e-5)
        assert float(jnp.max(got.alpha)) > 0.1, "nothing blended"

    def test_row_mode_grads(self):
        w = h = 128
        means3d, cov6, opac, feats, cam = self._inputs(1, w, h)
        proj = preprocess(means3d, cov6, cam.w2c, cam.full_proj, w, h,
                          cam.tan_fovx, cam.tan_fovy)
        bins = bin_gaussians(proj.means2d, proj.radii, proj.depths,
                             proj.visible, width=w, height=h,
                             tile_capacity=K)
        counts = jnp.minimum(bins.counts, K)
        bg0 = jnp.linspace(0.1, 0.9, C)

        def loss_ref(m2, con, op, feat):
            out = blend(bins.idx, bins.valid, m2, con, op, feat, proj.depths,
                        bg0, width=w, height=h)
            return (jnp.sum(out.image**2) + jnp.sum(out.alpha**2)
                    + jnp.sum(out.final_t**2))

        def loss_pal(m2, con, op, feat):
            out = blend_pallas(bins.sorted_rank, bins.order, bins.rank, bins.starts, counts,
                               m2, con, op, feat, proj.depths, bg0,
                               w, h, 16, 16, 64, K, True, True)
            return (jnp.sum(out.image**2) + jnp.sum(out.alpha**2)
                    + jnp.sum(out.final_t**2))

        args = (proj.means2d, proj.conics, opac, feats)
        g_ref = jax.grad(loss_ref, argnums=(0, 1, 2, 3))(*args)
        g_pal = jax.grad(loss_pal, argnums=(0, 1, 2, 3))(*args)
        for a, b in zip(g_ref, g_pal):
            np.testing.assert_allclose(np.asarray(b), np.asarray(a),
                                       atol=1e-4, rtol=1e-4)


class TestEarlyTerminationSaturation:
    """Dense high-opacity stacks saturate T < 1e-4 within the first chunk;
    the fwd/bwd kernels' early termination must truncate EXACTLY (monotone
    T: all later include-masks are false, so outputs and every gradient
    match the non-terminating jnp spec bit-for-... well, to fp tolerance)."""

    def _run(self, kernel_bwd):
        rng = np.random.RandomState(3)
        n = 300
        # all gaussians piled into a small screen region, opacity ~0.97
        means3d = np.concatenate(
            [rng.randn(n, 2) * 0.05, 2.0 + rng.rand(n, 1)], axis=1
        ).astype(np.float32)
        scales = np.full((n, 3), 0.05, np.float32)
        quats = np.tile(np.array([1, 0, 0, 0], np.float32), (n, 1))
        cov6 = strip_symmetric(covariance_from_scaling_rotation(
            jnp.asarray(scales), jnp.asarray(quats)))
        opac = jnp.full((n,), 0.97)
        feats = jnp.asarray(rng.rand(n, C).astype(np.float32))
        cam = make_camera(R=np.eye(3), t=np.array([0.0, 0.0, 3.0]),
                          width=W, height=H, fovx=1.0, fovy=1.0)
        proj = preprocess(jnp.asarray(means3d), cov6, cam.w2c, cam.full_proj,
                          W, H, cam.tan_fovx, cam.tan_fovy)
        bins = bin_gaussians(proj.means2d, proj.radii, proj.depths,
                             proj.visible, width=W, height=H, tile_capacity=K)
        bg = jnp.full((C,), 0.2)
        args = (proj.means2d, proj.conics, opac, feats, proj.depths, bg)
        counts = jnp.minimum(bins.counts, K)

        def loss_pal(m2, con, op, feat):
            out = blend_pallas(
                bins.sorted_rank, bins.order, bins.rank, bins.starts, counts,
                m2, con, op, feat, proj.depths, bg,
                W, H, 16, 16, 64, K, True, kernel_bwd)
            return (jnp.sum(out.image * out.image) + jnp.sum(out.alpha)
                    + jnp.sum(out.depth * 0.3) + jnp.sum(out.final_t * 0.7))

        def loss_ref(m2, con, op, feat):
            out = blend(bins.idx, bins.valid, m2, con, op, feat,
                        proj.depths, bg, width=W, height=H)
            return (jnp.sum(out.image * out.image) + jnp.sum(out.alpha)
                    + jnp.sum(out.depth * 0.3) + jnp.sum(out.final_t * 0.7))

        # saturation really happens (otherwise this test is vacuous):
        # final_t bottoms out just above 1e-4 by construction (include
        # freezes it there), so assert the saturation region is reached
        # AND at least one tile spans multiple kernel chunks — i.e. the
        # early-termination path actually skips chunk work.
        out = blend(bins.idx, bins.valid, *args, width=W, height=H)
        assert float(jnp.min(out.final_t)) < 2e-4
        assert int(jnp.max(bins.counts)) > 256

        gp = jax.grad(loss_pal, argnums=(0, 1, 2, 3))(*args[:4])
        gr = jax.grad(loss_ref, argnums=(0, 1, 2, 3))(*args[:4])
        for a, b in zip(gp, gr):
            np.testing.assert_allclose(a, b, rtol=2e-4, atol=2e-5)

    def test_kernel_bwd(self):
        self._run(True)

    def test_jnp_bwd(self):
        self._run(False)
