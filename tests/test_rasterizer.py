"""Rasterizer tests: binning vs brute force, blend vs sequential oracle, grads.

The oracle `sequential_render` transcribes the CUDA per-pixel loop semantics
(front-to-back, power>0 skip, alpha<1/255 skip, T<1e-4 stop, out_alpha = sum
of weights) in pure numpy — the reference's implicit test pattern
(SURVEY.md §4) made explicit.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mygauhuman_tpu.data.camera import make_camera
from mygauhuman_tpu.ops.binning import bin_gaussians, gaussian_tile_rects, tile_dims
from mygauhuman_tpu.ops.blend import blend
from mygauhuman_tpu.ops.projection import compute_cov3d, preprocess
from mygauhuman_tpu.ops.rasterize import RasterizerConfig, rasterize


def make_scene(n=40, seed=0, width=64, height=48, zspread=1.0):
    rng = np.random.default_rng(seed)
    cam = make_camera(
        R=np.eye(3), t=np.zeros(3), width=width, height=height,
        fovx=np.deg2rad(60), fovy=np.deg2rad(50),
    )
    pts = np.concatenate(
        [rng.uniform(-0.8, 0.8, size=(n, 2)), 2.0 + zspread * rng.uniform(size=(n, 1))],
        axis=-1,
    ).astype(np.float32)
    scales = np.exp(rng.uniform(np.log(0.02), np.log(0.12), size=(n, 3))).astype(np.float32)
    quats = rng.normal(size=(n, 4)).astype(np.float32)
    opac = rng.uniform(0.2, 0.95, size=(n,)).astype(np.float32)
    feat = rng.uniform(size=(n, 3)).astype(np.float32)
    return cam, pts, scales, quats, opac, feat


def sequential_render(means2d, conics, radii, depths, visible, opac, feat, bg, W, H):
    """Per-pixel sequential oracle with exact CUDA skip/stop semantics."""
    order = np.argsort(depths, kind="stable")
    C = feat.shape[-1]
    img = np.zeros((H, W, C))
    out_alpha = np.zeros((H, W))
    out_depth = np.zeros((H, W))
    final_t = np.ones((H, W))
    for py in range(H):
        for px in range(W):
            T = 1.0
            for g in order:
                if not visible[g] or radii[g] <= 0:
                    continue
                # tile-rect coverage test (binning drops non-covering tiles)
                x, y = means2d[g]
                r = radii[g]
                if px // 16 < int(np.floor((x - r) / 16)) or px // 16 >= int(np.floor((x + r + 15) / 16)):
                    continue
                if py // 16 < int(np.floor((y - r) / 16)) or py // 16 >= int(np.floor((y + r + 15) / 16)):
                    continue
                dx, dy = x - px, y - py
                a_, b_, c_ = conics[g]
                power = -0.5 * (a_ * dx * dx + c_ * dy * dy) - b_ * dx * dy
                if power > 0:
                    continue
                alpha = min(0.99, opac[g] * np.exp(power))
                if alpha < 1.0 / 255.0:
                    continue
                test_T = T * (1 - alpha)
                if test_T < 1e-4:
                    break
                img[py, px] += feat[g] * alpha * T
                out_alpha[py, px] += alpha * T
                out_depth[py, px] += depths[g] * alpha * T
                T = test_T
            img[py, px] += T * bg
            final_t[py, px] = T
    return img, out_alpha, out_depth, final_t


def test_binning_vs_bruteforce():
    cam, pts, scales, quats, opac, feat = make_scene(n=60, seed=1)
    cov6 = compute_cov3d(jnp.asarray(scales), jnp.asarray(quats))
    proj = preprocess(jnp.asarray(pts), cov6, jnp.asarray(cam.w2c),
                      jnp.asarray(cam.full_proj), cam.width, cam.height,
                      cam.tan_fovx, cam.tan_fovy)
    tw, th = tile_dims(cam.width, cam.height, 16, 16)
    bins = bin_gaussians(proj.means2d, proj.radii, proj.depths, proj.visible,
                         width=cam.width, height=cam.height,
                         max_tiles_per_gaussian=64, tile_capacity=64)
    assert int(bins.overflow_tiles) == 0 and int(bins.overflow_gauss) == 0

    means2d = np.asarray(proj.means2d)
    radii = np.asarray(proj.radii)
    depths = np.asarray(proj.depths)
    visible = np.asarray(proj.visible)
    mnx, mny, mxx, mxy = (np.asarray(v) for v in gaussian_tile_rects(
        proj.means2d, proj.radii, tw, th, 16, 16))
    for t in range(tw * th):
        tx, ty = t % tw, t // tw
        expect = [g for g in range(len(pts))
                  if visible[g] and radii[g] > 0
                  and mnx[g] <= tx < mxx[g] and mny[g] <= ty < mxy[g]]
        expect.sort(key=lambda g: depths[g])
        got = np.asarray(bins.idx[t])[np.asarray(bins.valid[t])]
        assert sorted(got.tolist()) == sorted(expect), f"tile {t}"
        # depth-ordering check
        np.testing.assert_array_equal(np.argsort(depths[got], kind="stable"),
                                      np.arange(len(got)))


@pytest.mark.parametrize("seed,zspread", [(2, 1.0), (3, 0.01)])
def test_blend_matches_sequential_oracle(seed, zspread):
    # zspread=0.01 stresses near-equal depths / heavy overlap
    cam, pts, scales, quats, opac, feat = make_scene(n=50, seed=seed, zspread=zspread)
    bg = np.array([0.1, 0.2, 0.3], np.float32)
    cov6 = compute_cov3d(jnp.asarray(scales), jnp.asarray(quats))
    out = rasterize(
        jnp.asarray(pts), cov6, jnp.asarray(opac), jnp.asarray(feat),
        jnp.asarray(cam.w2c), jnp.asarray(cam.full_proj), jnp.asarray(bg),
        width=cam.width, height=cam.height,
        tan_fovx=cam.tan_fovx, tan_fovy=cam.tan_fovy,
        config=RasterizerConfig(tile_capacity=128, max_tiles_per_gaussian=64),
    )
    proj = preprocess(jnp.asarray(pts), cov6, jnp.asarray(cam.w2c),
                      jnp.asarray(cam.full_proj), cam.width, cam.height,
                      cam.tan_fovx, cam.tan_fovy)
    img, alpha, depth, final_t = sequential_render(
        np.asarray(proj.means2d), np.asarray(proj.conics), np.asarray(proj.radii),
        np.asarray(proj.depths), np.asarray(proj.visible), opac, feat, bg,
        cam.width, cam.height)
    np.testing.assert_allclose(out.image, img, rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(out.alpha, alpha, rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(out.depth, depth, rtol=1e-4, atol=2e-4)
    np.testing.assert_allclose(out.final_t, final_t, rtol=1e-4, atol=1e-4)


def test_single_gaussian_profile():
    # One isotropic gaussian at the center: peak alpha at center, symmetric.
    W = H = 32
    cam = make_camera(R=np.eye(3), t=np.zeros(3), width=W, height=H,
                      fovx=np.deg2rad(60), fovy=np.deg2rad(60))
    pts = jnp.array([[0.0, 0.0, 2.0]])
    # big enough that the 0.5-px subpixel offset doesn't dent the peak
    cov6 = compute_cov3d(jnp.array([[0.5, 0.5, 0.5]]), jnp.array([[1.0, 0, 0, 0]]))
    out = rasterize(pts, cov6, jnp.array([0.8]), jnp.array([[1.0, 0.5, 0.25]]),
                    jnp.asarray(cam.w2c), jnp.asarray(cam.full_proj),
                    jnp.zeros(3),
                    width=W, height=H, tan_fovx=cam.tan_fovx, tan_fovy=cam.tan_fovy,
                    config=RasterizerConfig(tile_capacity=16))
    a = np.asarray(out.alpha)
    cy, cx = np.unravel_index(a.argmax(), a.shape)
    assert abs(cx - (W - 1) / 2) <= 1 and abs(cy - (H - 1) / 2) <= 1
    assert a.max() == pytest.approx(0.8, abs=0.02)
    # rgb ratio preserved
    img = np.asarray(out.image)
    np.testing.assert_allclose(img[cy, cx] / img[cy, cx, 0],
                               [1.0, 0.5, 0.25], rtol=1e-5)


def test_gradients_match_finite_differences():
    cam, pts, scales, quats, opac, feat = make_scene(n=12, seed=5, width=48, height=32)
    bg = jnp.zeros(3)
    cov6 = compute_cov3d(jnp.asarray(scales), jnp.asarray(quats))
    rng = np.random.default_rng(6)
    gproj = jnp.asarray(rng.normal(size=(32, 48, 3)).astype(np.float32))
    cfg = RasterizerConfig(tile_capacity=64, max_tiles_per_gaussian=64)

    def loss(op, ft, m3d):
        out = rasterize(m3d, cov3d6=cov6, opacities=op, features=ft,
                        w2c=jnp.asarray(cam.w2c), full_proj=jnp.asarray(cam.full_proj),
                        bg=bg, width=cam.width, height=cam.height,
                        tan_fovx=cam.tan_fovx, tan_fovy=cam.tan_fovy, config=cfg)
        return jnp.sum(out.image * gproj)

    g_op, g_ft, g_m = jax.grad(loss, argnums=(0, 1, 2))(
        jnp.asarray(opac), jnp.asarray(feat), jnp.asarray(pts))

    # finite differences on a few coordinates
    def num_grad(f, x, idx, eps):
        x = np.asarray(x, np.float64).copy()
        xp = x.copy(); xp[idx] += eps
        xm = x.copy(); xm[idx] -= eps
        return (f(xp) - f(xm)) / (2 * eps)

    f_op = lambda v: float(loss(jnp.asarray(v, jnp.float32), jnp.asarray(feat), jnp.asarray(pts)))
    f_ft = lambda v: float(loss(jnp.asarray(opac), jnp.asarray(v, jnp.float32), jnp.asarray(pts)))
    f_m = lambda v: float(loss(jnp.asarray(opac), jnp.asarray(feat), jnp.asarray(v, jnp.float32)))

    for i in [0, 3, 7]:
        ng = num_grad(f_op, opac, (i,), 1e-3)
        assert np.asarray(g_op)[i] == pytest.approx(ng, rel=0.03, abs=2e-2)
    for i, j in [(1, 0), (5, 2)]:
        ng = num_grad(f_ft, feat, (i, j), 1e-3)
        assert np.asarray(g_ft)[i, j] == pytest.approx(ng, rel=0.02, abs=1e-2)
    for i, j in [(2, 0), (8, 1)]:
        ng = num_grad(f_m, pts, (i, j), 1e-4)
        assert np.asarray(g_m)[i, j] == pytest.approx(ng, rel=0.05, abs=0.5)


def test_means2d_offset_grad_harvest():
    # d(loss)/d(offset) equals d(loss)/d(means2d): the densify-stats hook.
    cam, pts, scales, quats, opac, feat = make_scene(n=10, seed=7, width=32, height=32)
    cov6 = compute_cov3d(jnp.asarray(scales), jnp.asarray(quats))
    cfg = RasterizerConfig(tile_capacity=32, max_tiles_per_gaussian=64)

    def loss(off):
        out = rasterize(jnp.asarray(pts), cov6, jnp.asarray(opac), jnp.asarray(feat),
                        jnp.asarray(cam.w2c), jnp.asarray(cam.full_proj), jnp.zeros(3),
                        width=cam.width, height=cam.height,
                        tan_fovx=cam.tan_fovx, tan_fovy=cam.tan_fovy,
                        config=cfg, means2d_offset=off)
        return jnp.sum(out.image ** 2)

    g = jax.grad(loss)(jnp.zeros((len(pts), 2)))
    assert g.shape == (len(pts), 2)
    assert bool(jnp.isfinite(g).all())
    assert float(jnp.abs(g).max()) > 0


def test_tile_capacity_truncation_reports_overflow():
    cam, pts, scales, quats, opac, feat = make_scene(n=60, seed=8)
    cov6 = compute_cov3d(jnp.asarray(scales), jnp.asarray(quats))
    proj = preprocess(jnp.asarray(pts), cov6, jnp.asarray(cam.w2c),
                      jnp.asarray(cam.full_proj), cam.width, cam.height,
                      cam.tan_fovx, cam.tan_fovy)
    bins = bin_gaussians(proj.means2d, proj.radii, proj.depths, proj.visible,
                         width=cam.width, height=cam.height,
                         max_tiles_per_gaussian=64, tile_capacity=4)
    assert int(bins.overflow_tiles) > 0  # 60 gaussians in a small image

    bins_s = bin_gaussians(proj.means2d, proj.radii, proj.depths, proj.visible,
                           width=cam.width, height=cam.height,
                           max_tiles_per_gaussian=1, tile_capacity=64)
    assert int(bins_s.overflow_gauss) > 0


def test_alive_mask_excludes_padded_slots():
    cam, pts, scales, quats, opac, feat = make_scene(n=8, seed=9, width=32, height=32)
    cov6 = compute_cov3d(jnp.asarray(scales), jnp.asarray(quats))
    cfg = RasterizerConfig(tile_capacity=16, max_tiles_per_gaussian=64)
    kw = dict(width=cam.width, height=cam.height, tan_fovx=cam.tan_fovx,
              tan_fovy=cam.tan_fovy, config=cfg)
    full = rasterize(jnp.asarray(pts), cov6, jnp.asarray(opac), jnp.asarray(feat),
                     jnp.asarray(cam.w2c), jnp.asarray(cam.full_proj), jnp.zeros(3), **kw)
    alive = jnp.arange(8) < 4
    half = rasterize(jnp.asarray(pts), cov6, jnp.asarray(opac), jnp.asarray(feat),
                     jnp.asarray(cam.w2c), jnp.asarray(cam.full_proj), jnp.zeros(3),
                     alive=alive, **kw)
    only4 = rasterize(jnp.asarray(pts[:4]), cov6[:4], jnp.asarray(opac[:4]),
                      jnp.asarray(feat[:4]), jnp.asarray(cam.w2c),
                      jnp.asarray(cam.full_proj), jnp.zeros(3), **kw)
    assert not np.allclose(np.asarray(full.image), np.asarray(half.image))
    np.testing.assert_allclose(half.image, only4.image, atol=1e-6)


def test_instance_capacity_compaction_parity():
    """A generous instance_capacity I must reproduce the exact N*S render;
    an undersized I reports overflow_inst (counted, never silent)."""
    cam, pts, scales, quats, opac, feat = make_scene(n=40, width=64, height=48)
    cov6 = compute_cov3d(jnp.asarray(scales), jnp.asarray(quats))
    kwargs = dict(
        w2c=jnp.asarray(cam.w2c), full_proj=jnp.asarray(cam.full_proj),
        bg=jnp.zeros(3), width=64, height=48,
        tan_fovx=float(cam.tan_fovx), tan_fovy=float(cam.tan_fovy),
    )
    base = rasterize(
        jnp.asarray(pts), cov6, jnp.asarray(opac), jnp.asarray(feat),
        config=RasterizerConfig(), **kwargs,
    )
    compact = rasterize(
        jnp.asarray(pts), cov6, jnp.asarray(opac), jnp.asarray(feat),
        config=RasterizerConfig(instance_capacity=256), **kwargs,
    )
    assert int(compact.overflow_inst) == 0
    np.testing.assert_allclose(np.asarray(compact.image),
                               np.asarray(base.image), atol=1e-6)
    np.testing.assert_allclose(np.asarray(compact.final_t),
                               np.asarray(base.final_t), atol=1e-6)

    tiny = rasterize(
        jnp.asarray(pts), cov6, jnp.asarray(opac), jnp.asarray(feat),
        config=RasterizerConfig(instance_capacity=8), **kwargs,
    )
    assert int(tiny.overflow_inst) > 0


def test_instance_capacity_gradients_match():
    """Compacted path must carry identical gradients (Pallas-off jnp path)."""
    cam, pts, scales, quats, opac, feat = make_scene(n=24, width=48, height=32)
    cov6 = compute_cov3d(jnp.asarray(scales), jnp.asarray(quats))
    kwargs = dict(
        w2c=jnp.asarray(cam.w2c), full_proj=jnp.asarray(cam.full_proj),
        bg=jnp.zeros(3), width=48, height=32,
        tan_fovx=float(cam.tan_fovx), tan_fovy=float(cam.tan_fovy),
    )

    def loss(op, cfg):
        out = rasterize(jnp.asarray(pts), cov6, op, jnp.asarray(feat),
                        config=cfg, **kwargs)
        return jnp.sum(out.image ** 2)

    g_base = jax.grad(loss)(jnp.asarray(opac), RasterizerConfig())
    g_comp = jax.grad(loss)(
        jnp.asarray(opac), RasterizerConfig(instance_capacity=192))
    np.testing.assert_allclose(np.asarray(g_comp), np.asarray(g_base),
                               rtol=1e-5, atol=1e-7)
