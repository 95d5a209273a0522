"""Math-core tests: transforms, SH, projection, KNN.

Oracle pattern follows the reference's implicit test strategy (SURVEY.md §4):
every op gets an independent numpy/scipy-free reference twin, plus golden
values transcribed from the reference formulas.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mygauhuman_tpu.ops import sh as sh_mod
from mygauhuman_tpu.ops.knn import knn, mean_knn_dist2
from mygauhuman_tpu.ops.projection import compute_cov2d, compute_cov3d, preprocess
from mygauhuman_tpu.utils import transforms as tf
from mygauhuman_tpu.data.camera import make_camera, projection_from_K


def test_quat_to_rotmat_identity_and_orthonormal():
    q = jnp.array([1.0, 0.0, 0.0, 0.0])
    R = tf.quat_to_rotmat(q)
    np.testing.assert_allclose(R, np.eye(3), atol=1e-6)

    rng = np.random.default_rng(0)
    qs = rng.normal(size=(32, 4)).astype(np.float32)
    Rs = np.asarray(tf.quat_to_rotmat(jnp.asarray(qs)))
    eye = np.broadcast_to(np.eye(3), (32, 3, 3))
    np.testing.assert_allclose(Rs @ np.swapaxes(Rs, -1, -2), eye, atol=1e-5)
    np.testing.assert_allclose(np.linalg.det(Rs), np.ones(32), atol=1e-5)


def test_rodrigues_matches_cv2_style_reference():
    # Reference: R = I + sin(t) K + (1-cos(t)) K^2 for axis-angle t*n.
    rng = np.random.default_rng(1)
    rvecs = rng.normal(size=(16, 3)).astype(np.float32)
    R = np.asarray(tf.rodrigues(jnp.asarray(rvecs)))
    for i, rv in enumerate(rvecs):
        theta = np.linalg.norm(rv + 1e-8)
        n = rv / theta
        K = np.array([[0, -n[2], n[1]], [n[2], 0, -n[0]], [-n[1], n[0], 0]])
        R_ref = np.eye(3) + np.sin(theta) * K + (1 - np.cos(theta)) * (K @ K)
        np.testing.assert_allclose(R[i], R_ref, atol=1e-5)


def test_rodrigues_mlp_near_identity_at_zero():
    R = np.asarray(tf.rodrigues_mlp(jnp.zeros((4, 3))))
    np.testing.assert_allclose(R, np.broadcast_to(np.eye(3), (4, 3, 3)), atol=1e-2)
    # orthonormality for generic inputs
    rng = np.random.default_rng(2)
    rv = rng.normal(size=(8, 3)).astype(np.float32)
    R = np.asarray(tf.rodrigues_mlp(jnp.asarray(rv)))
    eye = np.broadcast_to(np.eye(3), (8, 3, 3))
    np.testing.assert_allclose(R @ np.swapaxes(R, -1, -2), eye, atol=1e-4)


def test_covariance_from_scaling_rotation_diag():
    s = jnp.array([[1.0, 2.0, 3.0]])
    q = jnp.array([[1.0, 0.0, 0.0, 0.0]])
    cov = tf.covariance_from_scaling_rotation(s, q)
    np.testing.assert_allclose(cov[0], np.diag([1.0, 4.0, 9.0]), atol=1e-5)
    # conjugation by a transform
    Rt = tf.rodrigues(jnp.array([[0.3, -0.2, 0.5]]))
    cov_t = tf.covariance_from_scaling_rotation(s, q, transform=Rt)
    expect = np.asarray(Rt[0]) @ np.diag([1.0, 4.0, 9.0]) @ np.asarray(Rt[0]).T
    np.testing.assert_allclose(cov_t[0], expect, atol=1e-5)


def test_strip_unstrip_roundtrip():
    rng = np.random.default_rng(3)
    A = rng.normal(size=(5, 3, 3)).astype(np.float32)
    S = A @ np.swapaxes(A, -1, -2)
    c6 = tf.strip_symmetric(jnp.asarray(S))
    back = tf.unstrip_symmetric(c6)
    np.testing.assert_allclose(back, S, atol=1e-6)


def test_eval_sh_degree0_is_constant():
    sh = jnp.ones((7, 3, 1))
    dirs = jnp.asarray(np.random.default_rng(4).normal(size=(7, 3)))
    out = sh_mod.eval_sh(0, sh, dirs)
    np.testing.assert_allclose(out, sh_mod.C0 * np.ones((7, 3)), atol=1e-6)


def test_eval_sh_orthogonality_montecarlo():
    # Integrating Y_i * Y_j over the sphere ~ delta_ij for the implemented basis.
    rng = np.random.default_rng(5)
    dirs = rng.normal(size=(200_000, 3))
    dirs /= np.linalg.norm(dirs, axis=-1, keepdims=True)
    n = 16  # degree 3
    outs = []
    for i in range(n):
        coeff = np.zeros((1, 1, n), np.float32)
        coeff[..., i] = 1.0
        coeff = np.broadcast_to(coeff, (dirs.shape[0], 1, n))
        outs.append(np.asarray(sh_mod.eval_sh(3, jnp.asarray(coeff), jnp.asarray(dirs)))[:, 0])
    Y = np.stack(outs, axis=-1)  # [S, n]
    G = (Y.T @ Y) / dirs.shape[0] * (4 * np.pi)
    np.testing.assert_allclose(G, np.eye(n), atol=0.15)


def test_rgb2sh_roundtrip():
    rgb = jnp.asarray(np.random.default_rng(6).uniform(size=(10, 3)))
    np.testing.assert_allclose(sh_mod.sh2rgb(sh_mod.rgb2sh(rgb)), rgb, atol=1e-6)


def _reference_cov2d(mean, cov3d, w2c, fx, fy, tanx, tany):
    """Straight transcription of the EWA math as an independent numpy twin."""
    t = w2c[:3, :3] @ mean + w2c[:3, 3]
    txtz, tytz = t[0] / t[2], t[1] / t[2]
    tx = np.clip(txtz, -1.3 * tanx, 1.3 * tanx) * t[2]
    ty = np.clip(tytz, -1.3 * tany, 1.3 * tany) * t[2]
    tz = t[2]
    J = np.array([
        [fx / tz, 0, -fx * tx / tz**2],
        [0, fy / tz, -fy * ty / tz**2],
    ])
    T = J @ w2c[:3, :3]
    V = T @ cov3d @ T.T
    return np.array([V[0, 0] + 0.3, V[0, 1], V[1, 1] + 0.3])


def test_cov2d_matches_numpy_reference():
    rng = np.random.default_rng(7)
    N = 64
    means = rng.normal(size=(N, 3)) * 0.5 + np.array([0, 0, 3.0])
    A = rng.normal(size=(N, 3, 3)) * 0.1
    covs = A @ np.swapaxes(A, -1, -2) + np.eye(3)[None] * 0.01
    cov6 = np.stack([covs[:, 0, 0], covs[:, 0, 1], covs[:, 0, 2],
                     covs[:, 1, 1], covs[:, 1, 2], covs[:, 2, 2]], axis=-1)
    w2c = np.eye(4, dtype=np.float64)
    # rotate the camera a bit
    Rz = np.asarray(tf.rodrigues(jnp.array([[0.1, 0.2, -0.1]])))[0]
    w2c[:3, :3] = Rz
    w2c[:3, 3] = [0.05, -0.1, 0.2]
    fx = fy = 600.0
    tanx = tany = 512 / (2 * fx)
    got = np.asarray(compute_cov2d(
        jnp.asarray(means, jnp.float32), jnp.asarray(cov6, jnp.float32),
        jnp.asarray(w2c, jnp.float32), fx, fy, tanx, tany))
    for i in range(N):
        ref = _reference_cov2d(means[i], covs[i], w2c, fx, fy, tanx, tany)
        np.testing.assert_allclose(got[i], ref, rtol=2e-4, atol=2e-4)


def test_preprocess_center_point():
    # A gaussian on the optical axis lands at the image center.
    W = H = 64
    cam = make_camera(R=np.eye(3), t=np.zeros(3), width=W, height=H,
                      fovx=np.deg2rad(60), fovy=np.deg2rad(60))
    means = jnp.array([[0.0, 0.0, 2.0], [0.0, 0.0, -1.0]])  # second behind camera
    cov6 = jnp.tile(jnp.array([[0.01, 0.0, 0.0, 0.01, 0.0, 0.01]]), (2, 1))
    out = preprocess(means, cov6, jnp.asarray(cam.w2c), jnp.asarray(cam.full_proj),
                     W, H, cam.tan_fovx, cam.tan_fovy)
    np.testing.assert_allclose(out.means2d[0], [(W - 1) / 2, (H - 1) / 2], atol=1e-3)
    assert bool(out.visible[0])
    assert not bool(out.visible[1])
    assert int(out.radii[1]) == 0
    assert out.depths[0] == pytest.approx(2.0, abs=1e-5)


def test_preprocess_projection_matches_pinhole():
    # Compare against direct pinhole projection with K.
    W, H = 128, 96
    K = np.array([[200.0, 0, 64.0], [0, 210.0, 48.0], [0, 0, 1]])
    R = np.asarray(tf.rodrigues(jnp.array([[0.2, -0.1, 0.05]])))[0]
    # dataset convention: R is c2w rotation block, t is w2c translation
    t = np.array([0.1, -0.2, 4.0])
    cam = make_camera(R=R.T.copy(), t=t, width=W, height=H, K=K)
    rng = np.random.default_rng(8)
    pts = rng.normal(size=(32, 3)).astype(np.float32)
    cov6 = np.tile(np.array([[1e-4, 0, 0, 1e-4, 0, 1e-4]], np.float32), (32, 1))
    out = preprocess(jnp.asarray(pts), jnp.asarray(cov6), jnp.asarray(cam.w2c),
                     jnp.asarray(cam.full_proj), W, H, cam.tan_fovx, cam.tan_fovy)
    w2c = np.asarray(cam.w2c, np.float64)
    pc = pts @ w2c[:3, :3].T + w2c[:3, 3]
    uv = (pc[:, :2] / pc[:, 2:3]) @ np.diag([K[0, 0], K[1, 1]]) + np.array([K[0, 2], K[1, 2]])
    # ndc2pix convention: pix = uv - 0.5 (continuous pixel centers at integers)
    for i in range(32):
        if pc[i, 2] > 0.2:
            np.testing.assert_allclose(np.asarray(out.means2d)[i], uv[i] - 0.5,
                                       rtol=1e-3, atol=5e-3)


def test_knn_small_exact():
    refs = jnp.array([[0.0, 0, 0], [1, 0, 0], [0, 2, 0], [5, 5, 5]])
    queries = jnp.array([[0.1, 0, 0], [4.9, 5, 5]])
    d2, idx = knn(queries, refs, k=2)
    assert idx.tolist() == [[0, 1], [3, 2]]
    np.testing.assert_allclose(d2[0], [0.01, 0.81], atol=1e-5)


def test_knn_vs_numpy_bruteforce():
    rng = np.random.default_rng(9)
    q = rng.normal(size=(257, 3)).astype(np.float32)
    r = rng.normal(size=(101, 3)).astype(np.float32)
    d2, idx = knn(jnp.asarray(q), jnp.asarray(r), k=4, block_size=64)
    D = ((q[:, None] - r[None]) ** 2).sum(-1)
    ref_idx = np.argsort(D, axis=1)[:, :4]
    ref_d2 = np.take_along_axis(D, ref_idx, axis=1)
    np.testing.assert_allclose(np.sort(d2, axis=1), np.sort(ref_d2, axis=1),
                               rtol=1e-4, atol=1e-5)


def test_knn_index_exactness_dense_cloud():
    """Nearest-vertex INDICES must match f64 brute force exactly.

    Guards the formulation AND the matmul precision: at JAX's default TPU
    matmul precision (bf16) the ||q||^2+||r||^2-2q.r cross term mis-picked
    26% of nearest vertices on dense unit-normal clouds; the cross matmul
    runs at Precision.HIGHEST (ops/knn.py::_dist2_block)."""
    rng = np.random.default_rng(3)
    q = rng.normal(size=(2048, 3)).astype(np.float32)
    r = rng.normal(size=(997, 3)).astype(np.float32)
    _, idx = knn(jnp.asarray(q), jnp.asarray(r), k=1)
    D = ((q.astype(np.float64)[:, None] - r.astype(np.float64)[None]) ** 2).sum(-1)
    ref_idx = np.argmin(D, axis=1)
    assert np.mean(np.asarray(idx)[:, 0] == ref_idx) > 0.999


def test_knn_exclude_self_and_mask():
    pts = jnp.asarray(np.random.default_rng(10).normal(size=(50, 3)), jnp.float32)
    d2, idx = knn(pts, pts, k=1, exclude_self=True)
    assert not np.any(np.asarray(idx)[:, 0] == np.arange(50))
    assert np.all(np.asarray(d2) > 0)
    mask = jnp.zeros(50, bool).at[:10].set(True)
    _, idx_m = knn(pts, pts, k=2, ref_mask=mask)
    assert np.all(np.asarray(idx_m) < 10)


def test_mean_knn_dist2_grid():
    # Unit grid: the 3 nearest neighbors of an interior point are at distance 1.
    xs = np.arange(5, dtype=np.float32)
    grid = np.stack(np.meshgrid(xs, xs, xs, indexing="ij"), -1).reshape(-1, 3)
    d2 = np.asarray(mean_knn_dist2(jnp.asarray(grid)))
    np.testing.assert_allclose(d2, np.ones_like(d2), atol=1e-5)


def test_projection_from_K_maps_corners():
    K = np.array([[300.0, 0, 128.0], [0, 300.0, 128.0], [0, 0, 1]])
    P = projection_from_K(K, 256, 256)
    # center ray -> ndc (0,0) at any depth
    p = P @ np.array([0, 0, 10.0, 1.0])
    ndc = p[:3] / p[3]
    np.testing.assert_allclose(ndc[:2], [0, 0], atol=1e-6)
    # point at u = W: x = (W - cx) * z / fx -> ndc x = +1
    z = 3.0
    x = (256 - 128) * z / 300.0
    p = P @ np.array([x, 0, z, 1.0])
    np.testing.assert_allclose(p[0] / p[3], 1.0, atol=1e-6)


def test_knn_pallas_kernel_parity():
    """Pallas KNN (interpret) vs the blocked-XLA path: identical indices,
    distances to f32 tolerance — incl. mask, exclude_self, and exact
    duplicate-ref ties (first-occurrence tie-break)."""
    from mygauhuman_tpu.ops.pallas_knn import knn_small_refs

    rng = np.random.default_rng(7)
    q = jnp.asarray(rng.normal(size=(700, 3)), jnp.float32)
    r = jnp.asarray(rng.normal(size=(250, 3)), jnp.float32)
    for k in (1, 2, 3):
        d_x, i_x = knn(q, r, k=k, use_pallas=False)
        d_p, i_p = knn_small_refs(q, r, k=k, interpret=True)
        assert np.array_equal(np.asarray(i_x), np.asarray(i_p)), k
        np.testing.assert_allclose(d_x, d_p, rtol=1e-5, atol=1e-6)
    # mask + exclude_self
    mask = jnp.asarray(rng.random(700) > 0.4)
    d_x, i_x = knn(q, q, k=2, ref_mask=mask, exclude_self=True,
                   use_pallas=False)
    d_p, i_p = knn_small_refs(q, q, k=2, ref_mask=mask, exclude_self=True,
                              interpret=True)
    assert np.array_equal(np.asarray(i_x), np.asarray(i_p))
    # exact ties from duplicated refs
    rt = jnp.concatenate([r[:64], r[:64]])
    _, i_x = knn(q, rt, k=3, use_pallas=False)
    _, i_p = knn_small_refs(q, rt, k=3, interpret=True)
    assert np.array_equal(np.asarray(i_x), np.asarray(i_p))
