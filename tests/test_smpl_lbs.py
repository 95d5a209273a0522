"""SMPL forward + LBS deformation tests.

Oracles: (a) an independent numpy loop transcription of the SMPL forward
(smpl_numpy.py math), (b) algebraic invariants — zero pose is the identity,
the canonical->posed deformation of the big-pose vertices must land exactly
on the target-pose SMPL vertices, and the (transforms, translation) affine
pair must reproduce world_pts (the eval replay path, render.py:169-195).
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mygauhuman_tpu.models import mlps
from mygauhuman_tpu.models.lbs import coarse_deform_c2source, transform_params
from mygauhuman_tpu.models.smpl import (
    SMPL_PARENTS,
    big_pose_params,
    smpl_forward,
    synthetic_smpl,
)


def numpy_smpl_forward(model, poses, shapes):
    """Independent loop-based numpy twin of the SMPL forward."""
    v_t = np.asarray(model.v_template, np.float64)
    sd = np.asarray(model.shapedirs, np.float64)
    pd = np.asarray(model.posedirs, np.float64)
    jr = np.asarray(model.j_regressor, np.float64)
    w = np.asarray(model.weights, np.float64)
    parents = model.parents

    v_shaped = v_t + sd @ np.asarray(shapes, np.float64)
    J = jr @ v_shaped

    import scipy.spatial.transform as sst  # torch-free rotation oracle
    R = sst.Rotation.from_rotvec(np.asarray(poses).reshape(24, 3) + 1e-8).as_matrix()

    lrotmin = (R[1:] - np.eye(3)).reshape(-1)
    v_posed = v_shaped + pd @ lrotmin

    G = np.zeros((24, 4, 4))
    for j in range(24):
        local = np.eye(4)
        local[:3, :3] = R[j]
        local[:3, 3] = J[j] - (J[parents[j]] if j > 0 else 0)
        G[j] = local if j == 0 else G[parents[j]] @ local
    A = G.copy()
    for j in range(24):
        A[j, :, 3] -= G[j] @ np.concatenate([J[j], [0]])
    T = np.einsum("vj,jab->vab", w, A)
    vh = np.concatenate([v_posed, np.ones((len(v_posed), 1))], -1)
    verts = np.einsum("vab,vb->va", T, vh)[:, :3]
    return verts, G[:, :3, 3]


@pytest.fixture(scope="module")
def model():
    return synthetic_smpl(num_vertices=200, seed=0)


def test_zero_pose_is_template(model):
    verts, joints = smpl_forward(model, jnp.zeros(72), jnp.zeros(10))
    np.testing.assert_allclose(verts, model.v_template, atol=1e-5)
    np.testing.assert_allclose(joints, model.j_regressor @ model.v_template, atol=1e-5)


def test_smpl_forward_matches_numpy_twin(model):
    rng = np.random.default_rng(1)
    poses = (0.3 * rng.normal(size=72)).astype(np.float32)
    shapes = rng.normal(size=10).astype(np.float32)
    verts, joints = smpl_forward(model, jnp.asarray(poses), jnp.asarray(shapes))
    # rodrigues +1e-8 regularization differs slightly from scipy; loose atol
    ref_v, ref_j = numpy_smpl_forward(model, poses, shapes)
    np.testing.assert_allclose(verts, ref_v, atol=2e-5)
    np.testing.assert_allclose(joints, ref_j, atol=2e-5)


def test_root_rotation_rotates_about_root(model):
    rvec = np.array([0.0, 0.0, np.pi / 2], np.float32)
    poses = np.zeros(72, np.float32)
    poses[:3] = rvec
    verts, _ = smpl_forward(model, jnp.asarray(poses), jnp.zeros(10))
    import scipy.spatial.transform as sst
    R = sst.Rotation.from_rotvec(rvec).as_matrix()
    j0 = np.asarray(model.j_regressor @ model.v_template)[0]
    expect = (np.asarray(model.v_template) - j0) @ R.T + j0
    np.testing.assert_allclose(verts, expect, atol=1e-4)


def test_deform_big_pose_verts_to_target_pose(model):
    """Canonical big-pose vertices must deform exactly onto target SMPL verts."""
    bp = big_pose_params()
    big_verts, _ = smpl_forward(model, bp["poses"], bp["shapes"])

    rng = np.random.default_rng(2)
    tgt = {
        "poses": jnp.asarray(0.4 * rng.normal(size=72).astype(np.float32)),
        "shapes": jnp.asarray(rng.normal(size=10).astype(np.float32)),
        "R": jnp.asarray(
            np.linalg.qr(rng.normal(size=(3, 3)))[0].astype(np.float32)
        ),
        "Th": jnp.asarray(rng.normal(size=3).astype(np.float32)),
    }
    det = float(jnp.linalg.det(tgt["R"]))
    if det < 0:  # keep it a proper rotation
        tgt["R"] = tgt["R"].at[:, 0].multiply(-1)

    out = coarse_deform_c2source(
        model, big_verts, tgt, bp, big_verts,
        normals=jnp.zeros_like(big_verts),
        vert_ids=jnp.arange(big_verts.shape[0]),
    )
    tgt_verts, _ = smpl_forward(model, tgt["poses"], tgt["shapes"])
    expect_world = tgt_verts @ jnp.linalg.inv(tgt["R"]) + tgt["Th"]
    np.testing.assert_allclose(out.smpl_pts, tgt_verts, atol=2e-4)
    np.testing.assert_allclose(out.world_pts, expect_world, atol=2e-4)


def test_transforms_translation_replay(model):
    """world_pts == transforms @ query + translation (eval cache replay)."""
    bp = big_pose_params()
    big_verts, _ = smpl_forward(model, bp["poses"], bp["shapes"])
    rng = np.random.default_rng(3)
    query = big_verts + 0.01 * jnp.asarray(rng.normal(size=big_verts.shape).astype(np.float32))
    tgt = {
        "poses": jnp.asarray(0.3 * rng.normal(size=72).astype(np.float32)),
        "shapes": jnp.asarray(0.5 * rng.normal(size=10).astype(np.float32)),
        "R": jnp.eye(3),
        "Th": jnp.asarray(np.array([0.1, 0.2, -0.3], np.float32)),
    }
    nrm = jnp.asarray(rng.normal(size=query.shape).astype(np.float32))
    out = coarse_deform_c2source(model, query, tgt, bp, big_verts, normals=nrm)
    replay = jnp.einsum("nab,nb->na", out.transforms, query) + out.translation
    np.testing.assert_allclose(replay, out.world_pts, atol=1e-4)


def test_deform_with_lbs_offset_and_correct_rs(model):
    bp = big_pose_params()
    big_verts, _ = smpl_forward(model, bp["poses"], bp["shapes"])
    rng = np.random.default_rng(4)
    tgt = {
        "poses": jnp.asarray(0.3 * rng.normal(size=72).astype(np.float32)),
        "shapes": jnp.zeros(10),
        "R": jnp.eye(3),
        "Th": jnp.zeros(3),
    }
    key = jax.random.PRNGKey(0)
    pr = mlps.init_pose_refiner(key)
    correct_Rs = mlps.apply_pose_refiner(pr, tgt["poses"][3:])
    # tiny-init head -> corrections ~ identity
    np.testing.assert_allclose(
        correct_Rs, np.broadcast_to(np.eye(3), (23, 3, 3)), atol=1e-2
    )
    lo = mlps.init_lbs_offset(key)
    offsets = mlps.apply_lbs_offset(lo, big_verts)
    assert offsets.shape == (big_verts.shape[0], 24)

    out = coarse_deform_c2source(
        model, big_verts, tgt, bp, big_verts,
        lbs_offset=offsets, correct_Rs=correct_Rs,
    )
    base = coarse_deform_c2source(model, big_verts, tgt, bp, big_verts)
    # near-identity corrections shouldn't blow up the deformation
    assert float(jnp.abs(out.world_pts - base.world_pts).max()) < 0.5
    # weights renormalized
    np.testing.assert_allclose(out.bweights.sum(-1), 1.0, atol=1e-5)
    # gradients flow to the MLP params through the deformation
    def loss(p):
        off = mlps.apply_lbs_offset(p, big_verts)
        o = coarse_deform_c2source(model, big_verts, tgt, bp, big_verts, lbs_offset=off)
        return jnp.sum(o.world_pts ** 2)
    g = jax.grad(loss)(lo)
    gmax = max(float(jnp.abs(x).max()) for x in jax.tree.leaves(g) if hasattr(x, "max"))
    assert np.isfinite(gmax) and gmax > 0


def test_transform_params_zero_pose_identity(model):
    A, joints = transform_params(
        model, {"poses": jnp.zeros(72), "shapes": jnp.zeros(10)}
    )
    np.testing.assert_allclose(A, np.broadcast_to(np.eye(4), (24, 4, 4)), atol=1e-5)


def test_positional_encoding_layout():
    x = jnp.array([[0.5, -0.25, 1.0]])
    pe = mlps.positional_encode(x)
    assert pe.shape == (1, 63)
    np.testing.assert_allclose(pe[0, :3], [0.5, -0.25, 1.0])
    np.testing.assert_allclose(pe[0, 3:6], np.sin([0.5, -0.25, 1.0]), atol=1e-6)
    np.testing.assert_allclose(pe[0, 6:9], np.cos([0.5, -0.25, 1.0]), atol=1e-6)
    np.testing.assert_allclose(pe[0, 9:12], np.sin([1.0, -0.5, 2.0]), atol=1e-6)


class TestPallasDeformKernel:
    """ops/pallas_deform.py: the Pallas deform chain vs its pure-jnp twin
    (which is itself oracle-checked against the reference through the
    tests above — the kernel is op-for-op the same math)."""

    def _inputs(self, N=256, seed=0):
        rng = np.random.RandomState(seed)
        abig = jnp.asarray(rng.randn(12, N).astype(np.float32))
        # make the 3x3 blocks well-conditioned (near identity + noise)
        eye = np.zeros((12, 1), np.float32)
        eye[[0, 5, 10]] = 1.0
        abig = abig * 0.1 + jnp.asarray(eye)
        asrc = jnp.asarray(rng.randn(12, N).astype(np.float32)) * 0.1 \
            + jnp.asarray(eye)
        packed = jnp.asarray(rng.randn(9, N).astype(np.float32))
        rg = np.linalg.qr(rng.randn(3, 3))[0].astype(np.float32)
        sc = np.zeros((1, 32), np.float32)
        sc[0, 0:9] = rg.reshape(-1)
        sc[0, 9:18] = np.linalg.inv(rg).reshape(-1)
        sc[0, 18:21] = rng.randn(3)
        return abig, asrc, packed, jnp.asarray(sc)

    def test_interpret_matches_jnp(self):
        from mygauhuman_tpu.ops.pallas_deform import deform_rows

        args = self._inputs()
        ref = deform_rows(*args, "jnp")
        got = deform_rows(*args, "interpret")
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                                   rtol=1e-6, atol=1e-6)

    def test_gradients_flow(self):
        from mygauhuman_tpu.ops.pallas_deform import deform_rows

        args = self._inputs(N=128)

        def loss(abig, asrc, packed):
            out = deform_rows(abig, asrc, packed, args[3], "interpret")
            return jnp.sum(out ** 2)

        g = jax.grad(loss, argnums=(0, 1, 2))(*args[:3])
        ref = jax.grad(
            lambda a, b, p: jnp.sum(
                deform_rows(a, b, p, args[3], "jnp") ** 2),
            argnums=(0, 1, 2))(*args[:3])
        for gi, ri in zip(g, ref):
            assert float(jnp.sum(jnp.abs(gi))) > 0
            np.testing.assert_allclose(np.asarray(gi), np.asarray(ri),
                                       rtol=1e-5, atol=1e-5)

    def test_non_multiple_block_pads(self):
        """Serving-path capacities are multiples of 128 but not of the
        kernel block (cli/render's compact_state hit B=4096 with
        N=42,496); the wrapper must pad the lane axis and slice back."""
        from mygauhuman_tpu.ops.pallas_deform import (
            _deform_rows_pallas, deform_rows,
        )

        args = self._inputs(N=320)   # 320 % 128 = 64: forces the pad path
        ref = deform_rows(*args, "jnp")
        got = _deform_rows_pallas(*args, block=128, interpret=True)
        assert got.shape == ref.shape
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                                   rtol=1e-6, atol=1e-6)
