"""Dataset-reader tests over synthetic on-disk fixtures that mimic the real
layouts (ZJU annots.npy + images/masks/params, MonoCap dirs, COLMAP text
model, Blender transforms, DNA .smc HDF5) — through to a full render from a
parsed batch.
"""
import json
import os

import numpy as np
import pytest

import jax.numpy as jnp

from mygauhuman_tpu.data import readers as R
from mygauhuman_tpu.models.smpl import synthetic_smpl

IMG = 32


def write_img(path, value=0.5, channels=3):
    import imageio.v2 as imageio

    os.makedirs(os.path.dirname(path), exist_ok=True)
    arr = np.full((IMG, IMG, channels) if channels > 1 else (IMG, IMG),
                  int(value * 255), np.uint8)
    imageio.imwrite(path, arr)


def make_zju_fixture(root, n_views=19, n_frames=500):
    """annots.npy + per-view images; all frame entries reuse one image per
    view (contents keyed by basename, so one params/vertices file serves)."""
    rng = np.random.RandomState(0)
    K = np.array([[30.0, 0, IMG / 2], [0, 30.0, IMG / 2], [0, 0, 1]])
    cams = {"K": [], "D": [], "R": [], "T": []}
    for v in range(n_views):
        theta = 2 * np.pi * v / n_views
        Rm = np.array([
            [np.cos(theta), 0, np.sin(theta)],
            [0, 1, 0],
            [-np.sin(theta), 0, np.cos(theta)],
        ])
        cams["K"].append(K)
        cams["D"].append(np.zeros((5, 1)))
        cams["R"].append(Rm)
        cams["T"].append(np.array([[0.0], [0.0], [3000.0]]))  # mm

    ims = []
    for f in range(n_frames):
        ims.append({
            "ims": [f"images/{v:02d}/000000.jpg" for v in range(n_views)]
        })
    np.save(os.path.join(root, "annots.npy"),
            {"cams": cams, "ims": ims}, allow_pickle=True)

    for v in [0, 3, 6, 12, 18]:   # the split's views only
        write_img(os.path.join(root, f"images/{v:02d}/000000.jpg"), 0.6)
        write_img(os.path.join(root, f"normal/{v:02d}/000000.jpg"), 0.5)
        write_img(os.path.join(root, f"mask/{v:02d}/000000.png"), 1.0,
                  channels=1)

    verts = rng.randn(100, 3).astype(np.float32) * 0.3
    os.makedirs(os.path.join(root, "smpl_vertices"), exist_ok=True)
    os.makedirs(os.path.join(root, "smpl_params"), exist_ok=True)
    np.save(os.path.join(root, "smpl_vertices/0.npy"), verts)
    np.save(os.path.join(root, "smpl_params/0.npy"), {
        "Rh": np.zeros((1, 3), np.float32),
        "Th": np.zeros((1, 3), np.float32),
        "shapes": np.zeros((1, 10), np.float32),
        "poses": np.zeros((1, 72), np.float32),
    }, allow_pickle=True)


class TestZJU:
    def test_read_scene(self, tmp_path):
        root = str(tmp_path / "my_zju_377")
        os.makedirs(root)
        make_zju_fixture(root)
        model = synthetic_smpl(num_vertices=120)
        cwd = os.getcwd()
        os.chdir(tmp_path)
        try:
            info = R.read_zju_mocap_refine_info(
                root, white_background=False, output_path="test_exp",
                eval=True, smpl_model=model,
            )
        finally:
            os.chdir(cwd)
        # 50 poses x 4 train views / 17 x 1 test view
        assert len(info.train_cameras) == 50 * 4
        assert len(info.test_cameras) == 17 * 1
        c = info.train_cameras[0]
        assert c.image.shape == (IMG // 2, IMG // 2, 3)  # 0.5 scaling
        assert c.bkgd_mask.shape == (IMG // 2, IMG // 2)
        assert c.bound_mask.max() <= 1.0
        assert c.smpl_param["poses"].shape == (1, 72)
        assert c.big_pose_world_vertex.shape[0] == 120
        assert np.isfinite(info.nerf_normalization["radius"])

    def test_batch_conversion_and_render(self, tmp_path):
        root = str(tmp_path / "my_zju_377")
        os.makedirs(root)
        make_zju_fixture(root)
        model = synthetic_smpl(num_vertices=120)
        cwd = os.getcwd()
        os.chdir(tmp_path)
        try:
            info = R.read_zju_mocap_refine_info(
                root, False, "test_exp", True, smpl_model=model)
        finally:
            os.chdir(cwd)
        batch = R.camera_info_to_batch(info.train_cameras[0])
        assert batch.gt_image.shape == (IMG // 2, IMG // 2, 3)

        # end-to-end: init from the reader's cloud and render this batch
        from mygauhuman_tpu.models import gaussians as G
        from mygauhuman_tpu.ops.rasterize import RasterizerConfig
        from mygauhuman_tpu.render import render_frame

        pcd = info.point_cloud
        state = G.create_from_pcd(pcd.points, pcd.colors, pcd.normals,
                                  capacity=128)
        out = render_frame(
            state, batch.camera, batch.frame, model,
            bg=jnp.zeros(3), active_sh_degree=0,
            config=RasterizerConfig(tile_capacity=128, chunk_tiles=2),
        )
        assert out.render.shape == (IMG // 2, IMG // 2, 3)
        assert bool(jnp.all(jnp.isfinite(out.render)))


class TestMonoCap:
    def test_read_scene(self, tmp_path):
        root = str(tmp_path / "monocap_lan")
        os.makedirs(root)
        rng = np.random.RandomState(0)
        n_views = 11
        K = np.array([[30.0, 0, IMG / 2], [0, 30.0, IMG / 2], [0, 0, 1]])
        cams = {
            "K": [K] * n_views,
            "D": [np.zeros((5, 1))] * n_views,
            "R": [np.eye(3)] * n_views,
            "T": [np.array([0.0, 0.0, 3000.0])] * n_views,
        }
        np.save(os.path.join(root, "annots.npy"), {"cams": cams},
                allow_pickle=True)
        for v in range(n_views):
            for frame in range(0, 500, 5):
                pass  # single shared files below
        for v in range(n_views):
            for f in [0]:
                write_img(os.path.join(root, f"images/{v:02d}/0000.jpg"), 0.6)
                write_img(os.path.join(root, f"mask/{v:02d}/0000.png"), 1.0,
                          channels=1)
        # all pose indices resolve to files 0000/params 0
        # MonoCap iterates pose_index over interval 5 -> need those files;
        # create symlink-free copies for the required indices
        os.makedirs(os.path.join(root, "params"), exist_ok=True)
        os.makedirs(os.path.join(root, "vertices"), exist_ok=True)
        verts = rng.randn(80, 3).astype(np.float32) * 0.3
        param = {
            "Rh": np.zeros((1, 3), np.float32),
            "Th": np.zeros((1, 3), np.float32),
            "shapes": np.zeros((1, 10), np.float32),
            "poses": np.zeros((1, 72), np.float32),
        }
        needed = list(range(0, 500, 5)) + list(range(0, 510, 30))
        for i in needed:
            np.save(os.path.join(root, f"params/{i}.npy"), param,
                    allow_pickle=True)
            np.save(os.path.join(root, f"vertices/{i}.npy"), verts)
            for v in range(n_views):
                src = os.path.join(root, f"images/{v:02d}/0000.jpg")
                dst = os.path.join(root, f"images/{v:02d}/{i:04d}.jpg")
                if not os.path.exists(dst):
                    os.link(src, dst)
                srcm = os.path.join(root, f"mask/{v:02d}/0000.png")
                dstm = os.path.join(root, f"mask/{v:02d}/{i:04d}.png")
                if not os.path.exists(dstm):
                    os.link(srcm, dstm)

        model = synthetic_smpl(num_vertices=100)
        cwd = os.getcwd()
        os.chdir(tmp_path)
        try:
            info = R.read_monocap_info(root, False, "test_exp", True,
                                       smpl_model=model)
        finally:
            os.chdir(cwd)
        assert len(info.train_cameras) == 100      # 100 poses x 1 view
        assert len(info.test_cameras) == 17 * 10   # 17 poses x 10 views
        assert info.nerf_normalization["radius"] == 1.0  # single-view rule


class TestColmap:
    def test_text_model(self, tmp_path):
        root = str(tmp_path / "scene")
        sparse = os.path.join(root, "sparse")
        os.makedirs(sparse)
        with open(os.path.join(sparse, "cameras.txt"), "w") as f:
            f.write("# comment\n1 PINHOLE 32 32 30.0 30.0 16.0 16.0\n")
        with open(os.path.join(sparse, "images.txt"), "w") as f:
            f.write("1 1 0 0 0 0 0 4 1 im0.png\n\n")
            f.write("2 1 0 0 0 0.5 0 4 1 im1.png\n\n")
        with open(os.path.join(sparse, "points3D.txt"), "w") as f:
            f.write("1 0.1 0.2 0.3 100 150 200 0.5\n")
            f.write("2 -0.1 0.0 0.3 10 15 20 0.5\n")
        write_img(os.path.join(root, "images/im0.png"), 0.5)
        write_img(os.path.join(root, "images/im1.png"), 0.5)

        from mygauhuman_tpu.data.colmap import read_colmap_scene_info

        info = read_colmap_scene_info(root, eval=False)
        assert len(info.train_cameras) == 2
        assert info.point_cloud.points.shape == (2, 3)
        np.testing.assert_allclose(info.train_cameras[0].K[0, 0], 30.0)


class TestBlender:
    def test_transforms(self, tmp_path):
        root = str(tmp_path / "lego")
        os.makedirs(root)
        c2w = np.eye(4)
        c2w[2, 3] = 3.0
        meta = {
            "camera_angle_x": 0.8,
            "frames": [
                {"file_path": "./r_0", "transform_matrix": c2w.tolist()},
            ],
        }
        with open(os.path.join(root, "transforms_train.json"), "w") as f:
            json.dump(meta, f)
        write_img(os.path.join(root, "r_0.png"), 0.7)

        from mygauhuman_tpu.data.blender import read_nerf_synthetic_info

        info = read_nerf_synthetic_info(root)
        assert len(info.train_cameras) == 1
        assert info.train_cameras[0].image.shape == (IMG, IMG, 3)


class TestSMC:
    def make_smc(self, path, n_frames=3, n_cams=2):
        import h5py

        with h5py.File(path, "w") as f:
            f.attrs["gender"] = "neutral"
            f.attrs["actor_id"] = 1
            f.attrs["performance_id"] = 2
            f.attrs["ethnicity"] = "x"
            for cid in range(n_cams):
                g = f.create_group(f"Camera_5mp/{cid}/color")
                for fr in range(n_frames):
                    g.create_dataset(
                        str(fr), data=np.full((IMG, IMG, 3), 128, np.uint8)
                    )
                m = f.create_group(f"Mask/{cid}/mask")
                for fr in range(n_frames):
                    m.create_dataset(
                        str(fr), data=np.full((IMG, IMG), 255, np.uint8)
                    )
                cp = f.create_group(f"Camera_Parameter/{cid}")
                cp.create_dataset("K", data=np.array(
                    [[30.0, 0, 16], [0, 30.0, 16], [0, 0, 1]]))
                cp.create_dataset("D", data=np.zeros(5))
                RT = np.eye(4)
                RT[2, 3] = 3.0
                cp.create_dataset("RT", data=RT)
            sx = f.create_group("SMPLx")
            sx.create_dataset("betas", data=np.zeros((1, 10)))
            sx.create_dataset("expression", data=np.zeros((n_frames, 10)))
            sx.create_dataset("fullpose", data=np.zeros((n_frames, 55, 3)))
            transl = np.arange(n_frames * 3, dtype=np.float64).reshape(
                n_frames, 3
            )
            sx.create_dataset("transl", data=transl)
            sx.create_dataset("scale", data=np.float64(1.0))

    def test_smc_reader(self, tmp_path):
        from mygauhuman_tpu.data.smc_reader import SMCReader

        p = str(tmp_path / "actor_main.smc")
        self.make_smc(p)
        r = SMCReader(p)
        assert r.actor_info["gender"] == "neutral"
        img = r.get_img("Camera_5mp", 0, "color", 1)
        assert img.shape == (IMG, IMG, 3)
        calib = r.get_Calibration(0)
        assert calib["K"].shape == (3, 3)
        sm = r.get_SMPLx(Frame_id=0)
        assert sm["fullpose"].shape == (55, 3)
        assert float(sm["scale"]) == 1.0
        assert r.get_frame_count() == 3

    def test_smc_reader_layout_parity(self, tmp_path):
        """Reference-schema surface: actor_info keys (SMCReader.py:25-34),
        list/None Frame_id, time-ordered batch reads, calibration cache."""
        from mygauhuman_tpu.data.smc_reader import SMCReader

        p = str(tmp_path / "actor_annots.smc")
        self.make_smc(p, n_frames=12)  # >9 frames: '10' must follow '9'
        r = SMCReader(p)
        assert r.get_actor_info() == {
            "id": 1, "perf_id": 2, "gender": "neutral", "ethnicity": "x"
        }
        assert "SMPLx" in r.get_available_keys()
        # list Frame_id -> stacked batch; None -> all frames in time order
        batch = r.get_img("Camera_5mp", 0, "color", Frame_id=[0, 5])
        assert batch.shape == (2, IMG, IMG, 3)
        masks = r.get_mask(0)
        assert masks.shape == (12, IMG, IMG)
        sm = r.get_SMPLx()  # every per-frame key indexed [frame_list, ...]
        assert sm["fullpose"].shape == (12, 55, 3)
        np.testing.assert_array_equal(
            sm["transl"][10], np.arange(30, 33, dtype=np.float64)
        )
        sm10 = r.get_SMPLx(Frame_id=10)
        np.testing.assert_array_equal(sm10["transl"], sm["transl"][10])
        assert sm10["betas"].shape == (10,)  # single-row export broadcasts
        calib = r.get_Calibration_all()
        assert set(calib) == {"0", "1"}
        assert calib["0"]["RT"].shape == (4, 4)
        assert calib["0"]["Color_Calibration"] is None  # absent -> None
        assert r.get_camera_ids() == ["0", "1"]
        r.release()
        assert r.smc is None

    def test_dna_reader_with_synthetic_smplx(self, tmp_path):
        from mygauhuman_tpu.data.dna_rendering import read_cameras_dna_rendering
        from mygauhuman_tpu.models.smplx import synthetic_smplx

        p = str(tmp_path / "actor_main.smc")
        self.make_smc(p, n_frames=3, n_cams=2)
        model = synthetic_smplx(num_vertices=150)
        infos = read_cameras_dna_rendering(
            p, output_view=[0, 1], white_background=False,
            smplx_model=model, split="test",
        )
        # split test: 20 poses x interval 5 clipped by available frames ->
        # reader iterates fixed schedule; our fixture has 3 frames so only
        # pose 0 resolves for interval 5 -> 1 pose x 2 views... the reference
        # would IndexError; keep fixture aligned: interval 5 from 0 hits 0
        assert len(infos) >= 2
        c = infos[0]
        assert c.image.shape == (IMG // 2, IMG // 2, 3)
        assert c.smpl_param["poses"].shape == (165,)
        assert c.world_vertex.shape == (150, 3)


class TestHelpers:
    def test_vertex_normals_plane(self):
        verts = np.array([[0, 0, 0], [1, 0, 0], [0, 1, 0], [1, 1, 0]],
                         np.float64)
        faces = np.array([[0, 1, 2], [1, 3, 2]])
        n = R.vertex_normals(verts, faces)
        np.testing.assert_allclose(np.abs(n[:, 2]), 1.0, atol=1e-6)

    def test_bound_mask(self):
        K = np.array([[30.0, 0, 16], [0, 30.0, 16], [0, 0, 1]])
        pose = np.eye(4)[:3]
        pose[2, 3] = 3.0
        bounds = np.array([[-0.5, -0.5, -0.5], [0.5, 0.5, 0.5]])
        mask = R.get_bound_2d_mask(bounds, K, pose, 32, 32)
        assert mask[16, 16] == 1.0
        assert mask[0, 0] == 0.0


class TestRenderDatasetAndScene:
    def test_render_reader(self, tmp_path):
        # Render layout == ZJU layout with views [1,4,7,9]/[0,2,5,8],
        # schedule (2,50)/(5,20)
        root = str(tmp_path / "my_render_seq")
        os.makedirs(root)
        make_zju_fixture(root, n_views=10)
        import imageio.v2 as imageio
        for v in [0, 1, 2, 4, 5, 7, 8, 9]:
            write_img(os.path.join(root, f"images/{v:02d}/000000.jpg"), 0.6)
            write_img(os.path.join(root, f"normal/{v:02d}/000000.jpg"), 0.5)
            write_img(os.path.join(root, f"mask/{v:02d}/000000.png"), 1.0,
                      channels=1)
        model = synthetic_smpl(num_vertices=100)
        cwd = os.getcwd()
        os.chdir(tmp_path)
        try:
            info = R.read_render_info(root, False, "test_exp", True,
                                      smpl_model=model)
        finally:
            os.chdir(cwd)
        assert len(info.train_cameras) == 50 * 4
        assert len(info.test_cameras) == 20 * 4

    def test_novel_view_orbit(self, tmp_path):
        root = str(tmp_path / "my_zju_377")
        os.makedirs(root)
        make_zju_fixture(root)
        model = synthetic_smpl(num_vertices=100)
        cwd = os.getcwd()
        os.chdir(tmp_path)
        try:
            info = R.read_zju_mocap_refine_info(root, False, "t", True,
                                                smpl_model=model)
        finally:
            os.chdir(cwd)
        orbits = R.orbit_camera_infos(info.train_cameras[0], n_views=6)
        assert len(orbits) == 6
        # orbit cameras sit ~3m from the pivot and are all distinct
        centers = []
        for o in orbits:
            w2c = np.eye(4)
            w2c[:3, :3] = o.R.T
            w2c[:3, 3] = o.T
            c2w = np.linalg.inv(w2c)
            centers.append(c2w[:3, 3])
        centers = np.stack(centers)
        d = np.linalg.norm(centers - np.array([0, 0, -0.8]), axis=1)
        np.testing.assert_allclose(d, 3.0, rtol=1e-4)
        assert len(np.unique(np.round(centers, 4), axis=0)) == 6

    def test_scene_class(self, tmp_path):
        from mygauhuman_tpu.data.scene import Scene

        root = str(tmp_path / "my_zju_377")
        os.makedirs(root)
        make_zju_fixture(root)
        model = synthetic_smpl(num_vertices=100)
        cwd = os.getcwd()
        os.chdir(tmp_path)
        try:
            scene = Scene(root, "t", smpl_model=model, shuffle=True)
        finally:
            os.chdir(cwd)
        assert len(scene.get_train_cameras()) == 200
        assert len(scene.get_test_cameras()) == 17
        assert int(scene.gaussians.num_alive) == 100
        rays = scene.get_canonical_rays()
        assert rays.shape == (16 * 16, 3)
        # save/reload round trip
        p = scene.save(str(tmp_path / "out"), 7)
        assert os.path.exists(p)
