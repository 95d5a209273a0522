"""convert CLI: COLMAP orchestration + image pyramid (reference convert.py).

COLMAP itself is an external binary; these tests substitute a recording
stub executable so the full stage sequence, argument plumbing, and the
sparse/ -> sparse/0 shuffle run end-to-end without it.
"""
import os
import stat
import sys

import numpy as np
import pytest

from mygauhuman_tpu.cli import convert


def _make_stub_colmap(tmp_path):
    """A fake colmap that logs its argv and mimics the undistorter output."""
    log = tmp_path / "colmap_calls.log"
    script = tmp_path / "colmap"
    script.write_text(f"""#!/bin/sh
echo "$@" >> {log}
if [ "$1" = "image_undistorter" ]; then
  # --output_path is the 8th token; write the model files the real
  # undistorter would place directly under <output>/sparse.
  out=""
  prev=""
  for a in "$@"; do
    if [ "$prev" = "--output_path" ]; then out="$a"; fi
    prev="$a"
  done
  mkdir -p "$out/sparse" "$out/images"
  touch "$out/sparse/cameras.bin" "$out/sparse/images.bin" "$out/sparse/points3D.bin"
fi
exit 0
""")
    script.chmod(script.stat().st_mode | stat.S_IEXEC)
    return str(script), log


def test_full_pipeline_with_stub(tmp_path):
    scene = tmp_path / "scene"
    (scene / "input").mkdir(parents=True)
    colmap, log = _make_stub_colmap(tmp_path)

    convert.run_colmap(str(scene), colmap=colmap, camera="OPENCV", use_gpu=False)

    calls = log.read_text().strip().splitlines()
    stages = [c.split()[0] for c in calls]
    assert stages == [
        "feature_extractor", "exhaustive_matcher", "mapper", "image_undistorter",
    ]
    # GPU flag plumbed through
    assert "--SiftExtraction.use_gpu 0" in calls[0]
    # model files moved under sparse/0 (reference convert.py:80-88)
    for name in ("cameras.bin", "images.bin", "points3D.bin"):
        assert (scene / "sparse" / "0" / name).exists()
        assert not (scene / "sparse" / name).exists()


def test_skip_matching_runs_undistorter_only(tmp_path):
    scene = tmp_path / "scene"
    (scene / "input").mkdir(parents=True)
    colmap, log = _make_stub_colmap(tmp_path)

    convert.run_colmap(str(scene), colmap=colmap, skip_matching=True)
    stages = [c.split()[0] for c in log.read_text().strip().splitlines()]
    assert stages == ["image_undistorter"]


def test_missing_colmap_fails_clearly(tmp_path):
    with pytest.raises(SystemExit, match="not found"):
        convert.run_colmap(str(tmp_path), colmap="definitely-not-a-binary")


def test_image_pyramid(tmp_path):
    cv2 = pytest.importorskip("cv2")
    scene = tmp_path / "scene"
    (scene / "images").mkdir(parents=True)
    img = (np.random.default_rng(0).random((64, 48, 3)) * 255).astype(np.uint8)
    cv2.imwrite(str(scene / "images" / "frame.png"), img)

    convert.build_image_pyramid(str(scene))

    for factor in (2, 4, 8):
        small = cv2.imread(str(scene / f"images_{factor}" / "frame.png"))
        assert small.shape == (64 // factor, 48 // factor, 3)
    # INTER_AREA 2x downscale of a constant image is exact
    const = np.full((16, 16, 3), 200, np.uint8)
    cv2.imwrite(str(scene / "images" / "const.png"), const)
    convert.build_image_pyramid(str(scene))
    out = cv2.imread(str(scene / "images_2" / "const.png"))
    assert np.all(out == 200)
    # odd dims round half UP (ImageMagick '-resize 50%' semantics):
    # 101 -> 51 at /2, 101 -> 25 at /4 (25.25 truncates), 13 at /8
    odd = np.zeros((101, 13, 3), np.uint8)
    cv2.imwrite(str(scene / "images" / "odd.png"), odd)
    convert.build_image_pyramid(str(scene))
    assert cv2.imread(str(scene / "images_2" / "odd.png")).shape == (51, 7, 3)
    assert cv2.imread(str(scene / "images_4" / "odd.png")).shape == (25, 3, 3)
    assert cv2.imread(str(scene / "images_8" / "odd.png")).shape == (13, 2, 3)
