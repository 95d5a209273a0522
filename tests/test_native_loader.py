"""Native C++ decode pipeline tests: build, decode parity vs imageio,
half-scale box filter, threaded pipeline ordering and error paths."""
import os

import numpy as np
import pytest

from mygauhuman_tpu.data.native_loader import (
    NativeImageLoader,
    decode_image,
    native_available,
)


@pytest.fixture(scope="module")
def images(tmp_path_factory):
    import imageio.v2 as imageio

    d = tmp_path_factory.mktemp("imgs")
    rng = np.random.RandomState(0)
    paths = {}
    rgb = (rng.rand(32, 48, 3) * 255).astype(np.uint8)
    p = str(d / "a.png")
    imageio.imwrite(p, rgb)
    paths["png"] = (p, rgb)
    # smooth gradient for the lossy-codec comparison (JPEG destroys noise)
    yy, xx = np.mgrid[0:32, 0:48]
    smooth = np.stack([yy * 8, xx * 5, (yy + xx) * 3], axis=-1
                      ).clip(0, 255).astype(np.uint8)
    p = str(d / "b.jpg")
    imageio.imwrite(p, smooth, quality=95)
    paths["jpg"] = (p, smooth)
    gray = (rng.rand(16, 16) * 255).astype(np.uint8)
    p = str(d / "g.png")
    imageio.imwrite(p, gray)
    paths["gray"] = (p, gray)
    return paths


class TestNativeBuild:
    def test_builds(self):
        assert native_available(), "g++/libjpeg/libpng build failed"
        assert os.path.exists(
            os.path.join(os.path.dirname(os.path.dirname(
                os.path.abspath(__file__))), "build", "libdataloader.so")
        )


class TestDecode:
    def test_png_exact(self, images):
        p, rgb = images["png"]
        img = decode_image(p)
        assert img.shape == (32, 48, 3)
        np.testing.assert_allclose(img, rgb / 255.0, atol=1e-6)

    def test_jpeg_close(self, images):
        p, rgb = images["jpg"]
        img = decode_image(p)
        assert img.shape == (32, 48, 3)
        # lossy: mean error small
        assert np.abs(img - rgb / 255.0).mean() < 0.05

    def test_gray_png(self, images):
        p, gray = images["gray"]
        img = decode_image(p)
        assert img.shape == (16, 16, 1)
        np.testing.assert_allclose(img[..., 0], gray / 255.0, atol=1e-6)

    def test_half_scale_is_box_filter(self, images):
        p, rgb = images["png"]
        img = decode_image(p, half_scale=True)
        assert img.shape == (16, 24, 3)
        full = rgb.astype(np.float32) / 255.0
        expected = 0.25 * (full[0::2, 0::2] + full[1::2, 0::2]
                           + full[0::2, 1::2] + full[1::2, 1::2])
        np.testing.assert_allclose(img, expected, atol=1e-5)


class TestPipeline:
    def test_parallel_order_preserving(self, images):
        p_png, rgb = images["png"]
        p_jpg, _ = images["jpg"]
        paths = [p_png, p_jpg] * 8
        with NativeImageLoader(workers=4) as dl:
            out = dl.load_all(paths)
        assert len(out) == 16
        # even indices are the png; order preserved despite threading
        np.testing.assert_allclose(out[0], rgb / 255.0, atol=1e-6)
        np.testing.assert_allclose(out[14], rgb / 255.0, atol=1e-6)

    def test_bad_path_raises(self):
        with NativeImageLoader(workers=1) as dl:
            dl.submit("/nonexistent/file.png", 0)
            with pytest.raises(IOError):
                dl.collect()

    def test_throughput_vs_serial(self, images):
        """Smoke: parallel decode of 64 images completes (not a strict perf
        assertion; CI machines vary)."""
        p, _ = images["jpg"]
        with NativeImageLoader(workers=8) as dl:
            out = dl.load_all([p] * 64)
        assert all(o is not None for o in out)
