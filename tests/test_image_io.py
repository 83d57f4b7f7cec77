"""Multi-backend imread/imfrombytes/imwrite parity.

Reference surface: core/fileio/image_io.py:16-318 — four backends
(cv2/turbojpeg/pillow/tifffile), ``use_backend`` with ImportError on missing
optional libs, five flag names incl. ``*_ignore_orientation``, BGR default.
turbojpeg/tifffile round-trips skip when the optional library is absent
(neither ships in this image), but the ImportError contract is always
exercised.
"""

import numpy as np
import pytest

from image_segmentation_lab_tpu.core.fileio import image_io
from image_segmentation_lab_tpu.core.fileio.image_io import (
    imfrombytes, imread, imwrite, supported_backends, use_backend)


@pytest.fixture
def img_file(tmp_path, rng):
    arr = rng.randint(0, 256, (24, 32, 3)).astype(np.uint8)
    path = tmp_path / "img.png"
    assert imwrite(arr, str(path))
    return arr, str(path)


def test_supported_backends_matches_reference():
    assert supported_backends == ["cv2", "turbojpeg", "pillow", "tifffile"]


def test_cv2_pillow_roundtrip_and_channel_order(img_file):
    arr, path = img_file
    bgr = imread(path, backend="cv2")
    np.testing.assert_array_equal(bgr, arr)  # png is lossless
    rgb = imread(path, channel_order="rgb", backend="cv2")
    np.testing.assert_array_equal(rgb, bgr[..., ::-1])
    pil_bgr = imread(path, backend="pillow")
    np.testing.assert_array_equal(pil_bgr, bgr)
    gray_cv2 = imread(path, flag="grayscale", backend="cv2")
    assert gray_cv2.ndim == 2
    # ndarray passthrough
    assert imread(arr) is arr


def test_ignore_orientation_flags(img_file):
    arr, path = img_file
    for backend in ("cv2", "pillow"):
        out = imread(path, flag="color_ignore_orientation", backend=backend)
        np.testing.assert_array_equal(out, arr)
        g = imread(path, flag="grayscale_ignore_orientation",
                   backend=backend)
        assert g.ndim == 2


def test_imfrombytes_matches_imread(img_file):
    arr, path = img_file
    content = open(path, "rb").read()
    np.testing.assert_array_equal(imfrombytes(content), imread(path))
    np.testing.assert_array_equal(
        imfrombytes(content, backend="pillow"),
        imread(path, backend="pillow"))


def test_use_backend_importerror_parity():
    """Missing optional libraries raise ImportError from use_backend
    (reference image_io.py:59-71); unknown names are rejected."""
    prev = image_io.imread_backend
    try:
        for name, available in (("turbojpeg", image_io.TurboJPEG),
                                ("tifffile", image_io.tifffile)):
            if available is None:
                with pytest.raises(ImportError):
                    use_backend(name)
                assert image_io.imread_backend == prev  # not switched
            else:
                use_backend(name)
                assert image_io.imread_backend == name
                use_backend(prev)
        with pytest.raises(AssertionError):
            use_backend("nonexistent")
        with pytest.raises(ValueError):
            imread(np.zeros(1).tobytes(), backend="nonexistent")
    finally:
        image_io.imread_backend = prev


@pytest.mark.skipif(image_io.TurboJPEG is None,
                    reason="PyTurboJPEG not installed")
def test_turbojpeg_roundtrip(tmp_path, rng):
    arr = rng.randint(0, 256, (24, 32, 3)).astype(np.uint8)
    path = tmp_path / "img.jpg"
    imwrite(arr, str(path))
    out = imread(str(path), backend="turbojpeg")
    assert out.shape == arr.shape
    # JPEG is lossy: require agreement with the cv2 decode, not the source
    ref = imread(str(path), backend="cv2")
    assert np.abs(out.astype(int) - ref.astype(int)).mean() < 3
    gray = imread(str(path), flag="grayscale", backend="turbojpeg")
    assert gray.ndim == 2


@pytest.mark.skipif(image_io.tifffile is None, reason="tifffile not installed")
def test_tifffile_roundtrip(tmp_path, rng):
    arr = rng.randint(0, 256, (24, 32, 3)).astype(np.uint8)
    path = tmp_path / "img.tif"
    image_io.tifffile.imwrite(str(path), arr)
    out = imread(str(path), backend="tifffile")
    np.testing.assert_array_equal(out, arr)  # returned as stored (no BGR)
    np.testing.assert_array_equal(
        imfrombytes(open(str(path), "rb").read(), backend="tifffile"), arr)
