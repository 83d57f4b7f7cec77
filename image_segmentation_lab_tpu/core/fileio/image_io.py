"""Image read/write.

Parity with reference ``core/fileio/image_io.py:16-318``: multi-backend
imread/imfrombytes/imwrite over cv2 / pillow / turbojpeg / tifffile, a
module-global default selected by ``use_backend`` (raising ImportError for
missing optional libraries exactly like the reference :59-71), and the five
cv2 flag names incl. the ``*_ignore_orientation`` variants (:33-40).  Color
images are returned **BGR** by default like the reference (cv2 convention);
pass ``channel_order='rgb'`` for RGB.  ``turbojpeg`` handles only
color/grayscale JPEGs; ``tifffile`` ignores flag/channel_order (both as in
the reference :216-233).
"""

from __future__ import annotations

import os
from pathlib import Path
from typing import Optional

import numpy as np

try:
    import cv2
    _HAS_CV2 = True
except Exception:  # pragma: no cover
    cv2 = None
    _HAS_CV2 = False

from PIL import Image, ImageOps

try:  # optional, reference image_io.py:16-20
    from turbojpeg import TJCS_RGB, TJPF_BGR, TJPF_GRAY, TurboJPEG
except ImportError:
    TJCS_RGB = TJPF_GRAY = TJPF_BGR = TurboJPEG = None

try:  # optional, reference image_io.py:26-29
    import tifffile
except ImportError:
    tifffile = None

_jpeg = None  # lazily-created TurboJPEG decoder instance
supported_backends = ["cv2", "turbojpeg", "pillow", "tifffile"]
imread_backend = "cv2" if _HAS_CV2 else "pillow"

_FLAG_MAP = {
    "color": 1,        # cv2.IMREAD_COLOR
    "grayscale": 0,    # cv2.IMREAD_GRAYSCALE
    "unchanged": -1,   # cv2.IMREAD_UNCHANGED
    # IMREAD_IGNORE_ORIENTATION (128) | base flag
    "color_ignore_orientation": 128 | 1,
    "grayscale_ignore_orientation": 128 | 0,
}


def use_backend(backend: str) -> None:
    """Select the process-wide default image decoding backend.

    Reference ``image_io.py:48-71``: asserts the name is supported and
    raises ImportError when the optional library is absent.
    """
    assert backend in supported_backends
    global imread_backend, _jpeg
    if backend == "cv2":
        if not _HAS_CV2:
            raise ImportError("`opencv-python` is not installed")
    elif backend == "turbojpeg":
        if TurboJPEG is None:
            raise ImportError("`PyTurboJPEG` is not installed")
        if _jpeg is None:
            _jpeg = TurboJPEG()
    elif backend == "pillow":
        if Image is None:  # pragma: no cover - PIL is a hard dep here
            raise ImportError("`Pillow` is not installed")
    elif backend == "tifffile":
        if tifffile is None:
            raise ImportError("`tifffile` is not installed")
    imread_backend = backend


def _jpegflag(flag: str = "color", channel_order: str = "bgr"):
    """TurboJPEG pixel format (reference image_io.py:74-86)."""
    channel_order = channel_order.lower()
    if channel_order not in ("rgb", "bgr"):
        raise ValueError('channel order must be either "rgb" or "bgr"')
    if flag == "color":
        return TJPF_BGR if channel_order == "bgr" else TJCS_RGB
    if flag == "grayscale":
        return TJPF_GRAY
    raise ValueError('flag must be "color" or "grayscale"')


def _pillow2array(pil_img, flag: str = "color",
                  channel_order: str = "bgr") -> np.ndarray:
    """Pillow image → ndarray (reference image_io.py:89-142): honors EXIF
    orientation unless the flag says otherwise, converts LA on a gray
    canvas, and emits BGR by default."""
    channel_order = channel_order.lower()
    if channel_order not in ("rgb", "bgr"):
        raise ValueError('channel order must be either "rgb" or "bgr"')
    if flag == "unchanged":
        arr = np.array(pil_img)
        if arr.ndim >= 3 and arr.shape[2] >= 3:
            arr[:, :, :3] = arr[:, :, (2, 1, 0)]  # RGB→BGR in place
        return arr
    if flag in ("color", "grayscale"):
        pil_img = ImageOps.exif_transpose(pil_img)
    if pil_img.mode != "RGB":
        if pil_img.mode != "LA":
            pil_img = pil_img.convert("RGB")
        else:
            # LA → RGB over a neutral canvas so black foregrounds survive
            img_rgba = pil_img.convert("RGBA")
            pil_img = Image.new("RGB", img_rgba.size, (124, 117, 104))
            pil_img.paste(img_rgba, mask=img_rgba.split()[3])
    if flag in ("color", "color_ignore_orientation"):
        arr = np.array(pil_img)
        if channel_order != "rgb":
            arr = arr[:, :, ::-1]
    elif flag in ("grayscale", "grayscale_ignore_orientation"):
        arr = np.array(pil_img.convert("L"))
    else:
        raise ValueError(
            'flag must be "color", "grayscale", "unchanged", '
            '"color_ignore_orientation" or "grayscale_ignore_orientation" '
            f"but got {flag}")
    return np.ascontiguousarray(arr)


def imread(img_or_path,
           flag: str = "color",
           channel_order: str = "bgr",
           backend: Optional[str] = None) -> np.ndarray:
    """Read an image from path (ndarray passes through).

    ``backend`` overrides the module default set by ``use_backend``
    (reference image_io.py:144-233).
    """
    if isinstance(img_or_path, np.ndarray):
        return img_or_path
    path = str(img_or_path)
    if backend is None:
        backend = imread_backend
    if backend not in supported_backends:
        raise ValueError(
            f"backend: {backend} is not supported. Supported backends are "
            f"{supported_backends}")
    if not os.path.isfile(path):
        raise FileNotFoundError(f"img file does not exist: {path}")
    if backend == "turbojpeg":
        if TurboJPEG is None:
            raise ImportError("`PyTurboJPEG` is not installed")
        global _jpeg
        if _jpeg is None:
            _jpeg = TurboJPEG()
        with open(path, "rb") as f:
            img = _jpeg.decode(f.read(), _jpegflag(flag, channel_order))
        if img.shape[-1] == 1:
            img = img[:, :, 0]
        return img
    if backend == "tifffile":
        if tifffile is None:
            raise ImportError("`tifffile` is not installed")
        return tifffile.imread(path)
    if backend == "pillow":
        with Image.open(path) as pil_img:
            return _pillow2array(pil_img, flag, channel_order)
    if not _HAS_CV2:
        with Image.open(path) as pil_img:  # pragma: no cover
            return _pillow2array(pil_img, flag, channel_order)
    img = cv2.imread(path, _FLAG_MAP[flag])
    if img is None:
        raise IOError(f"Failed to read image: {path}")
    if flag in ("color", "color_ignore_orientation") and \
            channel_order == "rgb":
        img = cv2.cvtColor(img, cv2.COLOR_BGR2RGB)
    return img


def imfrombytes(content: bytes,
                flag: str = "color",
                channel_order: str = "bgr",
                backend: Optional[str] = None) -> np.ndarray:
    """Decode an in-memory buffer (reference image_io.py:236-280)."""
    if backend is None:
        backend = imread_backend
    if backend not in supported_backends:
        raise ValueError(
            f"backend: {backend} is not supported. Supported backends are "
            f"{supported_backends}")
    if backend == "turbojpeg":
        if TurboJPEG is None:
            raise ImportError("`PyTurboJPEG` is not installed")
        global _jpeg
        if _jpeg is None:
            _jpeg = TurboJPEG()
        img = _jpeg.decode(content, _jpegflag(flag, channel_order))
        if img.shape[-1] == 1:
            img = img[:, :, 0]
        return img
    if backend == "tifffile":
        if tifffile is None:
            raise ImportError("`tifffile` is not installed")
        import io
        return tifffile.imread(io.BytesIO(content))
    if backend == "pillow" or not _HAS_CV2:
        import io
        with Image.open(io.BytesIO(content)) as pil_img:
            return _pillow2array(pil_img, flag, channel_order)
    buf = np.frombuffer(content, np.uint8)
    img = cv2.imdecode(buf, _FLAG_MAP[flag])
    if flag in ("color", "color_ignore_orientation") and \
            channel_order == "rgb":
        img = cv2.cvtColor(img, cv2.COLOR_BGR2RGB)
    return img


def imwrite(img: np.ndarray,
            file_path: str,
            auto_mkdir: bool = True) -> bool:
    if auto_mkdir:
        Path(file_path).parent.mkdir(parents=True, exist_ok=True)
    if _HAS_CV2:
        return cv2.imwrite(str(file_path), img)
    arr = img
    if arr.ndim == 3 and arr.shape[-1] == 3:
        arr = arr[..., ::-1]  # BGR→RGB for pillow
    Image.fromarray(arr.astype(np.uint8)).save(str(file_path))
    return True
