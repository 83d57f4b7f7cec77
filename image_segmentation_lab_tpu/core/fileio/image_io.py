"""Image read/write.

Parity with reference ``core/fileio/image_io.py:144-318`` (multi-backend
cv2/pillow imread/imwrite/imfrombytes).  cv2 is the default backend; pillow is
the fallback.  Color images are returned **BGR** by default like the reference
(which uses cv2 conventions); pass ``channel_order='rgb'`` for RGB.
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

from PIL import Image

_FLAG_MAP = {
    "color": 1,      # cv2.IMREAD_COLOR
    "grayscale": 0,  # cv2.IMREAD_GRAYSCALE
    "unchanged": -1, # cv2.IMREAD_UNCHANGED
}


def imread(img_or_path,
           flag: str = "color",
           channel_order: str = "bgr",
           backend: Optional[str] = None) -> np.ndarray:
    """Read an image from path / ndarray passthrough."""
    if isinstance(img_or_path, np.ndarray):
        return img_or_path
    path = str(img_or_path)
    if not os.path.isfile(path):
        raise FileNotFoundError(f"img file does not exist: {path}")
    if backend is None:
        backend = "cv2" if _HAS_CV2 else "pillow"
    if backend == "cv2":
        img = cv2.imread(path, _FLAG_MAP[flag])
        if img is None:
            raise IOError(f"Failed to read image: {path}")
        if flag == "color" and channel_order == "rgb":
            img = cv2.cvtColor(img, cv2.COLOR_BGR2RGB)
        return img
    # pillow fallback
    with Image.open(path) as pil_img:
        if flag == "grayscale":
            pil_img = pil_img.convert("L")
        elif flag == "color":
            pil_img = pil_img.convert("RGB")
        arr = np.asarray(pil_img)
    if flag == "color" and channel_order == "bgr":
        arr = arr[..., ::-1]
    return np.ascontiguousarray(arr)


def imfrombytes(content: bytes,
                flag: str = "color",
                channel_order: str = "bgr") -> np.ndarray:
    if _HAS_CV2:
        buf = np.frombuffer(content, np.uint8)
        img = cv2.imdecode(buf, _FLAG_MAP[flag])
        if flag == "color" and channel_order == "rgb":
            img = cv2.cvtColor(img, cv2.COLOR_BGR2RGB)
        return img
    import io
    with Image.open(io.BytesIO(content)) as pil_img:
        arr = np.asarray(pil_img.convert("RGB" if flag == "color" else "L"))
    if flag == "color" and channel_order == "bgr":
        arr = arr[..., ::-1]
    return np.ascontiguousarray(arr)


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
