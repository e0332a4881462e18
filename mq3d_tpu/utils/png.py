"""Image file IO (PNG), with cv2 fast path and PIL fallback.

The reference uses cv2.imread/imwrite throughout (reference:
scripts/dataio/image_data_io.py:64-81); PNG codecs stay host-side in either
framework — they are IO, not compute.
"""

from __future__ import annotations

from pathlib import Path
from typing import Optional

import numpy as np

try:
    import cv2

    _HAS_CV2 = True
except Exception:  # pragma: no cover
    _HAS_CV2 = False


def imread_bgr(path: Path) -> Optional[np.ndarray]:
    path = Path(path)
    if not path.exists():
        return None
    if _HAS_CV2:
        img = cv2.imread(str(path))
        return img
    from PIL import Image  # pragma: no cover

    with Image.open(path) as im:  # pragma: no cover
        rgb = np.asarray(im.convert("RGB"))
    return rgb[..., ::-1].copy()  # pragma: no cover


def imread_gray(path: Path) -> Optional[np.ndarray]:
    path = Path(path)
    if not path.exists():
        return None
    if _HAS_CV2:
        return cv2.imread(str(path), cv2.IMREAD_GRAYSCALE)
    from PIL import Image  # pragma: no cover

    with Image.open(path) as im:  # pragma: no cover
        return np.asarray(im.convert("L"))


def imwrite(path: Path, img: np.ndarray):
    """Write an image; float arrays are rounded-and-clipped to uint8 the way
    cv2.imwrite does (saturate_cast).  PNGs encode through the native zlib
    writer (native/mqio.cpp) when available."""
    path = Path(path)
    path.parent.mkdir(parents=True, exist_ok=True)
    if img.dtype != np.uint8:
        img = np.clip(np.rint(img), 0, 255).astype(np.uint8)
    if path.suffix.lower() == ".png":
        from mq3d_tpu.utils.native import write_png

        if write_png(path, img):
            return
    if _HAS_CV2:
        ok = cv2.imwrite(str(path), img)
        if not ok:
            raise IOError(f"Failed to write image: {path}")
        return
    from PIL import Image  # pragma: no cover

    if img.ndim == 3:  # pragma: no cover
        Image.fromarray(img[..., ::-1]).save(path)
    else:  # pragma: no cover
        Image.fromarray(img).save(path)
