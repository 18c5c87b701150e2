"""Image loading with aspect-ratio bucketing to fixed resolution sets.

Parity: ``mapanything/utils/image.py`` — RESOLUTION_MAPPINGS (:40-70,
518/512-px long side x 10 aspect-ratio buckets), ``rgb`` denormalization
(:92), ``load_images`` (:134) with resize modes. Fixed buckets give XLA a
small closed set of compile shapes (one jit cache entry per bucket).
"""

from __future__ import annotations

from pathlib import Path
from typing import List, Sequence, Union

import cv2
import numpy as np

from mapanything_tpu.data.cropping import crop_resize_if_necessary
from mapanything_tpu.models.encoders.normalizations import IMAGE_NORMALIZATION_DICT

RESOLUTION_MAPPINGS = {
    518: {
        1.000: (518, 518),
        1.321: (518, 392),
        1.542: (518, 336),
        1.762: (518, 294),
        2.056: (518, 252),
        3.083: (518, 168),
        0.757: (392, 518),
        0.649: (336, 518),
        0.567: (294, 518),
        0.486: (252, 518),
    },
    512: {
        1.000: (512, 512),
        1.333: (512, 384),
        1.524: (512, 336),
        1.778: (512, 288),
        2.000: (512, 256),
        3.200: (512, 160),
        0.750: (384, 512),
        0.656: (336, 512),
        0.562: (288, 512),
        0.500: (256, 512),
    },
}

IMG_EXTENSIONS = {".jpg", ".jpeg", ".png", ".bmp", ".webp", ".tif", ".tiff"}


def find_closest_aspect_ratio(aspect_ratio: float, resolution_set: int = 518):
    """Closest bucket (width, height) for an aspect ratio (reference :75)."""
    mapping = RESOLUTION_MAPPINGS[resolution_set]
    key = min(mapping.keys(), key=lambda x: abs(x - aspect_ratio))
    return mapping[key]


def rgb(img: np.ndarray, norm_type: str = "dinov2", true_shape=None) -> np.ndarray:
    """Denormalize an image array to [0, 1] RGB (reference :92)."""
    img = np.asarray(img)
    if true_shape is not None:
        h, w = true_shape
        img = img[..., :h, :w, :]
    if img.dtype == np.uint8:
        return img.astype(np.float32) / 255.0
    if norm_type in IMAGE_NORMALIZATION_DICT:
        norm = IMAGE_NORMALIZATION_DICT[norm_type]
        img = img * np.asarray(norm.std) + np.asarray(norm.mean)
    return np.clip(img, 0.0, 1.0)


try:  # HEIF/HEIC support is optional (reference image.py:24-31 pattern:
    # pillow-heif registers a PIL opener when installed)
    import pillow_heif  # type: ignore

    pillow_heif.register_heif_opener()
    HEIF_SUPPORT = True
except ImportError:  # pragma: no cover - env-dependent
    HEIF_SUPPORT = False

HEIF_EXTENSIONS = {".heic", ".heif"}


def _read_image(path, bayer_format: bool = False) -> np.ndarray:
    """Read one image as RGB uint8.

    Parity with the reference loader (``mapanything/utils/image.py:134``):
    ``bayer_format=True`` demosaics a raw Bayer-pattern capture
    (cv2 ``COLOR_BAYER_RG2BGR``, consumed as RGB exactly as upstream
    does); ``.heic/.heif`` route through PIL when pillow-heif is
    installed (optional import above).
    """
    path = str(path)
    suffix = Path(path).suffix.lower()
    if suffix in HEIF_EXTENSIONS:
        if not HEIF_SUPPORT:
            raise RuntimeError(
                f"{path}: HEIF support needs the optional pillow-heif "
                "package (reference gates .heic the same way)"
            )
        from PIL import Image, ImageOps

        img = ImageOps.exif_transpose(Image.open(path)).convert("RGB")
        return np.asarray(img)
    if bayer_format:
        raw = cv2.imread(path, cv2.IMREAD_UNCHANGED)
        if raw is None:
            raise FileNotFoundError(path)
        # reference quirk reproduced: BAYER_RG2BGR output is consumed as
        # RGB without a further swap (image.py:226-229)
        return cv2.cvtColor(raw, cv2.COLOR_BAYER_RG2BGR)
    img = cv2.imread(path, cv2.IMREAD_COLOR)
    if img is None:
        raise FileNotFoundError(path)
    return cv2.cvtColor(img, cv2.COLOR_BGR2RGB)


def load_images(
    folder_or_list: Union[str, Sequence],
    resolution_set: int = 518,
    norm_type: str = "dinov2",
    resize_mode: str = "fixed_mapping",
    size: int = None,
    bayer_format: bool = False,
    stride: int = 1,
) -> dict:
    """Load + bucket-resize a folder/list of images (reference :134).

    Resize modes:
      - "fixed_mapping": long side + closest aspect-ratio bucket (default);
      - "longest_side": scale longest side to ``size`` (multiple of 14);
      - "square": center-crop square at ``size``.

    ``bayer_format`` demosaics raw Bayer captures; ``.heic/.heif`` files
    load when pillow-heif is installed (both per reference :134,226).
    ``stride`` keeps every n-th image.

    Returns dict with:
      images: (V, H, W, 3) float32 normalized; images_no_norm in [0, 1];
      true_shape: (V, 2) original shapes; paths.
    """
    extensions = IMG_EXTENSIONS | (HEIF_EXTENSIONS if HEIF_SUPPORT else set())
    if isinstance(folder_or_list, (str, Path)):
        paths = sorted(
            p for p in Path(folder_or_list).iterdir()
            if p.suffix.lower() in extensions
        )
    else:
        paths = [Path(p) for p in folder_or_list]
    paths = paths[::max(stride, 1)]
    if not paths:
        raise ValueError(f"no images found in {folder_or_list}")

    norm = IMAGE_NORMALIZATION_DICT[norm_type]
    imgs, raw, shapes = [], [], []
    target = None
    for p in paths:
        img = _read_image(p, bayer_format=bayer_format)
        h, w = img.shape[:2]
        shapes.append((h, w))
        if target is None:
            if resize_mode == "fixed_mapping":
                target = find_closest_aspect_ratio(w / h, resolution_set)
            elif resize_mode == "longest_side":
                assert size is not None
                scale = size / max(h, w)
                target = (
                    int(round(w * scale / 14) * 14),
                    int(round(h * scale / 14) * 14),
                )
            elif resize_mode == "square":
                assert size is not None
                target = (size, size)
            else:
                raise ValueError(resize_mode)
        out, _, _, _ = crop_resize_if_necessary(img, target, None, _fake_K(h, w))
        raw.append(out.astype(np.float32) / 255.0)
        imgs.append(norm.apply(raw[-1]))

    return dict(
        images=np.stack(imgs).astype(np.float32),
        images_no_norm=np.stack(raw).astype(np.float32),
        true_shape=np.asarray(shapes, np.int32),
        paths=[str(p) for p in paths],
        data_norm_type=norm_type,
    )


def _fake_K(h: int, w: int) -> np.ndarray:
    """Placeholder intrinsics so crop bookkeeping works for plain images."""
    return np.array(
        [[max(h, w), 0, w / 2 - 0.5], [0, max(h, w), h / 2 - 0.5], [0, 0, 1]],
        np.float32,
    )
