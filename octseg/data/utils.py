"""Host-side data helpers: file listing, grayscale conversion, Supervisely
mask decode, inference pre/post-processing and the overlay writer.

Behavioral parity with the reference helpers (reference: src/data/utils.py —
get_file_list :48-74, get_dir_list :77-99, convert_to_grayscale :102-113,
convert_base64_to_numpy :132-156, preprocessing_img :159-166, data_processing
:169-192, save_results :195-235), including the reference's uint8 wraparound
in overlay alpha computation (the translucent-fill / bright-outline look of
the published demo outputs depends on it).

TPU-first split: the per-pixel morphology/blur chain inside save_results runs
batched on device (octseg.ops.morphology); only PIL compositing and PNG
encode stay on host.
"""

from __future__ import annotations

import base64
import logging
import os
import zlib
from glob import glob
from pathlib import Path
from typing import List, Optional, Tuple, Union

import cv2
import jax
import jax.numpy as jnp
import numpy as np
from PIL import Image

from octseg.core.registry import CLASS_COLORS_RGB, CLASS_IDS
from octseg.ops.morphology import ELLIPSE_5, ELLIPSE_7, close, dilate, erode, gaussian_blur5


def get_file_list(
    src_dirs: Union[List[str], str],
    ext_list: Union[List[str], str],
    filename_template: str = '',
) -> List[str]:
    all_files = []
    src_dirs = [src_dirs] if isinstance(src_dirs, str) else src_dirs
    ext_list = [ext_list] if isinstance(ext_list, str) else ext_list
    for src_dir in src_dirs:
        for root, _dirs, files in os.walk(src_dir):
            for file in files:
                ext = Path(file).suffix.lower()
                if ext in ext_list and filename_template in file:
                    all_files.append(os.path.join(root, file))
    all_files.sort()
    return all_files


def get_dir_list(
    data_dir: str,
    include_dirs: Optional[List[str]] = None,
    exclude_dirs: Optional[List[str]] = None,
) -> List[str]:
    dir_list = []
    for series_dir in glob(data_dir + '/*/'):
        name = Path(series_dir).name
        if include_dirs and name not in include_dirs:
            logging.info('%s not in include_dirs — skipping', name)
            continue
        if exclude_dirs and name in exclude_dirs:
            logging.info('%s listed in exclude_dirs — skipping', name)
            continue
        dir_list.append(series_dir)
    dir_list.sort()
    return dir_list


def convert_to_grayscale(
    img_src: np.ndarray,
    min_limit: int = 40,
    max_limit: int = 220,
) -> np.ndarray:
    """RGB → clipped/equalized grayscale → 3-channel (annotation display aid)."""
    img = cv2.cvtColor(img_src, cv2.COLOR_RGB2GRAY)
    img[img < min_limit] = 0
    img[img > max_limit] = 255
    img = cv2.equalizeHist(img)
    return cv2.cvtColor(img, cv2.COLOR_GRAY2RGB)


def get_study_name(dcm_path: str) -> str:
    return Path(dcm_path).parts[-2]


def get_series_name(dcm_path: str) -> str:
    return str(int(Path(dcm_path).name.replace('IMG', '')))


def convert_base64_to_numpy(s: str) -> np.ndarray:
    """Supervisely bitmap: zlib+base64-encoded PNG → boolean mask."""
    z = zlib.decompress(base64.b64decode(s))
    n = np.frombuffer(z, np.uint8)
    img_decoded = cv2.imdecode(n, cv2.IMREAD_UNCHANGED)
    if img_decoded.ndim == 3 and img_decoded.shape[2] >= 4:
        return img_decoded[:, :, 3].astype(bool)
    if img_decoded.ndim == 2:
        return img_decoded.astype(bool)
    raise RuntimeError('Wrong internal mask format')


def convert_numpy_to_base64(mask: np.ndarray) -> str:
    """Inverse of convert_base64_to_numpy (needed by the Supervisely
    converter when re-encoding cropped object masks)."""
    m = (mask.astype(np.uint8)) * 255
    rgba = np.dstack([m, m, m, m])
    ok, png = cv2.imencode('.png', rgba)
    if not ok:
        raise RuntimeError('PNG encode failed')
    return base64.b64encode(zlib.compress(png.tobytes())).decode('ascii')


def preprocessing_img(img: Image.Image, input_size: int) -> np.ndarray:
    """PIL RGB → BGR uint8 resized to input_size (ref predict preprocessing)."""
    image = np.array(img)
    image = cv2.cvtColor(image, cv2.COLOR_RGB2BGR)
    return cv2.resize(image, (input_size, input_size))


def data_processing(
    data_path: str,
    save_dir: str,
    output_size: List[int],
) -> Tuple[List[Image.Image], List[np.ndarray], List[str]]:
    """Load input PNG/JPGs, resize to output_size, allocate empty 4-ch masks."""
    os.makedirs(save_dir, exist_ok=True)
    if os.path.isfile(data_path):
        images_path = [data_path]
    else:
        images_path = sorted(glob(f'{data_path}/*.[pj][np][ge]*'))
    images, masks, image_names = [], [], []
    for img_path in images_path:
        # output_size is [height, width] everywhere in octseg; PIL's resize
        # takes (width, height). (The reference passes output_size straight
        # through, utils.py:187 — latent transpose for non-square sizes,
        # which no shipped config uses.)
        img = Image.open(img_path).resize((output_size[1], output_size[0]))
        images.append(img)
        masks.append(np.zeros((output_size[0], output_size[1], 4)))
        image_names.append(os.path.basename(img_path).split('.')[0])
    return images, masks, image_names


@jax.jit
def _postprocess_chain(m: jnp.ndarray):
    """Device part of the overlay chain for a stack of binary masks (K,H,W):
    close(5) → fill = blur5(closed), ring = dilate7 & !erode7.

    Reference (multi-pass XLA) implementation; on TPU the fused Pallas
    kernel (octseg.ops.pallas.postprocess) computes the same outputs ~4x
    faster — postprocess_masks() below dispatches between them.
    """
    closed = close(m, ELLIPSE_5)
    ring = dilate(closed, ELLIPSE_7) * (1.0 - (erode(closed, ELLIPSE_7) > 0))
    fill = gaussian_blur5(closed)
    return fill, ring


def postprocess_masks(m: jnp.ndarray):
    """(fill, ring) for stacked binary masks; Pallas on TPU, XLA elsewhere.

    The gate is == 'tpu' (not "anything non-CPU"): the fused kernel uses
    pltpu memory spaces, so on a GPU backend it would fail at trace time
    instead of falling back to the portable XLA chain.
    """
    if jax.devices()[0].platform.lower() == 'tpu':
        from octseg.ops.pallas.postprocess import fused_overlay_postprocess

        return fused_overlay_postprocess(m)
    return _postprocess_chain(m)


def _paste_overlay(img: Image.Image, alpha8: np.ndarray, color: tuple) -> Image.Image:
    class_img = Image.new('RGB', size=img.size, color=color)
    img.paste(class_img, (0, 0), Image.fromarray(alpha8))
    return img


def save_results(
    images: List[Image.Image],
    masks: List[np.ndarray],
    images_name: List[str],
    classes: List[str],
    save_dir: str,
) -> None:
    """Write {name}_overlay.png and {name}_mask.png per frame (ref contract).

    The alpha masks reproduce the reference's uint8 wraparound exactly:
    fill alpha = uint8(fill * 64 * 0.85 * 255), ring alpha =
    uint8(ring * 255 * 0.85 * 255) — see get_img_mask_union_pil
    (reference: src/models/smp/utils.py:203-213).
    """
    os.makedirs(save_dir, exist_ok=True)
    if not images:
        return
    # device pass: all frames × classes at once
    stack = np.stack(masks)  # (N, H, W, 4)
    sel = np.stack(
        [stack[:, :, :, CLASS_IDS[cl] - 1] for cl in classes], axis=1
    )  # (N, K, H, W)
    n, k, h, w = sel.shape
    fill, ring = postprocess_masks(jnp.asarray(sel.reshape(n * k, h, w), jnp.float32))
    fill = np.asarray(fill).reshape(n, k, h, w)
    ring = np.asarray(ring).reshape(n, k, h, w)

    for i, (img, mask, image_name) in enumerate(zip(images, masks, images_name)):
        img = img.convert('RGB') if img.mode != 'RGB' else img.copy()
        color_mask = Image.new('RGB', size=img.size, color=(128, 128, 128))
        for j, class_name in enumerate(classes):
            color = CLASS_COLORS_RGB[class_name]
            # translucent fill (uint8 wraparound parity with the reference)
            fill_alpha = _wrap_uint8(fill[i, j] * 64.0 * 0.85 * 255.0)
            img = _paste_overlay(img, fill_alpha, color)
            ring_alpha = _wrap_uint8(ring[i, j] * 255.0 * 0.85 * 255.0)
            img = _paste_overlay(img, ring_alpha, color)
            m255 = mask[:, :, CLASS_IDS[class_name] - 1] * 255
            class_img = Image.new('RGB', size=img.size, color=color)
            color_mask.paste(class_img, (0, 0), Image.fromarray(m255).convert('L'))
        color_mask.save(f'{save_dir}/{image_name}_mask.png')
        img.save(f'{save_dir}/{image_name}_overlay.png')


def _wrap_uint8(x: np.ndarray) -> np.ndarray:
    """C-cast float→uint8 conversion (modular wrap), matching numpy astype."""
    return x.astype(np.int64).astype(np.uint8)


def get_img_mask_union_pil(
    img: Image.Image,
    mask: np.ndarray,
    color: tuple,
    alpha: float = 0.85,
) -> Image.Image:
    """Paste a solid class color over img with alpha = uint8(mask*alpha*255)
    (reference helper incl. its wraparound: src/models/smp/utils.py:203-213)."""
    alpha8 = _wrap_uint8(np.asarray(mask, np.float64) * alpha * 255.0)
    return _paste_overlay(img, alpha8, tuple(color))


def get_img_mask_union(
    img_0: np.ndarray, alpha_0: float, img_1: np.ndarray, alpha_1: float,
    color: tuple,
) -> np.ndarray:
    """Weighted blend of an RGB image with a colorized grayscale mask
    (reference helper: src/models/smp/utils.py:185-200)."""
    colored = (
        cv2.cvtColor(np.asarray(img_1, np.uint8), cv2.COLOR_GRAY2RGB)
        * np.asarray(color)
    ).astype(np.uint8)
    return cv2.addWeighted(np.asarray(img_0, np.uint8), alpha_0, colored, alpha_1, 0)


def get_img_color_mask(
    img_0: np.ndarray, alpha_0: float, img_1: np.ndarray, alpha_1: float,
    color: tuple,
) -> np.ndarray:
    """BGR variant of get_img_mask_union (reference: utils.py:216-231)."""
    colored = (
        cv2.cvtColor(np.asarray(img_1, np.uint8), cv2.COLOR_GRAY2BGR)
        * np.asarray(color)
    ).astype(np.uint8)
    return cv2.addWeighted(np.asarray(img_0, np.uint8), alpha_0, colored, alpha_1, 0)
