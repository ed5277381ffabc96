"""Device-side image-pyramid construction.

The reference builds the eval pyramid on the host with PIL and ships every
level to the device (os2d/data/dataloader.py:326-345) — 7 levels sum to ~8.2x
the base image in float32. Over a thin host<->device link that transfer
dominates end-to-end eval, so this module ships the base image ONCE as uint8
(~28x less traffic) and derives all normalized levels on device with
antialiased bilinear resizes (jax.image.resize antialias=True, matching PIL's
triangle-filter downscaling closely).

Parity note: device resize is not bit-identical to PIL BILINEAR; the host
pyramid remains available via cfg.tpu.device_side_pyramid=False.
"""

from __future__ import annotations

from functools import lru_cache
from typing import List, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..structures.feature_map import FeatureMapSize


@lru_cache(maxsize=None)
def _pyramid_fn(base_hw: Tuple[int, int], level_sizes: Tuple[Tuple[int, int], ...],
                mean: Tuple[float, ...], std: Tuple[float, ...]):
    mean_arr = jnp.asarray(mean, jnp.float32)
    std_arr = jnp.asarray(std, jnp.float32)

    @jax.jit
    def build(image_u8):
        img = image_u8.astype(jnp.float32) / 255.0
        img = (img - mean_arr) / std_arr
        levels = []
        for (h, w) in level_sizes:
            if (h, w) == base_hw:
                lvl = img
            else:
                lvl = jax.image.resize(
                    img, (h, w, 3), method="bilinear", antialias=True
                )
            levels.append(lvl[None])
        return levels

    return build


def device_pyramid(image_u8: np.ndarray, level_sizes: Sequence[FeatureMapSize],
                   img_normalization) -> List[jnp.ndarray]:
    """[H, W, 3] uint8 host image -> per-level [1, h_l, w_l, 3] normalized
    device arrays. jit-cached per (base shape, level sizes)."""
    assert image_u8.dtype == np.uint8 and image_u8.ndim == 3
    fn = _pyramid_fn(
        (image_u8.shape[0], image_u8.shape[1]),
        tuple((s.h, s.w) for s in level_sizes),
        tuple(float(m) for m in img_normalization["mean"]),
        tuple(float(s) for s in img_normalization["std"]),
    )
    return fn(jnp.asarray(image_u8))
