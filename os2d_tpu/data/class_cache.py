"""Device-resident class-image cache for training.

The reference ships every batch's class images host->device each step
(os2d/engine/train.py:481-483 via the dataloader's _transform_image_gt,
os2d/data/dataloader.py:357-385). At the grozi recipe (15 classes of
240x240 uint8) that is ~2.6 MB/step on top of the ~4.3 MB batch images —
over a thin host<->TPU link the upload, not the device, bounds the step
rate (BENCH_NOTES r2/r3 training sections).

TPU-native replacement: with the headline augmentation config (no color
distortion, no class-image crops, no extra-class-image mining) a batch's
class image is a deterministic function of (class_id, resample-method
draw, batch flips). So precompute every (class, method) palette resize
ONCE on the host, keep the stack [C, M, S, S, 3] uint8 resident in HBM,
and resolve each batch's class tensor with a tiny on-device gather + flip
— zero per-step class-image upload.

Exactness vs the host path (same RNG stream, so the draws are identical):
- HAMMING / BICUBIC / LANCZOS / BILINEAR draws are BIT-IDENTICAL — PIL's
  convolution resampling commutes exactly with mirror flips (verified
  empirically across sizes; the integer kernel sums are order-invariant).
- BOX / NEAREST draws under a flipped batch differ: PIL's box/nearest
  index rounding is not mirror-symmetric, so flip-then-resize (host) and
  resize-then-flip (device) disagree by a sub-pixel sampling phase. Both
  are equally valid resamples of the same crop; unflipped batches are
  bit-identical for all six methods. (tests/test_class_cache.py pins
  both facts.)
"""

import logging

import numpy as np

from .dataloader import snap_to_palette
from .transforms import _RESAMPLE_CHOICES
from ..structures.feature_map import FeatureMapSize, exact_resize_area

logger = logging.getLogger("OS2D.class_cache")


class DeviceClassCache:
    """Precomputed (class, resample-method) palette resizes, device-resident.

    Attrs:
      class_ids: sorted class ids covered (the loader's whole universe)
      index_of:  {class_id: row in the stack}
      sizes:     {class_id: FeatureMapSize after the palette resize}
      stack:     jnp uint8 [C, M, S, S, 3], M = len(_RESAMPLE_CHOICES)
    """

    def __init__(self, class_ids, index_of, sizes, stack_np):
        import jax.numpy as jnp

        self.class_ids = class_ids
        self.index_of = index_of
        self.sizes = sizes
        self.nbytes = stack_np.nbytes
        self.stack = jnp.asarray(stack_np)  # one-time upload
        self._gather_cache = {}

    @staticmethod
    def validate_loader(loader):
        """The cache is only equivalent to the host path when class-image
        pixels depend on nothing but (class_id, method draw, batch flips)."""
        aug = loader.data_augmentation
        problems = []
        if loader.mine_extra_class_images:
            problems.append("train.augment.mine_extra_class_images")
        if aug is not None and aug.do_random_color:
            problems.append("train.augment.random_color_distortion")
        if aug is not None and aug.do_random_crop_label_images:
            problems.append("train.augment.random_crop_class_images")
        if problems:
            raise ValueError(
                "tpu.device_class_cache requires per-step-static class "
                f"images; disable {', '.join(problems)}")

    @classmethod
    def build(cls, loader, budget_mb=None):
        """Host-precompute the stack from the loader's GT images (same
        PIL code path as _transform_image_gt minus flips and draws)."""
        cls.validate_loader(loader)
        dataset = loader.dataset
        class_ids = sorted(int(c) for c in dataset.get_class_ids())
        n_methods = len(_RESAMPLE_CHOICES)

        sizes, index_of, per_class = {}, {}, []
        target_shape = None
        for row, cid in enumerate(class_ids):
            img = dataset.gt_images_per_classid[cid]
            size_old = FeatureMapSize.from_image(img)
            if loader.class_shape_palette is not None:
                size_new = snap_to_palette(size_old.w, size_old.h,
                                           loader.class_shape_palette)
            else:
                size_new = exact_resize_area(
                    w=size_old.w, h=size_old.h,
                    target_area_side=loader.gt_image_size)
            if target_shape is None:
                target_shape = (size_new.h, size_new.w)
                # project the FULL stack size from the first class's shape
                # and fail the budget BEFORE the per-class PIL resize loop —
                # at INSTRE scale (~9k classes) the loop costs minutes and a
                # multi-GB host allocation that 'auto' would only then
                # discard (ADVICE r3)
                projected = (len(class_ids) * n_methods
                             * size_new.h * size_new.w * 3)
                if budget_mb is not None and projected > budget_mb * (1 << 20):
                    raise ValueError(
                        f"tpu.device_class_cache needs "
                        f"{projected / 2**20:.0f} MB for {len(class_ids)} "
                        f"classes x {n_methods} methods, over the "
                        f"{budget_mb} MB budget "
                        "(tpu.device_class_cache_budget_mb)")
            elif target_shape != (size_new.h, size_new.w):
                raise ValueError(
                    "tpu.device_class_cache needs a single class-image "
                    f"shape (got {target_shape} and "
                    f"{(size_new.h, size_new.w)}); configure a one-entry "
                    "class shape palette as the train loader does")
            index_of[cid] = row
            sizes[cid] = size_new
            variants = [
                np.asarray(img.resize((size_new.w, size_new.h), m), np.uint8)
                for m in _RESAMPLE_CHOICES
            ]
            per_class.append(np.stack(variants, 0))

        stack_np = np.stack(per_class, 0)  # [C, M, S, S, 3]
        logger.info(
            "device class cache: %d classes x %d methods @ %s = %.0f MB HBM",
            len(class_ids), n_methods, target_shape,
            stack_np.nbytes / 2**20)
        return cls(class_ids, index_of, sizes, stack_np)

    def _gather_fn(self, c_pad):
        import jax
        import jax.numpy as jnp

        if c_pad not in self._gather_cache:

            @jax.jit
            def gather(stack, rows, methods, flips):
                out = stack[rows, methods]  # [c_pad, S, S, 3] uint8
                out = jnp.where(flips[0], out[:, :, ::-1], out)  # hflip
                out = jnp.where(flips[1], out[:, ::-1], out)     # vflip
                return out

            self._gather_cache[c_pad] = gather
        return self._gather_cache[c_pad]

    def gather(self, class_ids, method_idx, hflip, vflip, c_pad):
        """Resolve a batch's class tensor on device: uint8 [c_pad, S, S, 3].

        Dispatched from the prefetcher thread, so the (tiny) program overlaps
        the in-flight train step; nothing crosses the wire but the index
        vectors."""
        import jax.numpy as jnp

        rows = np.zeros((c_pad,), np.int32)
        meth = np.zeros((c_pad,), np.int32)
        n = len(class_ids)
        rows[:n] = [self.index_of[int(c)] for c in class_ids]
        meth[:n] = method_idx
        flips = np.asarray([hflip, vflip], bool)
        return self._gather_fn(c_pad)(
            self.stack, jnp.asarray(rows), jnp.asarray(meth),
            jnp.asarray(flips))
