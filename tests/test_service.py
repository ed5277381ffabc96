"""Detection service (the serving app's core) on planted-patch images."""

import base64
from io import BytesIO

import numpy as np
from PIL import Image

import jax

from os2d_tpu.api.service import DetectionService
from os2d_tpu.models import Os2dConfig, Os2dModel, init_os2d_params


def _to_b64(img: Image.Image) -> str:
    buf = BytesIO()
    img.save(buf, format="PNG")
    return base64.b64encode(buf.getvalue()).decode()


def test_service_detects_planted_query():
    rng = np.random.RandomState(0)
    patch = np.kron(
        rng.randint(0, 255, (30, 30, 3), np.uint8), np.ones((8, 8, 1), np.uint8)
    )  # 240x240
    scene = rng.randint(0, 60, (480, 640, 3), np.uint8)
    x0, y0 = 48, 112
    scene[y0: y0 + 240, x0: x0 + 240] = patch

    model_cfg = Os2dConfig()
    model = Os2dModel(model_cfg)
    params = init_os2d_params(jax.random.PRNGKey(0), model_cfg)
    # small pyramid target so the 640px scene is not upscaled 2.3x (CPU test)
    import os2d_tpu.api.service as service_mod

    service = DetectionService(model, params, score_threshold=0.3)
    # patch target size so test runs at native resolution
    orig = service_mod.TARGET_IMAGE_SIZE
    service_mod.TARGET_IMAGE_SIZE = 640
    try:
        payload = {
            "image": {"content": _to_b64(Image.fromarray(scene))},
            "query": [{"content": _to_b64(Image.fromarray(patch))}],
        }
        result = service.detect_from_request(payload)
    finally:
        service_mod.TARGET_IMAGE_SIZE = orig

    assert result["scores"], "no detections returned"
    assert result["scores"] == sorted(result["scores"], reverse=True)
    # top detection must sit on the planted patch (relative coords)
    top = result["bboxes"][0]
    np.testing.assert_allclose(
        top, [x0 / 640, y0 / 480, (x0 + 240) / 640, (y0 + 240) / 480], atol=0.08
    )


def _planted_scene(rng, w, h, patch, x0, y0):
    scene = rng.randint(0, 60, (h, w, 3), np.uint8)
    scene[y0: y0 + patch.shape[0], x0: x0 + patch.shape[1]] = patch
    return scene


def test_service_detect_batch_two_images():
    """detect_batch: one query set against two scenes of DIFFERENT sizes,
    each pyramid scale as one batched dispatch on a shared canvas."""
    rng = np.random.RandomState(1)
    patch = np.kron(
        rng.randint(0, 255, (30, 30, 3), np.uint8), np.ones((8, 8, 1), np.uint8)
    )
    plants = [((640, 480), (48, 112)), ((560, 560), (304, 48))]
    scenes = [
        _planted_scene(rng, w, h, patch, x0, y0)
        for (w, h), (x0, y0) in plants
    ]

    model_cfg = Os2dConfig()
    model = Os2dModel(model_cfg)
    params = init_os2d_params(jax.random.PRNGKey(0), model_cfg)
    import os2d_tpu.api.service as service_mod

    service = DetectionService(model, params, score_threshold=0.3)
    orig = service_mod.TARGET_IMAGE_SIZE
    service_mod.TARGET_IMAGE_SIZE = 640
    try:
        results = service.detect_batch(
            [Image.fromarray(s) for s in scenes], [Image.fromarray(patch)]
        )
    finally:
        service_mod.TARGET_IMAGE_SIZE = orig

    assert len(results) == 2
    for ((w, h), (x0, y0)), res in zip(plants, results):
        assert res["scores"], f"no detections for scene {w}x{h}"
        top = res["bboxes"][0]
        np.testing.assert_allclose(
            top, [x0 / w, y0 / h, (x0 + 240) / w, (y0 + 240) / h], atol=0.08
        )
        # relative coords stay in the image: canvas padding is filtered out
        assert all(-0.05 <= c <= 1.05 for c in top)


def test_service_tta_rotation90():
    """class_image_augmentation expands query views; the original view still
    matches the planted patch and views merge under one per-query NMS."""
    rng = np.random.RandomState(2)
    patch = np.kron(
        rng.randint(0, 255, (30, 30, 3), np.uint8), np.ones((8, 8, 1), np.uint8)
    )
    scene = _planted_scene(rng, 640, 480, patch, 48, 112)

    model_cfg = Os2dConfig()
    model = Os2dModel(model_cfg)
    params = init_os2d_params(jax.random.PRNGKey(0), model_cfg)
    import os2d_tpu.api.service as service_mod

    service = DetectionService(model, params, score_threshold=0.3,
                               class_image_augmentation="rotation90")
    orig = service_mod.TARGET_IMAGE_SIZE
    service_mod.TARGET_IMAGE_SIZE = 640
    try:
        result = service.detect(Image.fromarray(scene), [Image.fromarray(patch)])
    finally:
        service_mod.TARGET_IMAGE_SIZE = orig

    assert result["scores"]
    top = result["bboxes"][0]
    np.testing.assert_allclose(
        top, [48 / 640, 112 / 480, (48 + 240) / 640, (112 + 240) / 480],
        atol=0.08,
    )


def test_dynamic_batcher_groups_concurrent_requests():
    """Cross-request dynamic batching: concurrent detect() calls with the
    SAME query catalog group into one detect_batch dispatch; results match
    the direct batched path and land on the planted patches."""
    import threading

    from os2d_tpu.api.service import DynamicBatcher

    rng = np.random.RandomState(3)
    patch = np.kron(
        rng.randint(0, 255, (30, 30, 3), np.uint8), np.ones((8, 8, 1), np.uint8)
    )
    positions = [(48, 112), (336, 176), (128, 48)]
    scenes = [
        Image.fromarray(_planted_scene(rng, 640, 480, patch, x0, y0))
        for (x0, y0) in positions
    ]
    queries = [Image.fromarray(patch)]

    model_cfg = Os2dConfig()
    model = Os2dModel(model_cfg)
    params = init_os2d_params(jax.random.PRNGKey(0), model_cfg)
    import os2d_tpu.api.service as service_mod

    service = DetectionService(model, params, score_threshold=0.3)
    orig = service_mod.TARGET_IMAGE_SIZE
    service_mod.TARGET_IMAGE_SIZE = 640
    batcher = DynamicBatcher(service, max_batch=3, max_wait_ms=3000)
    try:
        want = service.detect_batch(scenes, queries)

        results = [None] * len(scenes)
        threads = []
        for i, scene in enumerate(scenes):
            def call(i=i, scene=scene):
                results[i] = batcher.detect(scene, queries)
            t = threading.Thread(target=call)
            threads.append(t)
            t.start()
        for t in threads:
            t.join(timeout=300)
        assert all(r is not None for r in results)
        for i, ((x0, y0), res) in enumerate(zip(positions, results)):
            assert res["scores"], f"image {i}: no detections"
            np.testing.assert_allclose(
                res["bboxes"][0],
                [x0 / 640, y0 / 480, (x0 + 240) / 640, (y0 + 240) / 480],
                atol=0.08,
            )
            np.testing.assert_allclose(
                res["scores"][0], want[i]["scores"][0], atol=1e-5
            )
    finally:
        service_mod.TARGET_IMAGE_SIZE = orig
        batcher.close()


import pytest


@pytest.mark.slow
def test_dynamic_batcher_soak_starvation_free():
    """1-minute mixed-catalog soak (VERDICT r3 item 7): N clients stream
    requests with TWO different query catalogs against one DynamicBatcher.
    Different catalogs never share a batch, so the minority catalog rides the
    deferred queue — the FIFO fairness there must keep it progressing. Every
    client must complete requests throughout the soak (no starvation, no
    dropped slots, no worker death)."""
    import threading
    import time

    from os2d_tpu.api.service import DynamicBatcher

    rng = np.random.RandomState(7)
    patch_a = np.kron(
        rng.randint(0, 255, (30, 30, 3), np.uint8), np.ones((8, 8, 1), np.uint8)
    )
    patch_b = np.roll(patch_a, 80, axis=1)
    scene_a = Image.fromarray(_planted_scene(rng, 320, 240, patch_a[:120, :120],
                                             40, 60))
    scene_b = Image.fromarray(_planted_scene(rng, 320, 240, patch_b[:120, :120],
                                             150, 30))
    catalog_a = [Image.fromarray(patch_a[:120, :120])]
    catalog_b = [Image.fromarray(patch_b[:120, :120])]

    model_cfg = Os2dConfig()
    model = Os2dModel(model_cfg)
    params = init_os2d_params(jax.random.PRNGKey(0), model_cfg)
    import os2d_tpu.api.service as service_mod

    service = DetectionService(model, params, score_threshold=-10.0)
    orig = service_mod.TARGET_IMAGE_SIZE
    service_mod.TARGET_IMAGE_SIZE = 320
    batcher = DynamicBatcher(service, max_batch=4, max_wait_ms=15.0)
    SOAK_S = 60.0
    n_clients = 5  # clients 0-3 stream catalog A, client 4 is the minority B
    counts = [0] * n_clients
    errors = []
    try:
        # compile both program shapes up front so the soak measures steady
        # state, not one 30 s compile eating the minute
        service.detect_batch([scene_a], catalog_a)
        service.detect_batch([scene_a] * 4, catalog_a)
        deadline = time.monotonic() + SOAK_S

        def client(k):
            scene, catalog = ((scene_b, catalog_b) if k == n_clients - 1
                              else (scene_a, catalog_a))
            try:
                while time.monotonic() < deadline:
                    res = batcher.detect(scene, catalog)
                    assert res["scores"], f"client {k}: empty detections"
                    counts[k] += 1
            except Exception as e:  # noqa: BLE001 - collected for the assert
                errors.append((k, e))

        threads = [threading.Thread(target=client, args=(k,))
                   for k in range(n_clients)]
        for t in threads:
            t.start()
        for t in threads:
            t.join(timeout=SOAK_S + 300)
        assert not any(t.is_alive() for t in threads), "soak client hung"
        assert not errors, f"soak errors: {errors}"
        # starvation-free: every client, INCLUDING the minority catalog,
        # completed multiple round trips over the minute
        assert all(c >= 3 for c in counts), f"starved client: counts={counts}"
    finally:
        service_mod.TARGET_IMAGE_SIZE = orig
        batcher.close()


def test_service_prescreen_engages_for_large_catalog():
    """The serving layer must route large catalogs through the two-phase
    prescreen (observable via service.stats; VERDICT r3 item 7)."""
    rng = np.random.RandomState(11)
    patch = np.kron(
        rng.randint(0, 255, (30, 30, 3), np.uint8), np.ones((4, 4, 1), np.uint8)
    )  # 120x120
    scene = Image.fromarray(_planted_scene(rng, 320, 240, patch, 40, 60))
    queries = [Image.fromarray(np.roll(patch, 7 * k, axis=0))
               for k in range(8)]

    model_cfg = Os2dConfig()
    model = Os2dModel(model_cfg)
    params = init_os2d_params(jax.random.PRNGKey(0), model_cfg)
    import os2d_tpu.api.service as service_mod

    service = DetectionService(model, params, score_threshold=0.3,
                               prescreen_min_classes=8)
    orig = service_mod.TARGET_IMAGE_SIZE
    service_mod.TARGET_IMAGE_SIZE = 320
    try:
        res = service.detect(scene, queries)
    finally:
        service_mod.TARGET_IMAGE_SIZE = orig
    assert service.stats["prescreen_dispatches"] == 1, service.stats
    assert res["scores"], "prescreened path lost the planted patch"
