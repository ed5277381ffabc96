"""FastAPI one-shot detection service (reference app.py:1-103, TPU rebuild).

POST /detect-all-instances
  {"image": {"content": <b64>}, "query": [{"content": <b64>}, ...]}
  -> {"scores": [...], "bboxes": [[lx, ty, rx, by], ...]} (relative coords)

Unlike the reference, the model is built ONCE at startup (the reference
rebuilds per request, app.py:50-67). Environment variables:
  OS2D_CHECKPOINT - path to a checkpoint (.pkl from this framework or a
                    reference .pth); random init if unset.
  OS2D_PYRAMID    - comma-separated pyramid scales (default "1.0").
  OS2D_TTA        - query test-time augmentation: "" (default) |
                    "rotation90" | "horflip" | "horflip_rotation90".

POST /detect-batch
  {"images": [{"content": <b64>}, ...], "query": [{"content": <b64>}, ...]}
  -> {"results": [{"scores": ..., "bboxes": ...}, ...]}
  One query set against N images: each pyramid scale runs as a single
  batched backbone+head dispatch (shared class head, common canvas).
"""

import os

import jax

from os2d_tpu.api.service import DetectionService
from os2d_tpu.models import Os2dConfig, Os2dModel, init_os2d_params

try:
    from fastapi import FastAPI, HTTPException, Request
except ImportError as e:  # pragma: no cover
    raise ImportError(
        "fastapi is required for the serving app: pip install fastapi uvicorn"
    ) from e


def _decode_payload_images(payload: dict, image_key: str):
    """Validate + decode a request payload (the schema parser lives in
    api/service.py — ONE source of truth); malformed requests become 400s
    instead of unhandled 500s."""
    from os2d_tpu.api.service import parse_request_payload

    try:
        return parse_request_payload(payload, image_key)
    except ValueError as e:
        raise HTTPException(status_code=400, detail=str(e)) from e


def build_service() -> DetectionService:
    model_cfg = Os2dConfig()
    model = Os2dModel(model_cfg)
    ckpt_path = os.environ.get("OS2D_CHECKPOINT", "")
    if ckpt_path:
        if ckpt_path.endswith(".pkl"):
            import jax.numpy as jnp

            from os2d_tpu.utils.logger import load_checkpoint

            params = jax.tree_util.tree_map(
                jnp.asarray, load_checkpoint(ckpt_path)["net"]
            )
        else:
            from os2d_tpu.models.os2d import load_checkpoint_file

            params, _ = load_checkpoint_file(ckpt_path, model_cfg)
    else:
        params = init_os2d_params(jax.random.PRNGKey(0), model_cfg)
    scales = tuple(
        float(s) for s in os.environ.get("OS2D_PYRAMID", "1.0").split(",")
    )
    return DetectionService(
        model, params, pyramid_scales=scales,
        class_image_augmentation=os.environ.get("OS2D_TTA", ""),
    )


app = FastAPI(title="os2d-tpu one-shot detection")
service = build_service()

# cross-request dynamic batching: concurrent /detect-all-instances requests
# sharing the same query catalog are grouped into one device dispatch.
# OS2D_DYNAMIC_BATCH=<max batch> enables it (0/unset = off);
# OS2D_BATCH_WINDOW_MS tunes the gather window (default 10 ms).
_batch_size = int(os.environ.get("OS2D_DYNAMIC_BATCH", "0"))
batcher = None
if _batch_size > 1:
    from os2d_tpu.api.service import DynamicBatcher

    batcher = DynamicBatcher(
        service, max_batch=_batch_size,
        max_wait_ms=float(os.environ.get("OS2D_BATCH_WINDOW_MS", "10")),
    )


@app.post("/detect-all-instances")
async def detect_all_instances(request: Request):
    payload = await request.json()
    images, queries = _decode_payload_images(payload, "image")
    if batcher is not None:
        import asyncio

        return await asyncio.get_running_loop().run_in_executor(
            None, batcher.detect, images[0], queries
        )
    return service.detect(images[0], queries)


@app.post("/detect-batch")
async def detect_batch(request: Request):
    payload = await request.json()
    images, queries = _decode_payload_images(payload, "images")
    return {"results": service.detect_batch(images, queries)}


@app.get("/health")
async def health():
    return {"status": "ok"}
