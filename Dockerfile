# Serving image for os2d-tpu (reference Docker/Dockerfile analogue).
# Base image must provide jax with the TPU runtime for your platform, e.g.:
#   docker build --build-arg BASE=python:3.12-slim .
ARG BASE=python:3.12-slim
FROM ${BASE}

WORKDIR /workspace/os2d_tpu
COPY . .

# jax/flax/optax are expected from the base image on TPU VMs; the serving
# extras are installed here.
RUN pip install --no-cache-dir fastapi uvicorn pillow pandas pyyaml

# Checkpoint location (mount or bake in); see app.py
ENV OS2D_CHECKPOINT=/workspace/models/os2d_v2-train.pth
ENV OS2D_PYRAMID=1.0

EXPOSE 80
CMD ["uvicorn", "app:app", "--host", "0.0.0.0", "--port", "80"]
