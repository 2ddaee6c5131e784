# Qwen3-ASR TPU serving image.
#
# Build on a TPU-VM base image that ships libtpu; jax/aiohttp and friends are
# installed below. Deployment contract mirrors the reference compose stack:
# port 8000 public, optional gateway/worker split via GATEWAY_MODE.
FROM python:3.12-slim

WORKDIR /app

# Native toolchain for the C++ audio DSP library (built on first use).
RUN apt-get update && apt-get install -y --no-install-recommends \
        g++ \
    && rm -rf /var/lib/apt/lists/*

# TPU runtime + framework deps. On GKE TPU nodes prefer the preinstalled
# libtpu; `jax[tpu]` resolves it via the libtpu-releases index.
RUN pip install --no-cache-dir \
        "jax[tpu]" -f https://storage.googleapis.com/jax-releases/libtpu_releases.html \
        aiohttp pydantic websockets safetensors orbax-checkpoint optax \
        regex numpy

COPY qwen3_asr_tpu/ /app/qwen3_asr_tpu/
COPY bench.py /app/

ENV PYTHONUNBUFFERED=1
EXPOSE 8000

# GATEWAY_MODE=true → gateway (spawns worker); else standalone server.
CMD ["sh", "-c", \
     "if [ \"$GATEWAY_MODE\" = \"true\" ]; then \
        exec python -m qwen3_asr_tpu.serving.gateway --port 8000; \
      else \
        exec python -m qwen3_asr_tpu.serving.server --port 8000; \
      fi"]
