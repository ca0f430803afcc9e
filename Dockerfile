# Dockerfile — TPU-native runtime image for neuralstyletransferv1_tpu.
#
# TPU-first counterpart of the reference's NGC-TensorFlow GPU image
# (reference: Dockerfile:1-44). Runs on Cloud TPU VMs (v5e+): jax[tpu] wheels
# pull libtpu; torch stays CPU-only (checkpoint import oracle), TF is a
# proto/checkpoint reader for the magenta SavedModel path.
FROM python:3.12-slim-bookworm

ENV PYTHONUNBUFFERED=1 \
    PYTHONDONTWRITEBYTECODE=1 \
    PYTHONPATH=/app \
    DEBIAN_FRONTEND=noninteractive

WORKDIR /app

# ffmpeg enables the exact reference media path (io/frames.py uses it
# automatically when present; OpenCV IO is the fallback).
RUN apt-get update && apt-get install -y --no-install-recommends \
    ffmpeg \
    fonts-dejavu-core \
    g++ \
    libgl1 \
    libglib2.0-0 \
    libjpeg-dev \
    libpng-dev \
    make \
    && rm -rf /var/lib/apt/lists/*

RUN pip install --no-cache-dir \
    "jax[tpu]" -f https://storage.googleapis.com/jax-releases/libtpu_releases.html \
    && pip install --no-cache-dir \
    opencv-python-headless \
    "Pillow>=10.0.0" \
    "numpy>=1.26" \
    psutil \
    tensorflow-cpu \
    && pip install --no-cache-dir --index-url https://download.pytorch.org/whl/cpu \
    torch

# Standard runtime directories (reference layout, CLAUDE.md:412-419)
RUN mkdir -p /app/_work /app/input /app/input_videos /app/output /app/models

COPY . /app

# Build the C++ threaded frame loader from source (never shipped as a
# committed binary; it also auto-builds on first import as a fallback).
RUN make native

CMD ["bash"]
