# NuHTC-TPU deployment image (the reference ships a CUDA Dockerfile +
# DOCKER.md; this is the TPU-host equivalent). Base: a JAX TPU image with
# libtpu; no CUDA, no mmcv.
FROM python:3.12-slim

RUN apt-get update && apt-get install -y --no-install-recommends \
    build-essential libgl1 libglib2.0-0 libopenslide0 \
    && rm -rf /var/lib/apt/lists/*

WORKDIR /app
COPY . /app

RUN pip install --no-cache-dir \
    "jax[tpu]" -f https://storage.googleapis.com/jax-releases/libtpu_releases.html \
    flax optax orbax-checkpoint chex einops numpy scipy opencv-python-headless \
    pandas h5py matplotlib tqdm tensorboardX openslide-python

ENV PYTHONPATH=/app
ENV NUHTC_JAX_CACHE=/app/.jax_cache

# warm the C RLE library + compile cache at build time
RUN python -c "from nuhtc_tpu.native.build import load_librle; load_librle()"

ENTRYPOINT ["python"]
CMD ["tools/infer.py", "--help"]
