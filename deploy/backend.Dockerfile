# det_sam2_tpu serving container for a Cloud TPU VM.
#
# TPU-native counterpart of the reference's backend.Dockerfile (CUDA base
# image + gunicorn): here the base is plain Python, the accelerator stack is
# jax[tpu] (libtpu talks to the chips through /dev/vfio — exposed by
# docker-compose.yaml's privileged/device wiring, the TPU analogue of the
# reference compose file's nvidia device reservation), and the server is the
# stdlib ThreadingHTTPServer (one thread per request, so the reference's
# "at least 2 gunicorn threads for a parallel cancel request" requirement
# holds by construction — no WSGI worker layer needed).
#
# MODEL_SIZE uses the reference vocabulary (tiny/small/base_plus/large);
# serving/server.py env_config() maps it onto our preset names.
ARG BASE_IMAGE=python:3.11-slim
ARG MODEL_SIZE=base_plus

FROM ${BASE_IMAGE}
ARG MODEL_SIZE

ENV APP_ROOT=/opt/det_sam2_tpu
ENV PYTHONUNBUFFERED=1
ENV MODEL_SIZE=${MODEL_SIZE}
ENV SERVER_PORT=7263
ENV DATA_PATH=/data
# normalized-upload knobs (same names as the reference compose file)
ENV VIDEO_ENCODE_FPS=24
ENV VIDEO_ENCODE_MAX_WIDTH=1280
ENV VIDEO_ENCODE_MAX_HEIGHT=720
ENV MAX_UPLOAD_VIDEO_DURATION=10
# persistent XLA compilation cache: first-boot compiles survive restarts
ENV JAX_COMPILATION_CACHE_DIR=${APP_ROOT}/.cache/jax

# build-essential: the ctypes host CC kernel (ops/_cc_host.cpp) compiles at
# first import; ffmpeg accelerates upload transcoding (cv2 fallback works
# without it)
RUN apt-get update && apt-get install -y --no-install-recommends \
        build-essential ffmpeg \
    && rm -rf /var/lib/apt/lists/*

RUN pip install --no-cache-dir --upgrade pip \
    && pip install --no-cache-dir \
        "jax[tpu]" -f https://storage.googleapis.com/jax-releases/libtpu_releases.html \
    && pip install --no-cache-dir \
        flax optax orbax-checkpoint einops opencv-python-headless pillow

WORKDIR ${APP_ROOT}
COPY det_sam2_tpu ${APP_ROOT}/det_sam2_tpu
ENV PYTHONPATH=${APP_ROOT}

# Fetch the published SAM 2.1 checkpoint for the configured size at build
# time (det_sam2_tpu/tools/download_ckpts.py: same release URLs as the
# reference's download_ckpts.sh, verified sizes) and convert it to the
# torch-free native .npz (det_sam2_tpu/convert.py main). torch is needed
# ONLY for this conversion — install + uninstall inside one layer so the
# runtime image never carries it (and cannot crash-loop on `import torch`
# at startup). JAX_PLATFORMS=cpu: no TPU is attached at build time.
# Volume-mount your own .npz/.pt over the path (or set CHECKPOINT_PATH)
# to serve finetuned weights — .pt at runtime requires torch in the image.
RUN pip install --no-cache-dir torch \
        --index-url https://download.pytorch.org/whl/cpu \
    && python -m det_sam2_tpu.tools.download_ckpts \
        --models ${MODEL_SIZE} --out-dir /tmp/ckpts \
    && mkdir -p ${APP_ROOT}/checkpoints \
    && JAX_PLATFORMS=cpu python -m det_sam2_tpu.convert \
        "$(ls /tmp/ckpts/*.pt | head -1)" \
        ${APP_ROOT}/checkpoints/model.npz --model ${MODEL_SIZE} \
    && pip uninstall -y torch && rm -rf /tmp/ckpts
ENV CHECKPOINT_PATH=${APP_ROOT}/checkpoints/model.npz

EXPOSE 7263
# env_config() in serving/server.py reads MODEL_SIZE / SERVER_PORT /
# DATA_PATH / CHECKPOINT_PATH; the frontend is served by this same process
# at / (no separate frontend container — serving/frontend.py)
CMD ["python", "-m", "det_sam2_tpu.serving.server"]
