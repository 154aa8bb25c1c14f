# beta_recsys_tpu runtime image.
#
# Reference-parity note: the upstream project ships an Anaconda+JupyterLab
# image (reference Dockerfile:1-52) in CPU and CUDA flavours. The TPU-native
# equivalent is a slim python image with the JAX TPU wheel (libtpu comes from
# the `tpu` extra); the same image runs on CPU hosts (JAX_PLATFORMS=cpu) for
# development, so one target replaces the cpu/gpu pair.
#
# Build:   docker build -t betarecsys-tpu .
# Run:     docker run --privileged -p 8888:8888 betarecsys-tpu
# (--privileged is required for TPU VM device access; drop it on CPU hosts.)

ARG BASE_IMAGE="python:3.12-slim"

FROM ${BASE_IMAGE}

LABEL org.opencontainers.image.title="beta_recsys_tpu" \
      org.opencontainers.image.description="TPU-native recommender framework (JAX/XLA/Pallas)"

WORKDIR /opt/beta_recsys_tpu

# Native host-kernel toolchain (alias sampling / eval negatives / k-core in C++).
RUN apt-get update \
    && apt-get install -y --no-install-recommends g++ make git \
    && rm -rf /var/lib/apt/lists/*

COPY pyproject.toml README.md ./
COPY beta_recsys_tpu ./beta_recsys_tpu
COPY configs ./configs
COPY examples ./examples

# TPU wheel on TPU VMs; on CPU-only hosts pip resolves the portable jax wheel.
RUN pip install --no-cache-dir "jax[tpu]" -f https://storage.googleapis.com/jax-releases/libtpu_releases.html \
    || pip install --no-cache-dir jax
RUN pip install --no-cache-dir -e .[tensorboard] jupyterlab

# Build the C++ host kernels (gracefully optional at runtime).
RUN make -C beta_recsys_tpu/native || true

EXPOSE 8888

CMD ["jupyter", "lab", "--ip=0.0.0.0", "--port=8888", "--no-browser", "--allow-root"]
