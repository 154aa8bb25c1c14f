#!/usr/bin/env bash
# Build and tag release images for beta_recsys_tpu.
#
# Reference-parity note: mirrors the upstream release script's behavior
# (hack/release-images.sh: version/commit-stamped cpu+gpu images) with a
# single TPU/CPU-portable target; set WHAT=dev to also build a toolchain
# image with the test suite baked in.
#
# Usage:
#   hack/release-images.sh                 # build betarecsys-tpu:<version>
#   WHAT=dev hack/release-images.sh        # also build the dev/test image
#   REGISTRY=gcr.io/myproj hack/release-images.sh   # tag for a registry

set -euo pipefail

ROOT="$(cd "$(dirname "${BASH_SOURCE[0]}")/.." && pwd -P)"
cd "${ROOT}"

GIT_VERSION="$(git describe --tags --always 2>/dev/null || echo dev)"
GIT_COMMIT="$(git rev-parse --short HEAD 2>/dev/null || echo unknown)"
IMAGE_NAME="${IMAGE_NAME:-betarecsys-tpu}"
REGISTRY="${REGISTRY:-}"
BASE_IMAGE="${BASE_IMAGE:-python:3.12-slim}"

tag() {
  local name="$1"
  if [[ -n "${REGISTRY}" ]]; then echo "${REGISTRY}/${name}"; else echo "${name}"; fi
}

echo ">> building $(tag "${IMAGE_NAME}"):${GIT_VERSION} (commit ${GIT_COMMIT})"
docker build \
  --build-arg BASE_IMAGE="${BASE_IMAGE}" \
  --label "org.opencontainers.image.revision=${GIT_COMMIT}" \
  --label "org.opencontainers.image.version=${GIT_VERSION}" \
  -t "$(tag "${IMAGE_NAME}"):${GIT_VERSION}" \
  -t "$(tag "${IMAGE_NAME}"):latest" \
  .

if [[ "${WHAT:-}" == *dev* ]]; then
  echo ">> building $(tag "${IMAGE_NAME}"):${GIT_VERSION}-dev (with tests)"
  docker build \
    --build-arg BASE_IMAGE="$(tag "${IMAGE_NAME}"):${GIT_VERSION}" \
    -f - -t "$(tag "${IMAGE_NAME}"):${GIT_VERSION}-dev" . <<'EOF'
ARG BASE_IMAGE
FROM ${BASE_IMAGE}
COPY tests ./tests
RUN pip install --no-cache-dir pytest pytest-cov
EOF
fi

echo ">> done"
docker images | grep -E "${IMAGE_NAME}" || true
