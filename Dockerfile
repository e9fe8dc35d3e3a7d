# nanocall_tpu containers (packaging parity with the reference's fat +
# slim Docker images; see SURVEY.md L7: Dockerfile, Dockerfile.slim.in,
# script/build-slim-docker-image).  Assumes a base image with JAX + the
# TPU runtime for the target platform (e.g. a Cloud TPU VM base).
#
#   docker build -t nanocall-tpu .                 # fat (default: build stage)
#   docker build --target slim -t nanocall-tpu-slim \
#       --build-arg USER_ID=$(id -u) --build-arg GROUP_ID=$(id -g) \
#       --build-arg TZ=$(cat /etc/timezone) .      # slim runtime
#
# The reference's slim image ships the lddtree-extracted binary closure in
# a bare debian (script/build-slim-docker-image, script/get-lddtree); the
# Python-native equivalent is a multi-stage build whose runtime stage
# installs only the built wheel — no compiler toolchain, no build tree —
# with the same host-uid/tz/volume conventions (Dockerfile.slim.in).
ARG BASE=python:3.12-slim
FROM ${BASE} AS build

RUN apt-get update \
    && apt-get install -y --no-install-recommends g++ make \
    && rm -rf /var/lib/apt/lists/*

WORKDIR /opt/nanocall_tpu
COPY pyproject.toml README.md ./
COPY nanocall_tpu ./nanocall_tpu
COPY baseline ./baseline
COPY tools ./tools

# native host runtime + CPU baseline binary; the prebuilt .so rides inside
# the wheel so the slim stage needs no compiler
RUN make -C nanocall_tpu/native \
    && g++ -O3 -march=native -std=c++17 -pthread \
         -o baseline/cpu_nanocall baseline/cpu_nanocall.cpp \
    && pip install --no-cache-dir build \
    && python -m build --wheel --outdir /dist

RUN pip install --no-cache-dir .

ENTRYPOINT ["nanocall-tpu"]
CMD ["--version"]

# --- slim runtime image (reference Dockerfile.slim.in parity) -------------
FROM ${BASE} AS slim
ARG TZ=Etc/UTC
ARG USER_ID=1000
ARG GROUP_ID=1000
ARG USER_NAME=nanocall
ARG GROUP_NAME=nanocall

# use host timezone
ENV TZ=${TZ}
RUN ln -snf /usr/share/zoneinfo/${TZ} /etc/localtime \
    && echo ${TZ} > /etc/timezone

# use host id
RUN groupadd --gid ${GROUP_ID} ${GROUP_NAME} \
    && useradd --create-home --uid ${USER_ID} --gid ${GROUP_ID} ${USER_NAME}

COPY --from=build /dist/*.whl /tmp/
RUN pip install --no-cache-dir /tmp/*.whl && rm /tmp/*.whl

USER ${USER_NAME}
VOLUME ["/data"]
WORKDIR /data
ENTRYPOINT ["nanocall-tpu"]
CMD ["--version"]
