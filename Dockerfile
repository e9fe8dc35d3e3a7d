# nanocall_tpu container (packaging parity with the reference's Docker
# images; see SURVEY.md L7).  Assumes a base image with JAX + the TPU
# runtime for the target platform (e.g. a Cloud TPU VM base).
ARG BASE=python:3.12-slim
FROM ${BASE}

RUN apt-get update \
    && apt-get install -y --no-install-recommends g++ make \
    && rm -rf /var/lib/apt/lists/*

WORKDIR /opt/nanocall_tpu
COPY pyproject.toml README.md ./
COPY nanocall_tpu ./nanocall_tpu
COPY baseline ./baseline
COPY tools ./tools

# native host runtime + CPU baseline binary
RUN make -C nanocall_tpu/native \
    && g++ -O3 -march=native -std=c++17 -pthread \
         -o baseline/cpu_nanocall baseline/cpu_nanocall.cpp

RUN pip install --no-cache-dir .

ENTRYPOINT ["nanocall-tpu"]
CMD ["--version"]
