# ffsubsync-tpu container image.
#
# Role parity with the reference's Dockerfile (multi-stage build, `ffs`
# entrypoint); contents differ because the compute stack is JAX/TPU, not
# webrtcvad/torch. On a TPU VM, run with the host TPU runtime exposed
# (e.g. `--privileged --net=host` per Cloud TPU container docs); on any
# other machine JAX falls back to CPU and everything still works.

FROM python:3.12-slim AS base

RUN apt-get update \
    && apt-get install -y --no-install-recommends ffmpeg g++ make \
    && rm -rf /var/lib/apt/lists/*

WORKDIR /opt/ffsubsync-tpu
COPY setup.py README.md Makefile ./
COPY ffsubsync_tpu ./ffsubsync_tpu
COPY native ./native

# jax[tpu] resolves to the TPU wheel on TPU VMs; plain jax elsewhere.
ARG JAX_VARIANT=jax
RUN pip install --no-cache-dir "${JAX_VARIANT}" && pip install --no-cache-dir .

# build the optional native data-plane helper (tokenizer state machine)
RUN make -C native || true

ENTRYPOINT ["ffs-tpu"]
