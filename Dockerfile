# Runtime environment for the TPU-native speaker-verification framework.
#
# Counterpart of the reference's container (ref Dockerfile:1-33, which layers
# sox/ffmpeg + a full CUDA Kaldi build onto NGC TF1).  Here the footprint is
# far smaller: no Kaldi (features are computed on device, Kaldi-exact), no
# TF; just JAX with the TPU runtime, host-side audio tools for data prep,
# and a C++ toolchain for the native IO library (native/vox_io.cc).
#
# Intended for Cloud TPU VMs (the TPU runtime is provided by the VM image;
# for GPU-free CPU smoke runs this image works as-is).

FROM python:3.12-slim

RUN apt-get update && apt-get install -y --no-install-recommends \
        ffmpeg sox wget g++ make \
    && rm -rf /var/lib/apt/lists/*

# libtpu comes from the TPU VM; the pip extra pulls the matching runtime.
RUN pip install --no-cache-dir \
        "jax[tpu]" -f https://storage.googleapis.com/jax-releases/libtpu_releases.html \
        flax optax orbax-checkpoint chex einops numpy scipy scikit-learn \
        soundfile pytest

WORKDIR /opt/voxsrc2020_speaker_verification_tpu
COPY . .
RUN make -C native && pip install --no-cache-dir -e .

# Data prep + training entry points (see README "Quick start"):
#   python -m voxsrc2020_speaker_verification_tpu.cli.prepare_data ...
#   python -m voxsrc2020_speaker_verification_tpu.cli.train ...
CMD ["python", "-c", "import jax; print(jax.devices())"]
