"""TPU-native speaker-verification framework.

A from-scratch JAX/XLA/Pallas/pjit re-design of the capabilities of the
reference Kaldi + TF1 + Horovod pipeline (xx205/voxsrc2020_speaker_verification):
TDNN / Res2Net / DPN speaker-embedding models, margin-softmax losses,
Kaldi-compatible FBANK/CMVN feature extraction on device, data-parallel +
classifier-sharded training via `jax.sharding`, batched masked-pooling
embedding extraction, and cosine / adaptive-s-norm scoring with EER/minDCF.

Layer map (TPU-first redesign of reference SURVEY.md layers L1-L5):
  data/      host-side IO: Kaldi ark/scp compat, wav, loaders       (ref L1)
  ops/       on-device DSP + NN primitives (fbank, cmvn, pooling)   (ref L1/L2)
  models/    TDNN, Res2Net family, DPN                               (ref L2)
  losses/    margin-softmax projections + LR/margin schedules        (ref L2/L3)
  parallel/  mesh construction + sharding rules                      (ref Horovod)
  training/  jitted train step, grad accum, checkpoints, recipes     (ref L3/L5)
  eval/      extraction, scoring (cosine/asnorm), EER/minDCF         (ref L4)
"""

__version__ = "0.1.0"
