"""End-to-end learnability: synthetic speakers through the full stack.

Two gates (the reference's only QA was exactly this shape of end-to-end
metric check, SURVEY.md §4):

* a fast 2-speaker smoke (waveform -> on-device FBANK+CMVN -> train step ->
  extraction -> cosine EER beats chance), and
* a 16-speaker production-path run -- CM feature store -> the C++ feeder ->
  the actual fit() loop -> masked bucketed extraction -> cosine AND
  adaptive-s-norm scoring, EER < 5% -- strong enough that a subtly broken
  pooling / margin / BN / asnorm change fails it, which the 2-speaker
  chance-level gate cannot catch.
"""

import dataclasses
import os

import jax
import numpy as np
import pytest

from voxsrc2020_speaker_verification_tpu.eval.extract import extract_embeddings
from voxsrc2020_speaker_verification_tpu.eval.metrics import evaluate_trials
from voxsrc2020_speaker_verification_tpu.eval.scoring import cosine_scores, l2norm
from voxsrc2020_speaker_verification_tpu.ops.cmvn import sliding_cmvn
from voxsrc2020_speaker_verification_tpu.ops.fbank import FbankConfig, fbank
from voxsrc2020_speaker_verification_tpu.training import (
    TrainConfig, create_train_state, make_train_step, make_embed_fn,
)

SR = 16000
CFG = TrainConfig(
    model="tdnn", projection="am_linear", num_classes=2,
    dataset_length=256, feat_dim=24, feat_length=32,
    batch_size=8, num_accumulation_steps=1, total_epochs=23,
    bf16=False, base_lr=0.05, exp_root="",
)
FB = FbankConfig(num_bins=24, dither=0.0)


def _utt(rng, spk):
    """0.4 s utterance; speakers differ in spectral band."""
    t = np.arange(int(0.4 * SR)) / SR
    f0 = 300 + 40 * rng.rand() if spk == 0 else 2500 + 300 * rng.rand()
    sig = 4000 * np.sin(2 * np.pi * f0 * t) + 300 * rng.randn(len(t))
    return np.clip(sig, -32768, 32767).astype(np.float32)


def _features(wave):
    f = np.asarray(fbank(wave[None], FB))[0]
    return np.asarray(sliding_cmvn(f[None], window=300))[0]


def test_train_then_eer_beats_chance():
    rng = np.random.RandomState(0)
    train_feats = [(s, _features(_utt(rng, s))) for s in [0, 1] * 12]
    test_utts = {f"s{s}-u{i}": _features(_utt(rng, s))
                 for s in (0, 1) for i in range(4)}

    state = create_train_state(CFG, jax.random.PRNGKey(0))
    step = jax.jit(make_train_step(CFG), donate_argnums=0)
    crop = CFG.feat_length
    for it in range(30):
        idx = rng.choice(len(train_feats), CFG.batch_size)
        feats = np.stack([
            train_feats[i][1][:crop] for i in idx
        ])[None]  # (A=1, B, T, F)
        labels = np.array([[train_feats[i][0] for i in idx]], np.int32)
        state, metrics = step(state, feats.astype(np.float32), labels,
                              jax.random.PRNGKey(1))
    assert float(metrics["accuracy"]) > 0.8, dict(metrics)

    embed = jax.jit(make_embed_fn(CFG))
    embeddings = extract_embeddings(
        lambda f, m: embed(state.params, state.batch_stats, f, m),
        iter(test_utts.items()), batch_size=4, buckets=(64,),
    )
    xvec = {k: l2norm(v) for k, v in embeddings.items()}
    utts = sorted(xvec)
    trials = [(int(a.split("-")[0] == b.split("-")[0]), a, b)
              for i, a in enumerate(utts) for b in utts[i + 1:]]
    eer, _ = evaluate_trials(trials, cosine_scores(xvec, trials))
    assert eer < 25.0, f"EER {eer}% on separable speakers"


# ---------------------------------------------------------------------------
# 16-speaker production-path gate
# ---------------------------------------------------------------------------

N_SPK = 16
FEAT_DIM16 = 24


@pytest.fixture
def tiny_res2net():
    """Register a test-sized member of the Res2Net family: same split-conv
    blocks, stride-2 avg-pool passthrough, BN structure and head as the
    flagship, small enough for a few hundred CPU steps."""
    import importlib

    # the package re-exports a factory fn named `res2net` that shadows the
    # submodule attribute; import_module returns the real module
    res2net = importlib.import_module(
        "voxsrc2020_speaker_verification_tpu.models.res2net")

    name = "res2net_test_tiny"
    res2net.RES2NET_CONFIGS[name] = res2net.Res2NetConfig(
        name=name, num_filters=(8, 16, 16, 16), block_sizes=(1, 1, 1, 1),
        width=(4, 8, 8, 8), split=2, output_dim=32)
    try:
        yield name
    finally:
        del res2net.RES2NET_CONFIGS[name]


def _spk_features(rng, spk, seconds=1.2):
    """Speaker identity = two characteristic tones (shared grid, per-speaker
    pair) + noise; tones overlap between speakers so the task is non-trivial
    for plain spectral energy."""
    t = np.arange(int(seconds * SR)) / SR
    grid = np.linspace(200, 6000, N_SPK)
    f0 = grid[spk]
    f1 = grid[(spk * 7 + 3) % N_SPK]
    sig = (3000 * np.sin(2 * np.pi * f0 * t + rng.rand() * 6.28)
           + 2000 * np.sin(2 * np.pi * f1 * t + rng.rand() * 6.28)
           + 700 * rng.randn(len(t)))
    wave = np.clip(sig, -32768, 32767).astype(np.float32)
    f = np.asarray(fbank(wave[None], FbankConfig(num_bins=FEAT_DIM16,
                                                 dither=0.0)))[0]
    return f  # raw fbank: the FEEDER applies sliding CMN, like production


def test_sixteen_speakers_fit_extract_asnorm(tmp_path, tiny_res2net):
    """The production path end to end: CM feature store -> C++ feeder (or
    Python fallback) -> fit() -> masked bucketed extraction -> cosine +
    asnorm.  EER < 5% and asnorm does not degrade a correct cosine score --
    sensitive to subtle pooling/margin/BN/normalization breakage."""
    _run_sixteen_speakers(tmp_path, tiny_res2net, num_devices=1)


@pytest.mark.skipif(
    (os.cpu_count() or 1) < 8 and not os.environ.get("VOX_E2E_MULTIDEVICE"),
    reason="needs >=8 cores (or VOX_E2E_MULTIDEVICE=1): on small hosts the "
           "8-virtual-device CPU all-reduce rendezvous starves when native "
           "feeder threads compete for the Eigen pool (ROADMAP.md round 3)")
def test_sixteen_speakers_multidevice(tmp_path, tiny_res2net):
    """The SAME production gate on an 8-device mesh: the only test that
    combines a native C++ feeder with multi-device collectives (round-3
    review: dropping it left a feeder-thread/collective interaction
    uncovered).  Opt-in on small hosts via VOX_E2E_MULTIDEVICE=1."""
    _run_sixteen_speakers(tmp_path, tiny_res2net,
                          num_devices=min(8, jax.device_count()))


def _run_sixteen_speakers(tmp_path, tiny_res2net, num_devices):
    from voxsrc2020_speaker_verification_tpu.data import kaldi_io, native
    from voxsrc2020_speaker_verification_tpu.data.dataset import (
        BatchFeeder, FeatureShardDataset,
    )
    from voxsrc2020_speaker_verification_tpu.eval.scoring import (
        asnorm_scores, speaker_means,
    )
    from voxsrc2020_speaker_verification_tpu.training.loop import fit

    rng = np.random.RandomState(7)
    # epoch_size 10: LR warmup done after epoch 1 (step 10), margin ramps
    # steps 10-50 then holds at 0.2 -- the full schedule inside 220 steps
    config = TrainConfig(
        model=tiny_res2net, projection="sc_cm_linear", num_classes=N_SPK,
        num_centers=2, dataset_length=320,
        feat_dim=FEAT_DIM16, feat_length=64,
        batch_size=32, num_accumulation_steps=1, total_epochs=23,
        bf16=False, base_lr=0.05, lr_boundaries_epochs=(1, 20, 23),
        margin_boundaries_epochs=(1, 5), exp_root="", seed=0,
    )

    # CM-compressed feature store, like prepare_data writes (8 utts/spk)
    scp = str(tmp_path / "feats.scp")
    utt2id = {}
    with kaldi_io.ArkScpWriter(str(tmp_path / "feats.ark"), scp,
                               compress=True) as w:
        for spk in range(N_SPK):
            for i in range(8):
                key = f"s{spk:02d}-u{i}"
                w.write(key, _spk_features(rng, spk))
                utt2id[key] = spk

    if native.available() and hasattr(native.get_lib(),
                                      "vox_feeder_create"):
        feeder = native.NativeBatchFeeder(
            scp, utt2id, FEAT_DIM16, config.feat_length,
            config.batch_size, num_threads=2, seed=1)
    else:
        feeder = BatchFeeder(
            [FeatureShardDataset(scp, utt2id, FEAT_DIM16,
                                 config.feat_length, seed=1)],
            config.batch_size).start()
    # num_devices=1 on small hosts (2 cores here): the 8-virtual-device
    # all-reduce rendezvous can starve when the C++ feeder threads compete
    # for the Eigen pool -- XLA's rendezvous.cc aborts the process after
    # 40 s.  A CPU-backend artifact, not a TPU concern (collectives ride
    # ICI there); the multidevice variant above runs where cores allow.
    from voxsrc2020_speaker_verification_tpu.parallel.sharding import make_mesh
    mesh = make_mesh(num_data=num_devices, num_model=1,
                     devices=jax.devices()[:num_devices])
    try:
        result = fit(config, feeder, max_steps=220, checkpoint=False,
                     log_every=0, log_fn=lambda s: None, mesh=mesh)
    finally:
        feeder.stop() if not hasattr(feeder, "close") else feeder.close()
    state = result.state

    # held-out utterances, production extraction (full-utterance sliding
    # CMN -- the feeder applied the same to the training crops)
    def cmn(f):
        return np.asarray(sliding_cmvn(f[None], window=300))[0]

    test_utts = {f"s{spk:02d}-t{i}": cmn(_spk_features(rng, spk))
                 for spk in range(N_SPK) for i in range(4)}
    cohort_utts = {f"s{spk:02d}-c{i}": cmn(_spk_features(rng, spk))
                   for spk in range(N_SPK) for i in range(2)}

    embed = jax.jit(make_embed_fn(config))
    def extract(utts):
        return extract_embeddings(
            lambda f, m: embed(state.params, state.batch_stats, f, m),
            iter(utts.items()), batch_size=8, buckets=(128,))

    xvec = {k: l2norm(v) for k, v in extract(test_utts).items()}
    utts = sorted(xvec)
    trials = [(int(a[:3] == b[:3]), a, b)
              for i, a in enumerate(utts) for b in utts[i + 1:]]
    scores = cosine_scores(xvec, trials)
    eer, _ = evaluate_trials(trials, scores)
    assert eer < 5.0, f"cosine EER {eer}% on 16 synthetic speakers"

    # adaptive s-norm against a speaker-mean cohort (ref snorm.py:83-131)
    spk2utt = {}
    for u in cohort_utts:
        spk2utt.setdefault(u[:3], []).append(u)
    cohort = speaker_means(extract(cohort_utts), spk2utt)
    s2 = asnorm_scores(xvec, cohort, trials, scores,
                       topk=min(400, len(cohort)))
    eer2, _ = evaluate_trials(trials, s2)
    assert eer2 < 5.0, f"asnorm EER {eer2}% (cosine {eer}%)"
    # no-degradation margin: at 96 positive trials one flipped trial moves
    # EER by 1/96 ~= 1.04%, and the native feeder's batch composition is
    # thread-timing-dependent, so the trained model (and thus which single
    # borderline trial flips) varies run to run -- the margin must exceed
    # one quantum or the gate flakes at exactly +1.042% (observed)
    assert eer2 <= eer + 2.5, (
        f"asnorm degraded a correct cosine score: {eer2}% vs {eer}%")
