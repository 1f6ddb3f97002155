"""Native raw-audio path (native/vox_raw.cc): spec rendering parity vs the
Python reference implementation (data/augment.py) and feeder crop semantics
vs RawAudioShardDataset (data/raw_dataset.py, ref tf_data.py:84-101)."""

import json
import os

import numpy as np
import pytest

from voxsrc2020_speaker_verification_tpu.data import audio, augment, native
from voxsrc2020_speaker_verification_tpu.ops.fbank import (
    FbankConfig, num_frames,
)
from voxsrc2020_speaker_verification_tpu.ops.pipeline import max_crop_samples

pytestmark = pytest.mark.skipif(
    not native.available()
    or not hasattr(native.get_lib(), "vox_raw_feeder_create"),
    reason="native raw feeder unavailable",
)

SR = 16000


def _wav(tmp_path, name, seconds, seed, scale=2000.0):
    rng = np.random.RandomState(seed)
    path = str(tmp_path / f"{name}.wav")
    audio.write_wav(path, (rng.randn(int(seconds * SR)) * scale)
                    .astype(np.float32))
    return path


def _rir(tmp_path, name, seed):
    rng = np.random.RandomState(seed)
    t = int(0.3 * SR)
    rir = rng.randn(t) * np.exp(-np.arange(t) / (0.04 * SR))
    rir[40] = 3.0  # direct-path peak NOT at index 0: exercises shift-output
    path = str(tmp_path / f"{name}.wav")
    audio.write_wav(path, (rir * 8000.0).astype(np.float32))
    return path


def assert_render_matches(rxwav, atol=1.0):
    """Native render == Python render.  atol=1.0 is one int16 quantum on
    signals of amplitude ~2000-30000: differences far below the PCM wire
    format's own resolution (python float32 BLAS dots vs C++ double)."""
    want, sr_w = augment.load_utterance(rxwav)
    got, sr_g = native.render_spec(rxwav)
    assert sr_w == sr_g
    assert len(want) == len(got)
    np.testing.assert_allclose(got, want, rtol=0, atol=atol)


def test_plain_wav(tmp_path):
    assert_render_matches(_wav(tmp_path, "src", 2.0, 0))


def test_reverb_spec(tmp_path):
    spec = {"source": _wav(tmp_path, "src", 3.0, 1),
            "rir": _rir(tmp_path, "rir", 2), "noises": []}
    assert_render_matches(json.dumps(spec, separators=(",", ":")))


def test_foreground_noise_spec(tmp_path):
    src = _wav(tmp_path, "src", 3.0, 3)
    spec = {"source": src, "rir": None, "noises": [
        {"path": _wav(tmp_path, "n0", 1.0, 4, scale=1200.0),
         "snr": 5, "start": 0, "extend": False},
        {"path": _wav(tmp_path, "n1", 0.8, 5, scale=900.0),
         "snr": 15, "start": int(1.7 * SR), "extend": False},
    ]}
    assert_render_matches(json.dumps(spec, separators=(",", ":")))


def test_background_extend_spec(tmp_path):
    """Music/babble policies: bg noises looped over the full duration."""
    src = _wav(tmp_path, "src", 4.0, 6)
    spec = {"source": src, "rir": None, "noises": [
        {"path": _wav(tmp_path, f"b{i}", 1.3 + 0.4 * i, 7 + i, scale=700.0),
         "snr": snr, "start": 0, "extend": True}
        for i, snr in enumerate([20, 17, 13])
    ]}
    assert_render_matches(json.dumps(spec, separators=(",", ":")))


def test_combined_reverb_and_noise(tmp_path):
    spec = {"source": _wav(tmp_path, "src", 2.5, 10),
            "rir": _rir(tmp_path, "rir", 11),
            "noises": [{"path": _wav(tmp_path, "n", 2.0, 12, scale=1500.0),
                        "snr": 0, "start": int(0.3 * SR), "extend": False}]}
    assert_render_matches(json.dumps(spec, separators=(",", ":")))


def test_noise_overrunning_signal_end(tmp_path):
    """A noise longer than the remaining signal is truncated to the segment
    (augment.py: seg = noise[:len(sig)-start])."""
    spec = {"source": _wav(tmp_path, "src", 1.0, 13),
            "rir": None,
            "noises": [{"path": _wav(tmp_path, "n", 2.0, 14),
                        "snr": 10, "start": int(0.8 * SR), "extend": False}]}
    assert_render_matches(json.dumps(spec, separators=(",", ":")))


def test_negative_noise_start_is_rejected_safely(tmp_path):
    """A corrupt/hand-edited spec with a negative start offset must not
    write out of bounds: the noise entry is ignored (the policies never
    emit negative offsets; Python's slice semantics would wrap, which is
    equally meaningless -- safety is the contract here)."""
    src = _wav(tmp_path, "src", 1.0, 50)
    spec = {"source": src, "rir": None,
            "noises": [{"path": _wav(tmp_path, "n", 0.5, 51),
                        "snr": 5, "start": -4000, "extend": False},
                       {"path": _wav(tmp_path, "n2", 0.5, 52),
                        "snr": 5, "start": -1, "extend": True}]}
    got, sr = native.render_spec(json.dumps(spec, separators=(",", ":")))
    want, _ = audio.read_wav(src)
    np.testing.assert_array_equal(got, want)  # both noises ignored


def test_one_sample_source_and_rir(tmp_path):
    """Degenerate 1-sample source convolved with a 1-sample RIR (full
    convolution length == 1): the packed real-FFT must clamp its size to
    >= 2 instead of indexing an empty half-size buffer (round-3 review
    finding: heap overflow on truncated/corrupt wavs)."""
    src = str(tmp_path / "one.wav")
    rir = str(tmp_path / "rir1.wav")
    audio.write_wav(src, np.asarray([1234.0], np.float32))
    audio.write_wav(rir, np.asarray([2.5], np.float32))
    spec = {"source": src, "rir": rir, "noises": []}
    assert_render_matches(json.dumps(spec, separators=(",", ":")))


def test_non_ascii_paths_in_specs(tmp_path):
    """json.dumps defaults to ensure_ascii=True, so non-ASCII path bytes
    arrive as \\uXXXX escapes; the C++ parser must decode them back to
    UTF-8 or those utterances silently vanish as decode errors (round-3
    review finding)."""
    d = tmp_path / "música-話者"
    d.mkdir()
    rng = np.random.RandomState(0)
    src = str(d / "ütt.wav")
    audio.write_wav(src, (rng.randn(SR) * 2000).astype(np.float32))
    noise = str(d / "そうおん.wav")
    audio.write_wav(noise, (rng.randn(SR // 2) * 900).astype(np.float32))
    spec = {"source": src, "rir": None,
            "noises": [{"path": noise, "snr": 10, "start": 0,
                        "extend": True}]}
    # default dumps: every non-ASCII char escaped
    rx = json.dumps(spec)
    assert "\\u" in rx
    assert_render_matches(rx)


def test_malformed_spec_raises():
    with pytest.raises(IOError):
        native.render_spec('{"source": "missing.wav"')
    with pytest.raises(IOError):
        native.render_spec('{"source": "/nonexistent/file.wav"}')


def _scp(tmp_path, entries):
    path = str(tmp_path / "wav.scp")
    with open(path, "w") as f:
        for k, v in entries.items():
            f.write(f"{k} {v}\n")
    return path


def test_feeder_short_utterance_pad(tmp_path):
    """Short utterance (< feat_length frames): whole signal at pad_shift
    inside zeros, matching RawAudioShardDataset._crop (tf_data.py:92-95)."""
    cfg = FbankConfig(num_bins=8)
    src = _wav(tmp_path, "short", 0.6, 20)  # 0.6 s = 58 frames < L
    want, _ = audio.read_wav(src)
    pcm = np.clip(np.round(want), -32768, 32767).astype(np.int16)
    L, ctx = 100, 30
    scp = _scp(tmp_path, {"u0": src})
    feeder = native.NativeRawBatchFeeder(
        scp, {"u0": 3}, L, batch_size=2, num_accumulation_steps=1,
        cfg=cfg, context=ctx, num_threads=1, seed=0, skip_percent=0)
    try:
        n = num_frames(len(pcm), cfg)
        for _ in range(4):
            (waves, ns, off, shift), labels = feeder.get()
            assert waves.shape == (1, 2, max_crop_samples(L, ctx, cfg))
            for b in range(2):
                assert labels[0, b] == 3
                assert ns[0, b] == len(pcm)
                assert off[0, b] == 0
                assert 0 <= shift[0, b] <= L - n
                np.testing.assert_array_equal(
                    waves[0, b, : len(pcm)], pcm)
                assert not waves[0, b, len(pcm):].any()
    finally:
        feeder.close()


def test_feeder_long_utterance_crop(tmp_path):
    """Long utterance: the emitted window is a contiguous int16 slice at a
    frame boundary with valid CMVN-context bookkeeping (raw_dataset._crop)."""
    cfg = FbankConfig(num_bins=8)
    L, ctx = 50, 20
    src = _wav(tmp_path, "long", 3.0, 21)  # 3 s = 298 frames > L
    want, _ = audio.read_wav(src)
    pcm = np.clip(np.round(want), -32768, 32767).astype(np.int16)
    n = num_frames(len(pcm), cfg)
    scp = _scp(tmp_path, {"u0": src})
    feeder = native.NativeRawBatchFeeder(
        scp, {"u0": 1}, L, batch_size=2, num_accumulation_steps=2,
        cfg=cfg, context=ctx, num_threads=1, seed=7, skip_percent=0)
    try:
        for _ in range(4):
            (waves, ns, off, shift), _ = feeder.get()
            for a in range(2):
                for b in range(2):
                    w, k = waves[a, b], int(ns[a, b])
                    assert shift[a, b] == 0
                    assert not w[k:].any()
                    # reconstruct the crop parameters: the slice must sit at
                    # lo*frame_shift with t0 = off + lo in [0, n-L]
                    first = w[:k]
                    # locate in source (exact int16 match)
                    starts = np.flatnonzero(pcm[: len(pcm) - k + 1] == first[0])
                    pos = next(s for s in starts
                               if np.array_equal(pcm[s: s + k], first))
                    assert pos % cfg.frame_shift == 0
                    lo = pos // cfg.frame_shift
                    t0 = int(off[a, b]) + lo
                    assert 0 <= t0 <= n - L
                    assert int(off[a, b]) == t0 - max(0, t0 - ctx)
                    hi = min(n, t0 + L + ctx)
                    s_hi = min(len(pcm),
                               (hi - 1) * cfg.frame_shift + cfg.frame_length)
                    assert k == s_hi - pos
    finally:
        feeder.close()


def test_feeder_renders_specs_and_feeds_device_pipeline(tmp_path):
    """End to end: JSON aug specs through the native feeder, then the
    on-device pipeline (waveform_to_features) -- finite, non-zero features
    with the exact training shape."""
    import jax

    from voxsrc2020_speaker_verification_tpu.ops.pipeline import (
        waveform_to_features,
    )

    cfg = FbankConfig(num_bins=8, dither=0.0)
    src = _wav(tmp_path, "src", 2.0, 30)
    spec = {"source": src, "rir": _rir(tmp_path, "rir", 31),
            "noises": [{"path": _wav(tmp_path, "n", 1.0, 32, scale=900.0),
                        "snr": 10, "start": 0, "extend": False}]}
    scp = _scp(tmp_path, {
        "u0": src,
        "u0-aug": json.dumps(spec, separators=(",", ":")),
    })
    L, ctx = 40, 15
    feeder = native.NativeRawBatchFeeder(
        scp, {"u0": 0, "u0-aug": 0}, L, batch_size=4,
        num_accumulation_steps=1, cfg=cfg, context=ctx, num_threads=2,
        seed=0, skip_percent=0)
    try:
        (waves, ns, off, shift), labels = feeder.get()
        feats = waveform_to_features(
            waves[0], ns[0], off[0], shift[0], cfg, L,
            window=60, context=ctx)
        feats = np.asarray(feats)
        assert feats.shape == (4, L, 8)
        assert np.isfinite(feats).all()
        assert (np.abs(feats).sum(axis=(1, 2)) > 0).all()
        assert feeder.decode_errors() == 0
    finally:
        feeder.close()


def test_train_cli_raw_uses_native_feeder(tmp_path, monkeypatch, capsys):
    """cli.train --raw runs on the C++ raw feeder end to end (tiny wav
    corpus incl. an aug spec, one optimizer step, on-device FBANK+CMVN)."""
    import pickle

    from voxsrc2020_speaker_verification_tpu.cli import train as cli_train
    from voxsrc2020_speaker_verification_tpu.recipes import get_recipe

    config, _ = get_recipe("tdnn_voxsrc2020_vox2_dev")
    data_dir = tmp_path / "data" / config.dataset
    data_dir.mkdir(parents=True)
    utt2id, entries = {}, {}
    for i in range(4):
        path = _wav(tmp_path, f"u{i}", 0.8, 40 + i)
        entries[f"u{i}"] = path
        utt2id[f"u{i}"] = i % 3
    spec = {"source": entries["u0"], "rir": None,
            "noises": [{"path": entries["u1"], "snr": 10, "start": 0,
                        "extend": True}]}
    entries["u0-noise"] = json.dumps(spec, separators=(",", ":"))
    utt2id["u0-noise"] = utt2id["u0"]
    with open(data_dir / "wav.scp", "w") as f:
        for k, v in entries.items():
            f.write(f"{k} {v}\n")
    with open(data_dir / "utt2id.pkl", "wb") as f:
        pickle.dump(utt2id, f)

    monkeypatch.chdir(tmp_path)
    cli_train.main([
        "--recipe", "tdnn_voxsrc2020_vox2_dev", "--data-root", "data",
        "--raw", "--num-workers", "2",
        "--max-steps", "1", "--log-every", "0", "--no-checkpoint",
        "--batch-size", "2", "--num-accumulation-steps", "1",
        "--feat-length", "24",
    ])
    assert "done: 1 steps" in capsys.readouterr().out


def test_feeder_host_sharding_partitions_corpus(tmp_path):
    """shard_index/num_shards must partition the wav.scp like the Python
    dataset's strided slicing (multi-host raw feeding, cli.train
    --process-id/--num-processes): each shard sees only its own labels and
    the union covers everything."""
    cfg = FbankConfig(num_bins=8)
    entries, utt2id = {}, {}
    for i in range(6):
        entries[f"u{i}"] = _wav(tmp_path, f"u{i}", 0.8, 60 + i)
        utt2id[f"u{i}"] = i  # unique label == utterance identity
    scp = _scp(tmp_path, entries)
    seen = {}
    for shard in range(2):
        feeder = native.NativeRawBatchFeeder(
            scp, utt2id, 30, batch_size=3, num_accumulation_steps=1,
            cfg=cfg, context=10, num_threads=1, seed=0, skip_percent=0,
            shard_index=shard, num_shards=2)
        try:
            labels = set()
            for _ in range(4):
                _, lb = feeder.get()
                labels.update(int(v) for v in lb.ravel())
            seen[shard] = labels
        finally:
            feeder.close()
    # strided partition: shard 0 = utts {0,2,4}, shard 1 = {1,3,5}
    assert seen[0] == {0, 2, 4}, seen
    assert seen[1] == {1, 3, 5}, seen


def test_feeder_dead_on_bad_paths(tmp_path):
    scp = _scp(tmp_path, {"u0": "/nonexistent/a.wav",
                          "u1": "/nonexistent/b.wav"})
    feeder = native.NativeRawBatchFeeder(
        scp, {"u0": 0, "u1": 0}, 40, batch_size=1,
        num_accumulation_steps=1, num_threads=1, seed=0, skip_percent=0)
    try:
        with pytest.raises(IOError, match="failed to decode"):
            feeder.get()
        assert feeder.decode_errors() >= 2
    finally:
        feeder.close()
