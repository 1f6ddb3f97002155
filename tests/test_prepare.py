"""Data-prep subsystem tests: augmentation DSP/policies, MUSAN prep,
device FBANK pipeline, dataset creation (ref prepare_data.sh semantics)."""

import json
import math
import os

import numpy as np
import pytest

from voxsrc2020_speaker_verification_tpu.data import audio, kaldi_io
from voxsrc2020_speaker_verification_tpu.data.augment import (
    AUG_SUFFIXES, add_noise, augment_data_dir, extend_to_duration,
    load_utterance, musan_babble_policy, musan_noise_policy, render_spec,
    reverberate, ReverbPolicy,
)
from voxsrc2020_speaker_verification_tpu.data.musan import (
    load_noise_durations, make_musan_data_dirs, prepare_music,
)
from voxsrc2020_speaker_verification_tpu.utils import datadir


SR = 16000


def _tone(freq, dur_s, amp=8000.0):
    t = np.arange(int(dur_s * SR)) / SR
    return (amp * np.sin(2 * np.pi * freq * t)).astype(np.float32)


class TestAugmentDSP:
    def test_extend_loops_and_truncates(self):
        x = np.arange(5, dtype=np.float32)
        out = extend_to_duration(x, 12)
        np.testing.assert_array_equal(out, [0, 1, 2, 3, 4, 0, 1, 2, 3, 4, 0, 1])
        np.testing.assert_array_equal(extend_to_duration(x, 3), [0, 1, 2])

    def test_add_noise_snr(self):
        sig = _tone(440, 1.0)
        noise = np.random.RandomState(0).randn(SR).astype(np.float32) * 1000
        for snr in (0.0, 10.0):
            out = add_noise(sig, noise, snr)
            added = out - sig
            got = 10 * math.log10(np.dot(sig, sig) / np.dot(added, added))
            assert abs(got - snr) < 0.1

    def test_add_noise_segment(self):
        sig = _tone(440, 1.0)
        noise = np.ones(SR // 4, np.float32) * 500
        out = add_noise(sig, noise, 20.0, start=SR // 2)
        np.testing.assert_array_equal(out[: SR // 2], sig[: SR // 2])
        assert not np.allclose(out[SR // 2: SR // 2 + SR // 4],
                               sig[SR // 2: SR // 2 + SR // 4])

    def test_reverb_identity_rir(self):
        sig = _tone(300, 0.5)
        rir = np.zeros(64, np.float32)
        rir[0] = 1.0
        np.testing.assert_allclose(reverberate(sig, rir), sig, atol=1e-2)

    def test_reverb_shift_and_power(self):
        sig = _tone(300, 0.5)
        # delayed-impulse RIR: shift_output realigns, power preserved
        rir = np.zeros(256, np.float32)
        rir[100] = 0.7
        out = reverberate(sig, rir, shift_output=True)
        assert len(out) == len(sig)
        p_in, p_out = np.dot(sig, sig), np.dot(out, out)
        assert abs(p_out / p_in - 1.0) < 1e-3
        # realigned: correlates with the input at lag 0
        c = np.dot(out, sig) / (np.linalg.norm(out) * np.linalg.norm(sig))
        assert c > 0.99


@pytest.fixture
def corpus(tmp_path):
    """Tiny corpus: 2 speakers x 2 utts, 2 RIRs, MUSAN tree."""
    wavs = tmp_path / "wav"
    for spk in ("id001", "id002"):
        for i in range(2):
            d = wavs / spk / "vid"
            d.mkdir(parents=True, exist_ok=True)
            audio.write_wav(str(d / f"{i:05d}.wav"), _tone(200 + 50 * i, 0.6))
    rirs = tmp_path / "rirs" / "simulated_rirs"
    for room in ("smallroom", "mediumroom"):
        d = rirs / room / "Room001"
        d.mkdir(parents=True)
        rir = np.zeros(128, np.float32)
        rir[3] = 6000.0
        audio.write_wav(str(d / "rir.wav"), rir)
    musan = tmp_path / "musan"
    for sub in ("noise", "speech"):
        d = musan / sub / "free-sound"
        d.mkdir(parents=True)
        for i in range(2):
            audio.write_wav(str(d / f"{sub}-{i}.wav"),
                            np.random.RandomState(i).randn(SR).astype(np.float32) * 800)
    md = musan / "music" / "fma"
    md.mkdir(parents=True)
    for i, voc in enumerate("NY"):
        audio.write_wav(str(md / f"music-{i}.wav"), _tone(100, 1.0, 600))
    with open(md / "ANNOTATIONS", "w") as f:
        f.write("music-0 rock N\nmusic-1 pop Y\n")
    return tmp_path


class TestMusan:
    def test_vocals_filtered(self, corpus):
        m = prepare_music(str(corpus / "musan"))
        assert set(m) == {"music-0"}  # music-1 has vocals
        m = prepare_music(str(corpus / "musan"), use_vocals=True)
        assert set(m) == {"music-0", "music-1"}

    def test_data_dirs(self, corpus, tmp_path):
        dirs = make_musan_data_dirs(str(corpus / "musan"), str(tmp_path / "data"))
        assert set(dirs) == {"music", "speech", "noise"}
        nd = load_noise_durations(dirs["noise"])
        assert len(nd) == 2 and all(0.9 < d < 1.1 for d in nd.values())


class TestAugmentDir:
    def test_five_x(self, corpus, tmp_path):
        from voxsrc2020_speaker_verification_tpu.cli.prepare_data import (
            augment_stage, create_dataset,
        )
        data_root = str(tmp_path / "data")
        create_dataset(str(corpus / "wav"), os.path.join(data_root, "dev"))
        out = augment_stage(data_root, "dev", str(corpus / "musan"),
                            str(corpus / "rirs"))
        wav = datadir.read_two_column(os.path.join(out, "wav.scp"))
        utt2spk = datadir.read_two_column(os.path.join(out, "utt2spk"))
        assert len(wav) == 4 * 5
        base = "id001-vid-00000"
        for sfx in AUG_SUFFIXES:
            assert f"{base}-{sfx}" in wav
            assert utt2spk[f"{base}-{sfx}"] == utt2spk[base] == "id001"
        # reverb spec has an RIR and no noises; babble has 3-7 noises
        rv = json.loads(wav[base + "-reverb"])
        assert rv["rir"] and not rv["noises"]
        bb = json.loads(wav[base + "-babble"])
        assert bb["rir"] is None and 3 <= len(bb["noises"]) <= 7
        assert all(n["extend"] for n in bb["noises"])
        # noise spec: foreground tiling starts at 0, ~1s+dur apart
        nz = json.loads(wav[base + "-noise"])
        assert nz["noises"][0]["start"] == 0
        # specs render to the original length
        sig, sr = load_utterance(wav[base + "-babble"])
        ref, _ = load_utterance(wav[base])
        assert sr == SR and len(sig) == len(ref)

    def test_render_matches_dsp(self, corpus):
        src = str(corpus / "wav" / "id001" / "vid" / "00000.wav")
        rir = str(corpus / "rirs" / "simulated_rirs" / "smallroom" / "Room001" / "rir.wav")
        spec = {"source": src, "rir": rir, "noises": []}
        out, _ = render_spec(spec)
        sig, _ = audio.read_wav(src)
        rw, _ = audio.read_wav(rir)
        np.testing.assert_allclose(out, reverberate(sig, rw), atol=1e-4)


class TestFeaturePipeline:
    def test_fbank_dir(self, corpus, tmp_path):
        from voxsrc2020_speaker_verification_tpu.cli.prepare_data import create_dataset
        from voxsrc2020_speaker_verification_tpu.data.features import (
            compute_features_for_dir, finalize_dataset,
        )
        from voxsrc2020_speaker_verification_tpu.ops.fbank import (
            FbankConfig, fbank, num_frames,
        )
        d = str(tmp_path / "data" / "dev")
        create_dataset(str(corpus / "wav"), d)
        scp = compute_features_for_dir(d, 40, batch_size=2,
                                       bucket_seconds=(1, 2))
        feats = kaldi_io.read_all(kaldi_io.read_mat_scp(scp))
        assert len(feats) == 4
        cfg = FbankConfig(num_bins=40)
        sig, _ = audio.read_wav(
            str(corpus / "wav" / "id001" / "vid" / "00000.wav"))
        t = num_frames(len(sig), cfg)
        got = feats["id001-vid-00000"]
        assert got.shape == (t, 40)
        want = np.asarray(fbank(sig[None].astype(np.float32), cfg))[0]
        # compressed write quantizes; tolerances cover CM roundtrip
        np.testing.assert_allclose(got, want, atol=0.05, rtol=0.01)
        u2n = datadir.read_two_column(os.path.join(d, "utt2num_frames"))
        assert int(u2n["id001-vid-00000"]) == t

        finalize_dataset(d, 40, num_shards=(2,))
        assert os.path.exists(os.path.join(d, "utt2id.pkl"))
        shard = os.path.join(d, "2-split", "feats.1.scp")
        assert os.path.exists(shard)
        assert len(datadir.load_utt2id(os.path.join(d, "utt2id.pkl"))) == 4


class TestCreateDataset:
    def test_layout_and_validation(self, corpus, tmp_path):
        from voxsrc2020_speaker_verification_tpu.cli.prepare_data import create_dataset
        d = str(tmp_path / "dev")
        create_dataset(str(corpus / "wav"), d)
        assert datadir.validate_data_dir(d) == []
        utt2dur = datadir.read_two_column(os.path.join(d, "utt2dur"))
        assert abs(float(utt2dur["id001-vid-00000"]) - 0.6) < 0.01


class TestRirListMachinery:
    """The reference's general RIR-metadata path
    (reverberate_data_dir.py:458-551): parsing, probability smoothing,
    room grouping, and room-then-RIR sampling."""

    def _rir_list(self, tmp_path, room_sizes, name="rir_list"):
        lines = []
        for room, n in room_sizes.items():
            for i in range(n):
                lines.append(
                    f"--rir-id {room}-{i:03d} --room-id {room} "
                    f"/rirs/{room}/rir{i}.wav")
        p = tmp_path / name
        p.write_text("\n".join(lines) + "\n")
        return str(p)

    def test_smooth_probabilities(self):
        from voxsrc2020_speaker_verification_tpu.data.augment import (
            smooth_probabilities,
        )
        # all unspecified -> uniform
        assert smooth_probabilities([None, None]) == [0.5, 0.5]
        # specified entries blended toward uniform by the weight and
        # renormalized (reference formula, reverberate_data_dir.py:478-487)
        got = smooth_probabilities([0.8, None, None], 0.3)
        uniform = (1 - 0.8) / 2
        want = [0.7 * 0.8 + 0.3 * uniform, uniform, uniform]
        s = sum(want)
        for g, w in zip(got, want):
            assert abs(g - w / s) < 1e-12
        assert abs(sum(got) - 1.0) < 1e-12

    def test_parse_and_rooms(self, tmp_path):
        from voxsrc2020_speaker_verification_tpu.data.augment import (
            make_room_dict, parse_rir_list,
        )
        path = self._rir_list(tmp_path, {"Room001": 3, "Room002": 1})
        rirs = parse_rir_list(path)
        assert len(rirs) == 4
        assert abs(sum(r["probability"] for r in rirs) - 1.0) < 1e-12
        assert rirs[0]["path"] == "/rirs/Room001/rir0.wav"
        rooms = make_room_dict(rirs)
        assert set(rooms) == {"Room001", "Room002"}
        # uniform RIRs -> room probability proportional to its RIR count
        assert abs(rooms["Room001"]["probability"] - 0.75) < 1e-12

    def test_parse_rebases_corpus_relative_paths(self, tmp_path):
        """RIRS_NOISES rir_list locations are corpus-relative
        ('RIRS_NOISES/simulated_rirs/...'); with base=<rirs_root> they must
        come out absolute so specs work from any cwd."""
        from voxsrc2020_speaker_verification_tpu.data.augment import (
            parse_rir_list,
        )
        root = tmp_path / "RIRS_NOISES"
        rirdir = root / "simulated_rirs" / "smallroom" / "Room001"
        rirdir.mkdir(parents=True)
        (rirdir / "rir0.wav").write_bytes(b"")
        lst = root / "rir_list"
        lst.write_text(
            "--rir-id r0 --room-id Room001 "
            "RIRS_NOISES/simulated_rirs/smallroom/Room001/rir0.wav\n")
        rirs = parse_rir_list(str(lst), base=str(root))
        assert rirs[0]["path"] == str(rirdir / "rir0.wav")
        # absolute locations pass through untouched
        lst.write_text("--rir-id r0 --room-id R /abs/rir.wav\n")
        assert parse_rir_list(str(lst),
                              base=str(root))[0]["path"] == "/abs/rir.wav"

    def test_room_policy_sampling(self, tmp_path):
        from voxsrc2020_speaker_verification_tpu.data.augment import (
            RoomReverbPolicy,
        )
        small = self._rir_list(tmp_path, {"S1": 2, "S2": 2}, "small")
        medium = self._rir_list(tmp_path, {"M1": 4}, "medium")
        pol = RoomReverbPolicy([(0.5, small), (0.5, medium)], seed=5)
        counts = {"S": 0, "M": 0}
        for _ in range(4000):
            spec = pol.sample("/wav/x.wav")
            assert spec["rir"] is not None and spec["noises"] == []
            counts[spec["rir"].split("/")[2][0]] += 1
        # set probabilities 0.5/0.5 regardless of RIR counts
        assert abs(counts["S"] / 4000 - 0.5) < 0.03

    def test_rvb_probability(self, tmp_path):
        from voxsrc2020_speaker_verification_tpu.data.augment import (
            RoomReverbPolicy,
        )
        path = self._rir_list(tmp_path, {"R": 2})
        pol = RoomReverbPolicy([(None, path)], rvb_probability=0.0, seed=1)
        assert pol.sample("/wav/x.wav")["rir"] is None
