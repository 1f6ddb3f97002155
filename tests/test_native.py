"""Native C++ IO library parity tests (native/vox_io.cc via ctypes).

The Python kaldi_io implementations are the reference; the native decoders
must match them bit-for-bit on FM and CM matrices, FV vectors, and PCM wav.
"""

import os

import numpy as np
import pytest

from voxsrc2020_speaker_verification_tpu.data import audio, kaldi_io, native

pytestmark = pytest.mark.skipif(
    not native.available(), reason="native library unavailable (no compiler?)"
)


@pytest.fixture
def ark(tmp_path):
    rng = np.random.RandomState(0)
    mats = {
        "a": (rng.randn(37, 40) * 3).astype(np.float32),
        "b": (rng.randn(200, 80)).astype(np.float32),
        "c": (rng.randn(5, 7)).astype(np.float32),
    }
    plain = str(tmp_path / "plain")
    comp = str(tmp_path / "comp")
    with kaldi_io.ArkScpWriter(plain + ".ark", plain + ".scp") as w:
        for k, m in mats.items():
            w.write(k, m)
    with kaldi_io.ArkScpWriter(comp + ".ark", comp + ".scp", compress=True) as w:
        for k, m in mats.items():
            w.write(k, m)
    return mats, plain, comp


class TestNativeMat:
    def test_fm_bitexact(self, ark):
        mats, plain, _ = ark
        got = dict(kaldi_io.read_mat_scp(plain + ".scp", use_native=True))
        assert native.available()
        for k, m in mats.items():
            np.testing.assert_array_equal(got[k], m)

    def test_cm_matches_python_decoder(self, ark):
        mats, _, comp = ark
        py = dict(kaldi_io.read_mat_scp(comp + ".scp", use_native=False))
        nat = dict(kaldi_io.read_mat_scp(comp + ".scp", use_native=True))
        for k in mats:
            np.testing.assert_array_equal(nat[k], py[k])

    def test_direct_offset_read(self, ark):
        mats, plain, _ = ark
        with open(plain + ".scp") as f:
            for line in f:
                key, rx = line.split()
                path, off = rx.rsplit(":", 1)
                np.testing.assert_array_equal(
                    native.read_mat(path, int(off)), mats[key]
                )


class TestNativeVec:
    def test_fv(self, tmp_path):
        vecs = {f"v{i}": np.random.RandomState(i).randn(256).astype(np.float32)
                for i in range(3)}
        p = str(tmp_path / "v")
        with kaldi_io.ArkScpWriter(p + ".ark", p + ".scp") as w:
            for k, v in vecs.items():
                w.write(k, v)
        with open(p + ".scp") as f:
            for line in f:
                key, rx = line.split()
                path, off = rx.rsplit(":", 1)
                np.testing.assert_array_equal(
                    native.read_vec(path, int(off)), vecs[key]
                )


class TestNativeWav:
    def test_wav_parity(self, tmp_path):
        samples = (np.random.RandomState(3).randn(12345) * 5000).astype(np.float32)
        path = str(tmp_path / "x.wav")
        audio.write_wav(path, samples)
        want, sr_w = audio.read_wav(path)
        got, sr = native.read_wav(path)
        assert sr == sr_w == 16000
        np.testing.assert_array_equal(got, want)
