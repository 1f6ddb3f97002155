"""Cross-stack Kaldi IO validation: arks written by OUR writer must be
decodable by the REFERENCE'S kaldi_io.py (ref tensorflow/kaldi_io.py:367,
:471-505 for the CM codec, :249 for float-vector arks), so either stack can
consume the other's artifacts."""

import os
import sys

import numpy as np
import pytest

from voxsrc2020_speaker_verification_tpu.data import kaldi_io

REFERENCE = "/root/reference/tensorflow"

pytestmark = pytest.mark.skipif(
    not os.path.isdir(REFERENCE), reason="reference repo not mounted")


@pytest.fixture(scope="module")
def ref_kaldi_io():
    os.environ.setdefault("KALDI_ROOT", "/nonexistent")  # silence PATH probe
    sys.path.insert(0, REFERENCE)
    try:
        import kaldi_io as ref
    finally:
        sys.path.remove(REFERENCE)
    return ref


def _matrices():
    rng = np.random.RandomState(0)
    return {
        "gauss": rng.randn(37, 80).astype(np.float32) * 3.0,
        "one_row": rng.randn(1, 40).astype(np.float32),
        "const_col": np.tile(
            np.linspace(-5, 5, 16, dtype=np.float32), (12, 1)),
        "big_range": (rng.randn(50, 8) * 1e3).astype(np.float32),
        "tall": rng.randn(400, 4).astype(np.float32),  # >8 rows: percentiles
    }


@pytest.mark.parametrize("compress", [False, True])
def test_reference_decodes_our_mat_ark(ref_kaldi_io, tmp_path, compress):
    mats = _matrices()
    ark = str(tmp_path / ("cm.ark" if compress else "fm.ark"))
    scp = str(tmp_path / "feats.scp")
    with kaldi_io.ArkScpWriter(ark, scp, compress=compress) as w:
        for key, m in mats.items():
            w.write(key, m)

    theirs = dict(ref_kaldi_io.read_mat_ark(ark))
    ours = kaldi_io.read_all(kaldi_io.read_mat_ark(ark))
    assert set(theirs) == set(mats)
    for key, m in mats.items():
        if compress:
            # Same bytes, two decoders: only fp association may differ, so
            # any gap is a few float32 ulps of the matrix's global range.
            rng = max(float(m.max() - m.min()), 1e-3)
            np.testing.assert_allclose(
                theirs[key], ours[key], rtol=1e-5, atol=1e-5 * rng,
                err_msg=key)
            # And the roundtrip stays within the CM quantization error
            # (uint8 codes over percentile segments: ~1% of the matrix's
            # global range worst-case in the tails, tighter in the body).
            assert np.max(np.abs(theirs[key] - m)) / rng < 3e-2, key
        else:
            np.testing.assert_array_equal(theirs[key], ours[key], err_msg=key)
            np.testing.assert_array_equal(theirs[key], m, err_msg=key)

    # The reference's scp reader must accept our "path:offset" scp lines.
    via_scp = dict(ref_kaldi_io.read_mat_scp(scp))
    for key in mats:
        np.testing.assert_array_equal(via_scp[key], theirs[key], err_msg=key)
        assert via_scp[key].dtype == np.float32


def test_reference_decodes_our_vec_ark(ref_kaldi_io, tmp_path):
    rng = np.random.RandomState(1)
    vecs = {f"utt{i}": rng.randn(256).astype(np.float32) for i in range(5)}
    ark = str(tmp_path / "xvector.ark")
    with open(ark, "wb") as f:
        for key, v in vecs.items():
            kaldi_io.write_vec_flt(f, v, key=key)
    theirs = dict(ref_kaldi_io.read_vec_flt_ark(ark))
    assert set(theirs) == set(vecs)
    for key, v in vecs.items():
        np.testing.assert_array_equal(theirs[key], v, err_msg=key)


def test_reference_decodes_feature_dir_output(ref_kaldi_io, tmp_path):
    """End-to-end: compute_features_for_dir output (compressed fbank ark +
    scp) read back through the reference decoder matches ours bit-exactly."""
    from voxsrc2020_speaker_verification_tpu.data import audio
    from voxsrc2020_speaker_verification_tpu.data.features import (
        compute_features_for_dir,
    )
    from voxsrc2020_speaker_verification_tpu.utils import datadir

    d = tmp_path / "data"
    wavdir = d / "wavs"
    wavdir.mkdir(parents=True)
    rng = np.random.RandomState(2)
    wav_scp, utt2spk = {}, {}
    for i in range(3):
        path = str(wavdir / f"u{i}.wav")
        t = np.arange(int(16000 * (0.4 + 0.3 * i)))
        audio.write_wav(path, (6000 * np.sin(0.03 * (i + 1) * t)))
        wav_scp[f"spk{i}-u{i}"] = path
        utt2spk[f"spk{i}-u{i}"] = f"spk{i}"
    datadir.write_two_column(str(d / "wav.scp"), wav_scp)
    datadir.write_two_column(str(d / "utt2spk"), utt2spk)

    scp = compute_features_for_dir(str(d), 40, batch_size=2,
                                   bucket_seconds=(1, 2))
    ours = kaldi_io.read_all(kaldi_io.read_mat_scp(scp))
    theirs = dict(ref_kaldi_io.read_mat_scp(scp))
    assert set(theirs) == set(ours) == set(wav_scp)
    for key in ours:
        np.testing.assert_allclose(
            theirs[key], ours[key], rtol=1e-5, atol=1e-5, err_msg=key)
