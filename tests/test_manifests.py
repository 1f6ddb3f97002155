"""Bundled corpus-acquisition manifests (ref download_vox.sh:1-13,
md5sum_vox.txt:1-15, prepare_data.sh:201-216) and the part-assembly logic."""

import hashlib
import os

from voxsrc2020_speaker_verification_tpu.cli.prepare_data import (
    ARCHIVE_PARTS, DEFAULT_MD5, DEFAULT_TRIALS, DEFAULT_URLS,
    assemble_archives, verify_md5,
)

REF_MD5 = "/root/reference/md5sum_vox.txt"


def _parse_urls(path):
    with open(path) as f:
        return [l.strip() for l in f if l.strip() and not l.startswith("#")]


def test_bundled_manifests_complete():
    urls = _parse_urls(DEFAULT_URLS)
    names = [u.rsplit("/", 1)[1] for u in urls]
    # all 13 reference archives (download_vox.sh) + RIRS + MUSAN
    for parts in ARCHIVE_PARTS.values():
        for part in parts:
            assert part in names
    assert "vox1_test_wav.zip" in names
    assert "rirs_noises.zip" in names
    assert "musan.tar.gz" in names

    trials = [l.split() for l in _parse_urls(DEFAULT_TRIALS)]
    assert sorted(t[1] for t in trials) == [
        "list_test_E.txt", "list_test_H.txt", "list_test_T.txt"]
    assert all(t[0].startswith("http") for t in trials)


def test_md5_manifest_matches_reference():
    if not os.path.isfile(REF_MD5):
        import pytest
        pytest.skip("reference repo not mounted")
    with open(DEFAULT_MD5) as f:
        ours = {l.split()[1]: l.split()[0] for l in f if l.split()}
    with open(REF_MD5) as f:
        ref = {l.split()[1]: l.split()[0] for l in f if l.split()}
    # the reference file names the combined vox2 zip 'vox2_dev_aac.zip'
    assert ours == ref


def test_assemble_and_verify(tmp_path):
    root = str(tmp_path)
    blobs = {}
    for part in ARCHIVE_PARTS["vox1_dev_wav.zip"]:
        data = part.encode() * 100
        blobs[part] = data
        with open(os.path.join(root, part), "wb") as f:
            f.write(data)
    made = assemble_archives(root)
    assert made == ["vox1_dev_wav.zip"]
    combined = b"".join(blobs[p] for p in ARCHIVE_PARTS["vox1_dev_wav.zip"])
    with open(os.path.join(root, "vox1_dev_wav.zip"), "rb") as f:
        assert f.read() == combined

    manifest = tmp_path / "md5.txt"
    manifest.write_text(
        f"{hashlib.md5(combined).hexdigest()}  vox1_dev_wav.zip\n"
        f"{'0' * 32}  vox1_dev_wav_partaa\n")
    bad = verify_md5(str(manifest), root)
    assert bad == ["vox1_dev_wav_partaa"]  # corrupt part flagged, zip clean

    # idempotent: nothing to assemble the second time
    assert assemble_archives(root) == []
