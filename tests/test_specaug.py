"""On-device SpecAugment tests (reference sampling semantics,
spec_augment.py:27-62 via tf_data.py:104-109)."""

import jax
import numpy as np

from voxsrc2020_speaker_verification_tpu.ops.specaug import (
    FREQ_PARAM, TIME_PARAM, spec_augment,
)


def _runs_of_zeros(v):
    """Lengths of maximal all-zero runs in a 1-D 0/1 vector."""
    runs, n = [], 0
    for x in v:
        if x == 0:
            n += 1
        elif n:
            runs.append(n)
            n = 0
    if n:
        runs.append(n)
    return runs


class TestSpecAugment:
    def test_shapes_and_masking(self):
        key = jax.random.PRNGKey(0)
        feats = np.ones((8, 50, 40), np.float32)
        out = np.asarray(spec_augment(key, feats))
        assert out.shape == feats.shape
        for b in range(8):
            # freq mask: zeroed columns form at most one run of < FREQ_PARAM
            col_keep = (np.abs(out[b]).sum(axis=0) > 0).astype(int)
            runs = _runs_of_zeros(col_keep)
            assert len(runs) <= 1 and all(r < FREQ_PARAM for r in runs)
            row_keep = (np.abs(out[b]).sum(axis=1) > 0).astype(int)
            runs = _runs_of_zeros(row_keep)
            assert len(runs) <= 1 and all(r < TIME_PARAM for r in runs)
        # not a no-op across the whole batch
        assert (out != feats).any()

    def test_deterministic_per_key(self):
        feats = np.random.RandomState(0).rand(4, 30, 40).astype(np.float32)
        a = np.asarray(spec_augment(jax.random.PRNGKey(1), feats))
        b = np.asarray(spec_augment(jax.random.PRNGKey(1), feats))
        np.testing.assert_array_equal(a, b)
        c = np.asarray(spec_augment(jax.random.PRNGKey(2), feats))
        assert (a != c).any()

    def test_unmasked_values_unchanged(self):
        feats = np.random.RandomState(3).rand(4, 30, 40).astype(np.float32) + 1.0
        out = np.asarray(spec_augment(jax.random.PRNGKey(4), feats))
        changed = out != feats
        # every changed element was zeroed, never otherwise altered
        assert np.all(out[changed] == 0.0)
