"""Eval layer: chunking rule, batched masked extraction vs per-chunk exact
forward, asnorm vs a naive loop, EER/minDCF on constructed score sets."""

import numpy as np
import pytest

from voxsrc2020_speaker_verification_tpu.eval import (
    extract_embeddings, chunk_spans, l2norm, speaker_means,
    cosine_scores, asnorm_scores, compute_eer_and_min_dcf, evaluate_trials,
)


class TestChunkSpans:
    def test_reference_rule(self):
        # T=1024: tail of 24 (<25) frames is dropped (ref tf_extract.py:102)
        assert chunk_spans(1024) == [(0, 1000)]
        # T=1030: tail of 30 becomes a chunk
        assert chunk_spans(1030) == [(0, 1000), (1000, 30)]
        assert chunk_spans(999) == [(0, 999)]
        assert chunk_spans(2500) == [(0, 1000), (1000, 1000), (2000, 500)]
        # reference would emit zero chunks below 25 frames; we keep one
        assert chunk_spans(10) == [(0, 10)]


def test_extraction_matches_manual_chunked_average():
    """extract_embeddings (bucketed, padded, masked) must equal the manual
    per-chunk exact-length computation, for a real model."""
    import jax
    from voxsrc2020_speaker_verification_tpu.models import get_model

    model = get_model("tdnn")
    feat_dim = 24
    init_x = np.zeros((1, 50, feat_dim), np.float32)
    variables = model.init(jax.random.PRNGKey(0), init_x, False)

    @jax.jit
    def embed_fn(feats, mask):
        return model.apply(variables, feats, False, mask)

    rng = np.random.RandomState(0)
    utts = {
        "short": rng.randn(80, feat_dim).astype(np.float32),
        "exact": rng.randn(300, feat_dim).astype(np.float32),
        "long": rng.randn(730, feat_dim).astype(np.float32),
    }
    got = extract_embeddings(
        embed_fn, utts.items(), batch_size=4,
        buckets=(128, 300, 1000), max_frames=300, min_frames=25,
    )

    for utt, feats in utts.items():
        num, den = 0.0, 0.0
        for start, length in chunk_spans(len(feats), 300, 25):
            chunk = feats[None, start: start + length]
            e = np.asarray(model.apply(variables, chunk, False))[0]
            num = num + e * length
            den += length
        np.testing.assert_allclose(got[utt], num / den, rtol=2e-4, atol=2e-5)


def test_bf16_wire_parity():
    """The bf16 feature wire (round 5: halves the host->device transfer on
    the eval path) must be BIT-IDENTICAL to the fp32 wire for a bf16-compute
    model -- the model's entry cast rounds to bf16 either way -- and within
    input-quantization noise for an fp32 model."""
    import jax
    import jax.numpy as jnp
    import ml_dtypes
    from voxsrc2020_speaker_verification_tpu.models import get_model

    feat_dim = 24
    rng = np.random.RandomState(0)
    utts = {"a": rng.randn(80, feat_dim).astype(np.float32),
            "b": rng.randn(300, feat_dim).astype(np.float32)}

    for dtype, exact in ((jnp.bfloat16, True), (None, False)):
        model = get_model("tdnn", dtype=dtype)
        variables = model.init(
            jax.random.PRNGKey(0), np.zeros((1, 50, feat_dim), np.float32),
            False)

        @jax.jit
        def embed_fn(feats, mask, model=model, variables=variables):
            return model.apply(variables, feats.astype(jnp.float32),
                               False, mask)

        kw = dict(batch_size=4, buckets=(128, 300), max_frames=300)
        f32 = extract_embeddings(embed_fn, utts.items(), **kw)
        bf16 = extract_embeddings(embed_fn, utts.items(),
                                  wire_dtype=ml_dtypes.bfloat16, **kw)
        for utt in utts:
            if exact:
                np.testing.assert_array_equal(f32[utt], bf16[utt])
            else:
                np.testing.assert_allclose(f32[utt], bf16[utt],
                                           rtol=2e-2, atol=2e-2)


def test_speaker_means_not_renormalized():
    v1 = np.array([2.0, 0.0], np.float32)
    v2 = np.array([0.0, 3.0], np.float32)
    means = speaker_means({"u1": v1, "u2": v2}, {"spk": ["u1", "u2"]})
    np.testing.assert_allclose(means["spk"], [0.5, 0.5])  # mean of e1, e2


def test_asnorm_matches_naive_loop():
    rng = np.random.RandomState(1)
    d = 16
    xvecs = {f"u{i}": l2norm(rng.randn(d)) for i in range(10)}
    cohort = {f"c{i}": l2norm(rng.randn(d)) for i in range(50)}
    trials = [(1, "u0", "u1"), (0, "u2", "u3"), (1, "u4", "u5")]
    raw = cosine_scores(xvecs, trials)
    got = asnorm_scores(xvecs, cohort, trials, raw, topk=10)

    cmat = np.stack(list(cohort.values()))
    def stats(u):
        s = np.sort(xvecs[u] @ cmat.T)[::-1][:10]
        return s.mean(), s.std()
    for i, (_, u1, u2) in enumerate(trials):
        m1, s1 = stats(u1)
        m2, s2 = stats(u2)
        want = 0.5 * ((raw[i] - m1) / s1 + (raw[i] - m2) / s2)
        np.testing.assert_allclose(got[i], want, rtol=1e-5)


def test_eer_mindcf_separable():
    labels = [1] * 100 + [0] * 100
    scores = list(np.linspace(0.5, 1.0, 100)) + list(np.linspace(0.0, 0.45, 100))
    eer, _, min_dcf, _ = compute_eer_and_min_dcf(labels, scores)
    assert eer == 0.0 and min_dcf == 0.0


def test_eer_known_overlap():
    # symmetric overlap: score = label with noise; EER should be moderate
    rng = np.random.RandomState(0)
    labels = np.r_[np.ones(5000), np.zeros(5000)].astype(int)
    scores = np.r_[rng.randn(5000) + 1.0, rng.randn(5000) - 1.0]
    eer, thr, min_dcf, _ = compute_eer_and_min_dcf(labels, scores)
    # analytic EER for unit gaussians at +-1: Phi(-1) ~ 15.87%
    assert abs(eer - 0.1587) < 0.02
    assert abs(thr) < 0.15
    assert 0 < min_dcf <= 1

    eer_pct, mdcf = evaluate_trials(
        [(l, "a", "b") for l in labels], scores
    )
    np.testing.assert_allclose(eer_pct, eer * 100)
