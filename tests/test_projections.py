"""Margin projection heads: margin math vs closed-form expectations."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from voxsrc2020_speaker_verification_tpu.losses import (
    MarginProjection, PROJECTION_NAMES, cohort_weights,
)

B, D, C = 8, 16, 32


@pytest.fixture(scope="module")
def data():
    k1, k2 = jax.random.split(jax.random.PRNGKey(0))
    emb = jax.random.normal(k1, (B, D))
    labels = jax.random.randint(k2, (B,), 0, C)
    return emb, labels


def init_and_apply(kind, emb, labels, scale=32.0, margin=0.2, **kw):
    proj = MarginProjection(num_classes=C, kind=kind, **kw)
    variables = proj.init(jax.random.PRNGKey(1), emb, labels, scale, margin)
    logits = proj.apply(variables, emb, labels, scale, margin)
    return np.asarray(logits), variables


@pytest.mark.parametrize("kind", PROJECTION_NAMES)
def test_shapes_and_finite(kind, data):
    emb, labels = data
    logits, variables = init_and_apply(kind, emb, labels)
    assert logits.shape == (B, C)
    assert np.isfinite(logits).all()
    kshape = variables["params"]["kernel"].shape
    assert kshape == ((2, D, C) if kind.startswith("sc_") else (D, C))


def test_zero_margin_reduces_to_scaled_cosine(data):
    emb, labels = data
    am, _ = init_and_apply("am_linear", emb, labels, margin=0.0)
    cm, _ = init_and_apply("cm_linear", emb, labels, margin=0.0)
    aam, _ = init_and_apply("aam_linear", emb, labels, margin=0.0)
    v2020, _ = init_and_apply("cm_linear_voxsrc2020", emb, labels, margin=0.0)
    np.testing.assert_allclose(am, cm, atol=1e-5)
    np.testing.assert_allclose(am, aam, atol=1e-5)
    np.testing.assert_allclose(am, v2020, atol=1e-5)
    assert np.abs(am).max() <= 32.0 + 1e-4


def test_am_linear_margin_on_target_only(data):
    emb, labels = data
    base, _ = init_and_apply("am_linear", emb, labels, margin=0.0)
    with_m, _ = init_and_apply("am_linear", emb, labels, margin=0.3)
    diff = (base - with_m) / 32.0
    onehot = np.eye(C)[np.asarray(labels)]
    np.testing.assert_allclose(diff, 0.3 * onehot, atol=1e-5)


def test_cm_margin_math(data):
    """cm: target logit = cos(theta + m) - 0.5 m^2, others untouched."""
    emb, labels = data
    m = 0.25
    base, _ = init_and_apply("cm_linear", emb, labels, margin=0.0)
    got, _ = init_and_apply("cm_linear", emb, labels, margin=m)
    cos = base / 32.0
    onehot = np.eye(C)[np.asarray(labels)].astype(bool)
    theta = np.arccos(np.clip(cos[onehot], -1, 1))
    want_target = np.cos(theta + m) - 0.5 * m * m
    np.testing.assert_allclose(got[onehot] / 32.0, want_target, atol=1e-5)
    np.testing.assert_allclose(got[~onehot], base[~onehot], atol=1e-5)


def test_voxsrc2020_uses_linear_stabilizer(data):
    emb, labels = data
    m = 0.25
    cm, _ = init_and_apply("cm_linear", emb, labels, margin=m)
    v, _ = init_and_apply("cm_linear_voxsrc2020", emb, labels, margin=m)
    onehot = np.eye(C)[np.asarray(labels)].astype(bool)
    np.testing.assert_allclose(
        (cm[onehot] - v[onehot]) / 32.0, np.full(B, m / 2 - 0.5 * m * m), atol=1e-5
    )


def test_sub_center_max_over_centers(data):
    """sc variant must equal manual max over per-center cosine scores."""
    emb, labels = data
    logits, variables = init_and_apply("sc_cm_linear", emb, labels, margin=0.0)
    kernel = np.asarray(variables["params"]["kernel"])  # (2, D, C)
    emb_n = np.asarray(emb) / np.maximum(
        np.linalg.norm(emb, axis=1, keepdims=True), 1e-12
    )
    kn = kernel / np.maximum(
        np.sqrt(np.maximum((kernel ** 2).sum(1, keepdims=True), 1e-5)), 1e-12
    )
    cos = np.max(np.einsum("bd,kdc->kbc", emb_n, kn), axis=0)
    np.testing.assert_allclose(logits / 32.0, np.clip(cos, -1, 1), atol=1e-4)


def test_gradients_flow(data):
    emb, labels = data
    proj = MarginProjection(num_classes=C, kind="sc_cm_linear")
    variables = proj.init(jax.random.PRNGKey(1), emb, labels, 32.0, 0.2)

    def loss_fn(params, e):
        logits = proj.apply({"params": params}, e, labels, 32.0, 0.2)
        return jnp.mean(
            -jax.nn.log_softmax(logits)[jnp.arange(B), labels]
        )

    g_params, g_emb = jax.grad(loss_fn, argnums=(0, 1))(variables["params"], emb)
    assert np.isfinite(np.asarray(g_params["kernel"])).all()
    assert np.abs(np.asarray(g_emb)).max() > 0


def test_cohort_weights_shape():
    kernel = jax.random.normal(jax.random.PRNGKey(0), (2, D, C))
    w = np.asarray(cohort_weights(kernel))
    assert w.shape == (2 * C, D)
    np.testing.assert_allclose(np.linalg.norm(w, axis=1), 1.0, rtol=1e-5)
