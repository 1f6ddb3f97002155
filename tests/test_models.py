"""Model zoo: parameter-count parity with the reference README tables,
forward shapes, and masked-pooling equivalence for padded batched extraction."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from voxsrc2020_speaker_verification_tpu.models import get_model, MODEL_NAMES


def count_params(model, feat_dim, t=64):
    shapes = jax.eval_shape(
        lambda k, x: model.init(k, x, False),
        jax.random.PRNGKey(0), jnp.zeros((1, t, feat_dim)),
    )
    # Count params + BN moving stats: the reference README's "params" column
    # counts TF checkpoint variables, which include the (non-trainable)
    # moving mean/variance of every affine-free BN.
    return sum(np.prod(x.shape) for x in jax.tree.leaves(shapes))


# (model, feat_dim) -> params in millions, from the reference README tables
# (README.md:182-185 for 40-d tdnn/dpn; README.md:236-278 for 80-d res2nets).
EXPECTED_PARAMS_M = {
    ("tdnn", 40): 3.5,
    ("dpn68", 40): 13.9,
    ("res2net50_w24_s4_c64", 80): 32.2,
    ("res2net50_w24_s4_c32", 80): 17.7,
    ("res2net50_w8_s6_c16", 80): 4.8,
    ("res2net101_w24_s4_c32_att", 80): 29.3,
    # NOTE: the reference README lists 32.9M / 35.5M for res2net152/200, but
    # those numbers are inconsistent with the reference *code*
    # (res2net_model.py:270-280): 101->152 adds 4 stage-2 + 13 stage-3 blocks,
    # and one stage-3 block alone costs ~0.64M (split kernel 27*96^2 etc.), so
    # +3.6M is impossible.  The values below are the analytic counts derived
    # from the code (which our implementation reproduces for every config the
    # README counts consistently, incl. 101_att at 29.3M).
    ("res2net152_w24_s4_c32_att", 80): 38.31,
    ("res2net200_w24_s4_c32_att", 80): 40.90,
}


@pytest.mark.parametrize("name,feat_dim", list(EXPECTED_PARAMS_M))
def test_param_counts_match_reference(name, feat_dim):
    n = count_params(get_model(name), feat_dim)
    expected = EXPECTED_PARAMS_M[(name, feat_dim)]
    assert abs(n / 1e6 - expected) < 0.11, (name, n)


@pytest.mark.parametrize("name", ["tdnn", "res2net50_w8_s6_c16", "dpn68",
                                  "ecapa_tdnn_512"])
def test_forward_shape_and_finite(name):
    model = get_model(name)
    x = jax.random.normal(jax.random.PRNGKey(1), (2, 64, 40))
    variables = model.init(jax.random.PRNGKey(0), x, False)
    out = model.apply(variables, x, False)
    expected_dim = 192 if name in ("res2net50_w8_s6_c16", "ecapa_tdnn_512") else 256
    assert out.shape == (2, expected_dim)
    assert np.isfinite(np.asarray(out)).all()


@pytest.mark.parametrize("name", ["tdnn", "res2net50_w8_s6_c16", "dpn68",
                                  "ecapa_tdnn_512"])
def test_masked_padded_forward_matches_exact(name):
    """A zero-padded utterance with a validity mask must produce the same
    embedding as the exact-length utterance (replaces the reference's batch-1
    dynamic shapes, tf_extract.py:96-111).  BN running stats are perturbed to
    non-trivial values so BN(0) != 0 -- the hard case for pad masking."""
    model = get_model(name)
    t_valid, t_pad = 100, 128
    x = jax.random.normal(jax.random.PRNGKey(2), (1, t_valid, 40))
    variables = model.init(jax.random.PRNGKey(0), x, False)
    perturbed = jax.tree_util.tree_map_with_path(
        lambda path, v: v + 0.3 if "mean" in str(path[-1]) else v * 1.7,
        variables["batch_stats"],
    )
    variables = {"params": variables["params"], "batch_stats": perturbed}

    exact = model.apply(variables, x, False)

    padded = jnp.zeros((1, t_pad, 40)).at[:, :t_valid].set(x)
    mask = (jnp.arange(t_pad) < t_valid)[None, :].astype(jnp.float32)
    masked = model.apply(variables, padded, False, mask)

    np.testing.assert_allclose(np.asarray(exact), np.asarray(masked),
                               rtol=1e-4, atol=1e-4)


def test_strided_split_conv_grouped_matches_unrolled():
    """The stride-2 split stage is computed as ONE grouped conv (the reference
    unrolls s-1 independent convs, res2net_model.py:62-77); verify the grouped
    form reproduces the unrolled per-group math exactly."""
    from voxsrc2020_speaker_verification_tpu.models.res2net import Res2NetSplitConv
    from voxsrc2020_speaker_verification_tpu.ops import nn as ops

    s, w, k = 4, 6, 3
    mod = Res2NetSplitConv(split=s, width=w, strides=2)
    x = jax.random.normal(jax.random.PRNGKey(3), (2, 17, 9, s * w))
    variables = mod.init(jax.random.PRNGKey(0), x, False)
    got = mod.apply(variables, x, False)

    # Unrolled reference computation from the same params/stats.
    xp = ops.fixed_padding(x, k)
    kernel = variables["params"]["kernel"]
    outs = []
    for i in range(s - 1):
        y = jax.lax.conv_general_dilated(
            xp[..., i * w:(i + 1) * w], kernel[..., i * w:(i + 1) * w],
            window_strides=(2, 2), padding="VALID",
            dimension_numbers=jax.lax.conv_dimension_numbers(
                (2, 19, 11, w), (k, k, w, w), ("NHWC", "HWIO", "NHWC")),
        )
        stats = variables["batch_stats"][f"bn{i}"]["bn"]
        y = (y - stats["mean"]) * jax.lax.rsqrt(stats["var"] + ops.BN_EPSILON)
        outs.append(jax.nn.relu(y))
    outs.append(ops.avg_pool_3x3(xp[..., (s - 1) * w:], 2))
    expected = jnp.concatenate(outs, axis=3)

    assert got.shape == expected.shape
    np.testing.assert_allclose(np.asarray(got), np.asarray(expected),
                               rtol=1e-5, atol=1e-5)


def test_training_mode_updates_batch_stats():
    model = get_model("tdnn")
    x = jax.random.normal(jax.random.PRNGKey(1), (4, 32, 40))
    variables = model.init(jax.random.PRNGKey(0), x, True)
    out, mutated = model.apply(variables, x, True, mutable=["batch_stats"])
    assert out.shape == (4, 256)
    old = jax.tree.leaves(variables["batch_stats"])
    new = jax.tree.leaves(mutated["batch_stats"])
    assert any(not np.allclose(o, n) for o, n in zip(old, new))


def test_grouped_bn_matches_independent_half_batches():
    """bn_groups=2 training BN must equal two independent BNs over the batch
    halves (the reference's per-replica Horovod BN, models.py:62-73), and the
    running-stat update must be the across-group mean of the group moments."""
    from voxsrc2020_speaker_verification_tpu.ops import nn as ops

    x = jax.random.normal(jax.random.PRNGKey(0), (8, 12, 5, 7)) * 2.0 + 0.5
    bn = ops.BatchNorm(use_running_average=False)
    variables = bn.init(jax.random.PRNGKey(1), x)

    with ops.bn_groups(2):
        grouped, mutated = bn.apply(variables, x, mutable=["batch_stats"])

    halves, stats = [], []
    for part in (x[:4], x[4:]):
        y, m = bn.apply(variables, part, mutable=["batch_stats"])
        halves.append(np.asarray(y))
        stats.append(m["batch_stats"]["bn"])
    expected = np.concatenate(halves, axis=0)

    np.testing.assert_allclose(np.asarray(grouped), expected, rtol=2e-5, atol=2e-5)
    for key in ("mean", "var"):
        got = np.asarray(mutated["batch_stats"]["bn"][key])
        want = np.mean([np.asarray(s[key]) for s in stats], axis=0)
        np.testing.assert_allclose(got, want, rtol=2e-5, atol=2e-5)


def test_grouped_bn_inference_and_tree_unchanged():
    """bn_groups must not alter inference behavior or the variable tree."""
    from voxsrc2020_speaker_verification_tpu.ops import nn as ops

    x = jax.random.normal(jax.random.PRNGKey(2), (4, 6, 3, 5))
    bn = ops.BatchNorm(use_running_average=True)
    variables = bn.init(jax.random.PRNGKey(1), x)
    base = bn.apply(variables, x)
    with ops.bn_groups(4):
        grouped = bn.apply(variables, x)
        tree = jax.eval_shape(
            lambda k: ops.BatchNorm(use_running_average=False).init(k, x),
            jax.random.PRNGKey(1))
    np.testing.assert_allclose(np.asarray(base), np.asarray(grouped))
    assert jax.tree_util.tree_structure(tree) == jax.tree_util.tree_structure(variables)
    for a, b in zip(jax.tree.leaves(tree), jax.tree.leaves(variables)):
        assert a.shape == b.shape


def test_remat_and_policy_preserve_forward():
    """remat / remat_policy change memory scheduling, never values."""
    from voxsrc2020_speaker_verification_tpu.models import get_model as gm

    x = jax.random.normal(jax.random.PRNGKey(1), (2, 32, 40))
    base = gm("res2net50_w8_s6_c16")
    variables = base.init(jax.random.PRNGKey(0), x, False)
    want = base.apply(variables, x, False)
    for kwargs in ({"remat": True},
                   {"remat": True, "remat_policy": "dots_saveable"},
                   {"remat": True, "remat_stages": (0, 1)},
                   {"remat": True, "remat_stages": (0, 1, 2),
                    "remat_keep_blocks": ((2, 2), (2, 3))}):
        got = gm("res2net50_w8_s6_c16", **kwargs).apply(variables, x, False)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   rtol=1e-6, atol=1e-6)


def test_dpn_remat_preserves_forward():
    """dpn68 remat (round-5: required for its f600 LMFT leg on 16 GB HBM)
    changes memory scheduling, never values — same contract as res2net."""
    from voxsrc2020_speaker_verification_tpu.models import get_model as gm

    x = jax.random.normal(jax.random.PRNGKey(1), (2, 32, 40))
    base = gm("dpn68")
    variables = base.init(jax.random.PRNGKey(0), x, False)
    want = base.apply(variables, x, False)
    for kwargs in ({"remat": True},
                   {"remat": True, "remat_stages": (0, 1, 2)},
                   {"remat": True, "remat_stages": (0, 1, 2),
                    "remat_keep_blocks": ((2, 2), (2, 3))}):
        got = gm("dpn68", **kwargs).apply(variables, x, False)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   rtol=1e-6, atol=1e-6)


def test_all_models_buildable():
    for name in MODEL_NAMES:
        m = get_model(name)
        shapes = jax.eval_shape(
            lambda k, x, m=m: m.init(k, x, False),
            jax.random.PRNGKey(0), jnp.zeros((1, 32, 80)),
        )
        assert "params" in shapes
