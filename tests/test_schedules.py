"""LR / margin schedules: piecewise values at the reference recipe's
boundaries (EPOCH_SIZE*{3,13,23}, ref tf_train_tdnn.py:198-201)."""

import numpy as np

from voxsrc2020_speaker_verification_tpu.losses.schedules import (
    warmup_constant_exponential_decay,
    warmup_constant_cosine_decay,
    zero_linear_constant,
    total_margin,
    base_learning_rate,
)

E = 1000  # epoch size
BOUNDS = [3 * E, 13 * E, 23 * E]
LR = 0.64


def lr_at(s):
    return float(warmup_constant_exponential_decay(LR, np.int32(s), BOUNDS, E))


def test_warmup_linear():
    assert lr_at(0) == 0.0
    np.testing.assert_allclose(lr_at(1500), LR * 0.5)
    np.testing.assert_allclose(lr_at(3000), LR)


def test_constant_phase():
    np.testing.assert_allclose(lr_at(3001), LR)
    np.testing.assert_allclose(lr_at(13000), LR)


def test_staircase_decay():
    # (b1, b2]: lr * 0.5^ceil((s - b1)/E)
    np.testing.assert_allclose(lr_at(13001), LR * 0.5)
    np.testing.assert_allclose(lr_at(14000), LR * 0.5)
    np.testing.assert_allclose(lr_at(14001), LR * 0.25)
    np.testing.assert_allclose(lr_at(23000), LR * 0.5 ** 10)


def test_finetune_tail_is_lr_over_128():
    np.testing.assert_allclose(lr_at(23001), LR / 128)
    np.testing.assert_allclose(lr_at(10**6), LR / 128)


def test_cosine_variant_edges():
    f = lambda s: float(warmup_constant_cosine_decay(LR, np.int32(s), BOUNDS))
    np.testing.assert_allclose(f(3000), LR)
    np.testing.assert_allclose(f(18000), LR * 0.5, rtol=1e-5)
    np.testing.assert_allclose(f(23001), LR / 128)


def test_margin_schedule():
    m = lambda s: float(
        zero_linear_constant(0.2, np.int32(s), [3 * E, 13 * E], E)
    )
    assert m(0) == 0.0
    assert m(3000) == 0.0
    # staircase-linear: ceil((s-b0)/E) * E / (b1-b0) * margin
    np.testing.assert_allclose(m(3001), 0.2 * 1 / 10)
    np.testing.assert_allclose(m(4000), 0.2 * 1 / 10)
    np.testing.assert_allclose(m(4001), 0.2 * 2 / 10)
    np.testing.assert_allclose(m(13000), 0.2)
    np.testing.assert_allclose(m(20000), 0.2)


def test_total_margin():
    np.testing.assert_allclose(float(total_margin("sc_cm_linear", np.float32(0.2))),
                               0.2 + 0.5 * 0.04)
    np.testing.assert_allclose(float(total_margin("cm_linear_voxsrc2020", np.float32(0.2))),
                               0.2 + 0.1)
    np.testing.assert_allclose(float(total_margin("am_linear", np.float32(0.2))), 0.2)


def test_base_learning_rate_matches_reference():
    # 8 GPUs x bs 32 x accum 4 -> 0.08/128*1024 = 0.64 (ref tf_train_tdnn.py:198)
    np.testing.assert_allclose(base_learning_rate(8 * 32 * 4), 0.64)
