"""Model-axis sharding correctness: the sub-center margin softmax with the
classifier kernel sharded over the `model` mesh axis must produce the same
loss and parameter updates as the unsharded computation (SURVEY.md hard
part #3).  Also covers MetricsWriter persistence."""

import dataclasses

import jax
import numpy as np

from voxsrc2020_speaker_verification_tpu.parallel import make_mesh, param_shardings, batch_spec
from voxsrc2020_speaker_verification_tpu.training import (
    TrainConfig, create_train_state, make_train_step,
)
from jax.sharding import NamedSharding


BASE = TrainConfig(
    model="tdnn", projection="sc_cm_linear", num_classes=16, num_centers=2,
    dataset_length=128, feat_dim=40, feat_length=24,
    batch_size=4, num_accumulation_steps=2, total_epochs=23,
    bf16=False, exp_root="",
)


def _run_one_step(num_model: int, base=BASE, n_devices: int = 4):
    config = dataclasses.replace(base, num_model_shards=num_model)
    num_data = n_devices // num_model
    mesh = make_mesh(num_data=num_data, num_model=num_model,
                     devices=jax.devices()[:n_devices])
    state = create_train_state(config, jax.random.PRNGKey(0))
    shardings = param_shardings(mesh, jax.eval_shape(lambda: state))
    state = jax.device_put(state, shardings)
    data_sharding = NamedSharding(mesh, batch_spec())
    step = jax.jit(
        make_train_step(config),
        in_shardings=(shardings, data_sharding, data_sharding, None),
        out_shardings=(shardings, None),
    )
    rng = np.random.RandomState(0)
    a, b = config.num_accumulation_steps, config.batch_size
    feats = rng.randn(a, b, config.feat_length, config.feat_dim).astype(
        np.float32)
    labels = rng.randint(0, config.num_classes, (a, b)).astype(np.int32)
    new_state, metrics = step(state, feats, labels, jax.random.PRNGKey(1))
    return jax.device_get(new_state), {k: float(v) for k, v in metrics.items()}


class TestShardedClassifierParity:
    def test_model2_matches_model1(self):
        s1, m1 = _run_one_step(1)
        s2, m2 = _run_one_step(2)
        for k in ("loss", "classification_loss", "accuracy", "gradient_norm"):
            np.testing.assert_allclose(m1[k], m2[k], rtol=2e-4, atol=1e-5)
        # the sharded projection kernel receives the same update
        k1 = np.asarray(s1.params["projection"]["kernel"])
        k2 = np.asarray(s2.params["projection"]["kernel"])
        np.testing.assert_allclose(k1, k2, rtol=2e-4, atol=1e-5)
        trunk1 = jax.tree.leaves(s1.params["encoder"])[0]
        trunk2 = jax.tree.leaves(s2.params["encoder"])[0]
        np.testing.assert_allclose(np.asarray(trunk1), np.asarray(trunk2),
                                   rtol=2e-4, atol=1e-5)

    def test_model4_att_pool_matches_model1(self):
        """Round 5 (VERDICT r4 weak #5): the sub-center sharded softmax at
        FOUR class shards plus the att-stats head under the model axis --
        the 4-way psum over local sub-center maxima and 4-way class-offset
        argmax are untestable at 2 shards."""
        from voxsrc2020_speaker_verification_tpu.models import (
            register_res2net_variant,
        )

        name = register_res2net_variant(
            "res2net_shard_att", num_filters=(8, 16, 32, 64),
            width=(4, 8, 16, 32), split=4, block_sizes=(1, 1, 1, 1),
            block_strides=(1, 2, 2, 2), output_dim=64, pool="att_stats")
        base = dataclasses.replace(
            BASE, model=name, feat_dim=40, feat_length=32, batch_size=4,
            num_accumulation_steps=2)
        s1, m1 = _run_one_step(1, base=base, n_devices=1)  # unsharded ref
        s4, m4 = _run_one_step(4, base=base, n_devices=8)  # (2 data x 4 model)
        for k in ("loss", "classification_loss", "accuracy", "gradient_norm"):
            np.testing.assert_allclose(m1[k], m4[k], rtol=2e-4, atol=1e-5)
        k1 = np.asarray(s1.params["projection"]["kernel"])
        k4 = np.asarray(s4.params["projection"]["kernel"])
        np.testing.assert_allclose(k1, k4, rtol=2e-4, atol=1e-5)
        # the att-pool head params update identically under the model axis
        h1, h4 = s1.params["encoder"], s4.params["encoder"]
        for l1, l4 in zip(jax.tree.leaves(h1["head"]),
                          jax.tree.leaves(h4["head"])):
            np.testing.assert_allclose(np.asarray(l1), np.asarray(l4),
                                       rtol=2e-4, atol=1e-5)


class TestGroupedConvGspmdSafe:
    """ops.grouped_conv: the custom-vjp workaround for XLA's SPMD
    partitioner mis-reducing feature-grouped conv KERNEL gradients over
    mesh axes the op does not use (PERF.md round 5).  Checks the op
    directly: forward + both gradients equal the unrolled per-group
    reference, on one device AND on a (2 data x 2 model) mesh with the
    kernel replicated -- the configuration where the native op's dk comes
    back exactly num_model x too large."""

    def _data(self, groups=3, ci=4, co=5):
        rng = np.random.RandomState(0)
        x = rng.randn(4, 8, 8, groups * ci).astype(np.float32)
        k = rng.randn(3, 3, ci, groups * co).astype(np.float32)
        return x, k, groups, ci, co

    @staticmethod
    def _loss_ref(x, k, groups, strides=(2, 2)):
        """Unrolled per-group convs -- the trivially correct formulation."""
        import jax.numpy as jnp
        from voxsrc2020_speaker_verification_tpu.ops.nn import _nhwc_dn
        ci = x.shape[-1] // groups
        co = k.shape[-1] // groups
        outs = []
        for g in range(groups):
            xg = x[..., g * ci:(g + 1) * ci]
            kg = k[..., g * co:(g + 1) * co]
            outs.append(jax.lax.conv_general_dilated(
                xg, kg, strides, "VALID",
                dimension_numbers=_nhwc_dn(xg.shape, kg.shape)))
        return jnp.sum(jnp.concatenate(outs, -1) ** 2)

    @staticmethod
    def _loss_ours(x, k, groups, strides=(2, 2)):
        import jax.numpy as jnp
        from voxsrc2020_speaker_verification_tpu.ops.nn import grouped_conv
        return jnp.sum(grouped_conv(x, k, strides, "VALID", (1, 1),
                                    groups) ** 2)

    def test_matches_unrolled_single_device(self):
        x, k, groups, _, _ = self._data()
        ref = jax.jit(jax.value_and_grad(self._loss_ref, argnums=(0, 1)),
                      static_argnums=2)(x, k, groups)
        got = jax.jit(jax.value_and_grad(self._loss_ours, argnums=(0, 1)),
                      static_argnums=2)(x, k, groups)
        np.testing.assert_allclose(got[0], ref[0], rtol=1e-5)
        for a, b in zip(got[1], ref[1]):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       rtol=1e-4, atol=1e-4)

    def test_kernel_grad_exact_under_unused_mesh_axis(self):
        from jax.sharding import NamedSharding, PartitionSpec as P

        x, k, groups, _, _ = self._data()
        gold = jax.jit(jax.grad(self._loss_ours, argnums=1),
                       static_argnums=2)(x, k, groups)
        mesh = make_mesh(num_data=2, num_model=2, devices=jax.devices()[:4])
        ds = NamedSharding(mesh, P("data"))
        rs = NamedSharding(mesh, P())
        got = jax.jit(jax.grad(self._loss_ours, argnums=1),
                      static_argnums=2, in_shardings=(ds, rs))(
            jax.device_put(x, ds), jax.device_put(k, rs), groups)
        # the native fgc op returns exactly 2x here; ours must be exact
        np.testing.assert_allclose(np.asarray(got), np.asarray(gold),
                                   rtol=1e-4, atol=1e-4)


class TestMetricsWriter:
    def test_roundtrip(self, tmp_path):
        from voxsrc2020_speaker_verification_tpu.utils.observability import (
            MetricsWriter, load_metrics,
        )
        w = MetricsWriter(str(tmp_path))
        w.write(10, {"loss": 1.5, "accuracy": 0.5}, audio_s_per_s=1000.0)
        w.write(20, {"loss": 1.2, "accuracy": 0.6}, audio_s_per_s=1100.0)
        w.close()
        recs = load_metrics(str(tmp_path))
        assert [r["step"] for r in recs] == [10, 20]
        assert recs[1]["loss"] == 1.2 and recs[1]["audio_s_per_s"] == 1100.0
