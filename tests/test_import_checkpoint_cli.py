"""cli.import_checkpoint: migrate a reference checkpoint snapshot into an
orbax experiment dir that the training loop can resume from.

Uses the --npz side door (oracle-dump format, {tf_var_name: array}) so no
TensorFlow is needed: a fresh framework state is exported to TF names via
the *inverse* of utils/tf_import's variable map, round-tripped through the
CLI, restored, and compared tree-exactly -- including momentum slots and
the global step the LMFT resume trick keys schedules off."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from voxsrc2020_speaker_verification_tpu.cli import import_checkpoint
from voxsrc2020_speaker_verification_tpu.training import (
    TrainConfig, create_train_state,
)
from voxsrc2020_speaker_verification_tpu.training.checkpoint import (
    CheckpointManager,
)
from voxsrc2020_speaker_verification_tpu.utils.tf_import import (
    reference_var_map,
)

MODEL = "res2net50_w8_s6_c16"
STEP = 4321


def _get(tree, path):
    for p in path:
        tree = tree[p]
    return np.asarray(tree)


@pytest.fixture(scope="module")
def snapshot_and_state(tmp_path_factory):
    cfg = TrainConfig(
        model=MODEL, projection="sc_cm_linear", num_classes=11,
        num_centers=2, dataset_length=64, feat_dim=40, feat_length=32,
        batch_size=4, num_accumulation_steps=1, bf16=False, exp_root="")
    state = create_train_state(cfg, jax.random.PRNGKey(7))
    rngs = jax.random.split(jax.random.PRNGKey(8), 2)
    # non-trivial momentum + step so the round trip is observable
    momentum = jax.tree.map(
        lambda p: np.random.RandomState(3).randn(*np.shape(p)).astype(
            np.float32), state.params)
    snap = {}
    for tf_name, (col, path) in reference_var_map(MODEL).items():
        tree = state.params if col == "params" else state.batch_stats
        snap[tf_name + ":0"] = _get(tree, ("encoder",) + path)
        if col == "params":
            snap[tf_name + "/Momentum:0"] = _get(
                momentum, ("encoder",) + path)
    snap["sc_cm_linear/kernel:0"] = _get(state.params,
                                         ("projection", "kernel"))
    snap["sc_cm_linear/kernel/Momentum:0"] = _get(
        momentum, ("projection", "kernel"))
    snap["global_step:0"] = np.asarray(STEP, np.int64)
    d = tmp_path_factory.mktemp("import_cli")
    npz = d / "ref_snapshot.npz"
    np.savez(str(npz), **snap)
    return cfg, state, momentum, str(npz), d


def test_cli_roundtrip(snapshot_and_state):
    cfg, state, momentum, npz, d = snapshot_and_state
    exp = str(d / "exp")
    import_checkpoint.main([
        "--npz", npz, "--model", MODEL, "--projection", "sc_cm_linear",
        "--num-classes", "11", "--exp-dir", exp,
    ])

    # the dir is self-describing: config.json for cli.export/evaluate
    import json
    import os
    with open(os.path.join(exp, "config.json")) as f:
        written = json.load(f)
    assert written["model"] == MODEL
    assert written["num_classes"] == 11

    target = create_train_state(cfg, jax.random.PRNGKey(0))
    mgr = CheckpointManager(exp)
    assert mgr.latest_step() == STEP  # from the checkpoint's global_step
    restored = mgr.restore(target)
    mgr.close()
    assert int(restored.step) == STEP

    for (pa, a), (pb, b) in zip(
            jax.tree_util.tree_leaves_with_path(restored.params),
            jax.tree_util.tree_leaves_with_path(state.params)):
        assert pa == pb
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b),
                                      err_msg=jax.tree_util.keystr(pa))
    for (pa, a), (pb, b) in zip(
            jax.tree_util.tree_leaves_with_path(restored.momentum),
            jax.tree_util.tree_leaves_with_path(momentum)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b),
                                      err_msg=jax.tree_util.keystr(pa))
    for (pa, a), (pb, b) in zip(
            jax.tree_util.tree_leaves_with_path(restored.batch_stats),
            jax.tree_util.tree_leaves_with_path(state.batch_stats)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b),
                                      err_msg=jax.tree_util.keystr(pa))


def test_migrated_dir_exports_and_extracts(snapshot_and_state, tmp_path):
    """The migration story end to end: imported dir -> cli.export artifact
    -> embeddings from the artifact equal embeddings from the live state
    (what a user does with a released reference checkpoint)."""
    import os

    from voxsrc2020_speaker_verification_tpu.cli import export as export_cli
    from voxsrc2020_speaker_verification_tpu.eval.export import (
        load_inference_artifact,
    )
    from voxsrc2020_speaker_verification_tpu.training import make_embed_fn

    cfg, state, _momentum, npz, _d = snapshot_and_state
    exp = str(tmp_path / "exp")
    import_checkpoint.main([
        "--npz", npz, "--model", MODEL, "--projection", "sc_cm_linear",
        "--num-classes", "11", "--exp-dir", exp, "--feat-dim", "40",
    ])
    export_cli.main(["--exp-dir", exp])
    art = os.path.join(exp, "artifact")
    assert os.path.isdir(art)

    _art_cfg, embed_fn = load_inference_artifact(art)
    feats = np.random.RandomState(5).randn(2, 64, 40).astype(np.float32)
    got = np.asarray(embed_fn(feats, None))
    ref_embed = jax.jit(make_embed_fn(cfg))
    want = np.asarray(ref_embed(state.params, state.batch_stats,
                                jnp.asarray(feats), None))
    # the artifact infers in bf16 (its config default); the live reference
    # state here is fp32 -- agreement at bf16 rounding + cosine identity
    np.testing.assert_allclose(got, want, rtol=0.06, atol=0.06)
    for g, w in zip(got, want):
        cos = float(g @ w / (np.linalg.norm(g) * np.linalg.norm(w)))
        assert cos > 0.9995, cos


def test_cli_without_momentum_defaults_to_zero(snapshot_and_state, tmp_path):
    cfg, state, _momentum, npz, _d = snapshot_and_state
    data = np.load(npz)
    thin = {k: data[k] for k in data.files if "/Momentum" not in k}
    thin_npz = tmp_path / "thin.npz"
    np.savez(str(thin_npz), **thin)
    exp = str(tmp_path / "exp")
    import_checkpoint.main([
        "--npz", str(thin_npz), "--model", MODEL, "--exp-dir", exp,
        "--step", "0",
    ])
    mgr = CheckpointManager(exp)
    restored = mgr.restore(create_train_state(cfg, jax.random.PRNGKey(0)))
    mgr.close()
    assert int(restored.step) == 0
    assert all(float(jnp.abs(m).max()) == 0.0
               for m in jax.tree.leaves(restored.momentum))
