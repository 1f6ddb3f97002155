"""Projection-head parity against the REFERENCE tf_projection.py run as an
oracle (ref tf_projection.py:21-246): all nine heads, three margins each
(including margin 0, the schedule's starting value), on identical embeddings,
labels and kernels."""

import os
import subprocess
import sys

import numpy as np
import pytest

import jax.numpy as jnp

from voxsrc2020_speaker_verification_tpu.losses import (
    MarginProjection, PROJECTION_NAMES,
)

REFERENCE = "/root/reference/tensorflow/tf_projection.py"
ORACLE = os.path.join(os.path.dirname(__file__), "ref_projection_oracle.py")
MARGINS = (0.0, 0.2, 0.4)

pytestmark = pytest.mark.skipif(
    not os.path.isfile(REFERENCE), reason="reference repo not mounted")


@pytest.fixture(scope="module")
def oracle(tmp_path_factory):
    pytest.importorskip("tensorflow")
    out = tmp_path_factory.mktemp("proj") / "projections.npz"
    env = dict(os.environ, TF_USE_LEGACY_KERAS="1",
               CUDA_VISIBLE_DEVICES="", JAX_PLATFORMS="cpu")
    res = subprocess.run(
        [sys.executable, ORACLE, str(out)],
        capture_output=True, text=True, env=env, timeout=600,
    )
    if res.returncode != 0:
        pytest.fail(  # TF imported fine: crash = regression (ADVICE r4)
            f"reference oracle crashed (rc={res.returncode}): {res.stderr[-500:]}")
    return np.load(out)


@pytest.mark.parametrize("margin", MARGINS)
@pytest.mark.parametrize("kind", PROJECTION_NAMES)
def test_projection_matches_reference(oracle, kind, margin):
    emb = jnp.asarray(oracle["__emb__"])
    labels = jnp.asarray(oracle["__labels__"])
    kernel = oracle[f"{kind}_m{margin}_kernel"]
    golden = oracle[f"{kind}_m{margin}_logits"]

    proj = MarginProjection(num_classes=golden.shape[1], kind=kind)
    ours = proj.apply(
        {"params": {"kernel": jnp.asarray(kernel)}},
        emb, labels, 32.0, margin)
    np.testing.assert_allclose(np.asarray(ours), golden, rtol=2e-5, atol=2e-5)
