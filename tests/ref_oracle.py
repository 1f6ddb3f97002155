"""Run the REFERENCE model code as an oracle (subprocess helper).

Builds a reference model from /root/reference/tensorflow/models under TF2's
v1-compat mode, randomizes the BN moving statistics (so inference BN is
non-trivial), runs a forward pass on a fixed input, and dumps all variables
plus the golden embedding to an .npz.

Run in a subprocess: it rebinds sys.modules["tensorflow"] to compat.v1 (the
reference uses TF1 module-level APIs) and needs TF_USE_LEGACY_KERAS=1.

Usage: python ref_oracle.py <model_name> <feat_dim> <out.npz>
"""

import sys
import types

import numpy as np


def main() -> None:
    model_name, feat_dim, out_path = sys.argv[1], int(sys.argv[2]), sys.argv[3]

    # The reference imports horovod at module scope but never uses it at
    # graph-build time (ref models.py:17) -- stub it out.
    sys.modules.setdefault("horovod", types.ModuleType("horovod"))
    sys.modules.setdefault("horovod.tensorflow", types.ModuleType("horovod.tensorflow"))

    import tensorflow.compat.v1 as tf
    tf.disable_v2_behavior()
    sys.modules["tensorflow"] = tf  # reference code expects TF1 at module level
    sys.path.insert(0, "/root/reference/tensorflow")

    if model_name == "tdnn":
        from models import tdnn_model
        model = tdnn_model.tdnn
        # ref layout for 1-D conv models: (B, T, 1, F) (tf_train_tdnn.py:189,
        # expansion_dim=2)
        x = tf.placeholder(tf.float32, [None, None, 1, feat_dim])
        feats = np.random.RandomState(7).randn(3, 50, 1, feat_dim)
    elif model_name.startswith("dpn"):
        from models import dpn_model
        model = getattr(dpn_model, model_name)
        x = tf.placeholder(tf.float32, [None, None, feat_dim, 1])
        feats = np.random.RandomState(7).randn(3, 50, feat_dim, 1)
    else:
        from models import res2net_model
        model = getattr(res2net_model, model_name)
        # ref layout for 2-D conv models: (B, T, F, 1) (expansion_dim=3)
        x = tf.placeholder(tf.float32, [None, None, feat_dim, 1])
        feats = np.random.RandomState(7).randn(3, 50, feat_dim, 1)
    feats = feats.astype(np.float32)

    tf.set_random_seed(0)
    out = model(x, training=False)

    rng = np.random.RandomState(1)
    with tf.Session() as sess:
        sess.run(tf.global_variables_initializer())
        # Randomize BN moving stats: with the all-zero/all-one init the BN
        # layers would be identities and the parity test would not cover them.
        assigns = []
        for v in tf.global_variables():
            if "moving_mean" in v.name:
                assigns.append(v.assign(rng.randn(*v.shape.as_list()) * 0.1))
            elif "moving_variance" in v.name:
                assigns.append(v.assign(
                    0.5 + np.abs(rng.randn(*v.shape.as_list()))))
        sess.run(assigns)

        values = {v.name: sess.run(v) for v in tf.global_variables()}
        emb = sess.run(out, {x: feats})

    np.savez(out_path, __emb__=emb, __feats__=feats, **values)


if __name__ == "__main__":
    main()
