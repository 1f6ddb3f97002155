"""Run the REFERENCE projection heads as an oracle (subprocess helper).

Builds every tf_projection.py head (/root/reference/tensorflow/tf_projection.py
:21-246) under TF2's v1-compat mode on fixed embeddings/labels, captures the
orthogonally-initialized kernel actually used, and dumps kernels + logits per
(kind, margin) to an .npz for tests/test_projection_oracle.py.

Usage: python ref_projection_oracle.py <out.npz>
"""

import sys
import types

import numpy as np

KINDS = (
    "linear", "am_linear", "aam_linear", "cm_linear", "cm_linear_voxsrc2020",
    "hcm_linear", "sc_cm_linear", "sc_am_linear", "qm_linear",
)
MARGINS = (0.0, 0.2, 0.4)


def main() -> None:
    out_path = sys.argv[1]

    sys.modules.setdefault("horovod", types.ModuleType("horovod"))
    sys.modules.setdefault(
        "horovod.tensorflow", types.ModuleType("horovod.tensorflow"))

    import tensorflow.compat.v1 as tf
    tf.disable_v2_behavior()
    sys.modules["tensorflow"] = tf
    sys.path.insert(0, "/root/reference/tensorflow")

    import tf_projection

    rng = np.random.RandomState(7)
    batch, emb_dim, num_classes = 8, 32, 11
    emb = rng.randn(batch, emb_dim).astype(np.float32)
    labels = rng.randint(0, num_classes, size=(batch,)).astype(np.int32)

    dump = {"__emb__": emb, "__labels__": labels}
    tf.set_random_seed(0)
    x = tf.placeholder(tf.float32, [batch, emb_dim])
    y = tf.placeholder(tf.int32, [batch])

    outs = {}
    for kind in KINDS:
        fn = getattr(tf_projection, kind)
        for margin in MARGINS:
            # hcm_linear's margin is a (rotation, additive) tuple in the
            # reference signature (tf_projection.py:135); others are scalars.
            m = (margin, 0.1) if kind == "hcm_linear" else margin
            with tf.variable_scope(f"{kind}_m{margin}"):
                outs[(kind, margin)] = fn(
                    x, y, num_classes, scale=32.0, margin=m, name=kind)

    with tf.Session() as sess:
        sess.run(tf.global_variables_initializer())
        for (kind, margin), logits_t in outs.items():
            scope = f"{kind}_m{margin}/{kind}"
            kernel = [v for v in tf.global_variables()
                      if v.name.startswith(scope + "/")][0]
            dump[f"{kind}_m{margin}_kernel"] = sess.run(kernel)
            dump[f"{kind}_m{margin}_logits"] = sess.run(
                logits_t, {x: emb, y: labels})

    np.savez(out_path, **dump)


if __name__ == "__main__":
    main()
