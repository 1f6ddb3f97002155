"""Run the REFERENCE trainer graph as an oracle (subprocess helper).

Rebuilds the reference's training graph exactly as tf_train_tdnn.py:194-317
wires it -- reference model (models/tdnn_model.py) + reference projection
(tf_projection.py) + reference schedules (tf_scheduler.py), CE + collected
reg losses (:216-219), grads of loss/A (:225), fp32 accumulation variables
with the reset/add local-step dance (:229-247), global-norm clip 1.0 and
MomentumOptimizer(0.9) apply every A-th microbatch (:253-254,203) -- at world
size 1 (hvd allreduce is the identity, AMP off), runs N optimizer steps of
fixed synthetic batches on CPU, and dumps:

  * initial variables (for tf_import into our TrainState),
  * per-microbatch global_step / CE / reg / accuracy / LR / total margin,
  * final variables incl. Momentum slots and BN moving stats.

The step count crosses the LR warmup boundary (3 epochs) and two margin
staircase increments, so schedule wiring is exercised, not just one regime.

Works for every model family -- the reference trains them all through this
one trainer (run_*.sh all pass tf_train_tdnn.py as py_main): tdnn feeds
(B, T, 1, F) [expansion_dim 2], res2net/dpn feed (B, T, F, 1)
[expansion_dim 3] (ref tf_train_tdnn.py:189-195, run scripts arg 24).

Usage: python ref_trainer_oracle.py <out.npz> [model_name] [num_steps]
           [seed] [full|damped]

num_steps / seed / LR mode extend the 10-step parity harness to the
long-horizon statistical-equivalence runs (tests/test_trainer_envelope.py):
~50 optimizer steps at the FULL recipe LR, across several init seeds, give
the reference's own seed-to-seed trajectory envelope that the framework's
trajectory must land inside.
"""

import sys
import types

import numpy as np

# Geometry chosen so 10 optimizer steps cross schedule boundaries:
# EPOCH_SIZE=2 -> warmup ends at step 6, margin grows from step 6 in
# per-epoch staircase increments (boundaries [6, 26]).
FEAT_DIM, BATCH, ACCUM = 40, 4, 2
NUM_CLASSES, SCALE, MARGIN = 11, 32.0, 0.2
DATASET_LENGTH = 16            # EPOCH_SIZE = 16 // 4 // 2 = 2
NUM_STEPS = 10                 # optimizer steps (x ACCUM microbatches)
PROJECTION = "sc_cm_linear"
# crop length per model: 2-D CNNs use a shorter crop to keep the TF-CPU
# oracle fast; 32 frames still survive the three stride-2 stages
MODEL_T = {"tdnn": 50}
DEFAULT_T = 32
# Base LR per model.  The deep 2-D CNNs are chaotic at the recipe LR with
# batch 4: a 1-ulp param perturbation moves the step-0 CE by ~2e-4
# (measured), and 10 full-LR steps amplify backend reorder noise to O(1) --
# trajectories separate with NO wiring difference.  A 10x-smaller LR keeps
# the trajectories close while wiring errors (missing l2 = 1e-3*param/step,
# wrong clip/momentum/BN update) remain orders above the noise floor.
MODEL_LR = {"tdnn": 0.08 / 128 * BATCH * ACCUM}
DEFAULT_LR = 0.08 / 128 * BATCH * ACCUM / 10.0


def main() -> None:
    out_path = sys.argv[1]
    model_name = sys.argv[2] if len(sys.argv) > 2 else "tdnn"
    num_steps = int(sys.argv[3]) if len(sys.argv) > 3 else NUM_STEPS
    seed = int(sys.argv[4]) if len(sys.argv) > 4 else 0
    lr_mode = sys.argv[5] if len(sys.argv) > 5 else "default"
    T = MODEL_T.get(model_name, DEFAULT_T)
    if lr_mode == "full":       # recipe LR (envelope runs)
        base_lr = 0.08 / 128 * BATCH * ACCUM
    elif lr_mode == "damped":   # LR/10 (deep-model noise calibration)
        base_lr = 0.08 / 128 * BATCH * ACCUM / 10.0
    else:
        base_lr = MODEL_LR.get(model_name, DEFAULT_LR)

    sys.modules.setdefault("horovod", types.ModuleType("horovod"))
    sys.modules.setdefault(
        "horovod.tensorflow", types.ModuleType("horovod.tensorflow"))

    import tensorflow.compat.v1 as tf
    tf.disable_v2_behavior()
    sys.modules["tensorflow"] = tf
    sys.path.insert(0, "/root/reference/tensorflow")

    # TF 2.21 dropped `case` from the internal control_flow_ops module the
    # reference's tf_scheduler imports; restore it from the public v1 API.
    from tensorflow.python.ops import control_flow_ops
    if not hasattr(control_flow_ops, "case"):
        control_flow_ops.case = tf.case

    import tf_projection
    import tf_scheduler

    if model_name.startswith("dpn"):
        # TF CPU cannot backprop grouped convolutions ("Gradients for
        # grouped convolutions are not supported on CPU").  The reference
        # ships its own CPU fallback as a comment in models.py:206-218 --
        # the same kernel variable, computed as per-group convs + concat
        # (mathematically identical).  Patch models.conv2d BEFORE dpn_model
        # does `from .models import conv2d`.
        from models import models as ref_models

        def conv2d_cpu(inputs, filters, kernel_size, strides=1,
                       padding='valid', dilation_rate=(1, 1), trainable=True,
                       cardinality=1, reuse=None, scope=None,
                       data_format='channels_last', l2=1e-3):
            with tf.variable_scope(name_or_scope=scope,
                                   default_name='conv2d', values=[inputs],
                                   reuse=reuse):
                channel_axis = 3 if data_format == 'channels_last' else 1
                in_channels = inputs.get_shape().as_list()[channel_axis]
                assert in_channels % cardinality == 0
                assert filters % cardinality == 0
                pad = padding.upper() if isinstance(padding, str) else padding
                fmt = 'NHWC' if data_format == 'channels_last' else 'NCHW'
                ks = ([kernel_size, kernel_size]
                      if isinstance(kernel_size, int) else list(kernel_size))
                group_filters = tf.get_variable(
                    name='kernel',
                    initializer=tf.compat.v1.variance_scaling_initializer(),
                    regularizer=ref_models.l2_regularizer(l2),
                    shape=ks + [in_channels // cardinality, filters],
                    trainable=trainable, dtype=tf.float32)
                if cardinality == 1:
                    return tf.nn.conv2d(inputs, group_filters,
                                        strides=strides, padding=pad,
                                        data_format=fmt,
                                        dilations=dilation_rate)
                xs = tf.split(inputs, cardinality, channel_axis)
                kernels = tf.split(group_filters, cardinality, 3)
                outs = [tf.nn.conv2d(i, k, strides=strides, padding=pad,
                                     data_format=fmt,
                                     dilations=dilation_rate)
                        for i, k in zip(xs, kernels)]
                return tf.concat(outs, channel_axis)

        ref_models.conv2d = conv2d_cpu

    if model_name == "tdnn":
        from models import tdnn_model
        model = tdnn_model.tdnn
        shape = [None, None, 1, FEAT_DIM]   # expansion_dim 2 (1-D convs)
    elif model_name.startswith("dpn"):
        from models import dpn_model
        model = getattr(dpn_model, model_name)
        shape = [None, None, FEAT_DIM, 1]   # expansion_dim 3 (2-D convs)
    else:
        from models import res2net_model
        model = getattr(res2net_model, model_name)
        shape = [None, None, FEAT_DIM, 1]

    epoch_size = DATASET_LENGTH // BATCH // ACCUM  # ref :150 (world size 1)

    # --- graph, following ref tf_train_tdnn.py:194-258 ---
    X = tf.placeholder(tf.float32, shape, name="inputs")
    Y = tf.placeholder(tf.int32, [None], name="labels")
    global_step = tf.train.get_or_create_global_step()
    learning_rate = tf_scheduler.warmup_constant_exponential_decay(
        base_lr, global_step,
        [epoch_size * 3, epoch_size * 13, epoch_size * 23], epoch_size,
        decay_rate=0.5, staircase=True)                        # ref :198
    margin = tf_scheduler.zero_linear_constant(
        MARGIN, global_step, [epoch_size * 3, epoch_size * 13], epoch_size,
        staircase=True)                                        # ref :201
    optimizer = tf.train.MomentumOptimizer(
        learning_rate=learning_rate, momentum=0.9)             # ref :203

    tf.set_random_seed(seed)  # init seed; the data stream stays fixed
    emb = model(inputs=X, training=True)                       # ref :210
    logits = tf_projection.sc_cm_linear(
        emb, Y, NUM_CLASSES, scale=SCALE, margin=margin,
        name=PROJECTION)                                       # ref :214

    regularization_loss = tf.add_n(
        tf.get_collection(tf.GraphKeys.REGULARIZATION_LOSSES))  # ref :216
    classification_loss = tf.reduce_mean(
        tf.nn.sparse_softmax_cross_entropy_with_logits(
            logits=logits, labels=Y))                          # ref :218
    loss = classification_loss + regularization_loss           # ref :219
    accuracy = tf.reduce_mean(
        tf.cast(tf.nn.in_top_k(logits, Y, 1), tf.float32))     # ref :220

    update_ops = tf.get_collection(tf.GraphKeys.UPDATE_OPS)    # ref :222
    with tf.control_dependencies(update_ops):
        tvars = tf.trainable_variables()
        grads_and_vars = optimizer.compute_gradients(
            loss * 1.0 / ACCUM, tvars)                         # ref :225

        local_step = tf.get_variable(
            name="local_step", shape=[], dtype=tf.int32, trainable=False,
            initializer=tf.zeros_initializer())                # ref :229
        accum_vars = [
            tf.get_variable(
                name=v.name.split(":")[0] + "/accum", shape=v.shape.as_list(),
                dtype=tf.float32, trainable=False,
                initializer=tf.zeros_initializer())
            for v in tvars]                                    # ref :232-237

        reset_step = tf.cast(
            tf.math.equal(local_step % ACCUM, 0), tf.bool)     # ref :239
        local_step = tf.cond(
            reset_step,
            lambda: local_step.assign(tf.ones_like(local_step)),
            lambda: local_step.assign_add(1))                  # ref :240

        gva = [(gv[0], gv[1], accum_vars[i])
               for i, gv in enumerate(grads_and_vars) if gv[0] is not None]
        grads, tvars, accum_vars = list(zip(*gva))             # ref :242-243
        accum_vars = tf.cond(
            reset_step,
            lambda: [accum_vars[i].assign(g) for i, g in enumerate(grads)],
            lambda: [accum_vars[i].assign_add(g)
                     for i, g in enumerate(grads)])            # ref :245-247

        def update(accum_vars):
            # world size 1: hvd.allreduce is the identity (ref :250-252)
            clipped, _gnorm = tf.clip_by_global_norm(
                accum_vars, clip_norm=1.0)                     # ref :253
            return optimizer.apply_gradients(
                list(zip(clipped, tvars)), global_step=global_step)  # :254

        update_step = tf.cast(
            tf.math.equal(local_step % ACCUM, 0), tf.bool)     # ref :256
        train_op = tf.cond(
            update_step, lambda: update(accum_vars),
            lambda: tf.no_op())                                # ref :257

    # total margin reporting (ref :277-287, sc_cm_linear branch)
    margin_total = margin + 0.5 * margin * margin

    rs = np.random.RandomState(11)
    n_micro = num_steps * ACCUM
    feats = rs.randn(n_micro, BATCH, T, FEAT_DIM).astype(np.float32)
    labels = rs.randint(
        0, NUM_CLASSES, size=(n_micro, BATCH)).astype(np.int32)

    dump = {"__feats__": feats, "__labels__": labels,
            "__epoch_size__": np.int64(epoch_size)}
    expand_axis = 2 if model_name == "tdnn" else 3  # ref :189-195
    logs = []
    with tf.Session() as sess:
        sess.run(tf.global_variables_initializer())
        for v in tf.global_variables():
            dump["init/" + v.name] = sess.run(v)
        for k in range(n_micro):
            _, gs, ce, reg, acc, lr, mt = sess.run(
                [train_op, global_step, classification_loss,
                 regularization_loss, accuracy, learning_rate, margin_total],
                feed_dict={X: np.expand_dims(feats[k], expand_axis),
                           Y: labels[k]})
            logs.append((gs, ce, reg, acc, lr, mt))
        for v in tf.global_variables():
            dump["final/" + v.name] = sess.run(v)
    dump["__log__"] = np.asarray(logs, np.float64)

    np.savez(out_path, **dump)


if __name__ == "__main__":
    main()
