"""Run the REFERENCE system end-to-end as an oracle (subprocess helper).

Where ref_trainer_oracle.py pins 10 steps of the trainer *graph*, this runs
the reference STACK: its data pipeline (tf_data.DataGenerator over a Kaldi
CM ark, with the skip-10% reshuffle and random crop, tf_data.py:57-125), its
trainer wiring (tf_train_tdnn.py:194-317) for a full multi-epoch schedule,
its inference-graph rebuild + checkpoint restore (export_inference_graph.py:
38-66), its chunked extraction (tf_extract.py:96-111), and its scoring +
metrics (snorm.py, eer_minDCF.py) -- producing reference-side EER/minDCF on
a shared synthetic corpus.  The framework side of the comparison lives in
tests/test_cross_stack_system.py.

The model is a thin instance of the reference's own TDNN Model class
(tdnn_model.py:112-124 is parameterized exactly for this) so several
hundred optimizer steps fit in CPU minutes.

Usage: python ref_system_oracle.py <workdir> <out.npz>

<workdir> must contain:
  config.json   hyperparameters (see CONFIG KEYS below)
  train.ark     CM-compressed features, sliding-CMVN already applied
                (both stacks read the same bytes; the reference's
                apply-cmvn-sliding pipe needs Kaldi binaries this image
                does not have)
  utt2id.pkl    {utt: int32 label}
  test.scp      eval utterances (key -> ark:offset)
  cohort.scp    cohort utterances (speaker means become the asnorm cohort,
                like voxceleb2_dev in eval_inference_model.sh:27-40)
  spk2utt.json  {spk: [utt, ...]} for the cohort
  trials.txt    "<label> <utt1> <utt2>" lines
"""

import json
import os
import sys
import types
import zlib

import numpy as np


def main() -> None:
    workdir, out_path = sys.argv[1], sys.argv[2]
    cfg = json.load(open(os.path.join(workdir, "config.json")))

    FEAT_DIM = cfg["feat_dim"]
    T = cfg["feat_length"]
    BATCH = cfg["batch"]
    ACCUM = cfg["accum"]
    NUM_CLASSES = cfg["num_classes"]
    SCALE = cfg["scale"]
    MARGIN = cfg["margin"]
    DATASET_LENGTH = cfg["dataset_length"]
    TOTAL_EPOCHS = cfg["total_epochs"]
    TOPK = cfg["topk"]
    DATA_SEED = cfg["data_seed"]

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

    import tf_data
    import tf_projection
    import tf_scheduler

    # Model family dispatch: the reference Model classes are parameterized
    # for thin instances (tdnn_model.py:112-124, res2net_model.py:139-167).
    family = cfg.get("family", "tdnn")
    if family == "tdnn":
        from models import tdnn_model

        model = tdnn_model.Model(
            output_dim=cfg["output_dim"], padding="same",
            block_fn=tdnn_model.conv_relu_bn_block,
            block_filters=cfg["block_filters"],
            block_kernel_sizes=[(5, 1), (3, 1), (3, 1), (1, 1), (1, 1)],
            block_dilations=[(1, 1), (2, 1), (3, 1), (1, 1), (1, 1)],
            block_cardinalities=None, data_format="channels_last")
        ED = 2   # 1-D conv layout (B, T, 1, F): ref run_tf_train_local.sh
    else:
        assert family == "res2net", family
        from models import res2net_model

        model = res2net_model.Model(
            resnet_size=50, bottleneck=True,
            num_filters=list(cfg["num_filters"]),
            output_dim=cfg["output_dim"], kernel_size=3, conv_stride=1,
            first_pool_size=None, first_pool_stride=None,
            block_sizes=list(cfg["block_sizes"]),
            block_strides=list(cfg["block_strides"]),
            cardinality=1, use_se=False, split=cfg["split"],
            width=list(cfg["width"]),
            data_format="channels_last")
        ED = 3   # 2-D conv layout (B, T, F, 1): expansion_dim=3
                 # (ref run_res2net_local_vox2_dev_aug.sh:21)

    # world size 1 (ref tf_train_tdnn.py:150): one rank, one feeder shard
    epoch_size = DATASET_LENGTH // BATCH // ACCUM
    num_steps = epoch_size * TOTAL_EPOCHS
    base_lr = 0.08 / 128 * BATCH * ACCUM

    # --- train graph, following ref tf_train_tdnn.py:189-258 ---
    input_dims = [None, None, FEAT_DIM]
    input_dims.insert(ED, 1)                                   # ref :189-192
    X = tf.placeholder(tf.float32, input_dims, name="inputs")
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

    tf.set_random_seed(0)
    emb = model(inputs=X, training=True)                       # ref :210
    logits = tf_projection.sc_cm_linear(
        emb, Y, NUM_CLASSES, scale=SCALE, margin=margin,
        name="sc_cm_linear")                                   # ref :214

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
            clipped, _g = tf.clip_by_global_norm(
                accum_vars, clip_norm=1.0)                     # ref :253
            return optimizer.apply_gradients(
                list(zip(clipped, tvars)), global_step=global_step)  # :254

        update_step = tf.cast(
            tf.math.equal(local_step % ACCUM, 0), tf.bool)     # ref :256
        train_op = tf.cond(
            update_step, lambda: update(accum_vars),
            lambda: tf.no_op())                                # ref :257

    margin_total = margin + 0.5 * margin * margin  # ref :277-287 (sc_cm)

    # --- the reference data pipeline: DataGenerator over the CM ark
    # (tf_data.py:57-125).  "ark:<path>" skips the apply-cmvn-sliding pipe
    # (CMVN is already in the ark -- no Kaldi binaries in this image); the
    # generator's own skip-10% reshuffle, crop/pad and label lookup all run.
    np.random.seed(DATA_SEED)
    dg = iter(tf_data.DataGenerator(
        os.path.join(workdir, "train.ark"), "ark:{0}",
        os.path.join(workdir, "utt2id.pkl"), "None", "None",
        NUM_CLASSES, FEAT_DIM, T, None, None,
        training=True, specaug=False))

    def next_microbatch():
        feats = np.empty((BATCH, T, FEAT_DIM), np.float32)
        labels = np.empty((BATCH,), np.int32)
        for b in range(BATCH):  # ref get_batch (tf_train_tdnn.py:30-56)
            f, i = next(dg)
            feats[b], labels[b] = f, i
        return feats, labels

    dump = {}
    logs = []
    stream_sum = []
    stream_crc = []
    ckpt = os.path.join(workdir, "ref_ckpt", "model")
    os.makedirs(os.path.dirname(ckpt), exist_ok=True)
    with tf.Session() as sess:
        sess.run(tf.global_variables_initializer())
        for v in tf.global_variables():
            dump["init/" + v.name] = sess.run(v)
        n_micro = num_steps * ACCUM
        for k in range(n_micro):
            feats, labels = next_microbatch()
            stream_sum.append((float(feats.sum(dtype=np.float64)),
                               float(labels.sum())))
            stream_crc.append(zlib.crc32(feats.tobytes()))
            _, gs, ce, reg, acc, lr, mt = sess.run(
                [train_op, global_step, classification_loss,
                 regularization_loss, accuracy, learning_rate, margin_total],
                feed_dict={X: np.expand_dims(feats, ED), Y: labels})
            logs.append((gs, ce, reg, acc, lr, mt))
        for v in tf.global_variables():
            dump["final/" + v.name] = sess.run(v)
        tf.train.Saver().save(sess, ckpt)
    dump["__log__"] = np.asarray(logs, np.float64)
    dump["__stream_sum__"] = np.asarray(stream_sum, np.float64)
    dump["__stream_crc__"] = np.asarray(stream_crc, np.uint32)
    dump["__epoch_size__"] = np.int64(epoch_size)

    # --- inference graph rebuild + restore (export_inference_graph.py:38-66:
    # model(training=False) on a dynamic-length input, restore latest ckpt;
    # freeze_graph only folds variables into constants, which a same-process
    # Saver restore is numerically identical to) ---
    eval_graph = tf.Graph()
    with eval_graph.as_default():
        Xe = tf.placeholder(tf.float32, input_dims, name="inputs")
        emb_e = model(inputs=Xe, training=False)
        saver = tf.train.Saver(var_list=tf.global_variables())

    import kaldi_io as ref_kaldi_io

    def extract(scp_path, sess):
        """Chunked extraction, ref tf_extract.py:96-111: <=1000-frame
        chunks (min final chunk 25), length-weighted average."""
        out = {}
        max_frames = 1000
        for utt, feat in ref_kaldi_io.read_mat_scp(scp_path):
            # BATCH_SIZE=1; expand_dim per family (ref tf_extract.py:32)
            x = np.expand_dims(feat, ED - 1)[None]
            num_chunks = 1 + (x.shape[1] - 25) // max_frames
            vals, lens = [], []
            for i in range(num_chunks):
                n = (max_frames if (i + 1) * max_frames <= x.shape[1]
                     else x.shape[1] - i * max_frames)
                v = sess.run(emb_e, feed_dict={
                    Xe: x[:, i * max_frames: i * max_frames + n]})
                vals.append(v * n)
                lens.append(n)
            out[utt] = (sum(vals) / sum(lens))[0]
        return out

    with tf.Session(graph=eval_graph) as sess:
        saver.restore(sess, ckpt)
        test_vec = extract(os.path.join(workdir, "test.scp"), sess)
        cohort_vec = extract(os.path.join(workdir, "cohort.scp"), sess)

    # --- scoring + metrics: the reference's own snorm.py / eer_minDCF.py ---
    import snorm
    import eer_minDCF

    spk2utt = json.load(open(os.path.join(workdir, "spk2utt.json")))
    trials_path = os.path.join(workdir, "trials.txt")
    labels = [int(l.split()[0]) for l in open(trials_path)]

    t_norm = {u: snorm.l2norm(v, axis=0) for u, v in test_vec.items()}
    c_norm = {u: snorm.l2norm(v, axis=0) for u, v in cohort_vec.items()}
    cohort = snorm.read_speaker_xvector(c_norm, spk2utt)
    cos = snorm.get_cosine_score(t_norm, trials_path)
    m, s = snorm.get_cohort_mean_std(t_norm, cohort, topk=TOPK)
    asn = snorm.get_asnorm1_score(m, s, cos)

    def eer_mindcf(scores):
        eer, _t1, min_dcf, _t2 = eer_minDCF.compute_eer_and_min_dcf(
            labels, np.array([sc for _, _, sc in scores]), 1, 1, 0.01)
        return np.asarray([eer * 100.0, min_dcf], np.float64)

    dump["ref_cosine"] = eer_mindcf(cos)
    dump["ref_asnorm"] = eer_mindcf(asn)
    for u, v in test_vec.items():
        dump["emb/" + u] = v.astype(np.float32)

    np.savez(out_path, **dump)
    print(json.dumps({
        "steps": num_steps,
        "final_ce": float(np.mean([l[1] for l in logs[-epoch_size:]])),
        "ref_cosine": dump["ref_cosine"].tolist(),
        "ref_asnorm": dump["ref_asnorm"].tolist(),
    }))


if __name__ == "__main__":
    main()
