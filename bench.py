"""Benchmark: training throughput on real TPU hardware, audio-seconds/s/chip.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

Config matches the only reference configuration with a published single-GPU
wall-clock: res2net50_w8_s6_c16, 80-d FBANK, 200-frame (2 s) crops, effective
batch 1024 (bs 256 x accum 4), sc_cm_linear 5994 classes -- trained in 52 h
for 122,636 steps on 1x RTX 4090 (reference README.md:45,131), i.e.

    122636 steps * 1024 samples * 2 s / 52 h = 1341.5 audio-s/s per GPU.

vs_baseline = our audio-s/s per TPU chip / 1341.5.
"""

import json
import sys
import time

BASELINE_AUDIO_S_PER_S = 122_636 * 1024 * 2.0 / (52 * 3600)  # = 1341.5
# The LMFT leg is the reference's second published single-GPU wall-clock:
# 5 h for the remaining 127,968 - 122,636 = 5,332 steps x 1024 x 6 s
# (reference README.md:45,131,164).
LMFT_STEPS = 127_968 - 122_636
LMFT_BASELINE_AUDIO_S_PER_S = LMFT_STEPS * 1024 * 6.0 / (5 * 3600)  # = 1820.1
PRETRAIN_HOURS_REF, LMFT_HOURS_REF = 52.0, 5.0


def main():
    import os
    import jax
    import jax.numpy as jnp

    cache = os.path.join(os.path.dirname(os.path.abspath(__file__)), ".jax_cache")
    jax.config.update("jax_compilation_cache_dir", cache)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)

    from voxsrc2020_speaker_verification_tpu.training import (
        TrainConfig, create_train_state, make_train_step,
    )

    dev = jax.devices()[0]
    print(f"# device: {dev.platform} {getattr(dev, 'device_kind', '?')}",
          file=sys.stderr)

    config = TrainConfig(
        model="res2net50_w8_s6_c16",
        projection="sc_cm_linear",
        num_classes=5994,
        dataset_length=5_460_045,
        feat_dim=80,
        feat_length=200,
        batch_size=256,
        num_accumulation_steps=4,
        total_epochs=23,
        bf16=True,
        bn_groups=8,  # per-replica BN semantics, as the recipes set
    )

    n_chips = jax.device_count()
    if n_chips > 1:
        # Multi-chip: data-parallel over all chips at constant per-chip batch
        # (weak scaling); reported value stays per-chip for comparability.
        import dataclasses
        import math
        n_data = math.gcd(n_chips, 256) or 1
        config = dataclasses.replace(
            config, batch_size=config.batch_size * n_data)
        from voxsrc2020_speaker_verification_tpu.parallel import (
            batch_spec, make_mesh, param_shardings,
        )
        from jax.sharding import NamedSharding
        mesh = make_mesh(num_data=n_data, num_model=1,
                         devices=jax.devices()[:n_data])
        state = create_train_state(config, jax.random.PRNGKey(0))
        state_shardings = param_shardings(mesh, jax.eval_shape(lambda: state))
        state = jax.device_put(state, state_shardings)
        data_sharding = NamedSharding(mesh, batch_spec())
        step = jax.jit(
            make_train_step(config),
            in_shardings=(state_shardings, data_sharding, data_sharding, None),
            out_shardings=(state_shardings, None),
            donate_argnums=0,
        )
        put = lambda x: jax.device_put(x, data_sharding)
    else:
        n_data = 1
        state = create_train_state(config, jax.random.PRNGKey(0))
        step = jax.jit(make_train_step(config), donate_argnums=0)
        put = lambda x: x

    a, b = config.num_accumulation_steps, config.batch_size
    feats = put(jax.random.normal(
        jax.random.PRNGKey(1), (a, b, config.feat_length, config.feat_dim),
        jnp.float32,
    ))
    labels = put(jax.random.randint(
        jax.random.PRNGKey(2), (a, b), 0, config.num_classes))
    rng = jax.random.PRNGKey(3)

    # Warmup (compile + first steps).  NB: on the axon TPU tunnel,
    # block_until_ready returns immediately on remote futures -- only a value
    # fetch truly synchronizes, so warmup and timing both end with float().
    for _ in range(3):
        state, metrics = step(state, feats, labels, rng)
    _ = float(metrics["loss"])

    iters = 10
    t0 = time.perf_counter()
    for _ in range(iters):
        state, metrics = step(state, feats, labels, rng)
    _ = float(metrics["loss"])
    dt = time.perf_counter() - t0

    steps_per_s = iters / dt
    audio_s_per_s = (steps_per_s * config.effective_batch
                     * (config.feat_length / 100.0) / n_data)

    # Whole-system rate: the same step driven by the host feeder (synthetic
    # source, bf16 wire, double-buffered device prefetch) -- covers batch
    # assembly + host->device transfer, the honest end-to-end number.
    from voxsrc2020_speaker_verification_tpu.data import (
        BatchFeeder, SyntheticDataset,
    )
    from voxsrc2020_speaker_verification_tpu.training.loop import (
        device_prefetch,
    )

    feeder = BatchFeeder(
        [SyntheticDataset(config.feat_dim, config.feat_length,
                          config.num_classes, seed=i) for i in range(4)],
        config.batch_size, config.num_accumulation_steps, wire_bf16=True,
    ).start()
    try:
        it = device_prefetch(
            iter(feeder), lambda fl: (put(fl[0]), put(fl[1])), depth=2)
        fb, lb = next(it)
        state, metrics = step(state, fb, lb, rng)  # compile for bf16 feats
        _ = float(metrics["loss"])
        t0 = time.perf_counter()
        for _ in range(iters):
            fb, lb = next(it)
            state, metrics = step(state, fb, lb, rng)
        _ = float(metrics["loss"])
        sys_dt = time.perf_counter() - t0
    finally:
        feeder.stop()
    sys_audio_s_per_s = (iters / sys_dt * config.effective_batch
                         * (config.feat_length / 100.0) / n_data)

    # Real-IO rate: the same step fed from an actual CM-compressed feature
    # store through the native C++ feeder (ark decode + sliding CMN + crop +
    # bf16 wire in native/vox_feeder.cc) -- the production path of
    # cli.train.  Uses a small synthetic corpus written once per run.
    native_audio_s_per_s = None
    from voxsrc2020_speaker_verification_tpu.data import native
    if n_chips == 1 and native.available() and hasattr(
            native.get_lib(), "vox_feeder_create"):
        import tempfile

        import numpy as np
        from voxsrc2020_speaker_verification_tpu.data import kaldi_io

        with tempfile.TemporaryDirectory() as root:
            host_rng = np.random.RandomState(0)
            utt2id = {}
            scp = os.path.join(root, "feats.scp")
            with kaldi_io.ArkScpWriter(
                    os.path.join(root, "feats.ark"), scp,
                    compress=True) as w:
                for i in range(512):
                    key = f"u{i:04d}"
                    t = int(host_rng.randint(220, 400))
                    w.write(key, host_rng.randn(t, config.feat_dim)
                            .astype(np.float32))
                    utt2id[key] = i % config.num_classes
            feeder = native.NativeBatchFeeder(
                scp, utt2id, config.feat_dim, config.feat_length,
                config.batch_size, config.num_accumulation_steps,
                num_threads=max(2, (os.cpu_count() or 2)),
                wire_bf16=True)
            try:
                it = device_prefetch(
                    iter(feeder), lambda fl: (put(fl[0]), put(fl[1])),
                    depth=2)
                fb, lb = next(it)
                state, metrics = step(state, fb, lb, rng)
                _ = float(metrics["loss"])
                t0 = time.perf_counter()
                for _ in range(iters):
                    fb, lb = next(it)
                    state, metrics = step(state, fb, lb, rng)
                _ = float(metrics["loss"])
                nat_dt = time.perf_counter() - t0
            finally:
                feeder.close()
        native_audio_s_per_s = (iters / nat_dt * config.effective_batch
                                * (config.feat_length / 100.0))

    def measure_leg(leg_config, iters=5, warmup=2):
        """Synthetic-data device throughput of one training-leg config.
        NB: on the axon tunnel only a value fetch truly synchronizes
        (block_until_ready is a no-op on remote futures), so warmup and
        timing both end with float()."""
        leg_state = create_train_state(leg_config, jax.random.PRNGKey(0))
        leg_step = jax.jit(make_train_step(leg_config), donate_argnums=0)
        la, lb = leg_config.num_accumulation_steps, leg_config.batch_size
        leg_feats = jax.random.normal(
            jax.random.PRNGKey(1),
            (la, lb, leg_config.feat_length, leg_config.feat_dim),
            jnp.float32)
        leg_labels = jax.random.randint(
            jax.random.PRNGKey(2), (la, lb), 0, leg_config.num_classes)
        for _ in range(warmup):
            leg_state, m = leg_step(leg_state, leg_feats, leg_labels, rng)
        _ = float(m["loss"])
        t0 = time.perf_counter()
        for _ in range(iters):
            leg_state, m = leg_step(leg_state, leg_feats, leg_labels, rng)
        _ = float(m["loss"])
        dt = time.perf_counter() - t0
        return (iters / dt * leg_config.effective_batch
                * (leg_config.feat_length / 100.0))

    # LMFT leg of the same model: f600 crops at the measured-best v5e shape
    # (256 x 4, stage-(0,1,2) remat -- f600 no-remat exceeds HBM at any
    # microbatch, PERF.md).  Together with the pretrain leg this prices the
    # reference's complete 52 + 5 h w8 recipe on one chip.
    lmft_audio_s_per_s = None
    if n_chips == 1:
        import dataclasses
        lmft_audio_s_per_s = measure_leg(dataclasses.replace(
            config, feat_length=600, batch_size=256,
            num_accumulation_steps=4, remat=True, remat_stages=(0, 1, 2),
            bn_groups=16))

    # North-star config (BASELINE.md: res2net50_w24_s4_c32, the model the
    # project is judged on) at its best measured single-chip shape, 128 x 8
    # without remat (PERF.md round-2 sweep: 18% faster than any 256 x 4
    # remat variant).  The reference trains it on 8 GPUs and publishes no
    # single-GPU wall-clock, so vs_baseline is omitted for this metric.
    north_star = None
    if n_chips == 1:
        import dataclasses
        north_star = measure_leg(dataclasses.replace(
            config, model="res2net50_w24_s4_c32",
            batch_size=128, num_accumulation_steps=8, remat=False))

    print(json.dumps({
        "metric": "train_throughput_res2net50_w8_s6_c16",
        "value": round(audio_s_per_s, 1),
        "unit": "audio-s/s/chip",
        "vs_baseline": round(audio_s_per_s / BASELINE_AUDIO_S_PER_S, 3),
        "system_value": round(sys_audio_s_per_s, 1),
        "system_note": "feeder-driven incl. host batch assembly + transfer",
        **({"system_native_value": round(native_audio_s_per_s, 1),
            "system_native_note": "real CM feature store through the C++ "
                                  "feeder (production cli.train path)"}
           if native_audio_s_per_s is not None else {}),
        **({"north_star_metric": "train_throughput_res2net50_w24_s4_c32",
            "north_star_value": round(north_star, 1),
            "north_star_unit": "audio-s/s/chip",
            "north_star_note": "BASELINE north-star model, 128x8 no-remat "
                               "(best measured v5e shape, PERF.md); no "
                               "published single-GPU reference wall-clock"}
           if north_star is not None else {}),
        **(lambda lm: ({
            "lmft_metric": "train_throughput_res2net50_w8_s6_c16_f600",
            "lmft_value": round(lm, 1),
            "lmft_vs_baseline": round(lm / LMFT_BASELINE_AUDIO_S_PER_S, 3),
            "lmft_note": "f600 LMFT leg, 256x4 remat(0,1,2) (reference: "
                         "5 h on the 4090 = 1820 audio-s/s)",
            # complete w8 recipe (pretrain + LMFT) wall-clock vs 52 + 5 h
            "recipe_speedup": round(
                (PRETRAIN_HOURS_REF + LMFT_HOURS_REF) / (
                    PRETRAIN_HOURS_REF
                    * (BASELINE_AUDIO_S_PER_S / audio_s_per_s)
                    + LMFT_HOURS_REF
                    * (LMFT_BASELINE_AUDIO_S_PER_S / lm)), 3),
        } if lm is not None else {}))(lmft_audio_s_per_s),
        **_cross_stack_summary(),
    }))


def _cross_stack_summary():
    """End-task equivalence from the latest cross_stack_r*.json artifact
    (tests/test_cross_stack_*.py via scripts/cross_stack_report.py): the
    max |EER_ours - EER_ref| over both model families and both scoring
    backends -- chance is 50%, so a small delta means both complete stacks
    agree on the end task."""
    import glob
    import os

    here = os.path.dirname(os.path.abspath(__file__))
    paths = sorted(glob.glob(os.path.join(here, "cross_stack_r*.json")))
    if not paths:
        return {}
    data = json.load(open(paths[-1]))
    deltas = [
        abs(run[f"our_{kind}"][0] - run[f"ref_{kind}"][0])
        for run in data.values() if run.get("status") == "ok"
        for kind in ("cosine", "asnorm")
    ]
    not_ok = sorted(tag for tag, run in data.items()
                    if run.get("status") != "ok")
    if not deltas:
        return ({"cross_stack_artifact": os.path.basename(paths[-1]),
                 "cross_stack_not_ok_families": not_ok} if not_ok else {})
    return {
        "cross_stack_artifact": os.path.basename(paths[-1]),
        "cross_stack_max_eer_delta_pct": round(max(deltas), 3),
        "cross_stack_note": "max |EER ours - ref| across model families "
                            "and scorings; both full stacks trained on one "
                            "corpus (chance = 50%)",
        # never let a failed/skipped family hide behind the ok ones
        **({"cross_stack_not_ok_families": not_ok} if not_ok else {}),
    }


if __name__ == "__main__":
    main()
