"""Flagship-shape sweep on the real TPU: north-star res2net50_w24_s4_c32,
the att-pool flagships, and the LMFT shape, across remat variants.

Usage: python scripts/perf_sweep.py [quick|full]
Prints one line per config; OOMs are caught and reported.
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

CONFIGS = [
    # (model, bs, accum, frames, remat, remat_policy, remat_stages)
    ("res2net50_w24_s4_c32", 128, 8, 200, False, None, None),
    ("res2net50_w24_s4_c32", 256, 4, 200, True, None, (0,)),
    ("res2net50_w24_s4_c32", 256, 4, 200, True, None, (0, 1)),
    ("res2net50_w24_s4_c32", 256, 4, 200, True, "dots_saveable", (0,)),
    ("res2net50_w24_s4_c32", 256, 4, 200, True, "dots_saveable", (0, 1)),
    ("res2net50_w24_s4_c32", 256, 4, 200, True, None, None),
    # LMFT shape: effective 1024 x 600 frames (ref finetune recipe)
    ("res2net50_w24_s4_c32", 128, 8, 600, True, None, (0, 1)),
    ("res2net50_w24_s4_c32", 64, 16, 600, False, None, None),
    ("res2net50_w24_s4_c32", 128, 8, 600, True, None, None),
    # att-pool flagships
    ("res2net101_w24_s4_c32_att", 128, 8, 200, False, None, None),
    ("res2net101_w24_s4_c32_att", 256, 4, 200, True, None, (0, 1)),
    ("res2net200_w24_s4_c32_att", 128, 8, 200, True, None, (0, 1)),
    ("res2net200_w24_s4_c32_att", 64, 16, 200, False, None, None),
]


def measure(model, bs, accum, frames, remat, policy, stages, iters=8):
    from voxsrc2020_speaker_verification_tpu.training import (
        TrainConfig, create_train_state, make_train_step,
    )

    config = TrainConfig(
        model=model, projection="sc_cm_linear", num_classes=5994,
        dataset_length=5_460_045, feat_dim=80, feat_length=frames,
        batch_size=bs, num_accumulation_steps=accum, bf16=True,
        bn_groups=8, remat=remat, remat_policy=policy, remat_stages=stages,
    )
    state = create_train_state(config, jax.random.PRNGKey(0))
    step = jax.jit(make_train_step(config), donate_argnums=0)
    feats = jax.random.normal(
        jax.random.PRNGKey(1), (accum, bs, frames, 80), jnp.float32)
    labels = jax.random.randint(
        jax.random.PRNGKey(2), (accum, bs), 0, 5994)
    rng = jax.random.PRNGKey(3)
    for _ in range(2):
        state, m = step(state, feats, labels, rng)
    _ = float(m["loss"])
    t0 = time.perf_counter()
    for _ in range(iters):
        state, m = step(state, feats, labels, rng)
    _ = float(m["loss"])
    dt = (time.perf_counter() - t0) / iters
    del state, feats, labels
    return dt, bs * accum * frames / 100.0 / dt


def main():
    cache = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        ".jax_cache")
    jax.config.update("jax_compilation_cache_dir", cache)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)
    dev = jax.devices()[0]
    print(f"# {dev.platform} {getattr(dev, 'device_kind', '?')}", flush=True)

    for cfg in CONFIGS:
        model, bs, accum, frames, remat, policy, stages = cfg
        tag = (f"{model} {bs}x{accum} f{frames} "
               f"remat={remat} policy={policy} stages={stages}")
        try:
            dt, rate = measure(*cfg)
            print(f"{tag}: {dt * 1e3:8.1f} ms/step  {rate:7.1f} audio-s/s",
                  flush=True)
        except Exception as e:  # noqa: BLE001 -- OOM etc., keep sweeping
            msg = str(e).split("\n")[0][:120]
            print(f"{tag}: FAILED ({msg})", flush=True)


if __name__ == "__main__":
    main()
