"""Flagship-shape sweep on the real TPU: north-star res2net50_w24_s4_c32,
the att-pool flagships, and the LMFT shapes, across remat variants.

Usage:
  python scripts/perf_sweep.py [quick|full|att600|att152|w8f600|w8f200|c64dpn]
  python scripts/perf_sweep.py --one <model> <bs> <accum> <frames> \
      <remat> <policy> <stages>        # single config (internal)

Every config runs in ITS OWN subprocess: an HBM OOM at AOT-compile time or
a TPU-runtime crash must not poison the following measurements (observed in
round 2, PERF.md).  OOMs are caught and reported as FAILED lines.
"""

import os
import subprocess
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

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

# The f600 LMFT leg of the att flagships (README.md:278 headline model) +
# the unmeasured res2net152: stage-selective remat candidates around each
# model's best f200 shape, scaled by the ~3x activation footprint of f600.
ATT600_CONFIGS = [
    ("res2net101_w24_s4_c32_att", 64, 16, 600, False, None, None),
    ("res2net101_w24_s4_c32_att", 64, 16, 600, True, None, (0, 1, 2)),
    ("res2net101_w24_s4_c32_att", 64, 16, 600, True, None, None),
    ("res2net101_w24_s4_c32_att", 32, 32, 600, False, None, None),
    ("res2net101_w24_s4_c32_att", 32, 32, 600, True, None, (0, 1, 2)),
    ("res2net200_w24_s4_c32_att", 32, 32, 600, False, None, None),
    ("res2net200_w24_s4_c32_att", 32, 32, 600, True, None, (0, 1, 2)),
    ("res2net200_w24_s4_c32_att", 32, 32, 600, True, None, None),
    ("res2net200_w24_s4_c32_att", 16, 64, 600, False, None, None),
]

W8_F600_CONFIGS = [
    # the w8 model's f600 LMFT leg (ref trains it in 5 h on the 4090,
    # README.md:45 -- the second published single-GPU wall-clock)
    ("res2net50_w8_s6_c16", 256, 4, 600, False, None, None),
    ("res2net50_w8_s6_c16", 128, 8, 600, False, None, None),
    ("res2net50_w8_s6_c16", 256, 4, 600, True, None, (0, 1, 2)),
    ("res2net50_w8_s6_c16", 128, 8, 600, True, None, (0, 1, 2)),
    ("res2net50_w8_s6_c16", 256, 4, 600, True, None, (0, 1)),
    ("res2net50_w8_s6_c16", 512, 2, 600, True, None, (0, 1, 2)),
    ("res2net50_w8_s6_c16", 256, 4, 600, True, "dots_saveable", (0, 1, 2)),
    ("res2net50_w8_s6_c16", 256, 4, 600, True, None, None),
    # round-5 closure of the lattice (PERF.md w8 section): 64x16 no-remat
    # FITS but starves the MXU (784 audio-s/s); 128x8 remat crashes the
    # worker at any stage set; 512x2 remat and 256x4 (0,1) OOM.
    ("res2net50_w8_s6_c16", 64, 16, 600, False, None, None),
    ("res2net50_w8_s6_c16", 128, 8, 600, True, None, (0,)),
]

# The w8 model's f200 PRETRAIN leg (the bench.py headline): 256x4 no-remat
# is the round-1 shape (2313 audio-s/s) but the thin 8-channel split convs
# starve the MXU at small microbatches -- a LARGER microbatch may win if it
# fits.  f200's activation footprint is 1/3 of f600's, so 512x2 no-remat
# (~2/3 of the bytes of the OOMing 256x4 f600) is plausible headroom that
# was never measured.
W8_F200_CONFIGS = [
    ("res2net50_w8_s6_c16", 512, 2, 200, False, None, None),
    ("res2net50_w8_s6_c16", 1024, 1, 200, False, None, None),
    ("res2net50_w8_s6_c16", 512, 2, 200, True, None, (0, 1, 2)),
    ("res2net50_w8_s6_c16", 1024, 1, 200, True, None, (0, 1, 2)),
    ("res2net50_w8_s6_c16", 256, 4, 200, False, None, None),  # incumbent
]

# Round-5 closure of the README-table shape inventory (VERDICT weak #2):
# res2net50_w24_s4_c64 (default model of res2net_vox2_dev_aug) both legs,
# dpn68's f600 LMFT leg (requires the DPN remat knobs added this round).
C64_DPN_CONFIGS = [
    ("res2net50_w24_s4_c64", 128, 8, 200, False, None, None),
    ("res2net50_w24_s4_c64", 256, 4, 200, False, None, None),
    ("res2net50_w24_s4_c64", 64, 16, 200, False, None, None),
    ("res2net50_w24_s4_c64", 256, 4, 200, True, None, (0, 1)),
    ("res2net50_w24_s4_c64", 256, 4, 200, True, None, (0, 1, 2)),
    ("res2net50_w24_s4_c64", 128, 8, 600, True, None, (0, 1, 2)),
    ("res2net50_w24_s4_c64", 128, 8, 600, True, None, None),
    ("res2net50_w24_s4_c64", 64, 16, 600, False, None, None),
    ("res2net50_w24_s4_c64", 64, 16, 600, True, None, (0, 1, 2)),
    ("res2net50_w24_s4_c64", 64, 16, 600, True, None, None),
    ("dpn68", 256, 4, 600, False, None, None),
    ("dpn68", 128, 8, 600, False, None, None),
    ("dpn68", 64, 16, 600, False, None, None),
    ("dpn68", 256, 4, 600, True, None, (0, 1, 2)),
    ("dpn68", 128, 8, 600, True, None, (0, 1, 2)),
    ("dpn68", 128, 8, 600, True, None, None),
    ("dpn68", 64, 16, 600, True, None, (0, 1, 2)),
    ("dpn68", 64, 16, 600, True, None, None),
]

ATT152_CONFIGS = [
    # round-4 sweep 1 findings: f600 "32x32 + remat" crashes the TPU worker
    # reproducibly (101 and 200 alike); 64x16 remat(0,1,2) is the working
    # 101 shape -- try the same family for 152, and 16x64 remat for 200.
    ("res2net152_w24_s4_c32_att", 64, 16, 200, False, None, None),
    ("res2net152_w24_s4_c32_att", 64, 16, 600, True, None, (0, 1, 2)),
    ("res2net152_w24_s4_c32_att", 64, 16, 600, True, None, None),
    ("res2net200_w24_s4_c32_att", 16, 64, 600, True, None, (0, 1, 2)),
    ("res2net200_w24_s4_c32_att", 16, 64, 600, True, None, None),
    ("res2net200_w24_s4_c32_att", 64, 16, 600, True, None, None),
]


def measure(model, bs, accum, frames, remat, policy, stages, iters=6):
    import jax
    import jax.numpy as jnp

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


def _tag(model, bs, accum, frames, remat, policy, stages):
    return (f"{model} {bs}x{accum} f{frames} "
            f"remat={remat} policy={policy} stages={stages}")


def run_one(argv):
    import jax

    cache = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        ".jax_cache")
    jax.config.update("jax_compilation_cache_dir", cache)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)

    model, bs, accum, frames = argv[0], int(argv[1]), int(argv[2]), int(argv[3])
    remat = argv[4] == "True"
    policy = None if argv[5] == "None" else argv[5]
    stages = (None if argv[6] == "None"
              else tuple(int(i) for i in argv[6].split(",") if i != ""))
    tag = _tag(model, bs, accum, frames, remat, policy, stages)
    try:
        dt, rate = measure(model, bs, accum, frames, remat, policy, stages)
        print(f"{tag}: {dt * 1e3:8.1f} ms/step  {rate:7.1f} audio-s/s",
              flush=True)
    except Exception as e:  # noqa: BLE001 -- OOM etc., report and exit 0
        msg = str(e).split("\n")[0][:160]
        print(f"{tag}: FAILED ({msg})", flush=True)


def main():
    if len(sys.argv) > 1 and sys.argv[1] == "--one":
        run_one(sys.argv[2:])
        return

    suite = sys.argv[1] if len(sys.argv) > 1 else "quick"
    suites = {"quick": CONFIGS, "full": CONFIGS,
              "att600": ATT600_CONFIGS, "att152": ATT152_CONFIGS,
              "w8f600": W8_F600_CONFIGS, "w8f200": W8_F200_CONFIGS,
              "c64dpn": C64_DPN_CONFIGS}
    if suite not in suites:
        sys.exit(f"unknown suite {suite!r}; one of {sorted(suites)}")
    configs = suites[suite]
    for model, bs, accum, frames, remat, policy, stages in configs:
        args = [sys.executable, os.path.abspath(__file__), "--one",
                model, str(bs), str(accum), str(frames), str(remat),
                str(policy),
                "None" if stages is None else ",".join(map(str, stages))]
        try:
            res = subprocess.run(args, timeout=3000)
            if res.returncode != 0:
                print(f"{_tag(model, bs, accum, frames, remat, policy, stages)}"
                      f": SUBPROCESS DIED rc={res.returncode}", flush=True)
        except subprocess.TimeoutExpired:
            print(f"{_tag(model, bs, accum, frames, remat, policy, stages)}"
                  f": TIMEOUT", flush=True)


if __name__ == "__main__":
    main()
