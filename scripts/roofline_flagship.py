"""Roofline audit of the flagship (res2net50_w24_s4_c32) training step.

PERF.md claims the measured 1903 ms/step at 128x8 (1076 audio-s/s/chip) is
the memory speed-of-light for the reference's exact math.  This script makes
that claim auditable:

  analytic  -- enumerate every conv in the flagship and charge the MINIMAL
               HBM bytes its training-mode math requires:
                 fwd: input read + raw-out write + stats read (BN batch
                      stats are a full-tensor reduction that cannot start
                      before the conv finishes) + normalize read+write
                 bwd: the same tensors stream again for dx/dw and BN
                      backward; charged at 2x fwd (the standard lower
                      bound: every saved activation is re-read once, every
                      gradient written once and read once)
               The floor ms/step = bytes / HBM peak (819 GB/s on v5e).
  measured  -- XLA cost-analysis bytes of the real jitted step + the
               measured ms/step --> achieved GB/s.
  bench     -- microbenchmark each distinct conv(+BN+relu) shape standalone,
               fwd only, reporting achieved GB/s per shape; plus the
               lane-padding experiment (width 24 -> 32 at equal tensor
               bytes/element efficiency) the round-3 verdict asked for.

Usage: python scripts/roofline_flagship.py [analytic|bench|full]
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

MODEL = "res2net50_w24_s4_c32"
B, T, F = 128, 200, 80
ACCUM = 8
HBM_PEAK = 819e9  # v5e
BF16 = 2


def flagship_convs(width_override=None):
    """(name, (H, W), Cin, (Ho, Wo), Cout, has_bn) for every conv of one
    microbatch forward, from the architecture (models/res2net.py)."""
    from voxsrc2020_speaker_verification_tpu.models.res2net import (
        RES2NET_CONFIGS,
    )

    cfg = RES2NET_CONFIGS[MODEL]
    width = width_override or cfg.width
    convs = []
    h, w = T, F
    convs.append(("stem", (h, w), 1, (h, w), cfg.num_filters[0], True))
    cin = cfg.num_filters[0]
    for i, nblocks in enumerate(cfg.block_sizes):
        wi = width[i]
        cout = cfg.num_filters[i] * 4
        for j in range(nblocks):
            s = cfg.block_strides[i] if j == 0 else 1
            ho, wo = -(-h // s), -(-w // s)
            blk = f"s{i+1}b{j+1}"
            if j == 0:
                convs.append((f"{blk}.proj", (h, w), cin, (ho, wo), cout, True))
            convs.append((f"{blk}.conv1", (h, w), cin, (h, w),
                          cfg.split * wi, True))
            # split stage: s-1 convs of width wi (grouped at stride 2)
            for k in range(cfg.split - 1):
                convs.append((f"{blk}.split{k}", (h, w), wi, (ho, wo), wi,
                              True))
            convs.append((f"{blk}.conv3", (ho, wo), cfg.split * wi,
                          (ho, wo), cout, True))
            h, w, cin = ho, wo, cout
    return convs


def analytic(width_override=None, verbose=True):
    convs = flagship_convs(width_override)
    total_fwd = 0
    rows = []
    for name, (h, w), cin, (ho, wo), cout, has_bn in convs:
        in_b = B * h * w * cin * BF16
        out_b = B * ho * wo * cout * BF16
        # raw-out write + stats read + normalize read + write
        bn_b = 3 * out_b if has_bn else 0
        fwd = in_b + out_b + bn_b
        total_fwd += fwd
        rows.append((name, fwd))
    # residual add + relu per block: shortcut read + sum write (+re-read by
    # next block's conv1 is that conv's input read, already charged)
    from voxsrc2020_speaker_verification_tpu.models.res2net import (
        RES2NET_CONFIGS,
    )
    cfg = RES2NET_CONFIGS[MODEL]
    h, w = T, F
    res_b = 0
    for i, nblocks in enumerate(cfg.block_sizes):
        s = cfg.block_strides[i]
        h, w = -(-h // s), -(-w // s)
        res_b += nblocks * 2 * B * h * w * cfg.num_filters[i] * 4 * BF16
    total_fwd += res_b

    total_step = ACCUM * (total_fwd * 3)  # bwd = 2x fwd
    floor_ms = total_step / HBM_PEAK * 1e3
    if verbose:
        biggest = sorted(rows, key=lambda r: -r[1])[:6]
        for name, fwd in biggest:
            print(f"  {name:14s} fwd {fwd/1e6:8.1f} MB/microbatch")
        print(f"fwd minimal bytes/microbatch: {total_fwd/1e9:.2f} GB "
              f"(incl. {res_b/1e9:.2f} GB residual adds)")
        print(f"step minimal bytes (x{ACCUM} microbatches, bwd=2x fwd): "
              f"{total_step/1e9:.1f} GB")
        print(f"floor at {HBM_PEAK/1e9:.0f} GB/s: {floor_ms:.0f} ms/step")
    return total_step, floor_ms


def xla_cost():
    import jax

    from voxsrc2020_speaker_verification_tpu.training import (
        TrainConfig, create_train_state, make_train_step,
    )
    config = TrainConfig(
        model=MODEL, projection="sc_cm_linear", num_classes=5994,
        dataset_length=5_460_045, feat_dim=F, feat_length=T,
        batch_size=B, num_accumulation_steps=ACCUM, bf16=True, bn_groups=8)
    state = create_train_state(config, jax.random.PRNGKey(0))
    import jax.numpy as jnp
    feats = jnp.zeros((ACCUM, B, T, F), jnp.float32)
    labels = jnp.zeros((ACCUM, B), jnp.int32)
    lowered = jax.jit(make_train_step(config), donate_argnums=0).lower(
        state, feats, labels, jax.random.PRNGKey(3))
    cost = lowered.compile().cost_analysis()
    if isinstance(cost, list):
        cost = cost[0]
    print(f"XLA cost analysis: {cost.get('flops', 0)/1e12:.2f} TFLOP, "
          f"{cost.get('bytes accessed', 0)/1e9:.1f} GB logical bytes/step")
    return cost


def bench_shapes():
    """Per-shape conv(+BN-train+relu) fwd microbench on the device, plus the
    w24 -> w32 lane-padding comparison."""
    import jax
    import jax.numpy as jnp

    cache = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        ".jax_cache")
    jax.config.update("jax_compilation_cache_dir", cache)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)

    def conv_bn_relu(x, k, strides=1):
        y = jax.lax.conv_general_dilated(
            x, k, (strides, strides), "SAME",
            dimension_numbers=jax.lax.conv_dimension_numbers(
                x.shape, k.shape, ("NHWC", "HWIO", "NHWC")))
        mean = y.mean(axis=(0, 1, 2), dtype=jnp.float32)
        var = (y.astype(jnp.float32) ** 2).mean(axis=(0, 1, 2)) - mean ** 2
        out = (y - mean.astype(y.dtype)) * jax.lax.rsqrt(
            var + 1e-5).astype(y.dtype)
        return jax.nn.relu(out)

    def run(name, h, w, cin, cout, kk, strides=1, iters=20):
        x = jnp.zeros((B, h, w, cin), jnp.bfloat16)
        k = jnp.zeros((kk, kk, cin, cout), jnp.bfloat16)
        f = jax.jit(lambda a, b: conv_bn_relu(a, b, strides))
        o = f(x, k)
        _ = float(o.reshape(-1)[0])
        t0 = time.perf_counter()
        for _ in range(iters):
            o = f(x, k)
        _ = float(o.reshape(-1)[0])
        dt = (time.perf_counter() - t0) / iters
        ho, wo = o.shape[1], o.shape[2]
        # minimal streaming bytes for this fused shape (same model as
        # analytic(): in + out + 3x out for the BN barrier)
        bytes_min = (B * h * w * cin + 4 * B * ho * wo * cout) * BF16
        print(f"  {name:28s} {dt*1e3:7.2f} ms  {bytes_min/dt/1e9:6.0f} GB/s "
              f"of minimal bytes")
        return dt

    shapes = [
        # the stage-2 hot shapes (500 MB conv temps in the OOM report)
        ("s2.conv1 1x1 128->192", 200, 80, 128, 192, 1),
        ("s2.split 3x3 48->48", 100, 40, 48, 48, 3),
        ("s2.conv3 1x1 192->256", 100, 40, 192, 256, 1),
        ("s3.split 3x3 96->96", 50, 20, 96, 96, 3),
        ("s1.split 3x3 24->24", 200, 80, 24, 24, 3),
        # lane-padding probe: same spatial, width padded to 32
        ("s1.split 3x3 32->32 (pad)", 200, 80, 32, 32, 3),
        ("s2.split 3x3 64->64 (pad)", 100, 40, 64, 64, 3),
    ]
    for s in shapes:
        run(*s)


def main():
    mode = sys.argv[1] if len(sys.argv) > 1 else "analytic"
    if mode in ("analytic", "full"):
        total, floor = analytic()
        print()
        w32_total, w32_floor = analytic(
            width_override=(32, 64, 128, 256), verbose=False)
        print(f"(width 32 variant would move {w32_total/1e9:.0f} GB, "
              f"floor {w32_floor:.0f} ms -- more bytes, so lane padding "
              f"only wins if it raises achieved GB/s by more)")
    if mode in ("xla", "full"):
        xla_cost()
    if mode in ("bench", "full"):
        bench_shapes()


if __name__ == "__main__":
    main()
