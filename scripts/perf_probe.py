"""Train-step time breakdown on the real TPU.

Measures, for a given model/batch config:
  * forward-only embedding+logits time
  * full train step (value_and_grad + update) time
  * accumulation-shape variants at constant effective batch

Usage: python scripts/perf_probe.py [model] [batch_size] [accum]
On the axon tunnel, timings must end with a value fetch (remote futures make
block_until_ready a no-op) -- every loop below fetches a scalar.
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp


def timed(fn, *args, iters=10, warmup=2):
    out = None
    for _ in range(warmup):
        out = fn(*args)
    jax.tree.map(
        lambda x: float(x.reshape(-1)[0]),
        jax.tree.leaves(out)[0],
    )
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    float(jax.tree.leaves(out)[0].reshape(-1)[0])
    return (time.perf_counter() - t0) / iters


def main():
    import os
    cache = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".jax_cache")
    jax.config.update("jax_compilation_cache_dir", cache)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)

    from voxsrc2020_speaker_verification_tpu.training import (
        TrainConfig, create_train_state, make_train_step,
    )
    from voxsrc2020_speaker_verification_tpu.training.trainer import build_speaker_net

    model = sys.argv[1] if len(sys.argv) > 1 else "res2net50_w8_s6_c16"
    bs = int(sys.argv[2]) if len(sys.argv) > 2 else 256
    accum = int(sys.argv[3]) if len(sys.argv) > 3 else 4
    # arg 4: "remat" | "remat:<policy>" | "remat@0,1" (stage-selective)
    remat_arg = sys.argv[4] if len(sys.argv) > 4 else ""
    remat = remat_arg.startswith("remat")
    stages = (tuple(int(i) for i in remat_arg.split("@", 1)[1].split(","))
              if remat and "@" in remat_arg else None)
    remat_head = remat_arg.split("@", 1)[0]  # "remat" or "remat:<policy>"
    policy = remat_head.split(":", 1)[1] if remat and ":" in remat_head else None

    config = TrainConfig(
        model=model, projection="sc_cm_linear", num_classes=5994,
        dataset_length=5_460_045, feat_dim=80, feat_length=200,
        batch_size=bs, num_accumulation_steps=accum, bf16=True, remat=remat,
        remat_policy=policy, remat_stages=stages,
    )
    dev = jax.devices()[0]
    print(f"# {dev.platform} {getattr(dev, 'device_kind', '?')} "
          f"model={model} bs={bs} accum={accum} remat={remat} policy={policy} "
          f"stages={stages}",
          file=sys.stderr)

    state = create_train_state(config, jax.random.PRNGKey(0))
    net = build_speaker_net(config)

    feats1 = jax.random.normal(
        jax.random.PRNGKey(1), (bs, config.feat_length, config.feat_dim), jnp.float32)
    labels1 = jax.random.randint(jax.random.PRNGKey(2), (bs,), 0, config.num_classes)

    @jax.jit
    def fwd(params, batch_stats, feats, labels):
        (emb, logits), _ = net.apply(
            {"params": params, "batch_stats": batch_stats},
            feats, labels, config.scale, 0.2, True, mutable=["batch_stats"])
        return logits.astype(jnp.float32).mean()

    t_fwd = timed(fwd, state.params, state.batch_stats, feats1, labels1)
    print(f"forward+proj (bs {bs}):           {t_fwd * 1e3:8.2f} ms")

    @jax.jit
    def fwd_bwd(params, batch_stats, feats, labels):
        def loss(p):
            (emb, logits), _ = net.apply(
                {"params": p, "batch_stats": batch_stats},
                feats, labels, config.scale, 0.2, True, mutable=["batch_stats"])
            import optax
            return optax.softmax_cross_entropy_with_integer_labels(
                logits.astype(jnp.float32), labels).mean()
        l, g = jax.value_and_grad(loss)(params)
        return l, g

    t_fb = timed(fwd_bwd, state.params, state.batch_stats, feats1, labels1)
    print(f"forward+backward (bs {bs}):       {t_fb * 1e3:8.2f} ms")

    step = jax.jit(make_train_step(config), donate_argnums=0)
    feats = jax.random.normal(
        jax.random.PRNGKey(1), (accum, bs, config.feat_length, config.feat_dim),
        jnp.float32)
    labels = jax.random.randint(
        jax.random.PRNGKey(2), (accum, bs), 0, config.num_classes)
    rng = jax.random.PRNGKey(3)

    def run_step(s):
        s2, m = step(s, feats, labels, rng)
        return s2, m

    # manual timing: state is donated, thread it through
    for _ in range(3):
        state, metrics = run_step(state)
    _ = float(metrics["loss"])
    t0 = time.perf_counter()
    iters = 10
    for _ in range(iters):
        state, metrics = run_step(state)
    _ = float(metrics["loss"])
    t_step = (time.perf_counter() - t0) / iters
    eff = bs * accum
    print(f"train step ({accum}x{bs}):            {t_step * 1e3:8.2f} ms  "
          f"= {eff * config.feat_length / 100.0 / t_step:7.1f} audio-s/s")


if __name__ == "__main__":
    main()
