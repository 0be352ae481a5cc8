#!/usr/bin/env python
"""Memory-side train-step ladder (VERDICT r4 item 3).

The roofline table (BASELINE.md round 4) says the train step is
memory-bound: 399 MB HBM/patch at 56% of peak BW vs 47.7% MFU.  This
ladder measures each memory-side lever ONE AT A TIME against a fresh
baseline on an idle VM:

  baseline     the shipped step (fused augment v2, donate, 64 MiB scoped
               vmem, bs=256)
  mu8          Adam first moment in bf16 (optax mu_dtype) — the "bf16
               moments" lever.  Expectation check first: ResUNet-18 has
               ~14M params, so params+grads+mu+nu ≈ 230 MB/step of
               traffic = 0.2% of the step's ~102 GB — the param-side
               levers are arithmetic noise; measured to confirm.
  remat256     jax.checkpoint over the forward at bs=256 — remat as a
               BYTES play (r2 tested it only at bs=512 as a batch
               enabler: 781 patches/s)
  depth8       completion fetch every 8 steps instead of 4 (dispatch
               pipelining headroom)

Run serially — one process owns the TPU.
"""

from __future__ import annotations

import argparse
import json
import time

import jax
import jax.numpy as jnp
import numpy as np


def measure(step, state0, key, x, m, seconds: float, batch: int,
            depth: int = 4):
    """Throughput of a compiled train step; steps chain on the donated
    state, completion forced by a loss fetch every ``depth`` steps."""
    st = {"s": state0, "loss": None}

    def do():
        st["s"], st["loss"], _ = step(st["s"], key, x, m)

    do()
    _ = float(st["loss"])
    n = 0
    t0 = time.perf_counter()
    while time.perf_counter() - t0 < seconds:
        do()
        if (n + 1) % depth == 0:
            _ = float(st["loss"])
        n += 1
    _ = float(st["loss"])
    dt = time.perf_counter() - t0
    return round(n * batch / dt, 1)


def main() -> None:
    p = argparse.ArgumentParser()
    p.add_argument("--batch", type=int, default=256)
    p.add_argument("--seconds", type=float, default=20.0)
    p.add_argument("--levers", default="baseline,mu8,remat256,depth8")
    args = p.parse_args()

    from pdac_pathological_image_segmentation_tpu.config import Config
    from pdac_pathological_image_segmentation_tpu.utils.cache import (
        enable_compile_cache,
    )

    enable_compile_cache()
    import optax

    from pdac_pathological_image_segmentation_tpu.models.registry import (
        build_model,
    )
    from pdac_pathological_image_segmentation_tpu.train.state import (
        TrainState,
        create_train_state,
    )
    from pdac_pathological_image_segmentation_tpu.train.steps import (
        make_train_step,
    )
    from pdac_pathological_image_segmentation_tpu.utils.compile_options import (
        TRAIN_COMPILER_OPTIONS,
        compile_serving,
    )

    cfg = Config(model="unet", img_size=512, compute_dtype="bfloat16")
    model = build_model(cfg)
    state0 = create_train_state(cfg, model, jax.random.PRNGKey(0))
    n_params = sum(x.size for x in jax.tree_util.tree_leaves(state0.params))
    b = args.batch
    rng = np.random.default_rng(0)
    x = jax.device_put(rng.integers(0, 256, (b, 512, 512, 3), dtype=np.uint8))
    m = jax.device_put(rng.integers(0, 2, (b, 512, 512), dtype=np.uint8))
    key = jax.random.PRNGKey(0)
    results = {"batch": b, "n_params": int(n_params)}
    levers = args.levers.split(",")

    # every lever donates its state: each section gets fresh on-device
    # buffers (a*1 forces new allocations without a host round-trip)
    _fresh = jax.jit(lambda s: jax.tree_util.tree_map(lambda a: a * 1, s))

    def fresh():
        return _fresh(jax.device_put(state0))

    if "baseline" in levers:
        step = compile_serving(make_train_step(model, 512, donate=True),
                               fresh(), key, x, m,
                               options=TRAIN_COMPILER_OPTIONS)
        results["baseline"] = measure(step, fresh(), key, x, m,
                                      args.seconds, b)
        print("baseline", results["baseline"], flush=True)
        del step

    if "mu8" in levers:
        # Adam with bf16 first moment (nu has no dtype knob in optax;
        # mu alone halves one of the two moment tensors)
        tx8 = optax.inject_hyperparams(optax.adam,
                                       static_args=("mu_dtype",))(
            learning_rate=cfg.lr, b1=0.9, b2=0.999, eps=1e-8,
            mu_dtype=jnp.bfloat16)
        # fresh device copies — donating buffers shared with state0 would
        # delete state0's arrays out from under later levers
        def mk8():
            f0 = fresh()
            return TrainState(step=jnp.zeros((), jnp.int32),
                              params=f0.params, batch_stats=f0.batch_stats,
                              opt_state=tx8.init(f0.params), tx=tx8)

        step = compile_serving(make_train_step(model, 512, donate=True),
                               mk8(), key, x, m,
                               options=TRAIN_COMPILER_OPTIONS)
        results["mu8"] = measure(step, mk8(), key, x, m, args.seconds, b)
        print("mu8", results["mu8"], flush=True)
        del step

    if "remat256" in levers:
        step = compile_serving(
            make_train_step(model, 512, donate=True, remat=True),
            fresh(), key, x, m, options=TRAIN_COMPILER_OPTIONS)
        results["remat256"] = measure(step, fresh(), key, x, m,
                                      args.seconds, b)
        print("remat256", results["remat256"], flush=True)
        del step

    if "depth8" in levers:
        step = compile_serving(make_train_step(model, 512, donate=True),
                               fresh(), key, x, m,
                               options=TRAIN_COMPILER_OPTIONS)
        results["depth8"] = measure(step, fresh(), key, x, m,
                                    args.seconds, b, depth=8)
        print("depth8", results["depth8"], flush=True)
        del step

    print(json.dumps(results))


if __name__ == "__main__":
    main()
