#!/usr/bin/env python
"""A/B the train-step schedule: can augmentation of batch k+1 overlap
training on batch k?  (VERDICT r4 item 1.)

Three schedules, identical math per step:

  fused      the shipped step — augment(k) + train(k) in ONE program
  split      two programs — augment(k) dispatched, then core-train(k);
             the host enqueues augment(k+1) before fetching step k
             (double-buffered dispatch order)
  pipelined  ONE program computing train(aug_k) AND augment(raw_{k+1})
             as independent subgraphs, augmented buffers donated — the
             software-pipelining formulation (the state carries the
             next batch's augmented tensors)

On a TPU a core executes one program at a time and ops within a program
serialize on the single instruction stream, so neither split programs
nor independent subgraphs can overlap augment COMPUTE with train
COMPUTE — this trial exists to measure that expectation rather than
assume it (and to catch any secondary scheduling/fusion effects).

Run serially — one process owns the TPU.
"""

from __future__ import annotations

import argparse
import json
import time

import jax
import jax.numpy as jnp
import numpy as np


def main() -> None:
    p = argparse.ArgumentParser()
    p.add_argument("--batch", type=int, default=256)
    p.add_argument("--seconds", type=float, default=20.0)
    p.add_argument("--schedules", default="fused,split,pipelined")
    args = p.parse_args()

    from pdac_pathological_image_segmentation_tpu.config import Config
    from pdac_pathological_image_segmentation_tpu.utils.cache import (
        enable_compile_cache,
    )

    enable_compile_cache()
    from pdac_pathological_image_segmentation_tpu.models.registry import (
        build_model,
    )
    from pdac_pathological_image_segmentation_tpu.ops.pallas.fused_augment import (
        fused_train_transform,
    )
    from pdac_pathological_image_segmentation_tpu.train.objective import (
        make_objective,
    )
    from pdac_pathological_image_segmentation_tpu.train.state import (
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
    obj = make_objective(cfg)
    state0 = jax.device_put(
        create_train_state(cfg, model, jax.random.PRNGKey(0)))
    # every schedule donates its state, so each section starts from a
    # fresh on-device copy (a*1 forces new buffers without a host trip)
    fresh_state = jax.jit(
        lambda s: jax.tree_util.tree_map(lambda a: a * 1, s))
    b = args.batch
    rng = np.random.default_rng(0)
    x = jax.device_put(rng.integers(0, 256, (b, 512, 512, 3), dtype=np.uint8))
    m = jax.device_put(rng.integers(0, 2, (b, 512, 512), dtype=np.uint8))
    key = jax.random.PRNGKey(0)
    results = {}

    def core(state, imgs, msks, k_drop):
        """fwd+bwd+Adam on already-augmented tensors (the train step minus
        its augmentation section — mirrors train/steps.py micro_grads)."""
        def loss_fn(params):
            out, mutated = model.apply(
                {"params": params, "batch_stats": state.batch_stats},
                imgs, train=True, mutable=["batch_stats"],
                rngs={"dropout": k_drop},
            )
            return obj.loss_fn(out, msks, None), mutated["batch_stats"]

        (loss, new_bs), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(state.params)
        return state.apply_gradients(grads).replace(batch_stats=new_bs), loss

    def run(label, step_fn, warm_fn, fetch, depth: int = 4):
        """``depth`` = steps between completion fetches; the split/
        pipelined schedules keep an extra augmented batch (~670 MB at
        bs=256) alive per in-flight step, so they fetch every 2.

        An OOM (ResourceExhausted) is a RESULT here, not a crash — the
        schedule's extra live buffers not fitting is exactly what the
        A/B is measuring; record it and let the next schedule run."""
        try:
            warm_fn()
            # fetch BEFORE the timer: the relay compiles its scalar-fetch
            # program on first use (~minutes cold) — without this, the
            # first schedule's timed window absorbs that compile (the
            # "fused 0.5 patches/s" artifact)
            fetch()
            n = 0
            t0 = time.perf_counter()
            while time.perf_counter() - t0 < args.seconds:
                step_fn()
                if (n + 1) % depth == 0:
                    fetch()
                n += 1
            fetch()
            dt = time.perf_counter() - t0
            results[label] = round(n * b / dt, 1)
        except jax.errors.JaxRuntimeError as e:
            results[label] = ("OOM" if "RESOURCE_EXHAUSTED" in str(e)
                              else f"error: {str(e)[:120]}")
        print(label, results[label], "patches/s", flush=True)

    schedules = args.schedules.split(",")

    if "fused" in schedules:
        s0 = fresh_state(state0)
        step = compile_serving(make_train_step(model, 512, donate=True),
                               s0, key, x, m,
                               options=TRAIN_COMPILER_OPTIONS)
        st = {"s": s0, "loss": None}

        def do():
            st["s"], st["loss"], _ = step(st["s"], key, x, m)

        run("fused", do, do, lambda: float(st["loss"]))
        del step, st

    if "split" in schedules:
        s0 = fresh_state(state0)
        aug = jax.jit(lambda k, im, ms: fused_train_transform(k, im, ms))
        ex_i, ex_m = aug(key, x, m)
        core_j = compile_serving(
            jax.jit(core, donate_argnums=(0, 1, 2)),
            s0, ex_i, ex_m, key,
            options=TRAIN_COMPILER_OPTIONS)
        st = {"s": s0, "loss": None, "nxt": aug(key, x, m)}

        def do():
            imgs, msks = st["nxt"]
            st["nxt"] = aug(key, x, m)      # enqueue k+1's augment first
            st["s"], st["loss"] = core_j(st["s"], imgs, msks, key)

        run("split", do, do, lambda: float(st["loss"]), depth=1)
        del aug, core_j, st

    if "pipelined" in schedules:
        def pipe(state, aug_imgs, aug_msks, raw_img, raw_msk, k):
            k_aug, k_drop = jax.random.split(k)
            new_state, loss = core(state, aug_imgs, aug_msks, k_drop)
            nxt_imgs, nxt_msks = fused_train_transform(k_aug, raw_img,
                                                       raw_msk)
            return new_state, nxt_imgs, nxt_msks, loss

        s0 = fresh_state(state0)
        imgs0, msks0 = jax.jit(fused_train_transform)(key, x, m)
        pipe_j = compile_serving(
            jax.jit(pipe, donate_argnums=(0, 1, 2)),
            s0, imgs0, msks0, x, m, key,
            options=TRAIN_COMPILER_OPTIONS)
        st = {"s": s0, "i": imgs0, "m": msks0, "loss": None}

        def do():
            st["s"], st["i"], st["m"], st["loss"] = pipe_j(
                st["s"], st["i"], st["m"], x, m, key)

        run("pipelined", do, do, lambda: float(st["loss"]), depth=1)

    print(json.dumps({"batch": b, **results}))


if __name__ == "__main__":
    main()
