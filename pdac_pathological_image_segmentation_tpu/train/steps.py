"""jit-compiled train/eval step builders.

Factored out of the Trainer so the benchmark harness, the multichip dry-run
entry, and tests all exercise the exact same compiled programs.  Each step
fuses device-side augmentation (``ops/augment.py``), the model forward(+
backward), the objective (``train/objective.py``), and the Adam update into
one XLA computation; with a batch-sharded input the gradient/metric
reductions lower to ICI psums (the reference's DDP all-reduce,
``train_worker.py:79``).
"""

from __future__ import annotations

import flax.linen as nn
import jax
import jax.numpy as jnp

from pdac_pathological_image_segmentation_tpu.ops.augment import (
    eval_transform,
    train_transform,
)
from pdac_pathological_image_segmentation_tpu.train.objective import (
    Objective,
    make_objective,
)
from pdac_pathological_image_segmentation_tpu.train.state import TrainState


def _default_objective() -> Objective:
    from pdac_pathological_image_segmentation_tpu.config import Config

    return make_objective(Config(model="unet"))


def _can_fuse_augment(image_shape, img_size: int, parity_mode: bool,
                      stain: str, aug_dtype) -> bool:
    """Fused Pallas augmentation eligibility: TPU, bf16 pipeline, square
    native-size uint8 input, default-mode semantics, no stain hook
    (``ops/pallas/fused_augment.py`` — measured 25.9 vs 84.1 ms at
    bs=256/512² on v5e vs the XLA chain)."""
    if parity_mode or stain != "none" or aug_dtype != jnp.bfloat16:
        return False
    if image_shape[1] != img_size or image_shape[2] != img_size:
        return False
    if img_size % 8 or image_shape[1] != image_shape[2]:
        return False
    return jax.devices()[0].platform in ("tpu", "axon")


def make_train_step(model: nn.Module, img_size: int, parity_mode: bool = False,
                    donate: bool = True, objective: Objective | None = None,
                    remat: bool = False, grad_accum_steps: int = 1,
                    stain: str = "none", augment: bool = True,
                    fused_augment: bool = True):
    """Returns jitted ``step(state, key, image_u8, mask_u8) →
    (new_state, loss, score)`` — the reference's per-batch body
    (``train_worker.py:67-83``) as one fused program.

    ``remat=True`` wraps the forward in ``jax.checkpoint``: the backward
    pass recomputes activations instead of keeping them live, trading ~⅓
    more FLOPs for O(params+inputs) activation memory — enables much larger
    per-chip batches at 512² (config extra ``remat: true``).

    ``grad_accum_steps=k`` splits each batch into k microbatches scanned
    sequentially (``lax.scan`` — one compiled body, no unrolling), averaging
    gradients before a single Adam update (config extra
    ``grad_accum_steps``).  Combined with ``remat`` this runs the
    reference's global batch 128 at 512² within a single chip's HBM.  Note
    the Dice objective is batch-global, so the accumulated loss is the mean
    of per-microbatch Dice — a standard, slightly different estimator than
    full-batch Dice; BN running stats update per microbatch (chained)."""
    obj = objective or _default_objective()

    def forward(params, batch_stats, imgs, k_drop):
        return model.apply(
            {"params": params, "batch_stats": batch_stats},
            imgs, train=True, mutable=["batch_stats"],
            rngs={"dropout": k_drop},
        )

    if remat:
        forward = jax.checkpoint(forward)

    def micro_grads(params, batch_stats, imgs, msks, valid, k_drop):
        def loss_fn(p):
            out, mutated = forward(p, batch_stats, imgs, k_drop)
            return obj.loss_fn(out, msks, valid), (out, mutated["batch_stats"])

        (loss, (out, new_bs)), grads = jax.value_and_grad(
            loss_fn, has_aux=True
        )(params)
        # score on the pre-update forward (reference quirk #5,
        # train_worker.py:72-76)
        score = obj.score_fn(out, msks, valid)
        return grads, new_bs, loss, score

    def step(state: TrainState, key, image, mask, valid=None):
        # ``valid`` (N bool, optional): False marks wrap-padded samples of a
        # final partial batch.  The reference's DataLoader keeps partial
        # batches (drop_last defaults False, train_worker.py:218-225); with
        # static shapes we keep them by wrap-padding and masking the padded
        # samples out of loss/score (they still pass through BN batch stats —
        # real images, negligible effect).
        k_aug, k_drop = jax.random.split(key)
        if augment:
            # run the augmentation chain in the model's compute dtype so no
            # full-image float32 tensor ever hits HBM (uint8 is exact in
            # bf16; the model consumes bf16 anyway)
            aug_dtype = getattr(model, "dtype", None) or jnp.float32
            if fused_augment and _can_fuse_augment(
                image.shape, img_size, parity_mode, stain, aug_dtype
            ):
                # fused Pallas augmentation (same per-sample RNG stream as
                # train_transform; default-on where eligible — it WINS:
                # 25.9 vs 84.1 ms at bs=256/512² on v5e)
                from pdac_pathological_image_segmentation_tpu.ops.pallas.fused_augment import (
                    fused_train_transform,
                )

                imgs, msks = fused_train_transform(k_aug, image, mask)
            else:
                imgs, msks = train_transform(
                    k_aug, image, mask, img_size=img_size,
                    parity_mode=parity_mode, stain=stain, dtype=aug_dtype,
                )
        else:
            # augmentation disabled (config extra ``augment: false``):
            # val-pipeline transform only — also the deterministic input
            # path the cross-framework training-parity harness relies on
            # (scripts/train_parity.py)
            imgs, msks = eval_transform(image, mask, img_size=img_size,
                                        stain=stain)

        if grad_accum_steps <= 1:
            grads, new_bs, loss, score = micro_grads(
                state.params, state.batch_stats, imgs, msks, valid, k_drop
            )
        else:
            k = grad_accum_steps
            b = imgs.shape[0]
            assert b % k == 0, "batch must divide grad_accum_steps"
            imgs_m = imgs.reshape(k, b // k, *imgs.shape[1:])
            msks_m = msks.reshape(k, b // k, *msks.shape[1:])
            valid_m = (jnp.ones((k, b // k), bool) if valid is None
                       else valid.reshape(k, b // k))
            keys_m = jax.random.split(k_drop, k)

            def body(carry, inp):
                bs, grad_sum, loss_sum, score_sum = carry
                im, ms, vd, kk = inp
                g, bs, l, s = micro_grads(state.params, bs, im, ms, vd, kk)
                grad_sum = jax.tree_util.tree_map(jnp.add, grad_sum, g)
                return (bs, grad_sum, loss_sum + l, score_sum + s), None

            zero_grads = jax.tree_util.tree_map(
                lambda p: jnp.zeros(p.shape, jnp.float32), state.params
            )
            (new_bs, grads, loss, score), _ = jax.lax.scan(
                body,
                (state.batch_stats, zero_grads, 0.0, 0.0),
                (imgs_m, msks_m, valid_m, keys_m),
            )
            grads = jax.tree_util.tree_map(lambda g: g / k, grads)
            loss = loss / k
            score = score / k

        new_state = state.apply_gradients(grads).replace(batch_stats=new_bs)
        return new_state, loss, score

    return jax.jit(step, donate_argnums=(0,) if donate else ())


def make_eval_step(model: nn.Module, img_size: int,
                   objective: Objective | None = None, stain: str = "none"):
    """Returns jitted ``step(state, image_u8, mask_u8, valid) →
    (loss, score)`` with wrap-padded samples masked out."""
    obj = objective or _default_objective()
    dtype = getattr(model, "dtype", None) or jnp.float32

    @jax.jit
    def step(state: TrainState, image, mask, valid):
        imgs, msks = eval_transform(image, mask, img_size=img_size,
                                    dtype=dtype, stain=stain)
        out = model.apply(
            {"params": state.params, "batch_stats": state.batch_stats},
            imgs, train=False,
        )
        return obj.loss_fn(out, msks, valid), obj.score_fn(out, msks, valid)

    return step


def _fold_normalize_into_stem(params):
    """Fold the ImageNet normalize's per-channel *scale* into the encoder's
    stem conv kernel — an exact linear identity:

        normalize(x) = (x − 255·mean)·s,  s = 1/(255·std)
        conv_k(normalize(x)) = conv_{k·s}(x − 255·mean)

    The remaining shift is applied to the input (one elementwise op XLA
    fuses into the uint8→bf16 convert + the conv's layout copy), and because
    the shifted input is zero exactly where the normalized input is zero,
    the stem conv's zero padding stays bit-equivalent — no border error.
    Skipping the separate normalize pass saves a full-image HBM round trip
    (measured ~2 ms/step of a 112 ms ResUNet step at bs=512 on v5e).
    Returns a surgically-updated copy of ``params``; requires the
    torchvision stem layout (``encoder/conv1/kernel`` (7,7,3,·))."""
    import numpy as np

    from pdac_pathological_image_segmentation_tpu.config import IMAGENET_STD

    k = params["encoder"]["conv1"]["kernel"]  # (7,7,3,O) f32
    s = jnp.asarray(1.0 / (255.0 * np.asarray(IMAGENET_STD)), k.dtype)
    params = dict(params)
    params["encoder"] = dict(params["encoder"])
    params["encoder"]["conv1"] = {"kernel": k * s[None, None, :, None]}
    return params


def _can_fold_stem(params) -> bool:
    try:
        return tuple(params["encoder"]["conv1"]["kernel"].shape[:3]) == (7, 7, 3)
    except (KeyError, TypeError):
        return False


def make_infer_step(model: nn.Module, img_size: int, stain: str = "none"):
    """Returns jitted ``step(state, image_u8) → probs`` — the tile→mask
    inference path (resize+normalize+forward+sigmoid fused).  Binary models
    (``num_classes == 1``, the reference's case) emit ``(N, H, W)`` sigmoid
    probabilities; multi-class models emit ``(N, H, W, C)`` softmax
    probabilities for the WSI runners' per-class canvases.

    Fast path: **normalize fold** — the ImageNet scale folds into the stem
    conv weights (:func:`_fold_normalize_into_stem`) and the shift into the
    input, skipping the separate normalize pass.  (A Pallas fused
    stem+pool kernel was measured and rejected here — 75.8 ms vs ~17.6 for
    XLA's conv emitter at bs=512, r2/r3 logs in BASELINE.md.)"""
    dtype = getattr(model, "dtype", None) or jnp.float32

    @jax.jit
    def step(state: TrainState, image):
        n = image.shape[0]
        params, batch_stats = state.params, state.batch_stats
        if stain == "none" and _can_fold_stem(params):
            import numpy as np

            from pdac_pathological_image_segmentation_tpu.config import (
                IMAGENET_MEAN,
            )

            params = _fold_normalize_into_stem(params)
            if image.shape[1] != img_size or image.shape[2] != img_size:
                from pdac_pathological_image_segmentation_tpu.ops.resize import (
                    resize_bilinear,
                )

                image = resize_bilinear(image.astype(jnp.float32),
                                        img_size, img_size)
            # mean-shifted 0..255 pixels; the 1/(255·std) scale lives in the
            # folded stem kernel
            m255 = jnp.asarray(255.0 * np.asarray(IMAGENET_MEAN), dtype)
            imgs = image.astype(dtype) - m255
        else:
            imgs, _ = eval_transform(
                image, jnp.zeros((n, 1, 1), jnp.uint8), img_size=img_size,
                dtype=dtype, stain=stain,
            )
        out = model.apply(
            {"params": params, "batch_stats": batch_stats},
            imgs, train=False,
        )
        # logits arrive in the model's head dtype (float32 default;
        # bfloat16 when serving with ``head_dtype: bfloat16``) — keep the
        # sigmoid in that dtype so the bf16 path never writes f32
        if getattr(model, "num_classes", 1) > 1:
            return jax.nn.softmax(out, axis=-1)
        return jax.nn.sigmoid(out[..., 0])

    return step


def make_predict_step(model: nn.Module, img_size: int,
                      objective: Objective | None = None,
                      stain: str = "none"):
    """Returns jitted ``step(state, image_u8) → hard labels`` — binary
    (sigmoid≥0.5) or multi-class (argmax) depending on the objective."""
    obj = objective or _default_objective()
    dtype = getattr(model, "dtype", None) or jnp.float32

    @jax.jit
    def step(state: TrainState, image):
        n = image.shape[0]
        imgs, _ = eval_transform(
            image, jnp.zeros((n, 1, 1), jnp.uint8), img_size=img_size,
            dtype=dtype, stain=stain,
        )
        out = model.apply(
            {"params": state.params, "batch_stats": state.batch_stats},
            imgs, train=False,
        )
        return obj.predict_fn(out)

    return step
