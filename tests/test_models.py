import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pdac_pathological_image_segmentation_tpu.config import Config
from pdac_pathological_image_segmentation_tpu.models import (
    ResNetEncoder,
    build_model,
)

BATCH, SIZE = 2, 64  # tiny for CPU tests; strides identical to 512² behavior


def _init_and_apply(model, x, train=False):
    rngs = {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)}
    variables = model.init(rngs, x, train=False)
    out = model.apply(
        variables, x, train=train,
        rngs={"dropout": jax.random.PRNGKey(2)} if train else None,
        mutable=["batch_stats"] if train else False,
    )
    return variables, out


def test_encoder_feature_pyramid_shapes():
    x = jnp.zeros((BATCH, SIZE, SIZE, 3), jnp.float32)
    enc = ResNetEncoder(backbone="resnet18")
    variables = enc.init(jax.random.PRNGKey(0), x, train=False)
    feats = enc.apply(variables, x, train=False)
    strides = [2, 4, 8, 16, 32]
    chans = [64, 64, 128, 256, 512]
    assert len(feats) == 5
    for f, s, c in zip(feats, strides, chans):
        assert f.shape == (BATCH, SIZE // s, SIZE // s, c)


def test_encoder_output_stride_16():
    x = jnp.zeros((BATCH, SIZE, SIZE, 3), jnp.float32)
    enc = ResNetEncoder(backbone="resnet18", output_stride=16)
    variables = enc.init(jax.random.PRNGKey(0), x, train=False)
    feats = enc.apply(variables, x, train=False)
    # c5 stays at stride 16 (dilated instead of strided)
    assert feats[-1].shape == (BATCH, SIZE // 16, SIZE // 16, 512)


@pytest.mark.parametrize("model_name", ["unet", "fpn", "deeplabv3+", "pspnet"])
def test_model_output_contract(model_name):
    """model(x: N×H×W×3) → N×H×W×1 logits — the reference's L2 interface
    (SURVEY.md §1) in NHWC."""
    cfg = Config(model=model_name, img_size=SIZE, compute_dtype="float32")
    model = build_model(cfg)
    x = jnp.zeros((BATCH, SIZE, SIZE, 3), jnp.float32)
    _, out = _init_and_apply(model, x)
    assert out.shape == (BATCH, SIZE, SIZE, 1)
    assert out.dtype == jnp.float32


@pytest.mark.parametrize("model_name", ["unet", "fpn"])
def test_model_train_mode_updates_batch_stats(model_name):
    cfg = Config(model=model_name, img_size=SIZE, compute_dtype="float32")
    model = build_model(cfg)
    x = jnp.asarray(np.random.default_rng(0).normal(size=(BATCH, SIZE, SIZE, 3)),
                    jnp.float32)
    variables, (out, mutated) = _init_and_apply(model, x, train=True)
    assert "batch_stats" in mutated
    # running stats must have moved off their init values
    old = jax.tree_util.tree_leaves(variables["batch_stats"])
    new = jax.tree_util.tree_leaves(mutated["batch_stats"])
    assert any(not np.allclose(o, n) for o, n in zip(old, new))


def test_bfloat16_compute_path():
    cfg = Config(model="unet", img_size=SIZE, compute_dtype="bfloat16")
    model = build_model(cfg)
    x = jnp.zeros((BATCH, SIZE, SIZE, 3), jnp.float32)
    variables, out = _init_and_apply(model, x)
    # params stay fp32, output logits come back fp32 (cast at the resize head)
    assert all(
        p.dtype == jnp.float32 for p in jax.tree_util.tree_leaves(variables["params"])
    )
    assert out.dtype == jnp.float32


def test_resunet_stem_skip_unused_topology():
    """The reference quirk: stem feature x1 never concatenated
    (models/resunet.py:25-33). Our decoder conv1 input is 512 (256 up + 256
    skip), not 512+64."""
    cfg = Config(model="unet", img_size=SIZE, compute_dtype="float32")
    model = build_model(cfg)
    x = jnp.zeros((1, SIZE, SIZE, 3), jnp.float32)
    variables = model.init({"params": jax.random.PRNGKey(0)}, x, train=False)
    k = variables["params"]["conv1"]["kernel"]
    assert k.shape == (3, 3, 512, 256)


def test_folded_stem_matches_unfolded():
    """ResNetEncoder(fold_stem=True) is bit-equivalent (fp noise) to the
    plain 7×7/2 stem with the same params (ops/folded_stem.py)."""
    x = jnp.asarray(
        np.random.default_rng(3).normal(size=(2, SIZE, SIZE, 3)), jnp.float32
    )
    enc_fold = ResNetEncoder(backbone="resnet18", fold_stem=True)
    enc_plain = ResNetEncoder(backbone="resnet18", fold_stem=False)
    variables = enc_fold.init(jax.random.PRNGKey(0), x, train=False)
    f_fold = enc_fold.apply(variables, x, train=False)
    f_plain = enc_plain.apply(variables, x, train=False)
    for a, b in zip(f_fold, f_plain):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-4, atol=1e-4)


@pytest.mark.slow
def test_resnet50_backbone_builds():
    """Bottleneck-block backbone path (cfg backbone choices, SURVEY C10)."""
    cfg = Config(model="fpn", backbone="resnet50", img_size=SIZE,
                 compute_dtype="float32")
    model = build_model(cfg)
    x = jnp.zeros((1, SIZE, SIZE, 3), jnp.float32)
    v = model.init({"params": jax.random.PRNGKey(0)}, x, train=False)
    out = model.apply(v, x, train=False)
    assert out.shape == (1, SIZE, SIZE, 1)


def test_resnet34_backbone_builds():
    cfg = Config(model="pspnet", backbone="resnet34", img_size=SIZE,
                 compute_dtype="float32")
    model = build_model(cfg)
    x = jnp.zeros((1, SIZE, SIZE, 3), jnp.float32)
    v = model.init({"params": jax.random.PRNGKey(0)}, x, train=False)
    out = model.apply(v, x, train=False)
    assert out.shape == (1, SIZE, SIZE, 1)
