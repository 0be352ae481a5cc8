"""Reference-checkpoint optimizer-state conversion + one-step training
parity vs torch.

The reference's resume restores Adam moments (``train_worker.py:195``);
``load_reference_checkpoint_full`` must carry them over so a resumed-from-
reference run does not restart optimization cold — and, with identical
moments and weights, ONE further Adam step on the same batch must move the
parameters the same way in both frameworks (the end-to-end training-parity
microcheck: forward + Dice loss + backward + Adam in torch vs flax/optax).
"""

import numpy as np
import pytest
import torch

import jax
import jax.numpy as jnp

from pdac_pathological_image_segmentation_tpu.config import (
    IMAGENET_MEAN,
    IMAGENET_STD,
    Config,
)
from pdac_pathological_image_segmentation_tpu.models import build_model
from pdac_pathological_image_segmentation_tpu.ops.dice import dice_loss
from pdac_pathological_image_segmentation_tpu.train.state import (
    create_train_state,
)
from pdac_pathological_image_segmentation_tpu.utils.torch_weights import (
    load_reference_checkpoint_full,
)

from test_resunet_golden import SIZE, _TorchResUNet

LR = 1e-3


def _torch_dice_loss(logits, target, smooth=1e-6):
    """Reference DiceLoss (util.py:6-19): sigmoid inside, global flatten."""
    probs = torch.sigmoid(logits).reshape(-1)
    target = target.reshape(-1)
    inter = (probs * target).sum()
    return 1.0 - (2.0 * inter + smooth) / (probs.sum() + target.sum() + smooth)


def _normalize_np(images_u8):
    x = images_u8.astype(np.float32) / 255.0
    return ((x - np.asarray(IMAGENET_MEAN)) / np.asarray(IMAGENET_STD)
            ).astype(np.float32)


@pytest.fixture(scope="module")
def warm_reference_ckpt(tmp_path_factory):
    """Torch twin trained for 3 Adam steps → reference-format latest.pth."""
    torch.manual_seed(0)
    tmodel = _TorchResUNet().train()
    opt = torch.optim.Adam(tmodel.parameters(), lr=LR)
    rng = np.random.default_rng(0)
    for _ in range(3):
        imgs = rng.integers(0, 256, (2, SIZE, SIZE, 3), dtype=np.uint8)
        msks = rng.integers(0, 2, (2, SIZE, SIZE)).astype(np.float32)
        x = torch.as_tensor(_normalize_np(imgs).transpose(0, 3, 1, 2))
        out = tmodel(x)[:, 0]
        loss = _torch_dice_loss(out, torch.as_tensor(msks))
        opt.zero_grad()
        loss.backward()
        opt.step()
    path = tmp_path_factory.mktemp("ckpt") / "latest.pth"
    torch.save({
        "model": {f"module.{k}": v for k, v in tmodel.state_dict().items()},
        "optimizer": opt.state_dict(),
        "epoch": 2,
        "previous_best": 0.4,
    }, path)
    return str(path), tmodel, opt


def _flax_state_from(path):
    cfg = Config(model="unet", img_size=SIZE, compute_dtype="float32", lr=LR)
    model = build_model(cfg)
    state = create_train_state(cfg, model, jax.random.PRNGKey(0))
    state, meta = load_reference_checkpoint_full(path, state)
    return model, state, meta


def test_adam_moments_converted(warm_reference_ckpt):
    path, tmodel, opt = warm_reference_ckpt
    model, state, meta = _flax_state_from(path)
    assert meta["epoch"] == 2 and meta["previous_best"] == 0.4
    assert int(state.step) == 3

    # locate the ScaleByAdamState inside the injected-hyperparams chain
    import optax

    adam_states = [
        n for n in jax.tree_util.tree_leaves(
            state.opt_state,
            is_leaf=lambda n: isinstance(n, optax.ScaleByAdamState))
        if isinstance(n, optax.ScaleByAdamState)
    ]
    assert len(adam_states) == 1
    adam = adam_states[0]
    assert int(adam.count) == 3

    # param index 0 == encoder.conv1.weight (state_dict order)
    exp_avg = opt.state_dict()["state"][0]["exp_avg"].numpy()
    got = np.asarray(adam.mu["encoder"]["conv1"]["kernel"])
    np.testing.assert_allclose(got, exp_avg.transpose(2, 3, 1, 0), rtol=1e-6)
    exp_avg_sq = opt.state_dict()["state"][0]["exp_avg_sq"].numpy()
    got_nu = np.asarray(adam.nu["encoder"]["conv1"]["kernel"])
    np.testing.assert_allclose(got_nu, exp_avg_sq.transpose(2, 3, 1, 0),
                               rtol=1e-6)
    # a decoder transposed-conv moment went through the flip+transpose
    names = [k for k in tmodel.state_dict()
             if not k.endswith(("running_mean", "running_var",
                                "num_batches_tracked"))]
    i_up = names.index("upconv1.weight")
    mu_up = np.asarray(adam.mu["upconv1"]["kernel"])
    ref_up = opt.state_dict()["state"][i_up]["exp_avg"].numpy()
    np.testing.assert_allclose(
        mu_up, ref_up[:, :, ::-1, ::-1].transpose(2, 3, 0, 1), rtol=1e-6)


@pytest.mark.slow
def test_one_step_training_parity_vs_torch(warm_reference_ckpt):
    """With converted weights+moments, one identical (batch, loss, Adam)
    step moves parameters identically in torch and flax/optax."""
    path, tmodel, opt = warm_reference_ckpt
    model, state, _ = _flax_state_from(path)

    rng = np.random.default_rng(42)
    imgs = rng.integers(0, 256, (2, SIZE, SIZE, 3), dtype=np.uint8)
    msks = rng.integers(0, 2, (2, SIZE, SIZE)).astype(np.float32)
    norm = _normalize_np(imgs)

    # --- torch step
    tmodel.train()
    out = tmodel(torch.as_tensor(norm.transpose(0, 3, 1, 2)))[:, 0]
    tloss = _torch_dice_loss(out, torch.as_tensor(msks))
    opt.zero_grad()
    tloss.backward()
    before = {k: v.detach().clone() for k, v in tmodel.state_dict().items()}
    opt.step()
    after = tmodel.state_dict()

    # --- flax step (same math, no augmentation)
    def loss_fn(p):
        outs, mut = model.apply(
            {"params": p, "batch_stats": state.batch_stats},
            jnp.asarray(norm), train=True, mutable=["batch_stats"],
        )
        return dice_loss(outs[..., 0], jnp.asarray(msks)), mut

    (floss, _), grads = jax.value_and_grad(loss_fn, has_aux=True)(state.params)
    new_state = state.apply_gradients(grads)

    np.testing.assert_allclose(float(floss), float(tloss), rtol=1e-5)

    checks = [
        (("encoder", "conv1", "kernel"), "encoder.conv1.weight",
         lambda w: w.transpose(2, 3, 1, 0)),
        (("conv4", "kernel"), "conv4.weight",
         lambda w: w.transpose(2, 3, 1, 0)),
        (("encoder", "layer3_0", "bn2", "scale"), "encoder.layer3.0.bn2.weight",
         lambda w: w),
    ]
    for fpath, tname, tf in checks:
        node_new, node_old = new_state.params, state.params
        for k in fpath:
            node_new, node_old = node_new[k], node_old[k]
        delta_f = np.asarray(node_new) - np.asarray(node_old)
        delta_t = tf((after[tname] - before[tname]).numpy())
        # Adam-normalized updates are O(lr); demand they agree to ~1%
        np.testing.assert_allclose(delta_f, delta_t, atol=LR * 0.02,
                                   err_msg=tname)
        assert np.abs(delta_t).max() > LR * 0.1  # the step actually moved


# ---------------------------------------------------------------------------
# smp models: moments derived via the graft recorder (torch_weights.py
# _convert_smp_with_moments) — reference train_worker.py:186-201 resume for
# fpn / deeplabv3+ / pspnet
# ---------------------------------------------------------------------------

def _warm_torch_ckpt(tmodel, tmp_path_factory, tag):
    opt = torch.optim.Adam(tmodel.parameters(), lr=LR)
    rng = np.random.default_rng(3)
    for _ in range(2):
        imgs = rng.integers(0, 256, (2, SIZE, SIZE, 3), dtype=np.uint8)
        msks = rng.integers(0, 2, (2, SIZE, SIZE)).astype(np.float32)
        x = torch.as_tensor(_normalize_np(imgs).transpose(0, 3, 1, 2))
        loss = _torch_dice_loss(tmodel(x)[:, 0], torch.as_tensor(msks))
        opt.zero_grad()
        loss.backward()
        opt.step()
    path = tmp_path_factory.mktemp(tag) / "latest.pth"
    torch.save({
        "model": {f"module.{k}": v for k, v in tmodel.state_dict().items()},
        "optimizer": opt.state_dict(),
        "epoch": 1,
        "previous_best": 0.3,
    }, path)
    return str(path), opt


def _find_adam(state):
    import optax

    adams = [
        n for n in jax.tree_util.tree_leaves(
            state.opt_state,
            is_leaf=lambda n: isinstance(n, optax.ScaleByAdamState))
        if isinstance(n, optax.ScaleByAdamState)
    ]
    assert len(adams) == 1
    return adams[0]


def _check_moments(adam, tmodel, opt, checks):
    names = [k for k in tmodel.state_dict()
             if not k.endswith(("running_mean", "running_var",
                                "num_batches_tracked"))]
    opt_state = opt.state_dict()["state"]
    for tname, fpath, tf in checks:
        i = names.index(tname)
        assert i in opt_state, f"{tname}: no torch Adam state"
        for torch_m, flax_tree in (("exp_avg", adam.mu),
                                   ("exp_avg_sq", adam.nu)):
            ref = opt_state[i][torch_m].numpy()
            node = flax_tree
            for k in fpath:
                node = node[k]
            np.testing.assert_allclose(np.asarray(node), tf(ref), rtol=1e-6,
                                       err_msg=f"{tname} {torch_m}")


def test_fpn_adam_moments_converted(tmp_path_factory):
    from test_fpn_golden import _TorchSmpFPN

    torch.manual_seed(5)
    tmodel = _TorchSmpFPN().train()
    path, opt = _warm_torch_ckpt(tmodel, tmp_path_factory, "fpnckpt")

    cfg = Config(model="fpn", img_size=SIZE, compute_dtype="float32", lr=LR,
                 use_pallas=False)
    model = build_model(cfg)
    state = create_train_state(cfg, model, jax.random.PRNGKey(0))
    state, meta = load_reference_checkpoint_full(path, state,
                                                 model_name="fpn")
    assert meta["epoch"] == 1
    adam = _find_adam(state)
    assert int(adam.count) == 2

    oihw = lambda w: w.transpose(2, 3, 1, 0)
    ident = lambda w: w
    _check_moments(adam, tmodel, opt, [
        ("encoder.conv1.weight", ("encoder", "conv1", "kernel"), oihw),
        ("encoder.layer3.0.bn2.weight",
         ("encoder", "layer3_0", "bn2", "scale"), ident),
        ("decoder.p5.weight", ("lateral5", "kernel"), oihw),
        ("decoder.p5.bias", ("lateral5", "bias"), ident),
        ("decoder.p4.skip_conv.weight", ("lateral4", "kernel"), oihw),
        ("decoder.seg_blocks.0.block.0.block.0.weight",
         ("seg0_0", "Conv_0", "kernel"), oihw),
        ("decoder.seg_blocks.0.block.0.block.1.weight",
         ("seg0_0", "GroupNorm_0", "scale"), ident),
        ("segmentation_head.0.weight", ("head", "kernel"), oihw),
        ("segmentation_head.0.bias", ("head", "bias"), ident),
    ])


def test_pspnet_adam_moments_converted(tmp_path_factory):
    from test_pspnet_golden import _TorchSmpPSPNet

    torch.manual_seed(6)
    tmodel = _TorchSmpPSPNet().train()
    path, opt = _warm_torch_ckpt(tmodel, tmp_path_factory, "pspckpt")

    cfg = Config(model="pspnet", img_size=SIZE, compute_dtype="float32",
                 lr=LR, use_pallas=False)
    model = build_model(cfg)
    state = create_train_state(cfg, model, jax.random.PRNGKey(0))
    state, meta = load_reference_checkpoint_full(path, state,
                                                 model_name="pspnet")
    adam = _find_adam(state)
    assert int(adam.count) == 2

    oihw = lambda w: w.transpose(2, 3, 1, 0)
    ident = lambda w: w
    _check_moments(adam, tmodel, opt, [
        ("encoder.conv1.weight", ("encoder", "conv1", "kernel"), oihw),
        ("decoder.psp.blocks.0.pool.1.0.weight",
         ("psp_1", "conv", "kernel"), oihw),
        ("decoder.psp.blocks.0.pool.1.0.bias",
         ("psp_1", "conv", "bias"), ident),
        ("decoder.conv.0.weight", ("bottleneck_conv", "kernel"), oihw),
        ("segmentation_head.0.weight", ("head", "kernel"), oihw),
    ])
    # depth-3 encoder: layer4 never runs in the twin -> no torch Adam
    # state -> its converted moments stay cold (zeros)
    names = [k for k in tmodel.state_dict()
             if not k.endswith(("running_mean", "running_var",
                                "num_batches_tracked"))]
    i4 = names.index("encoder.layer4.0.conv1.weight")
    assert i4 not in opt.state_dict()["state"]
    assert float(np.abs(
        np.asarray(adam.mu["encoder"]["layer4_0"]["conv1"]["kernel"])
    ).sum()) == 0.0


def test_deeplab_adam_moments_converted(tmp_path_factory):
    from test_deeplab_golden import _TorchSmpDeepLabV3Plus

    torch.manual_seed(7)
    tmodel = _TorchSmpDeepLabV3Plus().train()
    path, opt = _warm_torch_ckpt(tmodel, tmp_path_factory, "dlckpt")

    cfg = Config(model="deeplabv3+", img_size=SIZE, compute_dtype="float32",
                 lr=LR, use_pallas=False)
    model = build_model(cfg)
    state = create_train_state(cfg, model, jax.random.PRNGKey(0))
    state, meta = load_reference_checkpoint_full(path, state,
                                                 model_name="deeplabv3+")
    adam = _find_adam(state)
    assert int(adam.count) == 2

    oihw = lambda w: w.transpose(2, 3, 1, 0)
    ident = lambda w: w
    _check_moments(adam, tmodel, opt, [
        ("encoder.conv1.weight", ("encoder", "conv1", "kernel"), oihw),
        ("decoder.aspp.0.convs.0.0.weight",
         ("aspp", "branch_1x1", "conv", "kernel"), oihw),
        # SeparableConv2d: depthwise (C,1,k,k) gets the same OIHW->HWIO op
        ("decoder.aspp.0.convs.1.0.0.weight",
         ("aspp", "branch_r0", "depthwise", "kernel"), oihw),
        ("decoder.aspp.0.convs.1.0.1.weight",
         ("aspp", "branch_r0", "pointwise", "kernel"), oihw),
        ("decoder.aspp.0.project.1.weight",
         ("aspp", "project", "bn", "scale"), ident),
        ("decoder.block1.0.weight", ("skip_project", "conv", "kernel"), oihw),
        ("segmentation_head.0.weight", ("head", "kernel"), oihw),
    ])
