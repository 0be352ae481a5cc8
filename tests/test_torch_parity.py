"""Golden parity tests: flax/XLA layer semantics vs torch (CPU).

The BASELINE target is Dice parity with the reference PyTorch pipeline
within fp tolerance.  torchvision isn't installed here, so these tests pin
the *primitive* semantics our models are built from against torch.nn with
bit-copied weights — conv padding, BN epsilon/momentum/running stats,
transposed conv, maxpool, and the full BasicBlock composite.  Combined with
the weight converter (utils/torch_weights.py) this is the parity chain.
"""

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np
import torch

from pdac_pathological_image_segmentation_tpu.models.resnet import (
    BN_EPS,
    BN_MOMENTUM,
    BasicBlock,
)

RNG = np.random.default_rng(0)
TOL = dict(rtol=2e-4, atol=2e-5)


def _nhwc(x_nchw):
    return jnp.asarray(np.transpose(x_nchw, (0, 2, 3, 1)))


def _to_nchw(y_nhwc):
    return np.transpose(np.asarray(y_nhwc), (0, 3, 1, 2))


def test_conv3x3_matches_torch():
    x = RNG.normal(size=(2, 8, 16, 16)).astype(np.float32)
    tconv = torch.nn.Conv2d(8, 16, 3, padding=1, bias=True)
    with torch.no_grad():
        ref = tconv(torch.as_tensor(x)).numpy()
    fconv = nn.Conv(16, (3, 3), padding=1)
    w = tconv.weight.detach().numpy().transpose(2, 3, 1, 0)  # OIHW→HWIO
    params = {"params": {"kernel": jnp.asarray(w),
                         "bias": jnp.asarray(tconv.bias.detach().numpy())}}
    out = fconv.apply(params, _nhwc(x))
    np.testing.assert_allclose(_to_nchw(out), ref, **TOL)


def test_strided_conv7x7_matches_torch():
    x = RNG.normal(size=(1, 3, 32, 32)).astype(np.float32)
    tconv = torch.nn.Conv2d(3, 64, 7, stride=2, padding=3, bias=False)
    with torch.no_grad():
        ref = tconv(torch.as_tensor(x)).numpy()
    fconv = nn.Conv(64, (7, 7), strides=(2, 2), padding=3, use_bias=False)
    w = tconv.weight.detach().numpy().transpose(2, 3, 1, 0)
    out = fconv.apply({"params": {"kernel": jnp.asarray(w)}}, _nhwc(x))
    np.testing.assert_allclose(_to_nchw(out), ref, **TOL)


def test_dilated_conv_matches_torch():
    x = RNG.normal(size=(1, 4, 16, 16)).astype(np.float32)
    tconv = torch.nn.Conv2d(4, 4, 3, padding=6, dilation=6, bias=False)
    with torch.no_grad():
        ref = tconv(torch.as_tensor(x)).numpy()
    fconv = nn.Conv(4, (3, 3), padding=6, kernel_dilation=(6, 6),
                    use_bias=False)
    w = tconv.weight.detach().numpy().transpose(2, 3, 1, 0)
    out = fconv.apply({"params": {"kernel": jnp.asarray(w)}}, _nhwc(x))
    np.testing.assert_allclose(_to_nchw(out), ref, **TOL)


def test_convtranspose_k2s2_matches_torch():
    # the ResUNet decoder upsampling, reference models/resunet.py:15
    x = RNG.normal(size=(2, 8, 8, 8)).astype(np.float32)
    tconv = torch.nn.ConvTranspose2d(8, 4, 2, stride=2)
    with torch.no_grad():
        ref = tconv(torch.as_tensor(x)).numpy()
    fconv = nn.ConvTranspose(4, (2, 2), strides=(2, 2), padding="VALID")
    # torch ConvTranspose2d weight is (in, out, kH, kW); flax ConvTranspose
    # wants (kH, kW, in, out) with the SPATIAL TAPS FLIPPED (flax lowers to
    # conv_transpose with flipped-kernel semantics)
    w = tconv.weight.detach().numpy()[:, :, ::-1, ::-1].transpose(2, 3, 0, 1)
    out = fconv.apply(
        {"params": {"kernel": jnp.asarray(w),
                    "bias": jnp.asarray(tconv.bias.detach().numpy())}},
        _nhwc(x),
    )
    np.testing.assert_allclose(_to_nchw(out), ref, **TOL)


def test_maxpool_3x3s2p1_matches_torch():
    # the resnet stem pool
    x = RNG.normal(size=(2, 4, 17, 17)).astype(np.float32)
    with torch.no_grad():
        ref = torch.nn.MaxPool2d(3, stride=2, padding=1)(
            torch.as_tensor(x)).numpy()
    out = nn.max_pool(_nhwc(x), (3, 3), strides=(2, 2),
                      padding=((1, 1), (1, 1)))
    np.testing.assert_allclose(_to_nchw(out), ref, **TOL)


def test_batchnorm_inference_matches_torch():
    x = RNG.normal(size=(2, 6, 8, 8)).astype(np.float32)
    tbn = torch.nn.BatchNorm2d(6, eps=BN_EPS, momentum=0.1)
    with torch.no_grad():
        tbn.weight.copy_(torch.as_tensor(RNG.normal(size=6).astype(np.float32)))
        tbn.bias.copy_(torch.as_tensor(RNG.normal(size=6).astype(np.float32)))
        tbn.running_mean.copy_(torch.as_tensor(RNG.normal(size=6).astype(np.float32)))
        tbn.running_var.copy_(torch.as_tensor(
            np.abs(RNG.normal(size=6)).astype(np.float32) + 0.5))
    tbn.eval()
    with torch.no_grad():
        ref = tbn(torch.as_tensor(x)).numpy()
    fbn = nn.BatchNorm(use_running_average=True, momentum=BN_MOMENTUM,
                       epsilon=BN_EPS)
    variables = {
        "params": {"scale": jnp.asarray(tbn.weight.detach().numpy()),
                   "bias": jnp.asarray(tbn.bias.detach().numpy())},
        "batch_stats": {"mean": jnp.asarray(tbn.running_mean.numpy()),
                        "var": jnp.asarray(tbn.running_var.numpy())},
    }
    out = fbn.apply(variables, _nhwc(x))
    np.testing.assert_allclose(_to_nchw(out), ref, **TOL)


def test_batchnorm_training_stats_update_matches_torch():
    x = RNG.normal(size=(4, 6, 8, 8)).astype(np.float32)
    tbn = torch.nn.BatchNorm2d(6, eps=BN_EPS, momentum=0.1)
    tbn.train()
    with torch.no_grad():
        ref = tbn(torch.as_tensor(x)).numpy()
    fbn = nn.BatchNorm(use_running_average=False, momentum=BN_MOMENTUM,
                       epsilon=BN_EPS)
    variables = {
        "params": {"scale": jnp.ones(6), "bias": jnp.zeros(6)},
        "batch_stats": {"mean": jnp.zeros(6), "var": jnp.ones(6)},
    }
    out, mutated = fbn.apply(variables, _nhwc(x), mutable=["batch_stats"])
    np.testing.assert_allclose(_to_nchw(out), ref, rtol=2e-3, atol=2e-4)
    np.testing.assert_allclose(
        np.asarray(mutated["batch_stats"]["mean"]),
        tbn.running_mean.detach().numpy(), rtol=2e-3, atol=1e-5,
    )
    # NOTE: torch folds the UNBIASED batch variance into running_var; flax
    # uses the biased one.  The relative gap is 1/(N·H·W−1) ≈ 0.4% here and
    # shrinks with batch size — pin that the two agree to that tolerance.
    np.testing.assert_allclose(
        np.asarray(mutated["batch_stats"]["var"]),
        tbn.running_var.detach().numpy(), rtol=6e-3,
    )


def test_basicblock_matches_torch_composite():
    """Full BasicBlock (stride-2 + projection) vs a hand-built torch twin."""
    x = RNG.normal(size=(2, 8, 16, 16)).astype(np.float32)

    class TorchBlock(torch.nn.Module):
        def __init__(self):
            super().__init__()
            self.conv1 = torch.nn.Conv2d(8, 16, 3, stride=2, padding=1,
                                         bias=False)
            self.bn1 = torch.nn.BatchNorm2d(16, eps=BN_EPS)
            self.conv2 = torch.nn.Conv2d(16, 16, 3, padding=1, bias=False)
            self.bn2 = torch.nn.BatchNorm2d(16, eps=BN_EPS)
            self.down = torch.nn.Conv2d(8, 16, 1, stride=2, bias=False)
            self.down_bn = torch.nn.BatchNorm2d(16, eps=BN_EPS)

        def forward(self, x):
            y = torch.relu(self.bn1(self.conv1(x)))
            y = self.bn2(self.conv2(y))
            return torch.relu(y + self.down_bn(self.down(x)))

    tb = TorchBlock().eval()
    with torch.no_grad():
        for bn in (tb.bn1, tb.bn2, tb.down_bn):
            bn.running_mean.copy_(torch.randn(16) * 0.1)
            bn.running_var.copy_(torch.rand(16) + 0.5)
        ref = tb(torch.as_tensor(x)).numpy()

    def conv_w(t):
        return jnp.asarray(t.weight.detach().numpy().transpose(2, 3, 1, 0))

    def bn_vars(t):
        return (
            {"scale": jnp.asarray(t.weight.detach().numpy()),
             "bias": jnp.asarray(t.bias.detach().numpy())},
            {"mean": jnp.asarray(t.running_mean.numpy()),
             "var": jnp.asarray(t.running_var.numpy())},
        )

    p_bn1, s_bn1 = bn_vars(tb.bn1)
    p_bn2, s_bn2 = bn_vars(tb.bn2)
    p_dbn, s_dbn = bn_vars(tb.down_bn)
    variables = {
        "params": {
            "conv1": {"kernel": conv_w(tb.conv1)},
            "bn1": p_bn1,
            "conv2": {"kernel": conv_w(tb.conv2)},
            "bn2": p_bn2,
            "downsample_conv": {"kernel": conv_w(tb.down)},
            "downsample_bn": p_dbn,
        },
        "batch_stats": {"bn1": s_bn1, "bn2": s_bn2, "downsample_bn": s_dbn},
    }
    block = BasicBlock(channels=16, strides=2)
    out = block.apply(variables, _nhwc(x), train=False)
    np.testing.assert_allclose(_to_nchw(out), ref, rtol=5e-4, atol=5e-5)


def test_dilated_stage_matches_smp_semantics():
    """output_stride<32 parity target is smp's replace_strides_with_dilation
    (the path the reference's DeepLabV3+ encoder goes through): EVERY conv in
    the dilated stage gets the same rate — block 0 included — with stride 1
    and padding (k//2)*rate.  (torchvision's previous_dilation convention
    doesn't apply: its BasicBlock raises on dilation > 1.)"""
    rate = 2
    x = RNG.normal(size=(1, 8, 16, 16)).astype(np.float32)

    class SmpPatchedStage(torch.nn.Module):
        """layer-N twin after smp's make_dilated patch."""

        def __init__(self):
            super().__init__()
            self.conv1 = torch.nn.Conv2d(8, 16, 3, stride=1, padding=rate,
                                         dilation=rate, bias=False)
            self.bn1 = torch.nn.BatchNorm2d(16, eps=BN_EPS)
            self.conv2 = torch.nn.Conv2d(16, 16, 3, stride=1, padding=rate,
                                         dilation=rate, bias=False)
            self.bn2 = torch.nn.BatchNorm2d(16, eps=BN_EPS)
            self.down = torch.nn.Conv2d(8, 16, 1, stride=1, bias=False)
            self.down_bn = torch.nn.BatchNorm2d(16, eps=BN_EPS)

        def forward(self, x):
            y = torch.relu(self.bn1(self.conv1(x)))
            y = self.bn2(self.conv2(y))
            return torch.relu(y + self.down_bn(self.down(x)))

    tb = SmpPatchedStage().eval()
    with torch.no_grad():
        for bn in (tb.bn1, tb.bn2, tb.down_bn):
            bn.running_mean.copy_(torch.randn(16) * 0.1)
            bn.running_var.copy_(torch.rand(16) + 0.5)
        ref = tb(torch.as_tensor(x)).numpy()

    def conv_w(t):
        return jnp.asarray(t.weight.detach().numpy().transpose(2, 3, 1, 0))

    def bn_vars(t):
        return (
            {"scale": jnp.asarray(t.weight.detach().numpy()),
             "bias": jnp.asarray(t.bias.detach().numpy())},
            {"mean": jnp.asarray(t.running_mean.numpy()),
             "var": jnp.asarray(t.running_var.numpy())},
        )

    p1, s1 = bn_vars(tb.bn1)
    p2, s2 = bn_vars(tb.bn2)
    pd, sd_ = bn_vars(tb.down_bn)
    variables = {
        "params": {
            "conv1": {"kernel": conv_w(tb.conv1)},
            "bn1": p1,
            "conv2": {"kernel": conv_w(tb.conv2)},
            "bn2": p2,
            "downsample_conv": {"kernel": conv_w(tb.down)},
            "downsample_bn": pd,
        },
        "batch_stats": {"bn1": s1, "bn2": s2, "downsample_bn": sd_},
    }
    # our dilated stage block: strides=1 (converted), uniform dilation
    block = BasicBlock(channels=16, strides=1, dilation=rate)
    out = block.apply(variables, _nhwc(x), train=False)
    np.testing.assert_allclose(_to_nchw(out), ref, rtol=5e-4, atol=5e-5)


def test_weight_converter_roundtrip():
    """convert_resnet_state_dict grafts a synthetic torch resnet18
    state_dict into the flax encoder and the stem conv output matches."""
    from pdac_pathological_image_segmentation_tpu.models.resnet import (
        ResNetEncoder,
    )
    from pdac_pathological_image_segmentation_tpu.utils.torch_weights import (
        convert_resnet_state_dict,
    )

    enc = ResNetEncoder(backbone="resnet18")
    x = jnp.zeros((1, 64, 64, 3), jnp.float32)
    variables = enc.init(jax.random.PRNGKey(0), x, train=False)

    # synthetic torch-layout state_dict with the right names/shapes
    sd = {}
    tw = RNG.normal(size=(64, 3, 7, 7)).astype(np.float32)
    sd["conv1.weight"] = tw
    for bn_name, c in [("bn1", 64)]:
        sd[f"{bn_name}.weight"] = np.ones(c, np.float32)
        sd[f"{bn_name}.bias"] = np.zeros(c, np.float32)
        sd[f"{bn_name}.running_mean"] = np.zeros(c, np.float32)
        sd[f"{bn_name}.running_var"] = np.ones(c, np.float32)
    chans = {1: 64, 2: 128, 3: 256, 4: 512}
    in_ch = {1: 64, 2: 64, 3: 128, 4: 256}
    for li in (1, 2, 3, 4):
        for b in (0, 1):
            pre = f"layer{li}.{b}"
            c = chans[li]
            cin = in_ch[li] if b == 0 else c
            sd[f"{pre}.conv1.weight"] = RNG.normal(size=(c, cin, 3, 3)).astype(np.float32)
            sd[f"{pre}.conv2.weight"] = RNG.normal(size=(c, c, 3, 3)).astype(np.float32)
            for bn in ("bn1", "bn2"):
                sd[f"{pre}.{bn}.weight"] = np.ones(c, np.float32)
                sd[f"{pre}.{bn}.bias"] = np.zeros(c, np.float32)
                sd[f"{pre}.{bn}.running_mean"] = np.zeros(c, np.float32)
                sd[f"{pre}.{bn}.running_var"] = np.ones(c, np.float32)
            if b == 0 and li > 1:
                sd[f"{pre}.downsample.0.weight"] = RNG.normal(
                    size=(c, cin, 1, 1)).astype(np.float32)
                sd[f"{pre}.downsample.1.weight"] = np.ones(c, np.float32)
                sd[f"{pre}.downsample.1.bias"] = np.zeros(c, np.float32)
                sd[f"{pre}.downsample.1.running_mean"] = np.zeros(c, np.float32)
                sd[f"{pre}.downsample.1.running_var"] = np.ones(c, np.float32)

    params, batch_stats = convert_resnet_state_dict(
        sd, variables["params"], variables["batch_stats"], encoder_key=None
    )
    k = np.asarray(params["conv1"]["kernel"])
    np.testing.assert_array_equal(k, tw.transpose(2, 3, 1, 0))
    # full forward still works with grafted weights
    feats = enc.apply({"params": params, "batch_stats": batch_stats},
                      jnp.ones((1, 64, 64, 3)), train=False)
    assert feats[-1].shape == (1, 2, 2, 512)
