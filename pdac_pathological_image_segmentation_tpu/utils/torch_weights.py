"""Convert torchvision ResNet weights into our NHWC flax parameter tree.

The reference initializes every encoder from torchvision's ImageNet resnet18
(reference ``models/resunet.py:12``, smp ``encoder_weights="imagenet"`` at
``train_worker.py:155``).  TPU pods have no network egress, so instead of
downloading we convert a user-supplied ``state_dict`` file
(``cfg.pretrained_path``) once on host:

* conv kernels: torch OIHW → flax HWIO transpose;
* BatchNorm: weight/bias → scale/bias params, running_mean/var → batch_stats;
* the fc/avgpool head is dropped (never instantiated here — see
  ``models/resnet.py``).

Works with any torch-serialized ResNet state_dict (including one extracted
from a reference ``latest.pth`` via its ``"model"`` key with the
``module.``/``encoder.`` prefixes, reference ``test.py:118-124``).
"""

from __future__ import annotations

from typing import Any, Dict, Tuple

import numpy as np


def _load_state_dict(path: str) -> Dict[str, np.ndarray]:
    import torch

    obj = torch.load(path, map_location="cpu", weights_only=False)
    if isinstance(obj, dict) and "model" in obj and not any(
        k.startswith(("conv1", "layer")) for k in obj
    ):
        obj = obj["model"]  # reference checkpoint layout, train_worker.py:116
    out = {}
    for k, v in obj.items():
        k = k.replace("module.", "")  # DDP prefix strip (test.py:118-124)
        if hasattr(v, "numpy"):
            out[k] = v.detach().cpu().numpy()
    return out


def strip_module_prefix(state_dict: Dict[str, Any]) -> Dict[str, Any]:
    """The reference's DDP ``module.`` prefix strip (``test.py:118-124``)."""
    return {k.replace("module.", ""): v for k, v in state_dict.items()}


def _torch_block_names(backbone_layers: Tuple[int, ...]):
    for stage_idx, n_blocks in enumerate(backbone_layers):
        for b in range(n_blocks):
            yield f"layer{stage_idx + 1}.{b}", f"layer{stage_idx + 1}_{b}"


def convert_resnet_state_dict(
    sd: Dict[str, np.ndarray],
    params: Any,
    batch_stats: Any,
    encoder_key: str = "encoder",
) -> Tuple[Any, Any]:
    """Graft torch ResNet weights into copies of ``params``/``batch_stats``
    (flax dicts produced by ``ResNetEncoder``), leaving non-encoder leaves
    untouched.  Raises KeyError on shape-incompatible trees."""
    import jax

    params = jax.tree_util.tree_map(np.asarray, params)
    batch_stats = jax.tree_util.tree_map(np.asarray, batch_stats)
    p_enc = params[encoder_key] if encoder_key else params
    b_enc = batch_stats[encoder_key] if encoder_key else batch_stats

    def put_conv(flax_node: dict, torch_name: str) -> None:
        w = sd[torch_name + ".weight"]  # O,I,H,W
        flax_node["kernel"] = np.transpose(w, (2, 3, 1, 0)).astype(np.float32)

    def put_bn(p_node: dict, b_node: dict, torch_name: str) -> None:
        p_node["scale"] = sd[torch_name + ".weight"].astype(np.float32)
        p_node["bias"] = sd[torch_name + ".bias"].astype(np.float32)
        b_node["mean"] = sd[torch_name + ".running_mean"].astype(np.float32)
        b_node["var"] = sd[torch_name + ".running_var"].astype(np.float32)

    put_conv(p_enc["conv1"], "conv1")
    put_bn(p_enc["bn1"], b_enc["bn1"], "bn1")

    n_layers = {1: 0, 2: 0, 3: 0, 4: 0}
    for k in sd:
        m = k.split(".")
        if m[0].startswith("layer"):
            li, bi = int(m[0][5:]), int(m[1])
            n_layers[li] = max(n_layers[li], bi + 1)
    layers = tuple(n_layers[i] for i in (1, 2, 3, 4))

    for tname, fname in _torch_block_names(layers):
        if fname not in p_enc:
            raise KeyError(f"flax encoder missing block {fname}")
        pf, bf = p_enc[fname], b_enc[fname]
        for conv_i in (1, 2, 3):
            tkey = f"{tname}.conv{conv_i}.weight"
            if tkey not in sd:
                continue
            put_conv(pf[f"conv{conv_i}"], f"{tname}.conv{conv_i}")
            put_bn(pf[f"bn{conv_i}"], bf[f"bn{conv_i}"], f"{tname}.bn{conv_i}")
        if f"{tname}.downsample.0.weight" in sd:
            put_conv(pf["downsample_conv"], f"{tname}.downsample.0")
            put_bn(pf["downsample_bn"], bf["downsample_bn"],
                   f"{tname}.downsample.1")

    import jax.numpy as jnp

    params = jax.tree_util.tree_map(jnp.asarray, params)
    batch_stats = jax.tree_util.tree_map(jnp.asarray, batch_stats)
    return params, batch_stats


def load_pretrained_encoder(
    path: str, params: Any, batch_stats: Any, encoder_key: str = "encoder"
) -> Tuple[Any, Any]:
    sd = _load_state_dict(path)
    # accept either a bare torchvision ResNet state_dict or a full reference
    # ResUNet checkpoint (whose encoder lives under "encoder.")
    sd = {k[len("encoder."):] if k.startswith("encoder.") else k: v
          for k, v in sd.items()}
    return convert_resnet_state_dict(sd, params, batch_stats, encoder_key)


def convert_resunet_state_dict(
    sd: Dict[str, np.ndarray], params: Any, batch_stats: Any
) -> Tuple[Any, Any]:
    """Convert a FULL reference ResUNet state_dict (reference
    ``models/resunet.py:7-22``: torchvision resnet18 under ``encoder.`` +
    upconv1-3/conv1-4 decoder) into our flax ResUNet variables — so a
    checkpoint trained with the reference pipeline evaluates directly in
    this framework (the Dice-parity path).

    Layout rules:
    * encoder convs/BNs: OIHW→HWIO + running stats (see
      :func:`convert_resnet_state_dict`);
    * decoder ``ConvTranspose2d`` weights are (in, out, kH, kW) and flax
      ``ConvTranspose`` uses **spatially flipped** taps in (kH, kW, in, out)
      (pinned by ``tests/test_torch_parity.py``);
    * plain decoder convs: OIHW→HWIO, bias as-is.
    """
    import jax
    import jax.numpy as jnp

    enc_sd = {k[len("encoder."):]: v for k, v in sd.items()
              if k.startswith("encoder.")}
    params, batch_stats = convert_resnet_state_dict(
        enc_sd, params, batch_stats, encoder_key="encoder"
    )
    params = jax.tree_util.tree_map(np.asarray, params)

    for name in ("upconv1", "upconv2", "upconv3"):
        w = sd[f"{name}.weight"]  # (in, out, kH, kW)
        params[name]["kernel"] = np.ascontiguousarray(
            w[:, :, ::-1, ::-1].transpose(2, 3, 0, 1)
        ).astype(np.float32)
        params[name]["bias"] = sd[f"{name}.bias"].astype(np.float32)
    for name in ("conv1", "conv2", "conv3", "conv4"):
        w = sd[f"{name}.weight"]  # O,I,H,W
        params[name]["kernel"] = np.transpose(w, (2, 3, 1, 0)).astype(
            np.float32
        )
        params[name]["bias"] = sd[f"{name}.bias"].astype(np.float32)

    params = jax.tree_util.tree_map(jnp.asarray, params)
    return params, batch_stats


def load_reference_checkpoint(path: str, params: Any, batch_stats: Any):
    """Load a reference training checkpoint (``latest.pth``/``best.pth``
    written by ``train_worker.py:116-125``: ``{"model": state_dict, ...}``
    with DDP ``module.`` prefixes) into our ResUNet variables."""
    sd = _load_state_dict(path)
    return convert_resunet_state_dict(sd, params, batch_stats)
