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
    if path.endswith(".npz"):
        # torch-free artifact produced by scripts/convert_torchvision_resnet18.py
        # (same torch key names, values already numpy)
        with np.load(path) as z:
            return {k: z[k] for k in z.files}
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


def _check_coverage(node: Any, written: set, path: Tuple[str, ...]) -> None:
    """Strict-graft audit: every leaf-bearing dict in the flax encoder
    subtree must have been overwritten (its ``id`` recorded in ``written``)
    — a silent partial graft (renamed torch keys, truncated state_dict)
    fails loudly instead of training from a mix of pretrained and random
    weights."""
    if isinstance(node, dict):
        if any(not isinstance(v, dict) for v in node.values()):
            if id(node) not in written:
                raise KeyError(
                    "flax encoder subtree not covered by the torch "
                    f"state_dict: {'/'.join(path)} — partial graft")
        for k, v in node.items():
            if isinstance(v, dict):
                _check_coverage(v, written, path + (k,))


class _GraftRecorder:
    """Records, during a weight-converter run, where each torch parameter
    landed in the flax params tree and which layout op it got — the exact
    information optimizer-moment conversion needs (torch Adam moments share
    their parameter's shape and must get the same transpose).  Deriving the
    mapping by re-running the golden-tested weight converter means it cannot
    drift from the weight placement.

    Entries are recorded against *node object identity* (the helpers only
    see the node); :meth:`resolve` is called by each converter against its
    live numpy tree before the final jnp rebuild, turning node refs into
    tree paths (paths survive ``tree_map`` rebuilds; object ids do not)."""

    _active: "_GraftRecorder | None" = None

    def __init__(self) -> None:
        self.prefix = ""
        # torch_key -> (node_ref | None, leaf, kind, resolved_path | None)
        self.entries: Dict[str, list] = {}

    @classmethod
    def note(cls, node: dict, leaf: str, torch_key: str, kind: str) -> None:
        rec = cls._active
        if rec is not None:
            rec.entries[rec.prefix + torch_key] = [node, leaf, kind, None]

    @classmethod
    def resolve_active(cls, params: Any) -> None:
        rec = cls._active
        if rec is None:
            return
        id2path: Dict[int, tuple] = {}

        def walk(node, path):
            if isinstance(node, dict):
                id2path[id(node)] = path
                for k, v in node.items():
                    walk(v, path + (k,))

        walk(params, ())
        for ent in rec.entries.values():
            node, leaf, _, resolved = ent
            if resolved is None and node is not None and id(node) in id2path:
                ent[3] = id2path[id(node)] + (leaf,)
                ent[0] = None

    @classmethod
    def prefixed(cls, prefix: str):
        import contextlib

        @contextlib.contextmanager
        def ctx():
            rec = cls._active
            if rec is None:
                yield
                return
            old = rec.prefix
            rec.prefix = old + prefix
            try:
                yield
            finally:
                rec.prefix = old

        return ctx()


def _graft_conv(sd: Dict[str, np.ndarray], node: dict, torch_name: str,
                bias: bool = False) -> None:
    """Graft a torch conv's OIHW weight into a flax node as HWIO (+ optional
    bias).  Shared by every converter — the transpose convention must never
    diverge between them.  Also correct for depthwise convs: torch's
    (C, 1, kH, kW) transposes to HWIO with I=1, which is what flax's
    ``feature_group_count=C`` expects."""
    w = sd[torch_name + ".weight"]
    node["kernel"] = np.transpose(w, (2, 3, 1, 0)).astype(np.float32)
    _GraftRecorder.note(node, "kernel", torch_name + ".weight", "oihw")
    if bias:
        node["bias"] = sd[torch_name + ".bias"].astype(np.float32)
        _GraftRecorder.note(node, "bias", torch_name + ".bias", "ident")


def _graft_norm_affine(sd: Dict[str, np.ndarray], p_node: dict,
                       torch_name: str) -> None:
    """Graft a torch norm layer's learnable affine (weight/bias → flax
    scale/bias) — BatchNorm and GroupNorm share this layout."""
    p_node["scale"] = sd[torch_name + ".weight"].astype(np.float32)
    p_node["bias"] = sd[torch_name + ".bias"].astype(np.float32)
    _GraftRecorder.note(p_node, "scale", torch_name + ".weight", "ident")
    _GraftRecorder.note(p_node, "bias", torch_name + ".bias", "ident")


def _graft_bn(sd: Dict[str, np.ndarray], p_node: dict, b_node: dict,
              torch_name: str) -> None:
    """Graft a torch BatchNorm's affine + running stats into flax
    params/batch_stats nodes."""
    _graft_norm_affine(sd, p_node, torch_name)
    b_node["mean"] = sd[torch_name + ".running_mean"].astype(np.float32)
    b_node["var"] = sd[torch_name + ".running_var"].astype(np.float32)


def convert_resnet_state_dict(
    sd: Dict[str, np.ndarray],
    params: Any,
    batch_stats: Any,
    encoder_key: str = "encoder",
    strict: bool = True,
) -> Tuple[Any, Any]:
    """Graft torch ResNet weights into copies of ``params``/``batch_stats``
    (flax dicts produced by ``ResNetEncoder``), leaving non-encoder leaves
    untouched.  Raises KeyError on shape-incompatible trees.

    ``strict=True`` additionally verifies EVERY leaf of the flax encoder
    subtree was overwritten — a silent partial graft (renamed torch keys,
    truncated state_dict) fails loudly instead of training from a mix of
    pretrained and random weights."""
    import jax

    params = jax.tree_util.tree_map(np.asarray, params)
    batch_stats = jax.tree_util.tree_map(np.asarray, batch_stats)
    p_enc = params[encoder_key] if encoder_key else params
    b_enc = batch_stats[encoder_key] if encoder_key else batch_stats
    written: set = set()

    def put_conv(flax_node: dict, torch_name: str) -> None:
        w = sd[torch_name + ".weight"]  # O,I,H,W
        if tuple(flax_node["kernel"].shape) != (
            w.shape[2], w.shape[3], w.shape[1], w.shape[0]
        ):
            raise ValueError(
                f"{torch_name}: kernel shape mismatch "
                f"{flax_node['kernel'].shape} vs torch {w.shape}"
            )
        _graft_conv(sd, flax_node, torch_name)
        written.add(id(flax_node))

    def put_bn(p_node: dict, b_node: dict, torch_name: str) -> None:
        _graft_bn(sd, p_node, b_node, torch_name)
        written.add(id(p_node))
        written.add(id(b_node))

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

    if strict:
        _check_coverage(p_enc, written, ("params",))
        _check_coverage(b_enc, written, ("batch_stats",))
    _GraftRecorder.resolve_active(params)

    import jax.numpy as jnp

    params = jax.tree_util.tree_map(jnp.asarray, params)
    batch_stats = jax.tree_util.tree_map(jnp.asarray, batch_stats)
    return params, batch_stats


def convert_mobilenetv2_state_dict(
    sd: Dict[str, np.ndarray],
    params: Any,
    batch_stats: Any,
    encoder_key: str = "encoder",
    strict: bool = True,
) -> Tuple[Any, Any]:
    """Graft torchvision ``mobilenet_v2`` weights (also the encoder layout
    of smp's ``mobilenet_v2`` zoo entry, reference ``train_worker.py:155``)
    into flax variables produced by ``MobileNetV2Encoder``.

    torchvision layout → ours (``models/mobilenetv2.py``):
    * ``features.0.{0,1}`` / ``features.18.{0,1}``  → ``features_{0,18}/conv+bn``
    * expand-ratio-1 block: ``features.1.conv.{0.0,0.1,1,2}``
      → ``features_1/{depthwise,project}``
    * t=6 blocks: ``features.i.conv.{0.0,0.1,1.0,1.1,2,3}``
      → ``features_i/{expand,depthwise,project}``
    * depthwise kernels (C,1,H,W) transpose to flax's (H,W,1,C) grouped form.
    """
    import jax
    import jax.numpy as jnp

    params = jax.tree_util.tree_map(np.asarray, params)
    batch_stats = jax.tree_util.tree_map(np.asarray, batch_stats)
    p_enc = params[encoder_key] if encoder_key else params
    b_enc = batch_stats[encoder_key] if encoder_key else batch_stats
    written: set = set()

    def put_convbn(p_node: dict, b_node: dict, conv_t: str, bn_t: str) -> None:
        w = sd[conv_t + ".weight"]  # O,I,H,W (I=1 for depthwise)
        if tuple(p_node["conv"]["kernel"].shape) != (
            w.shape[2], w.shape[3], w.shape[1], w.shape[0]
        ):
            raise ValueError(
                f"{conv_t}: kernel shape mismatch "
                f"{p_node['conv']['kernel'].shape} vs torch {w.shape}")
        _graft_conv(sd, p_node["conv"], conv_t)
        _graft_bn(sd, p_node["bn"], b_node["bn"], bn_t)
        written.add(id(p_node["conv"]))
        written.add(id(p_node["bn"]))
        written.add(id(b_node["bn"]))

    put_convbn(p_enc["features_0"], b_enc["features_0"],
               "features.0.0", "features.0.1")
    for i in range(1, 18):
        pf, bf = p_enc[f"features_{i}"], b_enc[f"features_{i}"]
        if f"features.{i}.conv.1.weight" in sd and \
                f"features.{i}.conv.1.0.weight" not in sd:
            # expand_ratio == 1 (features.1): dw at conv.0, project at conv.1/2
            put_convbn(pf["depthwise"], bf["depthwise"],
                       f"features.{i}.conv.0.0", f"features.{i}.conv.0.1")
            put_convbn(pf["project"], bf["project"],
                       f"features.{i}.conv.1", f"features.{i}.conv.2")
        else:
            put_convbn(pf["expand"], bf["expand"],
                       f"features.{i}.conv.0.0", f"features.{i}.conv.0.1")
            put_convbn(pf["depthwise"], bf["depthwise"],
                       f"features.{i}.conv.1.0", f"features.{i}.conv.1.1")
            put_convbn(pf["project"], bf["project"],
                       f"features.{i}.conv.2", f"features.{i}.conv.3")
    put_convbn(p_enc["features_18"], b_enc["features_18"],
               "features.18.0", "features.18.1")

    if strict:
        _check_coverage(p_enc, written, ("params",))
        _check_coverage(b_enc, written, ("batch_stats",))
    _GraftRecorder.resolve_active(params)

    params = jax.tree_util.tree_map(jnp.asarray, params)
    batch_stats = jax.tree_util.tree_map(jnp.asarray, batch_stats)
    return params, batch_stats


def convert_efficientnet_state_dict(
    sd: Dict[str, np.ndarray],
    params: Any,
    batch_stats: Any,
    encoder_key: str = "encoder",
    strict: bool = True,
) -> Tuple[Any, Any]:
    """Graft efficientnet-pytorch weights (the encoder layout of smp's
    ``efficientnet-b*`` zoo entries, reference ``train_worker.py:155``)
    into flax variables produced by ``EfficientNetEncoder``.

    efficientnet-pytorch layout → ours (``models/efficientnet.py``):

    * ``_conv_stem`` / ``_bn0``                → ``stem_conv`` / ``stem_bn``
    * ``_blocks.N._expand_conv`` / ``._bn0``   → ``blocks_N/expand_conv+bn``
      (absent on expand-ratio-1 blocks)
    * ``_blocks.N._depthwise_conv`` / ``._bn1`` → ``blocks_N/depthwise_*``
      (kernels (C,1,k,k) transpose to flax's (k,k,1,C) grouped form)
    * ``_blocks.N._se_reduce/_se_expand``      → 1×1 convs with bias
    * ``_blocks.N._project_conv`` / ``._bn2``  → ``blocks_N/project_*``
    * the classifier top (``_conv_head``/``_bn1``/``_fc``) is dropped —
      smp's ``EfficientNetEncoder`` never runs it either.
    """
    import jax
    import jax.numpy as jnp

    params = jax.tree_util.tree_map(np.asarray, params)
    batch_stats = jax.tree_util.tree_map(np.asarray, batch_stats)
    p_enc = params[encoder_key] if encoder_key else params
    b_enc = batch_stats[encoder_key] if encoder_key else batch_stats
    written: set = set()

    def put_conv(node: dict, tname: str, bias: bool = False) -> None:
        w = sd[tname + ".weight"]  # O,I,H,W (I=1 for depthwise)
        if tuple(node["kernel"].shape) != (
            w.shape[2], w.shape[3], w.shape[1], w.shape[0]
        ):
            raise ValueError(
                f"{tname}: kernel shape mismatch "
                f"{node['kernel'].shape} vs torch {w.shape}")
        _graft_conv(sd, node, tname, bias=bias)
        written.add(id(node))

    def put_bn(p_node: dict, b_node: dict, tname: str) -> None:
        _graft_bn(sd, p_node["bn"], b_node["bn"], tname)
        written.add(id(p_node["bn"]))
        written.add(id(b_node["bn"]))

    put_conv(p_enc["stem_conv"], "_conv_stem")
    put_bn(p_enc["stem_bn"], b_enc["stem_bn"], "_bn0")
    n_blocks = 0
    while f"blocks_{n_blocks}" in p_enc:
        n_blocks += 1
    for i in range(n_blocks):
        pf, bf = p_enc[f"blocks_{i}"], b_enc[f"blocks_{i}"]
        t = f"_blocks.{i}"
        if f"{t}._expand_conv.weight" in sd:
            put_conv(pf["expand_conv"], f"{t}._expand_conv")
            put_bn(pf["expand_bn"], bf["expand_bn"], f"{t}._bn0")
        elif "expand_conv" in pf:
            raise KeyError(
                f"{t}: flax block expects an expand conv but the torch "
                "state_dict has none — variant mismatch")
        put_conv(pf["depthwise_conv"], f"{t}._depthwise_conv")
        put_bn(pf["depthwise_bn"], bf["depthwise_bn"], f"{t}._bn1")
        put_conv(pf["se_reduce"], f"{t}._se_reduce", bias=True)
        put_conv(pf["se_expand"], f"{t}._se_expand", bias=True)
        put_conv(pf["project_conv"], f"{t}._project_conv")
        put_bn(pf["project_bn"], bf["project_bn"], f"{t}._bn2")
    if f"_blocks.{n_blocks}._depthwise_conv.weight" in sd:
        raise KeyError(
            f"torch state_dict has more blocks than the flax encoder "
            f"({n_blocks}) — variant mismatch")

    if strict:
        _check_coverage(p_enc, written, ("params",))
        _check_coverage(b_enc, written, ("batch_stats",))
    _GraftRecorder.resolve_active(params)

    params = jax.tree_util.tree_map(jnp.asarray, params)
    batch_stats = jax.tree_util.tree_map(jnp.asarray, batch_stats)
    return params, batch_stats


def convert_encoder_state_dict(
    enc_sd: Dict[str, np.ndarray],
    params: Any,
    batch_stats: Any,
    encoder_key: str = "encoder",
) -> Tuple[Any, Any]:
    """Dispatch the encoder graft by the state_dict's own layout — resnet
    (``conv1.weight``) vs mobilenet_v2 (``features.0.0.weight``) vs
    efficientnet (``_conv_stem.weight``) — so the smp model converters
    work for every supported ``cfg.backbone``."""
    if "features.0.0.weight" in enc_sd:
        return convert_mobilenetv2_state_dict(
            enc_sd, params, batch_stats, encoder_key=encoder_key)
    if "_conv_stem.weight" in enc_sd:
        return convert_efficientnet_state_dict(
            enc_sd, params, batch_stats, encoder_key=encoder_key)
    return convert_resnet_state_dict(
        enc_sd, params, batch_stats, encoder_key=encoder_key)


def load_pretrained_encoder(
    path: str, params: Any, batch_stats: Any, encoder_key: str = "encoder"
) -> Tuple[Any, Any]:
    sd = _load_state_dict(path)
    # accept either a bare torchvision state_dict or a full reference
    # checkpoint (whose encoder lives under "encoder.")
    sd = {k[len("encoder."):] if k.startswith("encoder.") else k: v
          for k, v in sd.items()}
    return convert_encoder_state_dict(sd, params, batch_stats, encoder_key)


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
    with _GraftRecorder.prefixed("encoder."):
        params, batch_stats = convert_encoder_state_dict(
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


def convert_smp_fpn_state_dict(
    sd: Dict[str, np.ndarray], params: Any, batch_stats: Any
) -> Tuple[Any, Any]:
    """Convert a segmentation_models_pytorch ``FPN(resnet*)`` state_dict —
    the reference's DEFAULT model (``configs/train_config.yaml:22`` is
    ``model: fpn``; factory at ``train_worker.py:153-161``) — into our flax
    FPN variables so reference-trained default checkpoints evaluate here.

    smp layout → ours:
    * ``encoder.*``                    → torchvision resnet (shared converter)
    * ``decoder.p5`` / ``decoder.pN.skip_conv``      → ``lateral5..lateral2``
    * ``decoder.seg_blocks.{i}.block.{j}.block.0/1`` → ``seg{i}_{j}``
      (3×3 conv + GroupNorm(32, eps=1e-5))
    * ``segmentation_head.0``          → ``head`` (3×3 conv; the following
      UpsamplingBilinear2d(4) is our align_corners=True resize)
    """
    import jax
    import jax.numpy as jnp

    enc_sd = {k[len("encoder."):]: v for k, v in sd.items()
              if k.startswith("encoder.")}
    with _GraftRecorder.prefixed("encoder."):
        params, batch_stats = convert_encoder_state_dict(
            enc_sd, params, batch_stats, encoder_key="encoder"
        )
    params = jax.tree_util.tree_map(np.asarray, params)

    def put_conv(flax_node, torch_name, bias=True):
        _graft_conv(sd, flax_node, torch_name, bias=bias)

    put_conv(params["lateral5"], "decoder.p5")
    for lvl, p in (("lateral4", "p4"), ("lateral3", "p3"), ("lateral2", "p2")):
        put_conv(params[lvl], f"decoder.{p}.skip_conv")

    for i, n_blocks in enumerate((3, 2, 1, 1)):  # n_upsamples 3,2,1,0
        for j in range(n_blocks):
            pre = f"decoder.seg_blocks.{i}.block.{j}.block"
            node = params[f"seg{i}_{j}"]
            put_conv(node["Conv_0"], f"{pre}.0", bias=False)
            _graft_norm_affine(sd, node["GroupNorm_0"], f"{pre}.1")

    put_conv(params["head"], "segmentation_head.0")
    _GraftRecorder.resolve_active(params)

    params = jax.tree_util.tree_map(jnp.asarray, params)
    batch_stats = jax.tree_util.tree_map(jnp.asarray, batch_stats)
    return params, batch_stats


def convert_smp_deeplabv3plus_state_dict(
    sd: Dict[str, np.ndarray], params: Any, batch_stats: Any
) -> Tuple[Any, Any]:
    """Convert a segmentation_models_pytorch ``DeepLabV3Plus(resnet*)``
    state_dict (reference factory ``train_worker.py:163-170`` /
    ``test.py:94-101``) into our flax DeepLabV3Plus variables.

    smp layout → ours:
    * ``encoder.*``                        → torchvision resnet (shared)
    * ``decoder.aspp.0.convs.0.{0,1}``     → ``aspp/branch_1x1`` (1×1+BN)
    * ``decoder.aspp.0.convs.{i}.0.{0,1}`` + ``.1`` → ``aspp/branch_r{i-1}``
      (SeparableConv2d = depthwise+pointwise, then BN), i = 1..3
    * ``decoder.aspp.0.convs.4.{1,2}``     → ``aspp/branch_pool``
    * ``decoder.aspp.0.project.{0,1}``     → ``aspp/project``
    * ``decoder.aspp.1.{0,1}`` + ``decoder.aspp.2`` → ``aspp_sep``
    * ``decoder.block1.{0,1}``             → ``skip_project``
    * ``decoder.block2.0.{0,1}`` + ``.1``  → ``fuse``
    * ``segmentation_head.0``              → ``head`` (1×1 conv + bias)
    """
    import jax
    import jax.numpy as jnp

    enc_sd = {k[len("encoder."):]: v for k, v in sd.items()
              if k.startswith("encoder.")}
    with _GraftRecorder.prefixed("encoder."):
        params, batch_stats = convert_encoder_state_dict(
            enc_sd, params, batch_stats, encoder_key="encoder"
        )
    params = jax.tree_util.tree_map(np.asarray, params)
    batch_stats = jax.tree_util.tree_map(np.asarray, batch_stats)

    def put_conv(node, torch_name, bias=False):
        _graft_conv(sd, node, torch_name, bias=bias)

    def put_bn(p_node, b_node, torch_name):
        _graft_bn(sd, p_node, b_node, torch_name)

    def put_sep(p_node, b_node, torch_sep, torch_bn):
        put_conv(p_node["depthwise"], torch_sep + ".0")  # depthwise: I=1 HWIO
        put_conv(p_node["pointwise"], torch_sep + ".1")
        put_bn(p_node["bn"], b_node["bn"], torch_bn)

    pa, ba = params["aspp"], batch_stats["aspp"]
    put_conv(pa["branch_1x1"]["conv"], "decoder.aspp.0.convs.0.0")
    put_bn(pa["branch_1x1"]["bn"], ba["branch_1x1"]["bn"],
           "decoder.aspp.0.convs.0.1")
    for i in (1, 2, 3):
        put_sep(pa[f"branch_r{i-1}"], ba[f"branch_r{i-1}"],
                f"decoder.aspp.0.convs.{i}.0", f"decoder.aspp.0.convs.{i}.1")
    put_conv(pa["branch_pool"]["conv"], "decoder.aspp.0.convs.4.1")
    put_bn(pa["branch_pool"]["bn"], ba["branch_pool"]["bn"],
           "decoder.aspp.0.convs.4.2")
    put_conv(pa["project"]["conv"], "decoder.aspp.0.project.0")
    put_bn(pa["project"]["bn"], ba["project"]["bn"],
           "decoder.aspp.0.project.1")

    put_sep(params["aspp_sep"], batch_stats["aspp_sep"],
            "decoder.aspp.1", "decoder.aspp.2")
    put_conv(params["skip_project"]["conv"], "decoder.block1.0")
    put_bn(params["skip_project"]["bn"], batch_stats["skip_project"]["bn"],
           "decoder.block1.1")
    put_sep(params["fuse"], batch_stats["fuse"],
            "decoder.block2.0", "decoder.block2.1")
    put_conv(params["head"], "segmentation_head.0", bias=True)
    _GraftRecorder.resolve_active(params)

    params = jax.tree_util.tree_map(jnp.asarray, params)
    batch_stats = jax.tree_util.tree_map(jnp.asarray, batch_stats)
    return params, batch_stats


def convert_smp_pspnet_state_dict(
    sd: Dict[str, np.ndarray], params: Any, batch_stats: Any
) -> Tuple[Any, Any]:
    """Convert a segmentation_models_pytorch ``PSPNet(resnet*)`` state_dict
    (reference factory ``train_worker.py:172-182``; unreachable in the
    reference's own test script due to the ``"pspnet+"`` typo at
    ``test.py:101`` — evaluable here) into our flax PSPNet variables.

    smp layout → ours (bin sizes 1, 2, 3, 6 → blocks 0..3):
    * ``encoder.*``                          → torchvision resnet (shared;
      layer3/layer4 ride along at their pretrained values — smp's depth-3
      encoder never runs them but keeps them in the state_dict)
    * ``decoder.psp.blocks.0.pool.1.0``      → ``psp_1/conv`` (bias, no BN —
      smp disables BatchNorm for the 1×1 bin)
    * ``decoder.psp.blocks.{i}.pool.1.{0,1}``→ ``psp_{2,3,6}/{conv,bn}``
    * ``decoder.conv.{0,1}``                 → ``bottleneck_conv`` /
      ``bottleneck_bn``
    * ``segmentation_head.0``                → ``head`` (3×3 conv + bias)
    """
    import jax
    import jax.numpy as jnp

    enc_sd = {k[len("encoder."):]: v for k, v in sd.items()
              if k.startswith("encoder.")}
    with _GraftRecorder.prefixed("encoder."):
        params, batch_stats = convert_encoder_state_dict(
            enc_sd, params, batch_stats, encoder_key="encoder"
        )
    params = jax.tree_util.tree_map(np.asarray, params)
    batch_stats = jax.tree_util.tree_map(np.asarray, batch_stats)

    def put_conv(node, torch_name, bias=False):
        _graft_conv(sd, node, torch_name, bias=bias)

    def put_bn(p_node, b_node, torch_name):
        _graft_bn(sd, p_node, b_node, torch_name)

    for block_idx, size in enumerate((1, 2, 3, 6)):
        pre = f"decoder.psp.blocks.{block_idx}.pool.1"
        node = params[f"psp_{size}"]
        if size == 1:
            put_conv(node["conv"], f"{pre}.0", bias=True)
        else:
            put_conv(node["conv"], f"{pre}.0")
            put_bn(node["bn"], batch_stats[f"psp_{size}"]["bn"], f"{pre}.1")

    put_conv(params["bottleneck_conv"], "decoder.conv.0")
    put_bn(params["bottleneck_bn"], batch_stats["bottleneck_bn"],
           "decoder.conv.1")
    put_conv(params["head"], "segmentation_head.0", bias=True)
    _GraftRecorder.resolve_active(params)

    params = jax.tree_util.tree_map(jnp.asarray, params)
    batch_stats = jax.tree_util.tree_map(jnp.asarray, batch_stats)
    return params, batch_stats


def load_reference_model_checkpoint(
    path: str, model_name: str, params: Any, batch_stats: Any
):
    """Load a reference training checkpoint for the given ``cfg.model``:
    ``unet`` (in-repo ResUNet), ``fpn`` (smp, the reference default),
    ``deeplabv3+`` or ``pspnet`` (smp factories, ``test.py:94-111``)."""
    sd = _load_state_dict(path)
    if model_name == "unet":
        return convert_resunet_state_dict(sd, params, batch_stats)
    if model_name == "fpn":
        return convert_smp_fpn_state_dict(sd, params, batch_stats)
    if model_name == "deeplabv3+":
        return convert_smp_deeplabv3plus_state_dict(sd, params, batch_stats)
    if model_name == "pspnet":
        return convert_smp_pspnet_state_dict(sd, params, batch_stats)
    raise ValueError(
        f"no .pth converter for model {model_name!r} "
        "(supported: unet, fpn, deeplabv3+, pspnet)"
    )


def _resunet_torch_param_path(name: str):
    """Map a reference-ResUNet torch parameter name to (flax path, transform)
    or None for params we don't instantiate (encoder.fc).  ``transform`` is
    the layout op also applied to that parameter's Adam moments (they share
    the parameter's shape)."""
    oihw = lambda w: np.transpose(w, (2, 3, 1, 0)).astype(np.float32)
    tconv = lambda w: np.ascontiguousarray(
        w[:, :, ::-1, ::-1].transpose(2, 3, 0, 1)
    ).astype(np.float32)
    ident = lambda w: np.asarray(w, np.float32)

    if name.startswith("encoder."):
        rest = name[len("encoder."):]
        parts = rest.split(".")
        if parts[0] in ("fc", "avgpool"):
            return None  # never instantiated (models/resnet.py)
        if parts[0] == "conv1":
            return ("encoder", "conv1", "kernel"), oihw
        if parts[0] == "bn1":
            leaf = {"weight": "scale", "bias": "bias"}[parts[1]]
            return ("encoder", "bn1", leaf), ident
        if parts[0].startswith("layer"):
            block = f"{parts[0]}_{parts[1]}"
            if parts[2].startswith("conv"):
                return ("encoder", block, parts[2], "kernel"), oihw
            if parts[2].startswith("bn"):
                leaf = {"weight": "scale", "bias": "bias"}[parts[3]]
                return ("encoder", block, parts[2], leaf), ident
            if parts[2] == "downsample":
                if parts[3] == "0":
                    return ("encoder", block, "downsample_conv", "kernel"), oihw
                leaf = {"weight": "scale", "bias": "bias"}[parts[4]]
                return ("encoder", block, "downsample_bn", leaf), ident
        raise KeyError(f"unmapped encoder param {name!r}")
    mod, leaf = name.split(".")
    if mod.startswith("upconv"):
        return (mod, {"weight": "kernel", "bias": "bias"}[leaf]), (
            tconv if leaf == "weight" else ident
        )
    if mod.startswith("conv"):
        return (mod, {"weight": "kernel", "bias": "bias"}[leaf]), (
            oihw if leaf == "weight" else ident
        )
    raise KeyError(f"unmapped param {name!r}")


def _convert_optimizer_state(
    ckpt: dict, params: Any, param_path_fn
) -> Tuple[Any, Any, int]:
    """Shared core of the torch-Adam → optax moment conversion
    (``train_worker.py:116-120`` saves ``optimizer.state_dict()``; resume
    restores the moments at ``train_worker.py:195``).

    torch indexes optimizer state by position in ``model.parameters()`` —
    the state_dict key order minus BN buffers.  ``param_path_fn(name)``
    maps a torch parameter name to ``(flax path tuple, layout transform)``
    or ``None`` for params we don't instantiate; params that never received
    gradients (e.g. ``encoder.fc`` under ``find_unused_parameters=True``)
    have no state entry and stay zero here, matching a cold moment.

    Returns ``(mu, nu, count)`` shaped like ``params`` (zeros where the
    checkpoint has no state).
    """
    import jax

    model_sd = ckpt["model"]
    model_sd = {k.replace("module.", ""): v for k, v in model_sd.items()}
    param_names = [
        k for k in model_sd
        if not k.endswith(("running_mean", "running_var",
                           "num_batches_tracked"))
    ]
    opt_sd = ckpt.get("optimizer") or {}
    opt_state = opt_sd.get("state", {})

    mu = jax.tree_util.tree_map(
        lambda p: np.zeros(p.shape, np.float32), params
    )
    nu = jax.tree_util.tree_map(
        lambda p: np.zeros(p.shape, np.float32), params
    )
    count = 0

    def put(tree, path, value):
        node = tree
        for k in path[:-1]:
            node = node[k]
        if node[path[-1]].shape != value.shape:
            raise ValueError(
                f"optimizer moment shape mismatch at {path}: "
                f"{node[path[-1]].shape} vs {value.shape}"
            )
        node[path[-1]] = value

    for idx, name in enumerate(param_names):
        entry = opt_state.get(idx, opt_state.get(str(idx)))
        if entry is None:
            continue
        mapped = param_path_fn(name)
        if mapped is None:
            continue
        path, transform = mapped
        exp_avg = entry["exp_avg"]
        exp_avg_sq = entry["exp_avg_sq"]
        if hasattr(exp_avg, "numpy"):
            exp_avg = exp_avg.detach().cpu().numpy()
            exp_avg_sq = exp_avg_sq.detach().cpu().numpy()
        put(mu, path, transform(exp_avg))
        put(nu, path, transform(exp_avg_sq))
        step = entry.get("step", 0)
        count = max(count, int(step.item() if hasattr(step, "item") else step))

    import jax.numpy as jnp

    mu = jax.tree_util.tree_map(jnp.asarray, mu)
    nu = jax.tree_util.tree_map(jnp.asarray, nu)
    return mu, nu, count


def convert_resunet_optimizer_state(
    ckpt: dict, params: Any
) -> Tuple[Any, Any, int]:
    """Torch Adam moments → optax for the reference ResUNet (handwritten
    name→path mapping; see :func:`_convert_optimizer_state`)."""
    return _convert_optimizer_state(ckpt, params, _resunet_torch_param_path)


_SMP_WEIGHT_CONVERTERS = {
    "fpn": convert_smp_fpn_state_dict,
    "deeplabv3+": convert_smp_deeplabv3plus_state_dict,
    "pspnet": convert_smp_pspnet_state_dict,
}

_MOMENT_TRANSFORMS = {
    "oihw": lambda a: np.transpose(a, (2, 3, 1, 0)).astype(np.float32),
    "ident": lambda a: np.asarray(a, np.float32),
}


def _convert_smp_with_moments(sd, ckpt, model_name: str, params, batch_stats):
    """One recorded run of the smp weight converter yields the converted
    variables AND the torch-name → (flax path, layout op) mapping, from
    which the Adam moments convert (:class:`_GraftRecorder` — moment
    placement is derived from the golden-tested weight placement, so the
    two can never drift).  Returns ``(params, batch_stats, mu, nu, count)``."""
    rec = _GraftRecorder()
    _GraftRecorder._active = rec
    try:
        params, batch_stats = _SMP_WEIGHT_CONVERTERS[model_name](
            sd, params, batch_stats)
    finally:
        _GraftRecorder._active = None
    unresolved = [k for k, e in rec.entries.items() if e[3] is None]
    if unresolved:
        raise KeyError(
            f"graft recorder could not resolve tree paths for {unresolved} "
            "— a converter grafted outside the recorded helpers?")
    mapping = {k: (e[3], _MOMENT_TRANSFORMS[e[2]])
               for k, e in rec.entries.items()}

    def path_fn(name: str):
        try:
            return mapping[name]
        except KeyError:
            # a torch param that HAS Adam state but no recorded graft means
            # the weight converter placed it outside the _graft_* helpers —
            # silently cold moments are exactly the drift the recorder
            # exists to prevent, so fail loudly instead
            raise KeyError(
                f"no recorded graft for torch param {name!r} "
                f"({model_name} converter drift)") from None

    mu, nu, count = _convert_optimizer_state(ckpt, params, path_fn)
    return params, batch_stats, mu, nu, count


def load_reference_checkpoint_full(path: str, state: Any,
                                   model_name: str = "unet"):
    """Load a reference ``latest.pth`` as a FULL resume point: model weights,
    BN stats, Adam moments, epoch, and previous_best — the reference's
    resume contract (``train_worker.py:186-201``) without restarting
    optimization cold, for any of the four reference architectures.
    Returns ``(new_state, meta_dict)``."""
    import torch

    ckpt = torch.load(path, map_location="cpu", weights_only=False)
    sd = {k.replace("module.", ""): v.detach().cpu().numpy()
          for k, v in ckpt["model"].items()}
    if model_name == "unet":
        params, batch_stats = convert_resunet_state_dict(
            sd, state.params, state.batch_stats
        )
        mu, nu, count = convert_resunet_optimizer_state(ckpt, params)
    elif model_name in _SMP_WEIGHT_CONVERTERS:
        params, batch_stats, mu, nu, count = _convert_smp_with_moments(
            sd, ckpt, model_name, state.params, state.batch_stats)
    else:
        raise ValueError(
            f"no reference-checkpoint resume for model {model_name!r} "
            f"(supported: unet, {', '.join(sorted(_SMP_WEIGHT_CONVERTERS))})")
    state = state.replace(params=params, batch_stats=batch_stats)
    state = state.with_adam_moments(mu, nu, count)
    return state, {
        "epoch": int(ckpt.get("epoch", -1)),
        "previous_best": float(ckpt.get("previous_best", 0.0)),
        "source": "reference_pth",
    }
