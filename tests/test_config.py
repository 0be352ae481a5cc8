import textwrap

import pytest

from pdac_pathological_image_segmentation_tpu.config import Config, load_config


def test_reference_train_yaml_parses(tmp_path):
    # exact key set of reference configs/train_config.yaml
    yml = textwrap.dedent(
        """
        train_path: "/data/train"
        val_path: "/data/validation"
        test_path: "/data/test"
        epochs: 50
        batch_size: 128
        lr: 0.0001
        img_size: 512
        seed: 41
        num_worker: 8
        port: tcp://0.0.0.0:12345
        earlystop_patience: 30
        model: fpn
        backbone: resnet18
        dilations: (3, 6, 9)
        """
    )
    p = tmp_path / "cfg.yaml"
    p.write_text(yml)
    cfg = load_config(str(p))
    assert cfg.model == "fpn"
    assert cfg.batch_size == 128
    assert cfg.dilations == (3, 6, 9)  # string "(3, 6, 9)" parsed
    assert cfg.seed == 41
    assert cfg.earlystop_patience == 30


def test_pspnet_typo_accepted():
    # reference test.py:101 checks "pspnet+"; both spellings canonicalize
    assert Config(model="pspnet+").model == "pspnet"
    assert Config(model="pspnet").model == "pspnet"


def test_invalid_model_rejected():
    with pytest.raises(ValueError):
        Config(model="segformer")


def test_unknown_keys_preserved():
    cfg = Config.from_dict({"model": "unet", "my_custom_key": 7})
    assert cfg.extras["my_custom_key"] == 7
    assert cfg.to_dict()["my_custom_key"] == 7


def test_dilations_list():
    assert Config(dilations=[12, 24, 36]).dilations == (12, 24, 36)


def test_compile_serving_fallback_cpu():
    """compile_serving applies TPU compiler options when the backend takes
    them and falls back to the plain jitted callable otherwise."""
    import jax
    import jax.numpy as jnp

    from pdac_pathological_image_segmentation_tpu.utils.compile_options import (
        compile_serving,
    )

    fn = compile_serving(jax.jit(lambda x: x + 1), jnp.zeros((4,)))
    assert float(fn(jnp.zeros((4,)))[0]) == 1.0


def test_lazy_compiled_shape_fallback():
    """LazyCompiled AOT-compiles on first call and falls back to plain jit
    when a different arg signature arrives."""
    import jax
    import jax.numpy as jnp

    from pdac_pathological_image_segmentation_tpu.utils.compile_options import (
        LazyCompiled,
    )

    fn = LazyCompiled(jax.jit(lambda x: x * 2))
    a = jnp.ones((4,))
    assert float(fn(a)[0]) == 2.0
    b = jnp.ones((8,))  # different shape → permanent fallback path
    assert float(fn(b)[0]) == 2.0
    assert float(fn(a)[0]) == 2.0
