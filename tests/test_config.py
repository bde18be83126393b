"""Every preset must build its model + augment fn and expose sane geometry."""

import pytest

from semanticsegmentation_tensorflow_tpu.config import PRESETS, get_preset
from semanticsegmentation_tensorflow_tpu.data import make_augment_fn
from semanticsegmentation_tensorflow_tpu.models import MODELS, build_model


@pytest.mark.parametrize("name", sorted(PRESETS))
def test_preset_builds(name):
    cfg = get_preset(name)
    assert cfg.model in MODELS
    model = build_model(cfg.model, num_classes=cfg.data.num_classes,
                        **cfg.model_kwargs)
    stride = getattr(model, "total_stride", 32)
    # crop sizes must be stride-aligned so the padded pipeline stays static
    if cfg.data.crop_size is not None:
        ch, cw = cfg.data.crop_size
        assert ch % stride == 0 and cw % stride == 0, (name, stride)
    aug = make_augment_fn(cfg.data.mean, cfg.data.std,
                          crop_size=cfg.data.crop_size,
                          random_flip=cfg.data.random_flip)
    assert callable(aug)


def test_unknown_preset_raises():
    with pytest.raises(ValueError):
        get_preset("nope")


def test_all_registry_models_instantiable():
    for name in MODELS:
        m = build_model(name, num_classes=3)
        assert m.num_classes == 3


def test_train_cli_model_kw_parser():
    """--model-kw literals: bools, none, numbers, strings (shared by all
    entry scripts via config.parse_model_kw since round 4)."""
    from semanticsegmentation_tensorflow_tpu.config import parse_model_kw

    got = parse_model_kw(
        "a=true,b=False,c=none,d=4096,e=0.5,f=f2, g = mixed ")
    assert got == {"a": True, "b": False, "c": None, "d": 4096,
                   "e": 0.5, "f": "f2", "g": "mixed"}
    assert parse_model_kw(None) == {}
    assert parse_model_kw("") == {}
