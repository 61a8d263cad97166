"""Optimizer registry (reference optimizers/__init__.py idiom: name ->
module ``<name>_optimizer`` -> class ``<Name>Optimizer``)."""

import importlib


def find_optimizer_using_name(name: str):
    module = importlib.import_module(f"ppst_tpu.optimizers.{name}_optimizer")
    target = name.replace("_", "") + "optimizer"
    for attr, cls in vars(module).items():
        if attr.lower() == target.lower():
            return cls
    raise NotImplementedError(
        f"no optimizer class matching {name!r} in ppst_tpu.optimizers"
    )


def get_option_setter(name: str):
    return find_optimizer_using_name(name).modify_commandline_options


def create_optimizer(opt, trainer):
    """``trainer`` is the ppst_tpu.train.Trainer holding model/params."""
    cls = find_optimizer_using_name(opt.optimizer)
    return cls(opt, trainer)
