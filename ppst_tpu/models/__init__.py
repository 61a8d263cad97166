from ppst_tpu.models.config import PPSTConfig
from ppst_tpu.models.encoder_con import ContentEncoder
from ppst_tpu.models.encoder_col import ColorEncoder, E2Output
from ppst_tpu.models.generator import Generator
from ppst_tpu.models.discriminator import Discriminator

__all__ = [
    "PPSTConfig",
    "ContentEncoder",
    "ColorEncoder",
    "E2Output",
    "Generator",
    "Discriminator",
    "find_model_using_name",
    "create_network",
]


def find_model_using_name(model_name: str):
    """Model registry (reference models/__init__.py:27-48 idiom):
    ``--model foo`` resolves to class FooModel in
    ppst_tpu.models.<foo>_model, falling back to the built-in PPSTModel
    for the canonical name."""
    if model_name.lower() == "ppst":
        from ppst_tpu.models.ppst import PPSTModel

        return PPSTModel
    import importlib

    module = importlib.import_module(f"ppst_tpu.models.{model_name}_model")
    target = model_name.replace("_", "") + "model"
    for name, cls in vars(module).items():
        if name.lower() == target.lower() and isinstance(cls, type):
            return cls
    raise NotImplementedError(f"no model class matching {model_name!r}")


# network registry (reference models/networks/__init__.py:6-14 idiom):
# "<netName>" + role -> flax module class. The canonical StyleGAN2Resnet
# set maps to the built-ins; additional networks register here.
_NETWORK_REGISTRY = {
    ("stylegan2resnet", "encoder_con"): ContentEncoder,
    ("stylegan2resnet", "encoder_col"): ColorEncoder,
    ("stylegan2resnet", "generator"): Generator,
    ("stylegan2", "discriminator"): Discriminator,
}


def register_network(net_name: str, role: str, cls):
    _NETWORK_REGISTRY[(net_name.lower(), role)] = cls


def create_network(cfg: PPSTConfig, net_name: str, role: str):
    key = (net_name.lower(), role)
    if key not in _NETWORK_REGISTRY:
        raise NotImplementedError(
            f"no network registered for {net_name!r} / {role!r}"
        )
    return _NETWORK_REGISTRY[key](cfg)
