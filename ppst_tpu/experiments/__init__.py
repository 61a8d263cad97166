"""Launcher registry (reference experiments/__init__.py)."""

import importlib


def find_launcher_using_name(name: str):
    module = importlib.import_module(f"ppst_tpu.experiments.{name}_launcher")
    cls = getattr(module, "Launcher", None)
    if cls is None:
        raise ValueError(f"{name}_launcher has no Launcher class")
    return cls
