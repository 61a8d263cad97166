"""Top-level shim so the reference CLI ``python -m experiments <name>
<cmd> <tag>`` keeps working; launchers live in ppst_tpu.experiments."""

from ppst_tpu.experiments import find_launcher_using_name  # noqa: F401
