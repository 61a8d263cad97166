"""Evaluation registry + GroupEvaluator (reference
evaluation/group_evaluator.py): comma-separated ``--evaluation_metrics``
with optional train/test phase prefixes, each metric resolving to
``<metric>_evaluator``. ``content_style_1t1_generation`` is aliased to the
grid evaluator (fixing the reference's broken launcher test config,
SURVEY.md 0.1-5)."""

from __future__ import annotations

from ppst_tpu.evaluation.base_evaluator import BaseEvaluator
from ppst_tpu.util.util import find_class_in_module

_ALIASES = {
    "content_style_1t1_generation": "content_style_grid_generation",
}


def find_evaluator_using_name(metric: str):
    metric = _ALIASES.get(metric, metric)
    name = f"{metric}_evaluator"
    cls = find_class_in_module(name, f"ppst_tpu.evaluation.{name}")
    assert issubclass(cls, BaseEvaluator)
    return cls


def find_evaluator_classes(opt):
    if len(opt.evaluation_metrics) == 0:
        return [], []
    classes, phases = [], []
    for metric in opt.evaluation_metrics.split(","):
        if metric.startswith("train"):
            phases.append("train")
            metric = metric[len("train"):]
        elif metric.startswith("test"):
            phases.append("test")
            metric = metric[len("test"):]
        else:
            phases.append("test")
        classes.append(find_evaluator_using_name(metric))
    return classes, phases


def get_option_setter():
    return GroupEvaluator.modify_commandline_options


class GroupEvaluator(BaseEvaluator):
    @staticmethod
    def modify_commandline_options(parser, is_train):
        parser.add_argument("--evaluation_metrics", default="none")
        opt, _ = parser.parse_known_args()
        classes, _ = find_evaluator_classes(opt)
        for cls in classes:
            parser = cls.modify_commandline_options(parser, is_train)
        return parser

    def __init__(self, opt, target_phase=None):
        super().__init__(opt, target_phase=None)
        classes, phases = find_evaluator_classes(opt)
        self.evaluators = [
            cls(opt, target_phase=ph) for cls, ph in zip(classes, phases)
        ]

    def evaluate(self, model, dataset, nsteps=None):
        original_phase = getattr(dataset, "phase", None)
        metrics = {}
        for ev in self.evaluators:
            print(
                f"Entering evaluation using {type(ev).__name__} "
                f"on {ev.target_phase} images"
            )
            if dataset is not None and hasattr(dataset, "set_phase"):
                dataset.set_phase(ev.target_phase)
            metrics.update(ev.evaluate(model, dataset, nsteps) or {})
            print(f"Finished evaluation of {type(ev).__name__}")
        if dataset is not None and original_phase and hasattr(dataset, "set_phase"):
            dataset.set_phase(original_phase)
        return metrics
