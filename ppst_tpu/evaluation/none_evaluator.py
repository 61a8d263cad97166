"""No-op evaluator (reference evaluation/none_evaluator.py)."""

from ppst_tpu.evaluation.base_evaluator import BaseEvaluator


class NoneEvaluator(BaseEvaluator):
    def evaluate(self, model, dataset, nsteps=None):
        return {}
