"""Evaluation entry point (reference test.py)."""

import ppst_tpu.data as data
from ppst_tpu.evaluation import GroupEvaluator
from ppst_tpu.options import TestOptions
from ppst_tpu.train import create_model


def main():
    from ppst_tpu.util.cache import setup_compile_cache

    setup_compile_cache()
    opt = TestOptions().parse()
    model = create_model(opt)
    dataset = data.create_dataset(opt)
    evaluators = GroupEvaluator(opt)
    evaluators.evaluate(model, dataset, opt.resume_iter)


if __name__ == "__main__":
    main()
