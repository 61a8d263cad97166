"""Image-count-based iteration counter (reference util/iter_counter.py).

Counts *images*, not steps; persists ``iter.txt`` for resume; EMA-smoothed
per-section wall times. The reference forces a device sync per section
(and CUDA_LAUNCH_BLOCKING) — here timing blocks on the async result only
when the section exits, never serializing dispatch (SURVEY.md 5.1)."""

from __future__ import annotations

import os
import time

import numpy as np


def _is_primary_process() -> bool:
    """Multi-host: only process 0 writes shared files (the reference
    rank-gates at train.py:32-55)."""
    try:
        import jax

        return jax.process_index() == 0
    except Exception:
        return True


class IterationCounter:
    @staticmethod
    def modify_commandline_options(parser, is_train):
        parser.add_argument("--total_nimgs", default=7000000, type=int)
        parser.add_argument("--save_freq", default=50000, type=int)
        parser.add_argument("--evaluation_freq", default=50000, type=int)
        parser.add_argument("--print_freq", default=480, type=int)
        parser.add_argument("--display_freq", default=1600, type=int)
        return parser

    def __init__(self, opt):
        self.opt = opt
        self.iter_record_path = os.path.join(
            opt.checkpoints_dir, opt.name, "iter.txt"
        )
        self.steps_so_far = 0
        self.batch_size = opt.batch_size
        self.time_measurements = {}

        is_train = getattr(opt, "isTrain", True)
        cont = getattr(opt, "continue_train", False)
        resume_iter = getattr(opt, "resume_iter", "latest")
        if is_train and cont and resume_iter == "latest" and not getattr(
            opt, "pretrained_name", None
        ):
            try:
                self.steps_so_far = int(
                    np.loadtxt(self.iter_record_path, delimiter=",", dtype=int)
                )
                print(f"Resuming from iteration {self.steps_so_far}")
            except Exception:
                print(
                    f"Could not load iteration record at {self.iter_record_path}. "
                    "Starting from beginning."
                )
        elif is_train and cont and resume_iter.replace("k", "").isnumeric():
            steps = int(resume_iter.replace("k", ""))
            if "k" in resume_iter:
                steps *= 1000
            self.steps_so_far = steps

    def record_one_iteration(self):
        if self.needs_saving() and _is_primary_process():
            os.makedirs(os.path.dirname(self.iter_record_path), exist_ok=True)
            np.savetxt(
                self.iter_record_path, [self.steps_so_far], delimiter=",", fmt="%d"
            )
        self.steps_so_far += self.batch_size

    def needs_saving(self):
        return (self.steps_so_far % self.opt.save_freq) < self.batch_size

    def needs_evaluation(self):
        return (self.steps_so_far >= self.opt.evaluation_freq) and (
            (self.steps_so_far % self.opt.evaluation_freq) < self.batch_size
        )

    def needs_printing(self):
        return (self.steps_so_far % self.opt.print_freq) < self.batch_size

    def needs_displaying(self):
        return (self.steps_so_far % self.opt.display_freq) < self.batch_size

    def completed_training(self):
        return self.steps_so_far >= self.opt.total_nimgs

    class TimeMeasurement:
        def __init__(self, name, parent):
            self.name = name
            self.parent = parent

        def __enter__(self):
            self.start_time = time.time()

        def __exit__(self, *exc):
            elapsed = (time.time() - self.start_time) / self.parent.batch_size
            prev = self.parent.time_measurements.get(self.name)
            self.parent.time_measurements[self.name] = (
                elapsed if prev is None else prev * 0.98 + elapsed * 0.02
            )

    def time_measurement(self, name):
        return IterationCounter.TimeMeasurement(name, self)
