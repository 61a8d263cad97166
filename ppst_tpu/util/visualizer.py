"""Console + loss_log.txt reporting (the live part of reference
util/visualizer.py:272-291; visdom/HTML display paths were config-gated
off in the reference and are not rebuilt)."""

from __future__ import annotations

import os
import time

import numpy as np


class Visualizer:
    @staticmethod
    def modify_commandline_options(parser, is_train):
        parser.add_argument("--no_html", type=bool, default=True)
        return parser

    def __init__(self, opt):
        from ppst_tpu.util.iter_counter import _is_primary_process

        self.opt = opt
        self.log_name = os.path.join(opt.checkpoints_dir, opt.name, "loss_log.txt")
        if getattr(opt, "isTrain", True) and _is_primary_process():
            os.makedirs(os.path.dirname(self.log_name), exist_ok=True)
            with open(self.log_name, "a") as f:
                now = time.strftime("%c")
                f.write(f"================ Training Loss ({now}) ================\n")

    def print_current_losses(self, steps, times, losses):
        message = f"(iters: {steps}"
        for name, t in times.items():
            message += f", {name}: {t * 1000:.1f}ms/img"
        message += ") "
        for k, v in losses.items():
            v = float(np.mean(np.asarray(v)))
            message += f"{k}: {v:.3f} "
        print(message, flush=True)
        with open(self.log_name, "a") as f:
            f.write(message + "\n")
