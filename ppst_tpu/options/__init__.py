"""CLI config system: two-pass argparse with distributed plugin flags.

Surface parity with reference options/__init__.py: the same base flags,
the same two-pass scheme (parse_known_args for selection flags, then each
selected plugin contributes its flags, then a strict parse), non-default
diff printing, and opt.txt / opt.pkl persistence. The ``--local-rank``
flag is accepted for command-line compatibility but unused (JAX drives
all local devices from one process).
"""

from __future__ import annotations

import argparse
import os
import pickle
import shlex

import ppst_tpu.data as data
import ppst_tpu.evaluation as evaluation
import ppst_tpu.optimizers as optimizers
from ppst_tpu.options.flags import add_model_flags, add_network_flags
from ppst_tpu.util import IterationCounter, Visualizer
from ppst_tpu.util.util import mkdirs, str2bool


class BaseOptions:
    def initialize(self, parser):
        parser.add_argument("--name", type=str, required=True,
                            help="name of the experiment")
        parser.add_argument("--easy_label", type=str, default="")
        parser.add_argument("--num_gpus", type=int, default=1,
                            help="#devices to use (mesh size); 0 = all")
        parser.add_argument("--checkpoints_dir", type=str, default="./checkpoints/")
        parser.add_argument("--model", type=str, default="ppst")
        parser.add_argument("--optimizer", type=str, default="ppst")
        parser.add_argument("--phase", type=str, default="train")
        parser.add_argument("--resume_iter", type=str, default="latest",
                            help="# iterations (in thousands) to resume")
        parser.add_argument("--num_classes", type=int, default=0)
        parser.add_argument("--seed", type=int, default=0)

        parser.add_argument("--batch_size", type=int, default=2)
        parser.add_argument("--preprocess", type=str, default="scale_width_and_crop")
        parser.add_argument("--load_size", type=int, default=512)
        parser.add_argument("--crop_size", type=int, default=512)
        parser.add_argument("--preprocess_crop_padding", type=int, default=None)
        parser.add_argument("--no_flip", action="store_true")
        parser.add_argument("--shuffle_dataset", type=str, default=None,
                            choices=("true", "false"))

        parser.add_argument("--dataroot", type=str, default=".")
        parser.add_argument("--dataroot2", type=str, default=".")
        parser.add_argument("--dataset_mode", type=str, default="celebamask")
        parser.add_argument("--nThreads", default=8, type=int)

        parser.add_argument("--netG", default="StyleGAN2Resnet")
        parser.add_argument("--netD", default="StyleGAN2")
        parser.add_argument("--netE1", default="StyleGAN2Resnet")
        parser.add_argument("--netE2", default="StyleGAN2Resnet")
        parser.add_argument("--use_antialias", type=str2bool, default=True)

        parser.add_argument("--local-rank", type=int, default=0)
        parser.add_argument("--dataname", type=str, default="results")
        parser.add_argument("--dtype", type=str, default="float32",
                            choices=("float32", "bfloat16"),
                            help="compute dtype for the conv stacks")
        parser.add_argument("--remat_taps", type=str2bool, default=False,
                            help="nested remat of the generator feature "
                                 "branch (lower peak HBM; headroom for "
                                 "beyond-512px training)")
        parser.add_argument("--remat_blocks", type=str2bool, default=False,
                            help="nested per-resblock remat inside the "
                                 "generator (lower peak HBM)")
        parser.add_argument("--fused_tap", type=str2bool, default=False,
                            help="fused Pallas 1x1 feature-tap kernel "
                                 "(bf16; differentiable)")
        parser.add_argument("--fused_styled_conv", type=str2bool,
                            default=False,
                            help="fused Pallas StyledConv kernel for the "
                                 "generator's non-upsampled 3x3 convs "
                                 "(bf16; fwd+bwd; measurement knob — XLA "
                                 "measured faster, see BASELINE.md r5)")
        # observability (SURVEY.md 5.1/5.2 TPU equivalents)
        parser.add_argument("--profile_dir", type=str, default=None,
                            help="write a jax.profiler trace of steps "
                                 "10-14 to this directory")
        parser.add_argument("--debug_nan", type=str2bool, default=False,
                            help="raise on non-finite losses after every "
                                 "step (checkify-style guard)")
        return parser

    def gather_options(self, command=None):
        parser = AugmentedArgumentParser()
        parser.custom_command = command
        parser = self.initialize(parser)

        opt, _ = parser.parse_known_args()

        parser = add_model_flags(parser, self.isTrain)
        parser = add_network_flags(parser, self.isTrain)
        parser = optimizers.get_option_setter(opt.optimizer)(parser, self.isTrain)
        parser = data.get_option_setter(opt.dataset_mode)(parser, self.isTrain)
        parser = Visualizer.modify_commandline_options(parser, self.isTrain)
        parser = IterationCounter.modify_commandline_options(parser, self.isTrain)
        parser = evaluation.get_option_setter()(parser, self.isTrain)

        opt, _ = parser.parse_known_args()
        opt = parser.parse_args()
        self.parser = parser
        return opt

    def print_options(self, opt):
        message = "----------------- Options ---------------\n"
        for k, v in sorted(vars(opt).items()):
            comment = ""
            default = self.parser.get_default(k)
            if v != default:
                comment = f"\t[default: {default}]"
            message += "{:>25}: {:<30}{}\n".format(str(k), str(v), comment)
        message += "----------------- End -------------------"
        print(message)

    def option_file_path(self, opt, makedir=False):
        expr_dir = os.path.join(opt.checkpoints_dir, opt.name)
        if makedir:
            mkdirs(expr_dir)
        return os.path.join(expr_dir, "opt")

    def save_options(self, opt):
        file_name = self.option_file_path(opt, makedir=True)
        with open(file_name + ".txt", "wt") as f:
            for k, v in sorted(vars(opt).items()):
                comment = ""
                default = self.parser.get_default(k)
                if v != default:
                    comment = f"\t[default: {default}]"
                f.write("{:>25}: {:<30}{}\n".format(str(k), str(v), comment))
        with open(file_name + ".pkl", "wb") as f:
            pickle.dump(opt, f)

    def parse(self, save=False, command=None):
        opt = self.gather_options(command)
        opt.isTrain = self.isTrain
        self.print_options(opt)
        if opt.isTrain:
            self.save_options(opt)
        opt.dataroot = os.path.expanduser(opt.dataroot)
        assert opt.num_gpus <= opt.batch_size, (
            "Batch size must not be smaller than num_gpus"
        )
        return opt


class TrainOptions(BaseOptions):
    def __init__(self):
        self.isTrain = True

    def initialize(self, parser):
        super().initialize(parser)
        parser.add_argument("--continue_train", type=str2bool, default=False)
        parser.add_argument("--pretrained_name", type=str, default=None)
        return parser


class TestOptions(BaseOptions):
    def __init__(self):
        self.isTrain = False

    def initialize(self, parser):
        super().initialize(parser)
        parser.add_argument("--result_dir", type=str, default="results")
        return parser


class AugmentedArgumentParser(argparse.ArgumentParser):
    """Adds shell-command-string parsing and str2bool nargs handling
    (reference options/__init__.py:176-211)."""

    def parse_args(self, args=None, namespace=None):
        if args is None and getattr(self, "custom_command", None):
            args = shlex.split(self.custom_command)[2:]
        return super().parse_args(args, namespace)

    def parse_known_args(self, args=None, namespace=None):
        if args is None and getattr(self, "custom_command", None):
            args = shlex.split(self.custom_command)[2:]
        return super().parse_known_args(args, namespace)

    def add_argument(self, *args, **kwargs):
        if kwargs.get("type") is str2bool:
            kwargs.setdefault("nargs", "?")
            kwargs.setdefault("const", True)
        super().add_argument(*args, **kwargs)
