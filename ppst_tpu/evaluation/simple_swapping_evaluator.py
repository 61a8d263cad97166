"""One content + one style image -> stylized output(s)
(reference evaluation/simple_swapping_evaluator.py — the README's
canonical inference path)."""

from __future__ import annotations

import os

import jax.numpy as jnp
import numpy as np
from PIL import Image

from ppst_tpu.data.base_dataset import get_transform
from ppst_tpu.evaluation.base_evaluator import BaseEvaluator
from ppst_tpu.util.util import lerp, save_image, tensor2im


class SimpleSwappingEvaluator(BaseEvaluator):
    @staticmethod
    def modify_commandline_options(parser, is_train):
        parser.add_argument("--input_structure_image", required=True, type=str)
        parser.add_argument("--input_texture_image", required=True, type=str)
        parser.add_argument(
            "--texture_mix_alphas", type=float, nargs="+", default=[1.0],
            help="Interpolation weight(s) of the texture image: 1.0 = full "
                 "swap, 0.0 = direct reconstruction",
        )
        opt, _ = parser.parse_known_args()
        dataroot = os.path.dirname(opt.input_structure_image)
        parser.set_defaults(dataroot=dataroot, dataset_mode="imagefolder")
        return parser

    def load_image(self, path):
        path = os.path.expanduser(path)
        img = Image.open(path).convert("RGB")
        return get_transform(self.opt)(img)[None]  # (1,H,W,3)

    def evaluate(self, model, dataset, nsteps=None):
        structure_image = self.load_image(self.opt.input_structure_image)
        texture_image = self.load_image(self.opt.input_texture_image)
        os.makedirs(self.output_dir(), exist_ok=True)

        structure_code, source_texture_code = model.encode(structure_image)
        fea_c, fea_c1 = model.extract_feat_from_image(structure_image)
        fea_s, fea_s1 = model.extract_feat_from_image(texture_image)
        desc_c = jnp.concatenate([fea_c, model.rselfcorr(fea_c1)], axis=-1)
        desc_s = jnp.concatenate([fea_s, model.rselfcorr(fea_s1)], axis=-1)
        corrmatrix = model.corrm(desc_s, desc_c)
        content_grid = (desc_c.shape[1], desc_c.shape[2])
        _, gl_w = model.encode2(texture_image, corrmatrix, corr_out_hw=content_grid)

        for alpha in self.opt.texture_mix_alphas:
            texture_code = lerp(list(source_texture_code), list(gl_w), alpha)
            output_image = model.decode(structure_code, texture_code)
            out = tensor2im(output_image)[0]
            output_name = "%s_%s_%.2f.png" % (
                os.path.splitext(
                    os.path.basename(self.opt.input_structure_image)
                )[0],
                os.path.splitext(os.path.basename(self.opt.input_texture_image))[0],
                alpha,
            )
            output_path = os.path.join(self.output_dir(), output_name)
            save_image(out, output_path)
            print("Saved at " + output_path)
        return {}
