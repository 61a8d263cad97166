"""Training-time (N+1)x(N+1) swap-visualization grid
(reference evaluation/swap_visualization_evaluator.py)."""

from __future__ import annotations

import os

import jax.numpy as jnp
import numpy as np

from ppst_tpu.evaluation.base_evaluator import BaseEvaluator
from ppst_tpu.util.html import HTML
from ppst_tpu.util.util import tensor2im


class SwapVisualizationEvaluator(BaseEvaluator):
    @staticmethod
    def modify_commandline_options(parser, is_train):
        parser.add_argument("--swap_num_columns", type=int, default=4,
                            help="images per swap grid (grid is NxN plus a "
                                 "row/col of originals)")
        parser.add_argument("--swap_num_images", type=int, default=16,
                            help="total images to swap across all grids")
        return parser

    def gather_images(self, dataset):
        images = []
        want = self.opt.swap_num_columns
        exhausted = False
        while len(images) < want:
            try:
                data = next(dataset)
            except StopIteration:
                exhausted = True
                break
            for i in range(data["real_A"].shape[0]):
                images.append(np.asarray(data["real_A"][i : i + 1]))
                if len(images) >= want:
                    break
        if not images:
            return None, True
        return images, exhausted

    def generate_mix_grid(self, model, images):
        n = len(images)
        sps, gls, descs = [], [], []
        for image in images:
            sp, gl = model.encode(image)
            fea, fea1 = model.extract_feat_from_image(image)
            descs.append(
                jnp.concatenate([fea, model.rselfcorr(fea1)], axis=-1)
            )
            sps.append(sp)
            gls.append(gl)

        cell = self.opt.load_size
        grid = np.ones((cell * (n + 1), cell * (n + 1), 3), np.uint8)

        def put(img, row, col):
            h, w = img.shape[:2]
            y = cell * row + (cell - h) // 2
            x = cell * col + (cell - w) // 2
            grid[y : y + h, x : x + w] = img

        for i, image in enumerate(images):
            img_np = tensor2im(image)[0]
            put(img_np, 0, i + 1)
            put(img_np, i + 1, 0)

        all_styles = jnp.concatenate(descs, axis=0)  # style descriptors (N,...)
        all_images = jnp.concatenate([jnp.asarray(im) for im in images], axis=0)
        for i in range(n):
            desc_row = jnp.repeat(descs[i], n, axis=0)  # content desc per row
            corr = model.corrm(all_styles, desc_row)
            _, gl_w = model.encode2(all_images, corr)
            sp_row = jnp.repeat(sps[i], n, axis=0)
            mix_row = model.decode(sp_row, gl_w)
            for j, mix in enumerate(tensor2im(mix_row)):
                put(mix, i + 1, j + 1)
        return grid

    def evaluate(self, model, dataset, nsteps):
        nsteps = (
            self.opt.resume_iter if nsteps is None else f"{round(nsteps / 1000)}k"
        )
        savedir = os.path.join(self.output_dir(), f"{self.target_phase}_{nsteps}")
        os.makedirs(savedir, exist_ok=True)
        webpage = HTML(
            savedir,
            f"Swap Visualization of {self.opt.name}. "
            f"iter={nsteps}. phase={self.target_phase}",
        )
        num_repeats = -(-self.opt.swap_num_images // self.opt.swap_num_columns)
        for i in range(num_repeats):
            images, exhausted = self.gather_images(dataset)
            if images is None:
                break
            mix_grid = self.generate_mix_grid(model, images)
            webpage.add_images([mix_grid], ["%04d.png" % i])
            if exhausted:
                break
        webpage.save()
        return {}
