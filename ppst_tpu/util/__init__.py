from ppst_tpu.util.util import (
    str2bool,
    lerp,
    normalize,
    tensor2im,
    tile_images,
    save_image,
    mkdirs,
    find_class_in_module,
    to_numpy,
)
from ppst_tpu.util.iter_counter import IterationCounter
from ppst_tpu.util.metric_tracker import MetricTracker
from ppst_tpu.util.visualizer import Visualizer
from ppst_tpu.util.html import HTML
