from ppst_tpu.train.steps import build_train_steps, make_optimizers
from ppst_tpu.train.bundle import ModelBundle, create_model
