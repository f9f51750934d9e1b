from autolabel_tpu.train.losses import DEPTH_EPSILON, LossOptions, compute_losses
from autolabel_tpu.train.optim import make_optimizer
from autolabel_tpu.train.trainer import SimpleTrainer, InteractiveTrainer
