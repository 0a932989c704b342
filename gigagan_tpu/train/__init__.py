from gigagan_tpu.train.ema import EMAState, ema_update
from gigagan_tpu.train.optimizer import get_optimizer
from gigagan_tpu.train.steps import GANState, TrainStepBuilder
from gigagan_tpu.train.trainer import GigaGAN, save_image_grid

__all__ = [
    "EMAState",
    "ema_update",
    "get_optimizer",
    "GANState",
    "TrainStepBuilder",
    "GigaGAN",
    "save_image_grid",
]
