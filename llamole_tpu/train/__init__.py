from .trainer import Trainer, TrainState, create_optimizer
from .workflow import run_mmsft
