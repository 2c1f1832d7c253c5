from .checkpoint import load_icv_checkpoint, save_icv_checkpoint
from .trainer import Trainer, TrainerConfig

__all__ = [
    "load_icv_checkpoint",
    "save_icv_checkpoint",
    "Trainer",
    "TrainerConfig",
]
