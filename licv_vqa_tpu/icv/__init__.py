from .encoder import GlobalICVEncoder, ICVEncoderOutput, ICVParams
from .module import ICVModuleConfig, TrainState, icv_loss_fn, make_train_step

__all__ = [
    "GlobalICVEncoder",
    "ICVEncoderOutput",
    "ICVParams",
    "ICVModuleConfig",
    "TrainState",
    "icv_loss_fn",
    "make_train_step",
]
