from shapegen_tpu.train.schedulers import ReduceLROnPlateau, CosineAnnealingLR  # noqa: F401
from shapegen_tpu.train.checkpoints import TopKCheckpointer, load_checkpoint  # noqa: F401
from shapegen_tpu.train.state import TrainState, set_learning_rate  # noqa: F401
from shapegen_tpu.train import tasks  # noqa: F401
from shapegen_tpu.train.trainer import Trainer, TrainerConfig  # noqa: F401
