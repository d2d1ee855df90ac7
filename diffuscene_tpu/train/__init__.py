from .ae_trainer import AETrainer, AETrainState
from .optim import freeze_mask, lr_schedule_factory, optimizer_factory
from .trainer import Trainer, TrainState
