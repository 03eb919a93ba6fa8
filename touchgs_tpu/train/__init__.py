from touchgs_tpu.train.trainer import Trainer, TrainState, make_train_step  # noqa: F401
