from recommendar_systems_tpu.train.trainer import Trainer, get_trainer
