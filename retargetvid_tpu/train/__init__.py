from retargetvid_tpu.train.losses import kld_loss, nss, corr_coeff, loss_sequences
from retargetvid_tpu.train.trainer import Trainer, TrainState, make_train_step

__all__ = ["kld_loss", "nss", "corr_coeff", "loss_sequences",
           "Trainer", "TrainState", "make_train_step"]
