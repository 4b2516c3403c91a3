from rusty_sr_tpu.train.loop import train_loop, TrainConfig, make_train_step, loss_fn  # noqa: F401
from rusty_sr_tpu.train.data import ImageFolderSupplier, PrefetchBuffer  # noqa: F401
