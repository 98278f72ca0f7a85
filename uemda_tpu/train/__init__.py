from uemda_tpu.train.lr import poly_warmup_schedule
from uemda_tpu.train.optim import make_optimizer
from uemda_tpu.train.state import TrainState, create_train_state
from uemda_tpu.train.checkpoints import load_checkpoint, save_checkpoint
