from matcha_tpu.train.metrics import size_stratified_metrics  # noqa: F401
from matcha_tpu.train.runtime import (Trainer, TrainState,  # noqa: F401
                                      TrainSettings)
