from .loss import bce_with_logits, deep_supervision_loss
from .trainer import (
    TrainConfig,
    make_train_step,
    make_train_step_multi,
    make_optimizer,
    stage_one_features,
)
from .data import (
    make_bp_failure_miner,
    make_cascade_failure_miner,
    mine_failures,
    mix_easy_hard,
    batch_iterator,
    batch_iterator_stacked,
)
