from passt_tpu.train.schedules import (
    exp_rampup,
    linear_rampdown,
    linear_rampup,
    pseudo_rampup,
    exp_rampdown,
    cosine_rampdown,
    exp_warmup,
    exp_warmup_linear_down,
    cosine_cycle,
    make_lr_schedule,
)
from passt_tpu.train.mixup import sample_mixup, apply_mixup
from passt_tpu.train.losses import (
    bce_with_logits,
    softmax_ce,
    multilabel_loss,
    single_label_mixup_loss,
    masked_bce_loss,
)
from passt_tpu.train.swa import SWAState, swa_init, swa_update, swa_should_update
from passt_tpu.train.steps import TrainState, create_train_state, make_train_step, make_eval_step
from passt_tpu.train.metrics import average_precision, mean_average_precision, roc_auc

__all__ = [
    "exp_rampup",
    "linear_rampdown",
    "exp_warmup_linear_down",
    "cosine_cycle",
    "make_lr_schedule",
    "sample_mixup",
    "apply_mixup",
    "bce_with_logits",
    "softmax_ce",
    "multilabel_loss",
    "single_label_mixup_loss",
    "masked_bce_loss",
    "SWAState",
    "swa_init",
    "swa_update",
    "swa_should_update",
    "TrainState",
    "create_train_state",
    "make_train_step",
    "make_eval_step",
    "average_precision",
    "mean_average_precision",
    "roc_auc",
]
