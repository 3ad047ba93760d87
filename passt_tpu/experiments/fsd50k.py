"""FSD50K recipe (reference: ex_fsd50k.py).

Deltas vs AudioSet: 200 classes, patchout (10, 4), NO SpecAugment
(freqm=timem=0), lr 1e-5, 50 epochs with rampdown start/len 10, SWA from
epoch 10 every 3, shuffled training (no weighted sampler), random-crop to
10 s in training (fsd50k/dataset.py:70-79), two eval sets (valid + eval;
run ``evaluate_only eval_set=eval`` for the second), variable-length eval
via ``data.clip_length=None data.eval_batch_size=1``.
"""

from passt_tpu.config import DataConfig, ExperimentConfig, MelConfig, ModelSelect, TrainerConfig
from passt_tpu.experiments.common import Experiment

experiment = Experiment(
    name="fsd50k",
    speed_test_batch_size=100,  # reference harness default, ex_esc50.py:281 family
    default_config=ExperimentConfig(
        name="fsd50k",
        model=ModelSelect(n_classes=200, s_patchout_t=10, s_patchout_f=4),
        mel=MelConfig(freqm=0, timem=0, fmin_aug_range=10, fmax_aug_range=2000),
        data=DataConfig(
            num_classes=200,
            clip_length=10,
            batch_size=12,
            eval_batch_size=10,
            wavmix=True,
            roll=True,
            weighted_sampler=False,
            crop="random",
        ),
        trainer=TrainerConfig(
            max_epochs=50,
            lr=1e-5,
            ramp_down_start=10,
            ramp_down_len=10,
            loss_type="multilabel",
            swa=True,
            swa_epoch_start=10,
            swa_freq=3,
            # Best-metric checkpoint retention on the validation set's mAP —
            # the reference recipe's ModelCheckpoint(monitor="allap",
            # save_top_k, mode="max") (ex_fsd50k.py:292-294). The reference
            # logs that metric under a "valid_"/"eval_" set prefix
            # (ex_fsd50k.py:222,254) — our dual-set epoch records use the
            # same names, so the intended protocol metric is valid_allap.
            # (With a single configured eval set the record key is plain
            # "allap": set trainer.monitor=allap then.)
            monitor="valid_allap",
        ),
    ),
)

if __name__ == "__main__":
    import sys

    from passt_tpu.experiments.common import run_command

    run_command(experiment, sys.argv[1:])
