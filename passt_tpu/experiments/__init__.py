from passt_tpu.experiments.common import Experiment, run_command

from passt_tpu.experiments import audioset, esc50, fsd50k, openmic

EXPERIMENTS = {
    "audioset": audioset.experiment,
    "esc50": esc50.experiment,
    "fsd50k": fsd50k.experiment,
    "openmic": openmic.experiment,
}

__all__ = ["Experiment", "run_command", "EXPERIMENTS"]
