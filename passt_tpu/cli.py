"""CLI entry: ``python -m passt_tpu.cli <experiment> [command] [overrides...]``

Commands (same surface as the reference CLIs, README.md:154-175):
  main              train the recipe
  evaluate_only     run evaluation (mAP / accuracy)
  model_speed_test  training-throughput benchmark (specs/second)
  test_loaders      pull one batch from each loader
  print_config      dump the resolved config

Overrides are dotted ``key=value`` pairs (``trainer.lr=1e-5``,
``data.batch_size=24``); named presets like ``mini_train`` apply bundles
(see passt_tpu.config.PRESETS). The token ``with`` is accepted and ignored
for reference-CLI compatibility.
"""

import sys


def main(argv=None):
    argv = list(sys.argv[1:] if argv is None else argv)
    from passt_tpu.experiments import EXPERIMENTS
    from passt_tpu.experiments.common import run_command

    if not argv or argv[0] in ("-h", "--help"):
        print(__doc__)
        print("experiments:", ", ".join(EXPERIMENTS))
        return 0
    name = argv.pop(0)
    if name not in EXPERIMENTS:
        raise SystemExit(f"unknown experiment {name!r}; available: {list(EXPERIMENTS)}")
    run_command(EXPERIMENTS[name], argv)
    return 0


if __name__ == "__main__":
    sys.exit(main())
