"""bench.py backend gate: never report a TPU headline from a non-TPU backend.

The driver runs bench.py on the real chip through the axon tunnel, which
logs a bridge-level "Platform 'axon' is experimental" warning while still
selecting the ``tpu`` jax backend. If that tunnel ever silently fell back
to CPU, the benchmark would print a plausible-but-wrong specs/s — the gate
turns that into a refusal (VERDICT r4 item 8).
"""

import os
import sys

import pytest


def _import_bench():
    sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
    import bench

    return bench


def test_gate_refuses_cpu_backend(monkeypatch):
    bench = _import_bench()
    monkeypatch.delenv("PASST_BENCH_ALLOW_CPU", raising=False)
    # conftest.py pins this test process to the virtual CPU backend.
    with pytest.raises(SystemExit, match="refusing to report"):
        bench._assert_tpu_backend()


def test_gate_allows_labeled_cpu_run(monkeypatch):
    bench = _import_bench()
    monkeypatch.setenv("PASST_BENCH_ALLOW_CPU", "1")
    platform, device_kind = bench._assert_tpu_backend()
    assert platform == "cpu"
    assert device_kind  # recorded in the output JSON line
