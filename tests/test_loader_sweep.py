"""Loader thread-pool scaling (PARITY §2.4's ~5-core feed requirement).

The build environment has one CPU core, so pool scaling is extrapolated
there; this test turns the standing caveat into an automatic measurement
on the first many-core host that runs the suite (skipped otherwise).
"""

import os
import sys

import pytest

SCRIPTS = os.path.join(os.path.dirname(__file__), "..", "scripts")
if SCRIPTS not in sys.path:
    sys.path.insert(0, SCRIPTS)


def _mp3_stack_available():
    from passt_tpu.data import native
    from passt_tpu.data.prepare import mp3enc

    return mp3enc.available() and native.mp3_available()


@pytest.mark.slow
@pytest.mark.skipif(
    (os.cpu_count() or 1) < 4,
    reason="worker-pool scaling needs a many-core host (build env has 1 core)",
)
def test_native_loader_pool_scales_with_workers():
    if not _mp3_stack_available():
        pytest.skip("mp3 encode/decode stack unavailable")
    from loader_worker_sweep import sweep

    results = sweep(n_clips=24, worker_counts=[1, 4], native_modes=(True,))
    rates = results[True]
    # the ~5-core feed extrapolation assumes near-linear scaling; accept
    # >=50% parallel efficiency at 4 workers, flag anything worse (HDF5
    # single-reader lock / GIL contention) as a real finding
    assert rates[4] > 2.0 * rates[1], (
        f"native loader pool scaled {rates[4] / rates[1]:.2f}x at 4 workers "
        f"(<2x): PARITY §2.4's linear-scaling extrapolation does not hold "
        f"on this host — re-derive the feed-core requirement"
    )
