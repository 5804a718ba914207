"""Double-buffered batch prefetcher (SURVEY.md section 7 stage 5)."""
import time

import numpy as np
import pytest

from cfnerf_tpu.data.prefetch import BatchPrefetcher


def test_order_and_values():
    pf = BatchPrefetcher(lambda step: {"x": np.full(3, step)}, start_step=10)
    try:
        for want in (11, 12, 13, 14):
            step, batch = pf.next()
            assert step == want
            np.testing.assert_array_equal(batch["x"], np.full(3, want))
    finally:
        pf.close()


def test_overlap_hides_host_latency():
    """With a 20ms sample cost and a 20ms consumer, the pipelined loop
    must take well under the 2x serial time."""
    def slow_make(step):
        time.sleep(0.02)
        return step

    pf = BatchPrefetcher(slow_make, start_step=0)
    try:
        pf.next()  # warm the pipe
        t0 = time.perf_counter()
        n = 10
        for _ in range(n):
            pf.next()
            time.sleep(0.02)  # "device compute"
        elapsed = time.perf_counter() - t0
    finally:
        pf.close()
    serial = n * 0.04
    assert elapsed < serial * 0.8, f"no overlap: {elapsed:.3f}s vs serial {serial:.3f}s"


def test_worker_error_surfaces():
    def bad(step):
        raise RuntimeError("boom")

    pf = BatchPrefetcher(bad, start_step=0)
    with pytest.raises(RuntimeError, match="boom"):
        pf.next()
    pf.close()


def test_close_joins():
    pf = BatchPrefetcher(lambda s: s, start_step=0)
    pf.next()
    pf.close()
    assert not pf._thread.is_alive()
