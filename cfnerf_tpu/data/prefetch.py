"""Double-buffered host->device batch prefetch.

SURVEY.md section 7 stage 5: the reference's host pipeline is synchronous —
slice rays, upload, step, repeat (run_nerf_uncertainty_NF.py:938-1014).  On
TPU the dispatch is asynchronous, so the only thing serializing host work
with device compute is Python itself: a background thread that samples and
uploads batch n+1 while the device executes step n removes the host from
the critical path entirely for the default n_inner=1 trainer (the n_inner>1
scan trainer amortizes dispatch differently).

JAX note: device_put/jnp.asarray from a worker thread is safe; the queue
holds device-resident (already sharded) batches, so the consumer's only
work is a Queue.get.
"""
from __future__ import annotations

import queue
import threading
from typing import Any, Callable, Tuple


class BatchPrefetcher:
    """Produces (step, device_batch) pairs for steps start+1, start+2, ...

    make_batch(step) runs on the worker thread: it should sample the host
    batch AND move it to device (e.g. shard_batch(mesh, ...)).  depth=2 is
    classic double buffering: one batch in flight on device, one staged.
    """

    def __init__(self, make_batch: Callable[[int], Any], start_step: int,
                 depth: int = 2):
        self._make = make_batch
        self._q: "queue.Queue[Tuple[int, Any]]" = queue.Queue(maxsize=depth)
        self._stop = threading.Event()
        self._error = None
        self._start_step = start_step
        self._thread = threading.Thread(target=self._worker, daemon=True)
        self._thread.start()

    def _worker(self):
        step = self._start_step
        try:
            while not self._stop.is_set():
                step += 1
                item = (step, self._make(step))
                while not self._stop.is_set():
                    try:
                        self._q.put(item, timeout=0.1)
                        break
                    except queue.Full:
                        continue
        except Exception as e:  # surfaced on the consumer's next() call
            self._error = e

    def next(self) -> Tuple[int, Any]:
        while True:
            if self._error is not None:
                raise self._error
            try:
                return self._q.get(timeout=0.5)
            except queue.Empty:
                if not self._thread.is_alive() and self._error is None:
                    raise RuntimeError("prefetch worker exited unexpectedly")

    def close(self):
        self._stop.set()
        # drain so a blocked put wakes up
        try:
            while True:
                self._q.get_nowait()
        except queue.Empty:
            pass
        self._thread.join(timeout=2.0)
