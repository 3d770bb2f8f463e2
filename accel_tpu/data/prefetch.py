"""Background-thread prefetching iterator.

Reference counterpart: ``lib/utils/PrefetchingIter.py`` (SURVEY.md §2) —
double-buffered producer thread hiding host data-prep behind device compute.
The native extension releases the GIL in its hot loops, so the producer
thread gets real CPU parallelism.
"""

from __future__ import annotations

import queue
import threading


class PrefetchingIter:
    def __init__(self, it, depth: int = 2, transform=None):
        """``transform`` (optional) runs in the producer thread — use it for
        jax.device_put so H2D transfer overlaps compute too."""
        self._it = iter(it)
        self._q: queue.Queue = queue.Queue(maxsize=depth)
        self._transform = transform
        self._done = object()
        self._err: BaseException | None = None
        self._thread = threading.Thread(target=self._produce, daemon=True)
        self._thread.start()

    def _produce(self):
        try:
            for item in self._it:
                if self._transform is not None:
                    item = self._transform(item)
                self._q.put(item)
        except BaseException as e:  # propagate into the consumer
            self._err = e
        finally:
            self._q.put(self._done)

    def __iter__(self):
        return self

    def __next__(self):
        item = self._q.get()
        if item is self._done:
            if self._err is not None:
                raise self._err
            raise StopIteration
        return item
