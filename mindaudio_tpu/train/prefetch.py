"""Background host→device batch prefetching.

The reference overlaps input work with compute via MindSpore's dataset
engine threads; here a small queue-backed wrapper does the same for any
Python batch iterator: collate runs in a worker thread while the device
executes the previous step, and ``device_put`` happens eagerly so transfers
overlap too (dispatch is async in JAX).
"""

from __future__ import annotations

import queue
import threading
from typing import Callable, Iterable, Iterator, Optional

import jax

__all__ = ["prefetch"]

_SENTINEL = object()


def prefetch(
    iterator: Iterable,
    size: int = 2,
    transform: Optional[Callable] = None,
) -> Iterator:
    """Iterate ``iterator`` through a ``size``-deep background queue.

    Args:
        iterator: any iterator of batches (tuples/dicts of arrays).
        size: queue depth; 2 is enough to hide collate + transfer.
        transform: optional fn applied in the worker thread — typically
            ``lambda b: jax.device_put(b, sharding)`` so the H2D copy is
            already in flight when the training loop receives the batch.

    Raises any worker exception in the consumer thread. Abandoning the
    generator early (``break``, GC) stops the worker promptly: the producer
    polls a stop event instead of blocking forever on a full queue, so no
    thread or device-resident batch outlives the consumer.
    """
    q: "queue.Queue" = queue.Queue(maxsize=size)
    err = []
    stop = threading.Event()

    def _put(item) -> bool:
        """put with stop polling; False = consumer gone, abort production."""
        while True:
            try:
                q.put(item, timeout=0.1)
                return True
            except queue.Full:
                if stop.is_set():
                    return False

    def worker():
        try:
            for item in iterator:
                if stop.is_set():
                    return
                if transform is not None:
                    item = transform(item)
                if not _put(item):
                    return
        except BaseException as e:  # re-raised on the consumer side
            err.append(e)
        finally:
            _put(_SENTINEL)

    t = threading.Thread(target=worker, daemon=True)
    t.start()

    try:
        while True:
            item = q.get()
            if item is _SENTINEL:
                if err:
                    raise err[0]
                return
            yield item
    finally:
        # consumer finished or abandoned us: release the producer and drop
        # any queued (possibly device-resident) batches
        stop.set()
        try:
            while True:
                q.get_nowait()
        except queue.Empty:
            pass
