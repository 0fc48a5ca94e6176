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

    Raises any worker exception in the consumer thread.
    """
    q: "queue.Queue" = queue.Queue(maxsize=size)
    err = []

    def worker():
        try:
            for item in iterator:
                if transform is not None:
                    item = transform(item)
                q.put(item)
        except BaseException as e:  # re-raised on the consumer side
            err.append(e)
        finally:
            q.put(_SENTINEL)

    t = threading.Thread(target=worker, daemon=True)
    t.start()

    while True:
        item = q.get()
        if item is _SENTINEL:
            if err:
                raise err[0]
            return
        yield item
