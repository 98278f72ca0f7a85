"""Background-thread batch prefetching.

The reference hides host latency behind 4-8 DataLoader worker processes
(``configs/ToVaihingen.py:59``); this machine has one CPU core, so instead a
single daemon thread assembles the next batches (RAM-cached decode + stack)
while the device executes the current step — enough to hide the ~10-20 ms of
host work behind 200-300 ms device steps.
"""

import queue
import threading
from typing import Iterator


def prefetch(iterator: Iterator, depth: int = 2) -> Iterator:
    """Wrap any batch iterator with a depth-bounded background thread.

    Worker exceptions (decode/IO failures) re-raise in the consumer — a
    corrupt tile must fail the run, not silently truncate the dataset."""
    q: "queue.Queue" = queue.Queue(maxsize=depth)
    stop = object()

    def worker():
        try:
            for item in iterator:
                q.put(item)
            q.put(stop)
        except BaseException as e:  # noqa: BLE001 - forwarded to consumer
            q.put((stop, e))

    t = threading.Thread(target=worker, daemon=True)
    t.start()
    while True:
        item = q.get()
        if item is stop:
            return
        if isinstance(item, tuple) and len(item) == 2 and item[0] is stop:
            raise item[1]
        yield item
