"""Host-side prefetching: overlap ray-batch assembly + host->HBM transfer
with the device train step.

Replaces the reference's torch DataLoader worker processes
(scripts/train.py:65-68) with a background thread that runs the numpy
sampler and eagerly device_puts the next batches while the TPU computes.
"""
import queue
import threading


class PrefetchIterator:
    """Wrap an iterable; a worker thread applies `transform` (typically the
    trainer's device_put) and keeps `depth` ready batches queued."""

    def __init__(self, iterable, transform=None, depth=3):
        self.iterable = iterable
        self.transform = transform or (lambda x: x)
        self.depth = depth

    def __len__(self):
        return len(self.iterable)

    def __iter__(self):
        q = queue.Queue(maxsize=self.depth)
        sentinel = object()
        error = []

        def worker():
            try:
                for item in self.iterable:
                    q.put(self.transform(item))
            except BaseException as e:  # surfaced on the consumer side
                error.append(e)
            finally:
                q.put(sentinel)

        thread = threading.Thread(target=worker, daemon=True)
        thread.start()
        while True:
            item = q.get()
            if item is sentinel:
                if error:
                    raise error[0]
                return
            yield item
