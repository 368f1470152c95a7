"""Threaded host-IO helpers: image prefetching and async file writing.

Parity with the reference's RealESRGANer threading utilities
(/root/reference/real_esrganer.py:172-218 PrefetchReader/IOConsumer) — host-side
pipeline pieces for batch jobs: overlap disk IO with TPU compute.
"""

from __future__ import annotations

import queue
import threading

from pixray_tpu.io.images import open_image, to_tensor


class PrefetchReader(threading.Thread):
    """Background image loader: iterate to receive (path, tensor) pairs."""

    def __init__(self, img_list, num_prefetch_queue: int = 4):
        super().__init__(daemon=True)
        self.que = queue.Queue(num_prefetch_queue)
        self.img_list = list(img_list)

    def run(self):
        for path in self.img_list:
            try:
                self.que.put((path, to_tensor(open_image(path).convert("RGB"))))
            except Exception as e:  # skip unreadable files, keep the pipeline alive
                print(f"PrefetchReader: skipping {path}: {e}")
        self.que.put(None)

    def __iter__(self):
        return self

    def __next__(self):
        item = self.que.get()
        if item is None:
            raise StopIteration
        return item


class IOConsumer(threading.Thread):
    """Background file writer: feed (pil_image, path) jobs; 'quit' to stop."""

    def __init__(self, que: queue.Queue, qid: int = 0):
        super().__init__(daemon=True)
        self._queue = que
        self.qid = qid

    def run(self):
        while True:
            msg = self._queue.get()
            if msg == "quit":
                break
            img, path = msg
            img.save(path)
        print(f"IO worker {self.qid} is done.")
