"""Prefetching host-side frame loader (double-buffered device feed).

The north-star execution model (BASELINE.json): host-side decode and
pose/intrinsics handling stay on the host, feeding a double-buffered device
pipeline.  ``PrefetchLoader`` runs IO + decode (+ optional resize/normalize)
in background threads so the device step never waits on the filesystem, and
keeps a bounded queue so memory stays flat on multi-thousand-frame scenes.
"""
from __future__ import annotations

import queue
import threading
from typing import Callable, Iterable, Iterator, TypeVar

T = TypeVar("T")

_SENTINEL = object()


class PrefetchLoader:
    """Run ``load_fn`` over items in background threads, yielding in order.

    Args:
        items: work list (e.g. frame names).
        load_fn: item -> loaded value (called in worker threads; must be
            thread-safe — NumPy/PIL decode is).
        num_workers: decode threads.
        buffer_size: max loaded-but-unconsumed items (the "double buffer";
            2-8 is plenty since the consumer is a ~10 ms device step).
    """

    def __init__(self, items: Iterable, load_fn: Callable, num_workers: int = 2,
                 buffer_size: int = 4):
        self.items = list(items)
        self.load_fn = load_fn
        self.num_workers = max(1, num_workers)
        self.buffer_size = max(1, buffer_size)

    def __len__(self) -> int:
        return len(self.items)

    def __iter__(self) -> Iterator:
        n = len(self.items)
        if n == 0:
            return
        results: dict[int, object] = {}
        results_lock = threading.Lock()
        results_ready = threading.Condition(results_lock)
        task_q: queue.Queue = queue.Queue()
        errors: list[BaseException] = []
        # Admission control: at most buffer_size items loaded ahead of the
        # consumer cursor.
        tickets = threading.Semaphore(self.buffer_size)
        stop = threading.Event()

        for i in range(n):
            task_q.put(i)

        def worker():
            while not stop.is_set():
                # Acquire the buffer ticket BEFORE taking a task so in-flight
                # work is always the lowest-index remaining items — otherwise
                # a small buffer could starve the index the consumer waits on.
                tickets.acquire()
                if stop.is_set():
                    return
                try:
                    idx = task_q.get_nowait()
                except queue.Empty:
                    tickets.release()
                    return
                try:
                    value = self.load_fn(self.items[idx])
                except BaseException as e:  # propagate to consumer
                    with results_ready:
                        errors.append(e)
                        results_ready.notify_all()
                    return
                with results_ready:
                    results[idx] = value
                    results_ready.notify_all()

        threads = [threading.Thread(target=worker, daemon=True)
                   for _ in range(self.num_workers)]
        for t in threads:
            t.start()
        try:
            for i in range(n):
                with results_ready:
                    while i not in results and not errors:
                        results_ready.wait()
                    if errors:
                        raise errors[0]
                    value = results.pop(i)
                tickets.release()
                yield value
        finally:
            stop.set()
            # unblock any worker waiting on a ticket
            for _ in threads:
                tickets.release()
            for t in threads:
                t.join(timeout=1.0)


def device_prefetch(frame_iter: Iterable, lookahead: int = 1) -> Iterator:
    """Overlap host->device frame transfers with the device step.

    Wraps an iterator of ``(frame_id, image, ...)`` tuples and starts the
    ``jax.device_put`` of the next ``lookahead`` images before yielding the
    current one, so the H2D copy of frame n+1 rides alongside the compute of
    frame n instead of serializing with it.  On this environment's tunneled
    TPU (~40 MB/s host link) the copy is comparable to the whole per-frame
    step — overlapping it is the difference between ~28 and >30 fps
    host-streamed (VERDICT r1 item 2).

    Images may be arrays or tuples of arrays (YUV 4:2:0 transport).
    """
    import collections

    import jax

    def put(img):
        if isinstance(img, tuple):
            return tuple(jax.device_put(p) for p in img)
        return jax.device_put(img)

    it = iter(frame_iter)
    pending: collections.deque = collections.deque()
    try:
        for _ in range(max(1, lookahead)):
            fid, img, *rest = next(it)
            pending.append((fid, put(img), *rest))
    except StopIteration:
        pass
    for item in it:
        fid, img, *rest = item
        pending.append((fid, put(img), *rest))  # transfer starts now
        yield pending.popleft()
    while pending:
        yield pending.popleft()


def scene_frame_loader(index, scene: str, frames: list[str],
                       preprocess: Callable | None = None,
                       num_workers: int = 2, buffer_size: int = 4):
    """Prefetching loader over one ScanNet scene's frames.

    Yields (frame_id, image, T_cw) with decode and preprocessing off the
    critical path.  ``preprocess`` maps the raw RGB array (e.g.
    transforms.preprocess_image or a pass-through for on-device resize).
    """
    import numpy as np
    from PIL import Image

    from . import scannet

    def load(frame):
        T_cw = scannet.read_extrinsic(index.pose_path(scene, frame))
        rgb = np.asarray(Image.open(index.image_path(scene, frame)))
        if preprocess is not None:
            rgb = preprocess(rgb)
        return int(frame), rgb, T_cw

    return PrefetchLoader(frames, load, num_workers, buffer_size)
