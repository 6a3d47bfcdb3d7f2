"""Double-buffered host pipeline for the batch loop.

The reference's loop is fully synchronous: read batch -> place -> write
(reference: epik/src/epik/main.cpp:332-365; a ``<future>`` include and
``is_busy`` helper exist but are dead code, main.cpp:4,39-43).  Here three
stages overlap:

  reader thread:   FASTA parse of batch N+2           (io/fasta.py or native)
  main thread:     tokenize + dispatch batch N+1      (placer.place_async)
  device:          computes batch N                   (async XLA dispatch)
  main thread:     fetch + assemble + write batch N   (placer.place_wait)

With a placer exposing only synchronous ``place`` (the scalar oracle), the
pipeline degrades gracefully to read-ahead only.
"""

from __future__ import annotations

import queue
import threading
import time

__all__ = ["run_pipeline", "PipelineStats"]


class PipelineStats:
    """Throughput + stage-time breakdown (the metrics surface; the reference
    has only the per-batch seq/s meter, SURVEY.md section 5.1)."""

    def __init__(self):
        self.num_seq_placed = 0
        self.num_iterations = 0
        self.average_speed = 0.0
        self.wall_seconds = 0.0
        self.dispatch_seconds = 0.0  # tokenize + pad + async device submit
        self.wait_seconds = 0.0  # device sync + fetch + assemble
        self.write_seconds = 0.0  # jplace serialization

    def summary(self) -> str:
        return (
            f"batches={self.num_iterations} reads={self.num_seq_placed} "
            f"wall={self.wall_seconds:.2f}s "
            f"dispatch={self.dispatch_seconds:.2f}s "
            f"wait={self.wait_seconds:.2f}s write={self.write_seconds:.2f}s"
        )


def _reader_thread(reader, q: queue.Queue, depth: int):
    try:
        while True:
            batch = reader.next_batch()
            q.put(batch)
            if not batch:
                return
    except BaseException as e:  # propagate to consumer
        q.put(e)


def run_pipeline(placer, reader, writer, progress=None, read_ahead: int = 2) -> PipelineStats:
    """Stream all batches from ``reader`` through ``placer`` into ``writer``.

    ``progress(seq_per_second, num_seq_placed, bytes_read)`` is called per
    batch (the reference's meter, main.cpp:347-358).
    """
    stats = PipelineStats()
    q: queue.Queue = queue.Queue(maxsize=read_ahead)
    t = threading.Thread(target=_reader_thread, args=(reader, q, read_ahead), daemon=True)
    t.start()

    # writer thread: jplace serialization overlaps the next batch's compute;
    # a single consumer preserves append order
    wq: queue.Queue = queue.Queue(maxsize=read_ahead)
    werr: list = []

    def _writer_thread():
        while True:
            item = wq.get()
            if item is None:
                return
            t0 = time.monotonic()
            try:
                writer << item
            except BaseException as e:  # surfaced at the end of the run
                werr.append(e)
                return
            stats.write_seconds += time.monotonic() - t0

    wt = threading.Thread(target=_writer_thread, daemon=True)
    wt.start()

    has_async = hasattr(placer, "place_async")
    begin = time.monotonic()
    pending = None  # (pending_handle_or_result, batch_size, t_start)

    def flush(p):
        handle, bsize, t_start = p
        t0 = time.monotonic()
        placed = placer.place_wait(handle) if has_async else handle
        stats.wait_seconds += time.monotonic() - t0
        ms = max((time.monotonic() - t_start) * 1000.0, 1.0)
        if werr:
            raise werr[0]
        wq.put(placed)
        seq_per_second = 1000.0 * bsize / ms
        stats.average_speed += seq_per_second
        stats.num_seq_placed += bsize
        stats.num_iterations += 1
        if progress is not None:
            progress(seq_per_second, stats.num_seq_placed, reader.bytes_read())

    while True:
        batch = q.get()
        if isinstance(batch, BaseException):
            raise batch
        if not batch:
            break
        t_start = time.monotonic()
        handle = placer.place_async(batch) if has_async else placer.place(batch)
        stats.dispatch_seconds += time.monotonic() - t_start
        if pending is not None:
            flush(pending)
        pending = (handle, len(batch), t_start)
    if pending is not None:
        flush(pending)
    wq.put(None)
    wt.join()
    if werr:
        raise werr[0]

    if stats.num_iterations:
        stats.average_speed /= stats.num_iterations
    stats.wall_seconds = time.monotonic() - begin
    return stats
