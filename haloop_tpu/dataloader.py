"""Host-side data pipeline: bucketed padding collator + threaded
prefetch loader.

Replaces torch DataLoader/worker-processes (ha/loop.py:502-509) with a
TPU-appropriate design: XLA compiles one program per input shape, so the
collator pads frame and token axes UP TO BUCKET BOUNDARIES (geometric
frame buckets, fixed-size token buckets). A background thread keeps the
next batch ready while the device runs the current step (double
buffering); with jax dispatch being async, this keeps the TPU busy.
"""

import queue
import threading

import numpy as np


def bucket_length(n, buckets):
    """Smallest bucket >= n; buckets grow geometrically so the number of
    compiled programs stays logarithmic in max length."""
    for b in buckets:
        if n <= b:
            return b
    return _round_up(n, 128)


def _round_up(n, m):
    return (n + m - 1) // m * m


def default_frame_buckets(max_len=16384):
    out, b = [], 128
    while b < max_len:
        out.append(b)
        b = _round_up(int(b * 1.5), 128)
    out.append(_round_up(max_len, 128))
    return out


class Collator:
    """Pads a list of (index, frames (T, C), text) into fixed bucketed
    arrays (ha/loop.py:24-41 semantics + bucketing)."""

    def __init__(self, vocab, frame_buckets=None, token_bucket=16):
        self.vocab = vocab
        self.frame_buckets = frame_buckets or default_frame_buckets()
        self.token_bucket = token_bucket

    def __call__(self, batch):
        indices = np.array([b[0] for b in batch])
        condtargets = [np.asarray(self.vocab.encode(b[2])) for b in batch]

        input_lengths = np.array([len(b[1]) for b in batch], np.int32)
        condtarget_lengths = np.array([len(t) for t in condtargets],
                                      np.int32)

        T = bucket_length(int(input_lengths.max()), self.frame_buckets)
        U = max(self.token_bucket,
                _round_up(int(condtarget_lengths.max()), self.token_bucket))

        C = batch[0][1].shape[-1]
        inputs = np.zeros((len(batch), T, C), np.float32)
        targets = np.zeros((len(batch), U), np.int64)
        for i, b in enumerate(batch):
            inputs[i, :len(b[1])] = b[1]
            targets[i, :len(condtargets[i])] = condtargets[i]
        return indices, inputs, targets, input_lengths, condtarget_lengths


class DataLoader:
    """Iterates dataset indices in batches, collating on `num_workers`
    threads (numpy releases the GIL for the heavy ops) with ordered
    delivery, prefetching `prefetch` batches ahead."""

    def __init__(self, dataset, collate_fn, batch_size=None, shuffle=False,
                 drop_last=False, batch_sampler=None, seed=0, prefetch=4,
                 num_workers=1, process_shard=None):
        self.dataset = dataset
        self.collate_fn = collate_fn
        self.batch_size = batch_size
        self.shuffle = shuffle
        self.drop_last = drop_last
        self.batch_sampler = batch_sampler
        self.seed = seed
        self.prefetch = max(prefetch, num_workers + 1)
        self.num_workers = max(1, num_workers)
        # multi-host: (process_index, process_count) — each host iterates
        # a disjoint 1/count slice of the (epoch-shuffled) index stream,
        # replacing torch's DistributedSampler (SURVEY.md §5.8)
        self.process_shard = process_shard
        self.epoch = 0

    def _indices(self):
        indices = np.arange(len(self.dataset))
        if self.shuffle:
            # same permutation on every process (seed is shared), then a
            # disjoint strided slice per process
            rng = np.random.default_rng(self.seed + self.epoch)
            rng.shuffle(indices)
        if self.process_shard is not None:
            pi, pc = self.process_shard
            if pc > 1:
                # equalize per-process counts (floor) so every host
                # iterates the SAME number of batches — unequal counts
                # would leave one host inside a collective step while
                # another has exited the loop (deadlock); torch's
                # DistributedSampler pads for the same reason
                indices = indices[pi::pc][:len(indices) // pc]
        return indices

    def _index_batches(self):
        if self.batch_sampler is not None:
            # the sampler path honors the same epoch/multi-host
            # contract as the index path: bump its epoch (else a
            # shuffling DurationBatchSampler repeats epoch-0's order
            # forever) and give each process a disjoint, equal-count
            # slice of the batch stream
            if hasattr(self.batch_sampler, 'set_epoch'):
                self.batch_sampler.set_epoch(self.epoch)
            batches = list(self.batch_sampler)
            if self.process_shard is not None:
                pi, pc = self.process_shard
                if pc > 1:
                    batches = batches[pi::pc][:len(batches) // pc]
            yield from batches
            return
        indices = self._indices()
        for i in range(0, len(indices), self.batch_size):
            chunk = indices[i:i + self.batch_size].tolist()
            if self.drop_last and len(chunk) < self.batch_size:
                continue
            yield chunk

    def __len__(self):
        if self.batch_sampler is not None:
            n = sum(1 for _ in self.batch_sampler)
            if self.process_shard is not None and self.process_shard[1] > 1:
                n //= self.process_shard[1]
            return n
        n = len(self._indices())
        if self.drop_last:
            return n // self.batch_size
        return (n + self.batch_size - 1) // self.batch_size

    def _set_dataset_epoch(self, dataset, epoch, seen=None):
        """Propagate the epoch counter into the dataset tree so
        augmentations seeded by (seed, epoch, index) — data.Mask/Speed —
        redraw each epoch while staying reproducible (duck-typed: any
        node with an ``epoch`` attribute gets it set)."""
        seen = set() if seen is None else seen
        if id(dataset) in seen:
            return
        seen.add(id(dataset))
        if hasattr(dataset, 'epoch'):
            dataset.epoch = epoch
        for child in getattr(dataset, 'datasets', []):
            self._set_dataset_epoch(child, epoch, seen)
        if hasattr(dataset, 'dataset'):
            self._set_dataset_epoch(dataset.dataset, epoch, seen)

    def __iter__(self):
        self.epoch += 1
        self._set_dataset_epoch(self.dataset, self.epoch)
        if self.num_workers == 1:
            yield from self._iter_single()
        else:
            yield from self._iter_pool()

    def _iter_single(self):
        q = queue.Queue(maxsize=self.prefetch)
        sentinel = object()

        def worker():
            try:
                for idx_batch in self._index_batches():
                    items = [self.dataset[i] for i in idx_batch]
                    q.put(self.collate_fn(items))
            except BaseException as e:          # surface in consumer
                q.put(e)
            finally:
                q.put(sentinel)

        threading.Thread(target=worker, daemon=True).start()
        while True:
            item = q.get()
            if item is sentinel:
                break
            if isinstance(item, BaseException):
                raise item
            yield item

    def _iter_pool(self):
        """Thread pool with in-order delivery."""
        import concurrent.futures as cf

        def load(idx_batch):
            return self.collate_fn([self.dataset[i] for i in idx_batch])

        with cf.ThreadPoolExecutor(max_workers=self.num_workers) as pool:
            pending = {}
            batches = enumerate(self._index_batches())
            next_submit = 0
            next_yield = 0
            exhausted = False
            while True:
                while not exhausted and len(pending) < self.prefetch:
                    try:
                        i, idx_batch = next(batches)
                    except StopIteration:
                        exhausted = True
                        break
                    pending[i] = pool.submit(load, idx_batch)
                    next_submit = i + 1
                if next_yield not in pending:
                    break
                fut = pending.pop(next_yield)
                next_yield += 1
                yield fut.result()
