"""Duration-bucketed batch sampler (reference: ha/sampler.py).

Greedy packing: a batch closes when (len+1) * max_duration would exceed
the budget — max duration is used because padded batches cost as much as
their longest member. Shuffling (optional) happens over indices before
packing, per epoch.
"""

import numpy as np


class DurationBatchSampler:
    def __init__(self, data_source, max_duration=240, shuffle=False, seed=0):
        self.data_source = data_source
        self.max_duration = max_duration
        self.shuffle = shuffle
        self.seed = seed
        self.epoch = 0

    def set_epoch(self, epoch):
        self.epoch = epoch

    def __iter__(self):
        indices = np.arange(len(self.data_source))
        if self.shuffle:
            rng = np.random.default_rng(self.seed + self.epoch)
            rng.shuffle(indices)
        batch = []
        max_duration = 0.0
        for i in indices.tolist():
            d = self.data_source.duration(i)
            new_max = max(max_duration, d)
            if (len(batch) + 1) * new_max > self.max_duration:
                if batch:
                    yield batch
                batch = [i]
                max_duration = d
            else:
                batch.append(i)
                max_duration = new_max
        if batch:
            yield batch
