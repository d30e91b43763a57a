"""BERT-style masking for the GPT denoising objective
(reference: ha/mlm.py): 15% of tokens selected; of those 80% -> mask
token, 10% -> random token, 10% kept; labels are zeroed elsewhere
(ignore_index=0). GPT-2 special ids hardcoded like the reference.
"""

import numpy as np


def mask_tokens(inputs, rng=None, mlm_probability=0.15, mask_token=50254,
                endoftext_token=50256, max_token=50257):
    """inputs: (B, T) int array. Returns (masked_inputs, labels)."""
    if rng is None:
        rng = np.random.default_rng()
    inputs = np.array(inputs, copy=True)
    labels = np.array(inputs, copy=True)

    prob = np.full(labels.shape, mlm_probability)
    prob[labels == endoftext_token] = 0.0
    masked = rng.random(labels.shape) < prob
    labels[~masked] = 0

    replaced = (rng.random(labels.shape) < 0.8) & masked
    inputs[replaced] = mask_token

    randomized = (rng.random(labels.shape) < 0.5) & masked & ~replaced
    inputs[randomized] = rng.integers(0, max_token, labels.shape)[randomized]
    return inputs, labels
