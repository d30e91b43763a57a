"""haloop_tpu: a TPU-native speech agent toolkit (JAX/XLA/Pallas/pjit).

A from-scratch rebuild of the capabilities of proger/haloop for TPU:
acoustic-model training (CTC / Star-CTC / transducer / attention
encoder-decoder), RNN and GPT language models, greedy & beam decoding,
sentence scoring, a GPT REPL, WER tooling, and an active-learning driver.

Layer map (mirrors SURVEY.md §1):
  ops/      -- numerics: log-semiring scans, lattice losses, attention kernels
  nn/       -- parameterized layers as pytree params + pure apply functions
  models/   -- model zoo: GPT, audio transformers, LSTM, recognizers
  parallel/ -- device mesh, sharding, collectives
  top-level -- lifecycle (init/checkpoint/optim), data, training loops, CLIs
"""

__version__ = "0.1.0"
