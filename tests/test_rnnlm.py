"""hal System tests: exact stream resume (checkpoint carries live hidden
state + carry-over prompt, ha/rnnlm.py:115-124) and BPC evaluation."""

import numpy as np
import pytest
import jax

from haloop_tpu.checkpoint import load_checkpoint, save_checkpoint
from haloop_tpu.rnnlm import System, main as _main


def make_args(tmp_path, corpus, **over):
    import argparse
    base = dict(init=None, reset_step=None, save=tmp_path / "ck.pt",
                device='cpu', lr=2e-3, wd=0.1, dropout=0.0, max_steps=-1,
                batch_size=2, bptt_len=16, rnn_size=32, num_layers=1,
                vocab='auto', train=f"bytes:{corpus}", top_k=1,
                log_interval=1000, hyp=False, chunk=False, complete=None,
                start_token='\n', complete_file=None, num_workers=1)
    base.update(over)
    return argparse.Namespace(**base)


@pytest.fixture
def corpus(tmp_path):
    p = tmp_path / "corpus.txt"
    p.write_text("the quick brown fox jumps over the lazy dog " * 40)
    return p


def test_exact_stream_resume(tmp_path, corpus):
    # continuous run: 10 steps
    args = make_args(tmp_path, corpus, max_steps=9)
    sys_a = System(args)
    sys_a.train_one_epoch(step=0)
    ref = jax.tree.leaves(sys_a.params)

    # split run: 5 steps, checkpoint, restore, 5 more
    args_b = make_args(tmp_path, corpus, max_steps=4,
                       save=tmp_path / "mid.pt")
    sys_b = System(args_b)
    sys_b.train_one_epoch(step=0)
    save_checkpoint(tmp_path / "mid.pt", sys_b.make_state_dict())

    args_c = make_args(tmp_path, corpus, max_steps=9,
                       init=tmp_path / "mid.pt")
    sys_c = System(args_c)
    assert sys_c.step == 5
    sys_c.train_one_epoch(step=sys_c.step)
    got = jax.tree.leaves(sys_c.params)

    for a, b in zip(ref, got):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-5, atol=1e-6)


def test_complete_reports_bpc(tmp_path, corpus):
    args = make_args(tmp_path, corpus, max_steps=3,
                     complete=["the quick"], bptt_len=4)
    system = System(args)
    system.train_one_epoch(step=0)
    scores, outputs = system.evaluate()
    assert scores.shape == (1,)
    assert np.isfinite(scores[0])
    assert outputs[0].startswith("\nthe quick")
