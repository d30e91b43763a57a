"""Reference-side DECODE rehearsal on an exported checkpoint.

The cross-framework WER-parity recipe (README) exports a here-trained
hac checkpoint for the reference stack to decode. test_export.py pins
strict-load + logits parity; this test pulls the chain one link
further: a model TRAINED here, exported with pt_saver, is pushed
through the reference's own eval semantics — Encoder.forward +
TemporalClassifier.decode + the F.ctc_loss eval loss
(/root/reference/ha/loop.py:277-343, ha/recognizer.py:48-72) — via the
installed torch CPU, and the greedy hypotheses, per-frame alignments,
and eval loss must match our evaluate()'s decode
(models/recognizer.py:temporal_classifier_decode) on the same
utterances. Fails if export ever breaks reference-side DECODE, not
just parameter loading.

Utterances are fed one at a time with their exact frame counts (no
bucket padding): the reference collapses argmax rows over the full
padded width (ha/recognizer.py:52-57 ignores input_lengths), ours
masks by length — with B=1 exact-length inputs the two conventions
coincide and any hypothesis diff is a real export/numerics break.
"""

import subprocess
import sys
from pathlib import Path

import numpy as np
import pytest
import jax
import jax.numpy as jnp

REPO = Path(__file__).resolve().parent.parent


@pytest.fixture(scope="module")
def trained_system():
    """lstm-tiny:512 trained 100 steps at lr 1e-2 on sinusoids — just
    past the all-blank CTC phase, so decodes are non-trivial."""
    from haloop_tpu.dataloader import Collator
    from haloop_tpu.data import make_dataset
    from haloop_tpu.init import create_model
    from haloop_tpu.loop import System, make_parser
    from haloop_tpu.symbol_tape import make_vocab

    args = make_parser().parse_args([
        '--arch', 'lstm-tiny:512', '--vocab', '512', '--lr', '1e-2',
        '--lr_schedule', 'const', '--clip-grad-norm', '10'])
    vocab = make_vocab('512')
    spec = create_model(args.arch)
    params = spec.init(jax.random.PRNGKey(0))
    system = System(args, spec, params, vocab)

    ds = make_dataset('head:sinusoids0')
    _, inputs, ct, il, tl = Collator(vocab)([ds[i] for i in range(8)])
    for step in range(100):
        key = system.next_key()
        (system.params, system.opt_state, loss, _, _) = \
            system._train_step(system.params, system.opt_state, inputs,
                               ct, il, tl, key, jnp.int32(step))
    assert np.isfinite(float(loss))
    return system, vocab, ds


def test_reference_decodes_exported_checkpoint(trained_system, tmp_path):
    torch = pytest.importorskip("torch")
    from conftest import reference_module
    ha_rnn = reference_module("ha.rnn")
    ha_recognizer = reference_module("ha.recognizer")
    from haloop_tpu.checkpoint import save_checkpoint
    from haloop_tpu.models.rnn import encoder_apply
    from haloop_tpu.models.recognizer import (temporal_classifier_decode,
                                              temporal_classifier_loss)

    system, vocab, ds = trained_system

    native = tmp_path / "hac.pt"
    save_checkpoint(native, {"encoder": system.params["encoder"],
                             "recognizer": system.params["recognizer"],
                             "optimizer": None, "loop_args": {}})
    subprocess.run([sys.executable, "-m", "haloop_tpu.export",
                    str(native), str(tmp_path / "out.pt")], check=True,
                   cwd=REPO,
                   env={"PATH": "/usr/bin:/bin", "JAX_PLATFORMS": "cpu",
                        "PALLAS_AXON_POOL_IPS": "", "HOME": "/root"})

    # the reference stack, loaded strictly from OUR export, in eval mode
    enc = ha_rnn.Encoder(input_dim=80, subsample_dim=128, hidden_dim=256)
    enc.load_state_dict(
        torch.load(tmp_path / "out.encoder.pt", weights_only=True),
        strict=True)
    rec = ha_recognizer.TemporalClassifier(feat_dim=256, vocab_size=512)
    rec.load_state_dict(
        torch.load(tmp_path / "out.recognizer.pt", weights_only=True),
        strict=True)
    enc.eval(), rec.eval()

    ref_losses, our_losses = [], []
    decoded = 0
    for i in range(8):
        _, frames, text = ds[i]
        x = np.asarray(frames, np.float32)[None]          # (1, T, 80)
        il = np.array([x.shape[1]], np.int64)
        targets = np.asarray(vocab.encode(text), np.int64)[None]
        tl = np.array([targets.shape[1]], np.int64)

        with torch.inference_mode():
            feats_t, flen_t, _ = enc(torch.tensor(x), torch.tensor(il))
            hyps_t, hlen_t, ali_t, _, _ = rec.decode(
                feats_t, flen_t, torch.tensor(tl))
            loss_t, _ = rec(feats_t, torch.tensor(targets),
                            input_lengths=flen_t,
                            target_lengths=torch.tensor(tl))

        feats_j, flen_j, _ = encoder_apply(
            jax.tree.map(lambda a: jnp.asarray(a, jnp.float32),
                         system.params["encoder"]),
            jnp.asarray(x), jnp.asarray(il), train=False)
        hyps_j, hlen_j, ali_j, _, _ = temporal_classifier_decode(
            system.params["recognizer"], feats_j, flen_j, train=False)
        loss_j, _ = temporal_classifier_loss(
            system.params["recognizer"], feats_j, jnp.asarray(targets),
            input_lengths=flen_j, target_lengths=jnp.asarray(tl),
            train=False)

        # the whole chain agrees: features, alignments, collapsed hyps,
        # and the eval CTC loss (fp32 both sides)
        assert int(flen_t[0]) == int(flen_j[0])
        np.testing.assert_allclose(np.asarray(feats_j), feats_t.numpy(),
                                   rtol=1e-4, atol=1e-4)
        np.testing.assert_array_equal(np.asarray(ali_j)[0],
                                      ali_t[0].numpy())
        ref_hyp = [int(t) for t in hyps_t[0]]
        our_hyp = [int(t) for t in
                   np.asarray(hyps_j)[0, :int(hlen_j[0])]]
        assert ref_hyp == our_hyp, (i, ref_hyp, our_hyp)
        decoded += len(ref_hyp)
        ref_losses.append(float(loss_t))
        our_losses.append(float(loss_j))

    # the trained model actually emits labels (not all-blank decodes) —
    # otherwise hypothesis parity would be vacuous
    assert decoded > 0
    np.testing.assert_allclose(our_losses, ref_losses,
                               rtol=5e-4, atol=5e-4)
    # corpus eval loss (what System.evaluate averages and the reference
    # prints in its `valid [...] loss:` line) agrees
    assert abs(np.mean(our_losses) - np.mean(ref_losses)) < 5e-4
