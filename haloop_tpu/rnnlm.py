"""hal — recurrent language model trainer/sampler (reference: ha/rnnlm.py).

Capabilities preserved: u16:|bytes:|words:|chars: dataset descriptors,
TBPTT training over SymbolTapeNoPad with carried hidden state, exact
stream resume (checkpoint stores vocab, optimizer, step, live hidden
state, and the carry-over prompt token — ha/rnnlm.py:115-124), rich
live continuation viz with longest-common-prefix diffing (--hyp/--chunk),
prompt completion with BPC scoring (--complete/--complete-file), and
KeyboardInterrupt checkpointing.

TPU-native: the train step (forward CE + clip-1.0 + AdamW) is one jitted
function carrying (params, opt_state, hidden); sampling runs the
models/rnn LSTM step under lax.scan with top-k.

Fixed vs reference (SURVEY.md §7 quirks): ``complete`` no longer
references undefined ``topk``/``joiner`` (ha/rnnlm.py:146-147).

Deliberate deviation: wandb metrics are logged every --log-interval
steps alongside the printed line, not every step as in the reference
(ha/rnnlm.py:261-264) — per-step logging would pay one queue-
synchronizing loss fetch per step on tunneled backends.
"""

import math
import sys
from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np
import optax

from haloop_tpu import argparse
from haloop_tpu import wandb_compat as wandb
from haloop_tpu.checkpoint import load_checkpoint, save_checkpoint
from haloop_tpu.models import rnn as R
from haloop_tpu.symbol_tape import (
    SymbolTapeNoPad, Vocabulary, load_u16, tokenize_bytes, tokenize_chars,
    tokenize_words)

try:
    from rich.console import Console
    _console = Console(log_path=False, highlight=False)

    def rprint(*args, **kwargs):
        _console.print(*args, **kwargs)
except ImportError:
    def rprint(*args, **kwargs):
        print(*args, **kwargs)


def make_dataset(args, vocab=None, extend_vocab=False):
    batch_size, bptt_len = args.batch_size, args.bptt_len
    match str(args.train).rsplit(':', maxsplit=1):
        case ['u16', path]:
            vocab = Vocabulary(pad_token=0)
            vocab.id_to_string = {}
            vocab.string_to_id = {}
            for x in range(int(args.vocab)):
                vocab.add_new_word(str(x))
            data = load_u16(path)
            return SymbolTapeNoPad(data, batch_size, bptt_len), vocab
        case ['bytes', path]:
            data, vocab = tokenize_bytes(path, vocab,
                                         extend_vocab=extend_vocab)
            return SymbolTapeNoPad(data, batch_size, bptt_len), vocab
        case ['words', path]:
            assert isinstance(args.vocab, str), \
                "vocab should be a file with vocabulary entries"
            data, vocab = tokenize_words(args.vocab, vocab,
                                         extend_vocab=extend_vocab)
            return SymbolTapeNoPad(data, batch_size, bptt_len), vocab
        case ['chars', path] | [path]:
            data, vocab = tokenize_chars(path, vocab,
                                         extend_vocab=extend_vocab)
            return SymbolTapeNoPad(data, batch_size, bptt_len), vocab


class System:
    def __init__(self, args):
        self.args = args
        self.vocab = None
        self.key = jax.random.PRNGKey(3407)
        ckpt = None

        if args.init:
            ckpt = load_checkpoint(args.init)
            self.vocab = Vocabulary()
            self.vocab.load_state_dict(ckpt['vocab'])
            extend_vocab = False
            self.step = ckpt.get('step', 0)
        else:
            extend_vocab = True
            self.step = 0

        if args.reset_step is not None:
            self.step = args.reset_step

        self.dataset = None
        if args.train:
            self.dataset, self.vocab = make_dataset(args, self.vocab,
                                                    extend_vocab)
        if not self.vocab:
            self.vocab = Vocabulary.bytes()

        vocab_size = len(self.vocab.id_to_string)
        self.num_layers = args.num_layers
        self.hidden_dim = args.rnn_size
        self.params = R.decoder_init(jax.random.PRNGKey(0), vocab_size,
                                     args.rnn_size, args.rnn_size,
                                     args.num_layers)
        if ckpt is not None:
            # native pytree or flat reference hal .pt (models/rnn.py)
            self.params = R.ingest_decoder_params(ckpt['model'])
            # adopt the checkpoint's geometry: the reference fails its
            # strict load on a --rnn-size mismatch; silently tracing
            # with the wrong dims would only blow up later inside jit
            layers, dim = R.decoder_geometry(self.params)
            if (layers, dim) != (self.num_layers, self.hidden_dim):
                print(f'checkpoint geometry {layers}x{dim} overrides '
                      f'--num-layers {self.num_layers} / '
                      f'--rnn-size {self.hidden_dim}', file=sys.stderr)
                self.num_layers, self.hidden_dim = layers, dim

        self.tx = optax.adamw(args.lr, b1=0.9, b2=0.999,
                              weight_decay=args.wd)
        self.opt_state = self.tx.init(self.params)
        if ckpt is not None and 'optimizer' in ckpt:
            try:
                self.opt_state = jax.tree.map(jnp.asarray, ckpt['optimizer'])
            except Exception:
                pass

        if ckpt is not None:
            self.state = tuple(jax.tree.map(jnp.asarray, ckpt['state']))
            self.prompt = np.asarray(ckpt['prompt'])
        else:
            self.state = R.decoder_init_hidden(args.num_layers,
                                               args.batch_size,
                                               args.rnn_size)
            self.prompt = np.zeros((1, args.batch_size), np.int64)

        self.log_interval = args.log_interval
        self._train_step = jax.jit(self._train_step_impl,
                                   donate_argnums=(0, 1, 2))

    # --------------------------------------------------------------- jit

    def _train_step_impl(self, params, opt_state, state, inputs, targets,
                         key):
        def loss_fn(p):
            logits, new_state = R.decoder_apply(
                p, inputs, state, num_layers=self.num_layers,
                dropout_rate=self.args.dropout, key=key,
                train=self.args.dropout > 0)
            logits = logits.astype(jnp.float32)
            logp = jax.nn.log_softmax(logits, axis=-1)
            nll = -jnp.take_along_axis(logp, targets[..., None],
                                       axis=-1)[..., 0]
            valid = targets != 0
            loss = jnp.sum(jnp.where(valid, nll, 0.0)) / \
                jnp.maximum(jnp.sum(valid), 1)
            # last-position logits of stream 0, for the --hyp/--chunk
            # continuation viz: the next-token distribution the model
            # holds after consuming ALL of inputs. Re-feeding inputs[-1]
            # through new_state would consume that token twice (the
            # reference samples from the training-forward logits too)
            return loss, (new_state, logits[-1, 0])

        (loss, (new_state, last_logits)), grads = \
            jax.value_and_grad(loss_fn, has_aux=True)(params)
        gnorm = jnp.sqrt(sum(jnp.sum(jnp.square(g))
                             for g in jax.tree.leaves(grads)))
        scale = jnp.minimum(1.0, 1.0 / (gnorm + 1e-6))
        grads = jax.tree.map(lambda g: g * scale, grads)
        updates, opt_state = self.tx.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        new_state = R.truncate_hidden(new_state)
        return params, opt_state, new_state, loss, gnorm, last_logits

    # ------------------------------------------------------------ sample

    def _forward_tokens(self, x, state):
        """x: (T, 1) ids -> (logits (T, V), state)."""
        logits, state = R.decoder_apply(self.params, x, state,
                                        num_layers=self.num_layers)
        return logits.reshape(-1, logits.shape[-1]), state

    def prepare_prompt(self, prompt):
        ids = [self.vocab.get_idx(c) if isinstance(c, str) else
               (self.vocab.string_to_id.get(bytes([c]), c)
                if isinstance(c, int) else self.vocab.get_idx(c))
               for c in prompt]
        x = np.array(ids, np.int64)[:, None]
        return x, R.decoder_init_hidden(self.num_layers, 1, self.hidden_dim)

    def complete(self, prompt, steps=512, top_k=1):
        x, state = self.prepare_prompt(prompt)
        logits, state = self._forward_tokens(jnp.asarray(x), state)
        logp = jax.nn.log_softmax(logits.astype(jnp.float32), -1)
        tgt = x[1:, 0]
        nll = -np.asarray(jnp.take_along_axis(
            logp[:-1], jnp.asarray(tgt)[:, None], axis=-1))[:, 0].sum()
        prompt_bits_per_token = nll / math.log(2) / max(len(tgt), 1)
        out = self.sample(logits, state, steps=steps, top_k=top_k)
        return prompt_bits_per_token, out

    def sample(self, logits, state, steps=512, top_k=1):
        """Top-k sampling under ONE jitted lax.scan: the whole
        continuation is a single dispatch and a single host fetch (the
        eager per-token loop paid one queue-synchronizing fetch per
        token — ~30 ms each on tunneled backends, >15 s per 512-token
        completion)."""
        if steps <= 0:
            return type(self.vocab.id_to_string.get(0)) is bytes and b'' or ''

        self.key, k = jax.random.split(self.key)
        ids = np.asarray(self._run_sample_scan(
            jnp.asarray(np.asarray(logits)[-1]), state, k,
            int(steps), int(top_k))).tolist()

        out_list = []
        joiner = ''

        def cast(s):
            nonlocal joiner
            if isinstance(s, int):
                joiner = b''
                return s.to_bytes(1, 'big')
            if isinstance(s, bytes):
                joiner = b''
                return s
            return s

        for ix in ids:
            out_list.append(cast(self.vocab.id_to_string[ix]))
        return joiner.join(out_list)

    def _run_sample_scan(self, l0, state, key, steps, top_k):
        if not hasattr(self, "_sample_cache"):
            self._sample_cache = {}
        ck = (steps, top_k)
        if ck not in self._sample_cache:
            def body(params, l0, state, key):
                def pick(k, l):
                    if top_k:
                        kth = jnp.sort(l)[-top_k]
                        l = jnp.where(l < kth, -jnp.inf, l)
                    return jax.random.categorical(k, l)

                def step(carry, k):
                    l, st = carry
                    ix = pick(k, l)
                    logits, st = R.decoder_apply(
                        params, ix.astype(jnp.int32)[None, None], st,
                        num_layers=self.num_layers)
                    return (logits.reshape(-1).astype(jnp.float32), st), ix

                keys = jax.random.split(key, steps)
                _, ids = jax.lax.scan(step, (l0.astype(jnp.float32), state),
                                      keys)
                return ids

            self._sample_cache[ck] = jax.jit(body)
        return self._sample_cache[ck](self.params, l0, state, key)

    # ------------------------------------------------------------- train

    def train_one_epoch(self, step=0):
        state = self.state
        prompt = jnp.asarray(self.prompt)
        hyp = ''

        for i in range(len(self.dataset)):
            if step > i:
                continue
            batch = jnp.asarray(np.asarray(self.dataset[i]).astype(np.int64))
            inputs = jnp.concatenate([prompt, batch[:-1]], axis=0)
            prompt = batch[-1:]

            self.key, k = jax.random.split(self.key)
            (self.params, self.opt_state, state, loss, grad_norm,
             last_logits) = self._train_step(self.params, self.opt_state,
                                             state, inputs, batch, k)

            if i % self.log_interval == 0:
                # ONE stacked fetch: each value fetch synchronizes the
                # whole device queue on tunneled backends (~30 ms)
                loss, grad_norm = np.asarray(
                    jnp.stack([loss, grad_norm])).tolist()
                train_bpc = loss / math.log(2)

                if self.args.hyp or self.args.chunk:
                    ref = self.vocab.decode(
                        np.asarray(inputs)[:, 0].tolist())[0]
                    if isinstance(hyp, bytes):
                        hyp = ''.join(f'{x:x}' for x in list(hyp))
                    if isinstance(ref, bytes):
                        ref = ''.join(f'{x:x}' for x in list(ref))

                    def lcp(a, b):
                        j = 0
                        while j < min(len(a), len(b)) and a[j] == b[j]:
                            j += 1
                        return a[:j], a[j:], b[j:]

                    matched, delete, insert = lcp(hyp, ref)
                    if self.args.chunk:
                        if matched:
                            rprint(f"[cyan]{matched}[/cyan]", end='')
                        else:
                            rprint(f"[magenta]{insert}[/magenta]", end='')
                    else:
                        rprint(f"[cyan]{matched}[/cyan]"
                               f"[magenta]{delete}[/magenta]{insert}",
                               end='')
                    # sample from the train step's OWN last-position
                    # logits (stream 0): state has already consumed
                    # inputs[-1], so re-feeding it would double-count
                    # that token and skew the first sampled char
                    hyp = self.sample(last_logits[None], jax.tree.map(
                        lambda h: h[:, :1], state),
                        steps=self.args.bptt_len, top_k=self.args.top_k)
                else:
                    _, eval_outputs = self.evaluate()
                    rprint(f"step {i}/{len(self.dataset)} "
                           f"loss: {loss:.3f} ppl: {math.exp(loss):.3f} "
                           f"bpc: {train_bpc:.3f} "
                           f"grad_norm: {grad_norm:.3f} "
                           f"{'; '.join(eval_outputs)}")

                wandb.log({'train/loss': loss, 'train/ppl': math.exp(loss),
                           'train/lr': self.args.lr,
                           'train/grad_norm': grad_norm})

            self.step = i + 1
            self.state = state
            self.prompt = np.asarray(prompt)

            if self.args.max_steps >= 0 and i == self.args.max_steps:
                break
        return self.step

    def evaluate(self):
        prompt_scores = []
        outputs = []

        def prompt_stream():
            for prompt in (self.args.complete or []):
                yield self.args.start_token + prompt
            for prompt_file in (self.args.complete_file or []):
                with open(prompt_file) as f:
                    for line in f:
                        _, text = line.strip().split(maxsplit=1)
                        yield self.args.start_token + text

        for prompt in prompt_stream():
            if self.args.vocab != 'auto':
                prompt = prompt.encode('utf-8')
            score, completion = self.complete(prompt, self.args.bptt_len,
                                              top_k=self.args.top_k)
            if isinstance(completion, bytes) and isinstance(prompt, str):
                prompt = prompt.encode('utf-8')  # byte-vocab completion
            output = prompt + completion if completion else prompt
            outputs.append(str(output, 'utf-8', errors='replace')
                           if isinstance(output, bytes) else output)
            prompt_scores.append(float(score))
        return np.array(prompt_scores), outputs

    def make_state_dict(self):
        return {
            'args': vars(self.args),
            'vocab': self.vocab.state_dict(),
            'model': self.params,
            'optimizer': self.opt_state,
            'step': self.step,
            'state': tuple(self.state),
            'prompt': self.prompt,
        }


def main():
    parser = argparse.ArgumentParser(
        description="hal trains recurrent language models",
        formatter_class=argparse.Formatter)
    parser.add_argument('--init', type=Path)
    parser.add_argument('--reset-step', type=int)
    parser.add_argument('--save', type=Path, default=Path('rnnlm.pt'))
    parser.add_argument('--device', type=str, default='tpu')
    parser.add_argument('--prng', choices=['rbg', 'threefry'],
                        default='rbg',
                        help="dropout/sampling PRNG (see hac --prng)")
    parser.add_argument('--lr', default=0.002, type=float)
    parser.add_argument('--wd', default=0.1, type=float)
    parser.add_argument('--dropout', default=0.0, type=float)
    parser.add_argument('--max-steps', default=-1, type=int)
    parser.add_argument('--batch-size', default=1, type=int)
    parser.add_argument('--bptt-len', default=64, type=int)
    parser.add_argument('--rnn-size', default=512, type=int)
    parser.add_argument('--num-layers', default=1, type=int)
    parser.add_argument('--vocab', default='auto', type=str)
    parser.add_argument('--train', type=str)
    parser.add_argument('--top-k', type=int, default=1)
    parser.add_argument('--log-interval', type=int, default=1)
    parser.add_argument('--hyp', action='store_true')
    parser.add_argument('--chunk', action='store_true')
    parser.add_argument('--complete', type=str, nargs='+')
    parser.add_argument('--start-token', type=str, default='\n')
    parser.add_argument('--complete-file', type=Path, nargs='+')
    parser.add_argument('--num-workers', type=int, default=1)
    args = parser.parse_args()
    jax.config.update('jax_default_prng_impl', args.prng)

    self = System(args)

    if args.train:
        print(args, file=sys.stderr)
        wandb.init(project='rnnlm', config=vars(args))
        try:
            self.train_one_epoch(step=self.step)
            if args.save:
                print('saving', args.save)
                save_checkpoint(args.save, self.make_state_dict())
        except KeyboardInterrupt:
            if args.save:
                print('saving', args.save)
                save_checkpoint(args.save, self.make_state_dict())
        if args.save:
            print('resume training with --init', args.save)

    prompt_scores, outputs = self.evaluate()
    if prompt_scores.size:
        for score, output in zip(prompt_scores, outputs):
            print('{:.2f}'.format(score), 'bpc', output)
        print('mean bpc', float(prompt_scores.mean()))


if __name__ == '__main__':
    main()
