"""hac — acoustic model training/eval/scoring loop (reference: ha/loop.py).

TPU-native redesign of the reference's CUDA loop:
  * ONE jitted train step: forward (encoder + recognizer loss), backward,
    encoder-only grad-norm clip (preserving the reference quirk at
    ha/loop.py:184), optax update, and NaN/Inf-skip logic — all inside
    jit via lax.cond. No GradScaler: TPUs train in bf16/fp32, losses are
    computed fp32 (the fp16+scaler machinery of ha/loop.py:60,176-196
    has no TPU equivalent by design).
  * per-bucket compilation: the collator pads to geometric buckets so
    jax.jit retraces a bounded number of shapes.
  * decode is the on-device lax.scan greedy loop from models/.
  * stdout TSV format preserved exactly: 'epoch\\tindex\\thypN\\ttext',
    ref/aliN/statN rows (ha/loop.py:407-411) — the active-learning loop
    parses these.
"""

from collections import Counter, defaultdict
from itertools import pairwise
import time

import jax
import jax.numpy as jnp
import numpy as np
import optax

from haloop_tpu import argparse
from haloop_tpu import symbol_tape
from haloop_tpu import wandb_compat as wandb
from haloop_tpu.align import align, edit_distance
from haloop_tpu.checkpoint import Checkpointer, load_checkpoint
from haloop_tpu.data import concat_datasets
from haloop_tpu.dataloader import Collator, DataLoader
from haloop_tpu.init import Initializer, log
from haloop_tpu.monitor import activation_stats, print_activation_stats
from haloop_tpu.optim import LR, configure_optimizers


def is_oom_error(e) -> bool:
    """Device out-of-memory, as surfaced by XLA/PJRT (RESOURCE_EXHAUSTED)."""
    msg = str(e)
    return ('RESOURCE_EXHAUSTED' in msg or 'Out of memory' in msg
            or 'out of memory' in msg)


def global_norm(tree):
    return jnp.sqrt(sum(jnp.sum(jnp.square(x))
                        for x in jax.tree.leaves(tree)))


class System:
    def __init__(self, args, spec, params, vocab, mesh='auto'):
        self.args = args
        self.spec = spec
        self.params = params
        self.vocab = vocab
        self.tx, self.opt_state = configure_optimizers(params, args)
        self.lr = LR(args)
        self.key = jax.random.PRNGKey(args.seed)

        # data parallelism (SURVEY.md §5.8): batch sharded over a 1-D
        # 'data' mesh, params/opt state replicated; XLA inserts the
        # gradient reduction inside the jitted step. 'auto' spans all
        # visible devices; None forces single-device.
        if mesh == 'auto':
            from haloop_tpu.parallel import data_mesh
            mesh = data_mesh() if len(jax.devices()) > 1 else None
        self.mesh = mesh
        if self.mesh is not None:
            from haloop_tpu.parallel.mesh import replicate
            self.params = replicate(self.mesh, self.params)
            self.opt_state = replicate(self.mesh, self.opt_state)

        # shallow-fusion LM for --beam decoding (BASELINE.json config:
        # transducer + prefix beam search with RNN-LM fusion): an hal
        # checkpoint (rnnlm.py state dict)
        self.fusion_params = None
        self.fusion_layers, self.fusion_dim = 2, 512
        if getattr(args, 'lm', None):
            from haloop_tpu.models import rnn as _rnn
            ckpt = load_checkpoint(args.lm)
            # native pytree or flat reference hal .pt — one detection
            # point for every hal-checkpoint consumer
            self.fusion_params = _rnn.ingest_decoder_params(ckpt['model'])
            self.fusion_layers, self.fusion_dim = _rnn.decoder_geometry(
                self.fusion_params)
        # one pattern for EVERY device-facing path on a mesh: shard_map
        # with force_local so the Pallas kernels (no GSPMD partitioning
        # rules) stay active per-shard, per-shard dropout streams via
        # fold_in(axis_index), pmean as the DDP allreduce. Ragged
        # batches that don't divide the mesh fall back to plain GSPMD
        # jit (replicated-correct, kernel-less).
        self._sharded_cache = {}
        # --allow-oom trades memory for survivability: donated buffers
        # are deleted on call entry, so after a mid-step OOM the old
        # params would be gone and every later batch would fail too —
        # keep inputs alive when the loop intends to catch and continue
        self._donate = () if getattr(args, 'allow_oom', False) else (0, 1)
        if self.mesh is not None:
            from jax.sharding import PartitionSpec as P
            from jax import shard_map
            from haloop_tpu.ops import dispatch
            B, R = P('data'), P()

            def dp_step(params, opt_state, inputs, condtargets,
                        input_lengths, condtarget_lengths, key, step):
                with dispatch.force_local():
                    return self._train_step_impl(
                        params, opt_state, inputs, condtargets,
                        input_lengths, condtarget_lengths, key, step,
                        axis='data')

            self._train_step = jax.jit(
                shard_map(dp_step, mesh=self.mesh,
                          in_specs=(R, R, B, B, B, B, R, R),
                          out_specs=(R, R, R, R, R),
                          check_vma=False),
                donate_argnums=self._donate)
            # ragged fallback (donation off: params must survive for
            # the sharded step's buffers)
            self._train_step_ragged = jax.jit(self._train_step_impl)

            def dp_micro(params, inputs, condtargets, input_lengths,
                         condtarget_lengths, key):
                key = jax.random.fold_in(key,
                                         jax.lax.axis_index('data'))
                with dispatch.force_local():
                    loss, grads = jax.value_and_grad(self._micro_loss)(
                        params, inputs, condtargets, input_lengths,
                        condtarget_lengths, key)
                return (jax.lax.pmean(loss, 'data'),
                        jax.lax.pmean(grads, 'data'))

            self._micro_grads_fn = jax.jit(
                shard_map(dp_micro, mesh=self.mesh,
                          in_specs=(R, B, B, B, B, R),
                          out_specs=(R, R), check_vma=False))
        else:
            self._train_step = jax.jit(self._train_step_impl,
                                       donate_argnums=self._donate)
            self._train_step_ragged = self._train_step
        self._micro_grads_ragged = jax.jit(
            jax.value_and_grad(self._micro_loss))
        self._eval_forward = jax.jit(
            self._forward_impl,
            static_argnames=("train", "measure_entropy", "return_stats"))
        self._decode = jax.jit(self._decode_impl,
                               static_argnames=("max_steps", "train"))
        self._score_step = jax.jit(self._score_impl)
        self._encode = jax.jit(self._encode_impl)

    def _divides_mesh(self, n):
        return self.mesh is not None and n % self.mesh.devices.size == 0

    def _use_collective_eval(self, n):
        """Sharded eval/decode only make sense single-process: their
        outputs are per-example rows the host prints, and a
        multi-process global array spans non-addressable devices. On
        multi-host each process evaluates its own loader shard locally
        (the reference's DDP evaluates per-rank too)."""
        return (self.mesh is not None and jax.process_count() == 1
                and n % self.mesh.devices.size == 0)

    def _ragged_on_mesh(self, n):
        """True when a batch cannot be sharded over the mesh. On a
        single process the replicated-jit fallback handles it; on
        multi-host there is NO safe fallback (per-process steps would
        skip the gradient allreduce and silently diverge the
        replicated params), so the caller must skip the batch."""
        return (self.mesh is not None and
                (n * jax.process_count()) % self.mesh.devices.size != 0)

    def _sharded_eval_forward(self, train):
        """shard_map twin of _eval_forward (default stats-less path)."""
        ck = ('eval', train)
        if ck not in self._sharded_cache:
            from jax.sharding import PartitionSpec as P
            from jax import shard_map
            from haloop_tpu.ops import dispatch
            B, R = P('data'), P()

            def body(params, inputs, condtargets, input_lengths,
                     condtarget_lengths, key):
                if train:    # test-time-dropout attempts: per-shard keys
                    key = jax.random.fold_in(
                        key, jax.lax.axis_index('data'))
                with dispatch.force_local():
                    loss, feats, feat_lens = self._forward_impl(
                        params, inputs, condtargets, input_lengths,
                        condtarget_lengths, key, train=train)
                return jax.lax.pmean(loss, 'data'), feats, feat_lens

            self._sharded_cache[ck] = jax.jit(shard_map(
                body, mesh=self.mesh, in_specs=(R, B, B, B, B, R),
                out_specs=(R, B, B), check_vma=False))
        return self._sharded_cache[ck]

    def _sharded_decode(self, max_steps, train):
        """shard_map twin of _decode (greedy and beam, all kinds)."""
        ck = ('decode', max_steps, train)
        if ck not in self._sharded_cache:
            from jax.sharding import PartitionSpec as P
            from jax import shard_map
            from haloop_tpu.ops import dispatch
            B, R = P('data'), P()

            def body(params, feats, feat_lens, target_lengths, prompt,
                     key, fusion_params):
                if train:
                    key = jax.random.fold_in(
                        key, jax.lax.axis_index('data'))
                with dispatch.force_local():
                    return self._decode_impl(
                        params, feats, feat_lens, target_lengths, prompt,
                        key, fusion_params, max_steps=max_steps,
                        train=train)

            self._sharded_cache[ck] = jax.jit(shard_map(
                body, mesh=self.mesh, in_specs=(R, B, B, B, B, R, R),
                out_specs=(B, B, B, B, B), check_vma=False))
        return self._sharded_cache[ck]

    def _run_eval_forward(self, inputs, condtargets, input_lengths,
                          condtarget_lengths, key, *, train):
        if self._use_collective_eval(len(input_lengths)):
            return self._sharded_eval_forward(train)(
                self.params, inputs, condtargets, input_lengths,
                condtarget_lengths, key)
        return self._eval_forward(self.params, inputs, condtargets,
                                  input_lengths, condtarget_lengths, key,
                                  train=train)

    def _run_decode(self, feats, feat_lens, target_lengths, prompt, key,
                    *, max_steps, train):
        if self._use_collective_eval(int(feats.shape[0])):
            return self._sharded_decode(max_steps, train)(
                self.params, feats, feat_lens, target_lengths, prompt,
                key, self.fusion_params)
        return self._decode(self.params, feats, feat_lens, target_lengths,
                            prompt, key, self.fusion_params,
                            max_steps=max_steps, train=train)

    # ------------------------------------------------------------ forward

    def _forward_impl(self, params, inputs, condtargets, input_lengths,
                      condtarget_lengths, key, *, train,
                      drop_labels=False, measure_entropy=False,
                      return_stats=False):
        k1, k2 = jax.random.split(key)
        if getattr(self.args, 'device_fbank', False):
            # raw waveforms in, log-mel on device inside the jitted step
            # (features.fbank_jax: framing is one reshape-gather, the
            # window/FFT/mel collapse into matmuls XLA fuses)
            from haloop_tpu.features import fbank_jax
            inputs, input_lengths = fbank_jax(
                inputs[..., 0].astype(jnp.float32), input_lengths)
        enc_params = params["encoder"]
        if self.args.dtype == "bfloat16":
            # bf16 encoder compute with fp32 master params (the TPU
            # equivalent of the reference's fp16 autocast, ha/loop.py:121)
            cast = lambda t: jax.tree.map(
                lambda x: x.astype(jnp.bfloat16)
                if jnp.issubdtype(x.dtype, jnp.floating) else x, t)
            enc_params = cast(enc_params)
            inputs = inputs.astype(jnp.bfloat16)
        feats, feat_lens, enc_stats = self.spec.encoder.apply(
            enc_params, inputs, input_lengths, train=train,
            key=k1 if train else None, measure_entropy=measure_entropy,
            collect_activations=return_stats)
        feats = feats.astype(jnp.float32)
        loss, stats = self.spec.recognizer.loss(
            params["recognizer"], feats, condtargets, feat_lens,
            condtarget_lengths, star_penalty=self.args.star_penalty,
            drop_labels=drop_labels, train=train,
            measure_entropy=measure_entropy,
            key=k2 if train or drop_labels else None)
        if return_stats:
            return loss, feats, feat_lens, (enc_stats, stats)
        return loss, feats, feat_lens

    def _train_step_impl(self, params, opt_state, inputs, condtargets,
                         input_lengths, condtarget_lengths, key, step,
                         axis=None):
        """One train step. With ``axis`` this is the per-shard body of a
        shard_map over the data mesh: each shard sees its local batch
        (so the Pallas kernels stay eligible — ops/dispatch.force_local)
        and gradients are psum-averaged here, the shard_map analog of
        DDP allreduce (ha/attention_loop.py:196-203)."""
        if axis is not None:
            # per-shard dropout streams (reference per-rank seeds,
            # ha/attention_loop.py:75)
            key = jax.random.fold_in(key, jax.lax.axis_index(axis))

        def loss_fn(p):
            loss, _, _ = self._forward_impl(
                p, inputs, condtargets, input_lengths, condtarget_lengths,
                key, train=True, drop_labels=True)
            return loss

        loss, grads = jax.value_and_grad(loss_fn)(params)
        if axis is not None:
            grads = jax.lax.pmean(grads, axis)
            loss = jax.lax.pmean(loss, axis)

        # encoder-only clipping (reference quirk ha/loop.py:183-184)
        enc_norm = global_norm(grads["encoder"])
        clip = self.args.clip_grad_norm
        scale = jnp.minimum(1.0, clip / (enc_norm + 1e-6))
        grads = {"encoder": jax.tree.map(lambda g: g * scale,
                                         grads["encoder"]),
                 "recognizer": grads["recognizer"]}

        bad = ~jnp.isfinite(loss) | ~jnp.isfinite(enc_norm)

        def apply(_):
            updates, new_opt = self.tx.update(grads, opt_state, params)
            return optax.apply_updates(params, updates), new_opt

        def skip(_):
            return params, opt_state

        new_params, new_opt = jax.lax.cond(bad, skip, apply, None)
        return new_params, new_opt, loss, enc_norm, bad

    def _decode_impl(self, params, feats, feat_lens, target_lengths,
                     prompt=None, key=None, fusion_params=None, *,
                     max_steps, train=False):
        if self.spec.recognizer.kind == "ctc" and self.args.beam > 1:
            from haloop_tpu.models.recognizer import \
                temporal_classifier_log_probs
            from haloop_tpu.ops.beam_device import ctc_beam_search_batched
            lp = temporal_classifier_log_probs(
                params["recognizer"], feats, key=key, train=train)
            prefixes, lens, scores = ctc_beam_search_batched(
                lp, feat_lens, beam_width=self.args.beam,
                fusion_params=fusion_params,
                fusion_layers=self.fusion_layers,
                fusion_dim=self.fusion_dim,
                lm_weight=self.args.lm_weight)
            # frame-posterior entropy is decode-independent: the beam
            # stat rows carry the same entropy_per_token as greedy's,
            # keeping active-loop entropy strategies usable with --beam
            from haloop_tpu.models.recognizer import frame_entropy_sum
            blens = jnp.maximum(lens[:, 0], 0)
            sum_ent = frame_entropy_sum(lp, feat_lens, blens)
            # per-frame argmax alignments are decode-independent too: the
            # aliN TSV rows (ha/loop.py:409-410) stay available with --beam
            ali = jnp.argmax(lp, axis=-1)
            return prefixes[:, 0], blens, scores[:, 0], sum_ent, ali
        if self.spec.recognizer.kind == "transducer" and self.args.beam > 1:
            from haloop_tpu.ops.beam_device import \
                transducer_beam_search_batched
            toks, ulens, scores, ents = transducer_beam_search_batched(
                params["recognizer"], feats, feat_lens,
                beam_width=self.args.beam, max_symbols=max_steps,
                fusion_params=fusion_params,
                fusion_layers=self.fusion_layers,
                fusion_dim=self.fusion_dim,
                lm_weight=self.args.lm_weight, return_entropy=True)
            # one joint per frame (monotonic beam): rescale so the stat
            # row's entropy_per_token is the mean per-frame entropy
            ent = ents[:, 0] * jnp.maximum(ulens[:, 0], 1) / \
                jnp.maximum(feat_lens, 1)
            return toks[:, 0], ulens[:, 0], scores[:, 0], ent, None
        if self.spec.recognizer.kind in ("ctc", "transducer"):
            return self.spec.recognizer.decode(
                params["recognizer"], feats, feat_lens, target_lengths,
                key=key, train=train, max_steps=max_steps)
        hyp, out_len, log_probs, sum_ent, ali = self.spec.recognizer.decode(
            params["recognizer"], feats, feat_lens, target_lengths,
            prompt=prompt, max_steps=max_steps, key=key, train=train)
        return hyp, out_len, log_probs, sum_ent, ali

    def _score_impl(self, params, feats, feat_lens, condtargets,
                    condtarget_lengths):
        rec = params["recognizer"]
        from haloop_tpu.models import transformer as TR
        dec_params = rec["decoder"] if "decoder" in rec else rec
        loss, _ = TR.decoder_forward(
            dec_params, self.spec.recognizer.tcfg, feats, condtargets,
            feat_lens, condtarget_lengths, reduction="sumeach",
            drop_labels=False, train=False)
        return loss

    def _encode_impl(self, params, inputs, input_lengths):
        """Encoder features only (the hac --score front half), on the
        same compute path as _forward_impl: jitted, with the bf16
        compute cast and the device-fbank option."""
        if getattr(self.args, 'device_fbank', False):
            from haloop_tpu.features import fbank_jax
            inputs, input_lengths = fbank_jax(
                inputs[..., 0].astype(jnp.float32), input_lengths)
        enc_params = params["encoder"]
        if self.args.dtype == "bfloat16":
            enc_params = jax.tree.map(
                lambda x: x.astype(jnp.bfloat16)
                if jnp.issubdtype(x.dtype, jnp.floating) else x,
                enc_params)
            inputs = inputs.astype(jnp.bfloat16)
        feats, feat_lens, _ = self.spec.encoder.apply(
            enc_params, inputs, input_lengths, train=False)
        return feats.astype(jnp.float32), feat_lens

    def next_key(self):
        self.key, k = jax.random.split(self.key)
        return k

    def shard(self, *arrays):
        """Shard a batch's leading axis over the data mesh (no-op when
        single-device or when the batch doesn't divide the mesh).
        Multi-process: each process contributes its LOCAL loader shard;
        the global batch (local x process_count) is assembled across
        hosts (parallel.mesh.global_batch)."""
        if self.mesh is None:
            return arrays
        n = len(arrays[0]) * jax.process_count()
        if n % self.mesh.devices.size:
            return arrays
        from haloop_tpu.parallel.mesh import global_batch
        return tuple(global_batch(self.mesh, a) for a in arrays)

    # ------------------------------------------------------------- train

    def train_one_epoch(self, epoch, global_step, train_loader,
                        valid_loader):
        train_loss = 0.0
        t0 = time.time()
        local_step = 0
        accum = 0
        acc_grads = None
        args = self.args

        profiling = False
        for i, (idxs, inputs, condtargets, input_lengths,
                condtarget_lengths) in enumerate(train_loader):
            if args.profile and i == 2 and not profiling:
                # skip compile steps, then trace (SURVEY.md §5.1: the
                # TPU replacement for ad-hoc wall-clock profiling)
                jax.profiler.start_trace(str(args.exp / 'profile'))
                profiling = True
            if profiling and i == 2 + args.profile:
                jax.profiler.stop_trace()
                profiling = False
                log(f'profiler trace written to {args.exp}/profile',
                    flush=True)
            step_key = self.next_key()
            if jax.process_count() > 1 and \
                    self._ragged_on_mesh(len(input_lengths)):
                # every host sees the same batch-size sequence (the
                # loader equalizes per-process counts), so this skip is
                # taken by ALL hosts in lockstep — no host is left
                # waiting inside a collective
                log(f'[{epoch}, {global_step:5d}], batch of {len(idxs)} '
                    f'x {jax.process_count()} processes does not divide '
                    f'the {self.mesh.devices.size}-device mesh, skipping',
                    flush=True)
                continue
            inputs, condtargets, input_lengths, condtarget_lengths = \
                self.shard(inputs, condtargets, input_lengths,
                           condtarget_lengths)
            try:
                if args.accumulate == 1:
                    step_fn = self._train_step
                    if self.mesh is not None and \
                            len(inputs) % self.mesh.devices.size:
                        step_fn = self._train_step_ragged
                    out = step_fn(
                        self.params, self.opt_state, inputs, condtargets,
                        input_lengths, condtarget_lengths, step_key,
                        jnp.int32(global_step))
                    # ONE stacked fetch: on the tunneled backend every
                    # host read syncs the whole device queue (~30 ms);
                    # this branch used to pay three per iteration
                    # (loss, bad, grad_norm)
                    loss, grad_norm, bad = np.asarray(jnp.stack(
                        [out[2], out[3],
                         out[4].astype(jnp.float32)])).tolist()
                    # commit only after the fetch succeeded: an OOM
                    # surfaces AT the fetch, and with --allow-oom
                    # (donation off) the old state must stay bound
                    self.params, self.opt_state = out[0], out[1]
                    if bad:
                        log(f'[{epoch}, {global_step:5d}], loss or grad_norm '
                            f'is not finite, skipping batch', flush=True)
                        continue
                else:
                    # micro-batch gradient accumulation. The non-finite
                    # micro-loss gate runs ON DEVICE (_masked_accum): a
                    # bad micro-batch contributes zero gradient and the
                    # positional accumulate boundary advances — the
                    # reference's semantics exactly (loss/accumulate is
                    # pre-divided, the skipped backward just leaves its
                    # term out, ha/loop.py:167-181) — so the host fetch
                    # happens ONCE per update, not once per micro-batch
                    # (~30 ms queue sync each on the tunneled backend)
                    loss, grads = self._micro_grads(
                        inputs, condtargets, input_lengths,
                        condtarget_lengths, step_key)
                    if acc_grads is None:
                        acc_grads = jax.tree.map(jnp.zeros_like, grads)
                        acc_nbad = jnp.int32(0)
                        acc_loss = jnp.float32(0)
                    acc_grads, acc_nbad, acc_loss = self._run_masked_accum(
                        acc_grads, acc_nbad, acc_loss, loss, grads)
                    accum += 1
                    if accum % args.accumulate:
                        continue
                    out = self._apply_grads(
                        self.params, self.opt_state, acc_grads)
                    loss, grad_norm, bad, nbad = np.asarray(jnp.stack(
                        [acc_loss, out[2], out[3].astype(jnp.float32),
                         acc_nbad.astype(jnp.float32)])).tolist()
                    self.params, self.opt_state = out[0], out[1]
                    acc_grads = None
                    # the update's mean batch loss (micro losses are
                    # pre-divided by accumulate; undo that and average
                    # over the finite micro-batches) — matches what the
                    # fused branch logs, instead of the last
                    # micro-batch's divided loss
                    ngood = max(args.accumulate - int(nbad), 1)
                    loss = loss * args.accumulate / ngood
                    if nbad:
                        log(f'[{epoch}, {global_step:5d}], {int(nbad)} '
                            f'micro-batch(es) had non-finite loss, '
                            f'contributed zero gradient', flush=True)
                    if bad:
                        log(f'[{epoch}, {global_step:5d}], grad_norm is '
                            f'not finite, skipping update', flush=True)
                        continue
            except Exception as e:
                # per-batch OOM tolerance (reference catches RuntimeError
                # under --allow-oom, ha/loop.py:157-165): XLA surfaces
                # device OOM as RESOURCE_EXHAUSTED on the step call or
                # the value fetch
                if args.allow_oom and is_oom_error(e):
                    log(f'[{epoch}, {global_step:5d}], out of memory on '
                        f'batch of shape {inputs.shape}, skipping: {e}',
                        flush=True)
                    acc_grads = None
                    continue
                raise

            lr = self.lr.get_lr(global_step)
            global_step += 1
            local_step += 1

            train_loss += loss / args.log_interval
            if local_step % args.log_interval == 0:
                t1 = time.time()
                # progress lines carry replicated values: multi-process
                # runs print them once, from the master (eval/decode TSV
                # rows stay per-process — those are DISTINCT loader
                # shards, part of the output contract)
                from haloop_tpu.parallel.mesh import is_master
                if is_master():
                    log(f'[{epoch}, {global_step:5d}] time: {t1 - t0:.3f} '
                        f'loss: {train_loss:.3f} '
                        f'grad_norm: {grad_norm:.3f} '
                        f'lr: {lr:.5f}', flush=True)
                    wandb.log({'train/loss': train_loss,
                               'train/grad_norm': grad_norm,
                               'train/lr': lr, 'iter': global_step})
                t0 = t1
                train_loss = 0.0

            # mid-epoch eval fires on ITS OWN schedule. The reference
            # nests this under the log gate (ha/loop.py:199-209), so
            # its --evaluate-every silently rounds up to
            # lcm(log_interval, evaluate_every); fixed deliberately,
            # like hala's eval-interval
            if local_step % args.evaluate_every == 0:
                self.evaluate(epoch, valid_loader, attempts=1)

            if lr == 0 and global_step > 10 and \
                    local_step % args.log_interval == 0:
                log(f'[{epoch}, {global_step:5d}] lr is zero, stopping',
                    flush=True)
                break

        if profiling:
            jax.profiler.stop_trace()
        return global_step

    def _micro_loss(self, params, inputs, condtargets, input_lengths,
                    condtarget_lengths, key):
        loss, _, _ = self._forward_impl(
            params, inputs, condtargets, input_lengths,
            condtarget_lengths, key, train=True, drop_labels=True)
        return loss / self.args.accumulate

    def _micro_grads(self, inputs, condtargets, input_lengths,
                     condtarget_lengths, key):
        """One micro-batch of gradients: shard_map over the data mesh
        when the batch divides it (same kernel/dropout semantics as the
        fused step), plain jit otherwise."""
        if self._divides_mesh(len(input_lengths)):
            return self._micro_grads_fn(self.params, inputs, condtargets,
                                        input_lengths, condtarget_lengths,
                                        key)
        return self._micro_grads_ragged(self.params, inputs, condtargets,
                                        input_lengths, condtarget_lengths,
                                        key)

    def _run_masked_accum(self, acc, nbad, loss_sum, loss, grads):
        """Accumulate one micro-batch of gradients on device, masking
        out non-finite micro-losses (zero contribution), counting them,
        and summing the finite losses — keeps the NaN gate without a
        per-micro-batch host sync (reference semantics: the skipped
        backward leaves its pre-divided term out, ha/loop.py:167-181)."""
        if not hasattr(self, "_masked_accum_fn"):
            def body(acc, nbad, loss_sum, loss, grads):
                ok = jnp.isfinite(loss)
                acc = jax.tree.map(
                    lambda a, g: a + jnp.where(ok, g, 0), acc, grads)
                return (acc, nbad + (~ok).astype(jnp.int32),
                        loss_sum + jnp.where(ok, loss, 0.0))
            self._masked_accum_fn = jax.jit(
                body, donate_argnums=self._donate and (0, 1, 2))
        return self._masked_accum_fn(acc, nbad, loss_sum, loss, grads)

    def _apply_grads(self, params, opt_state, grads):
        if not hasattr(self, "_apply_fn"):
            def f(params, opt_state, grads):
                enc_norm = global_norm(grads["encoder"])
                scale = jnp.minimum(
                    1.0, self.args.clip_grad_norm / (enc_norm + 1e-6))
                grads = {"encoder": jax.tree.map(lambda g: g * scale,
                                                 grads["encoder"]),
                         "recognizer": grads["recognizer"]}
                # skip the whole accumulated update on non-finite grads
                # (the reference gates on grad_norm too, ha/loop.py:185-189
                # — a finite loss does not imply finite gradients)
                bad = ~jnp.isfinite(enc_norm)

                def apply(_):
                    updates, new_opt = self.tx.update(grads, opt_state,
                                                      params)
                    return optax.apply_updates(params, updates), new_opt

                new_params, new_opt = jax.lax.cond(
                    bad, lambda _: (params, opt_state), apply, None)
                return new_params, new_opt, enc_norm, bad
            self._apply_fn = jax.jit(f, donate_argnums=self._donate)
        return self._apply_fn(params, opt_state, grads)

    # ----------------------------------------------------------- evaluate

    def evaluate(self, epoch, loader, attempts=1, tag='valid',
                 prompts=[None]):
        valid_loss = 0.0
        label_errors = Counter()
        word_errors = Counter()
        est_word_errors = Counter()
        args = self.args
        i = -1

        dropout_on = attempts > 1   # test-time dropout (ha/loop.py:270-273)
        measure_entropy = bool(getattr(args, 'entropy', False))
        for i, (idxs, inputs, condtargets, input_lengths,
                condtarget_lengths) in enumerate(loader):
            host_condtargets = np.asarray(condtargets)
            host_ct_lens = np.asarray(condtarget_lengths)
            if jax.process_count() == 1:
                # multi-host keeps eval batches host-local (see
                # _use_collective_eval): each process decodes and prints
                # its own loader shard
                inputs, condtargets, input_lengths, condtarget_lengths = \
                    self.shard(inputs, condtargets, input_lengths,
                               condtarget_lengths)
            if measure_entropy:
                out = self._eval_forward(
                    self.params, inputs, condtargets, input_lengths,
                    condtarget_lengths, self.next_key(), train=dropout_on,
                    measure_entropy=True, return_stats=True)
            else:
                # kernel-active shard_map path on a mesh (GSPMD-jit
                # fallback for ragged batches); the debug entropy/stats
                # path above stays on plain jit
                out = self._run_eval_forward(
                    inputs, condtargets, input_lengths,
                    condtarget_lengths, self.next_key(), train=dropout_on)
            if measure_entropy:
                loss, feats, feat_lens, (enc_stats, rec_stats) = out
                for name, stats in (('encoder', enc_stats),
                                    ('recognizer', rec_stats)):
                    for k, v in (stats or {}).items():
                        if isinstance(v, list) and v:
                            print(name, k,
                                  np.asarray(jnp.stack(v)), flush=True)
            else:
                loss, feats, feat_lens = out
            # once per batch — inside the prompt/attempt loops this
            # would inflate the reported loss by attempts x prompts
            # (the reference accumulates per batch, ha/loop.py:278,334)
            valid_loss += float(loss)
            if i == 0 and not args.quiet:
                # per-module activation stats on the first eval batch
                # (monitor hooks equivalent, ha/loop.py:275-282)
                out2 = self._eval_forward(
                    self.params, inputs, condtargets, input_lengths,
                    condtarget_lengths, self.next_key(), train=dropout_on,
                    return_stats=True)
                enc_stats2 = out2[3][0]
                named = {f'encoder.{k}': v for k, v in
                         (enc_stats2.get('activations') or {}).items()}
                named['encoder.features'] = feats
                print_activation_stats(activation_stats(named))

            collected = defaultdict(list)
            gt_wer = {}
            max_steps = int(condtargets.shape[1]) + 1

            for prompt in prompts:
                prompt_tensor = None
                if prompt is not None:
                    pid = self.vocab.raw_encode(prompt)
                    prompt_tensor = np.full((len(input_lengths), 1), pid,
                                            np.int32)
                for attempt in range(attempts):
                    out = self._run_decode(
                        feats, feat_lens, condtarget_lengths,
                        prompt_tensor, self.next_key(),
                        max_steps=max_steps, train=dropout_on)
                    hyps, out_lens, log_probs, sum_ents, alis = out
                    hyps = np.asarray(hyps)
                    out_lens = np.asarray(out_lens)
                    log_probs = np.asarray(log_probs)
                    sum_ents = (np.asarray(sum_ents)
                                if sum_ents is not None else
                                np.zeros(len(hyps)))
                    alis = np.asarray(alis) if alis is not None else None

                    host_feat_lens = np.asarray(feat_lens)
                    for n in range(len(idxs)):
                        k = int(idxs[n])
                        le, we, hyp = self.print_example(
                            k, host_condtargets[n], int(host_ct_lens[n]),
                            hyps[n], int(out_lens[n]),
                            alis[n] if alis is not None else None,
                            int(host_feat_lens[n]), float(log_probs[n]),
                            float(sum_ents[n]), epoch=epoch,
                            attempt=attempt, prompt=prompt)
                        label_errors += le
                        word_errors += we
                        collected[k].append(hyp)
                        gt_wer[k] = we['total'] / max(we['length'], 1)

            if attempts > 1:
                e, est_wer = self.estimate_wer(collected)
                est_word_errors += e
                for k in est_wer:
                    print(epoch, k, f'est-wer: {est_wer[k]:.3f}',
                          f'gt-wer: {gt_wer[k]:.3f}', sep="\t", flush=True)

        count = i + 1
        if count == 0:
            return float('inf')
        ler = round(label_errors['total'] / max(label_errors['length'], 1), 3)
        wer = round(word_errors['total'] / max(word_errors['length'], 1), 3)
        log(f'{tag} [{epoch}, {count:5d}] loss: {valid_loss / count:.3f} '
            f'ler: {ler:.3f} wer: {wer:.3f}', flush=True)
        if attempts > 1:
            est_wer = round(
                est_word_errors['total'] / max(est_word_errors['length'], 1),
                3)
            log(f'{tag} [{epoch}, {count:5d}] estimated-wer: {est_wer:.3f} '
                f'diff-wer: {wer - est_wer:.3f}', flush=True)
        if wandb.get_run() is not None:
            wandb.log({f'{tag}/loss': valid_loss / count, f'{tag}/ler': ler,
                       f'{tag}/wer': wer})
        return valid_loss / count

    def estimate_wer(self, hypotheses):
        """WER estimate from pairwise dropout-hypothesis distances
        (ha/loop.py:345-357)."""
        est_word_errors = Counter()
        est_wer = {}
        for k in hypotheses:
            errors, lengths, counts = 0, 0, 0
            for l, r in pairwise(hypotheses[k]):
                errors += edit_distance(l, r)['total']
                lengths += len(r)
                counts += 1
            if counts:
                est_word_errors += Counter({'total': errors / counts,
                                            'length': lengths / counts})
                est_wer[k] = errors / max(lengths, 1)
        return est_word_errors, est_wer

    def print_example(self, dataset_index, ref, ref_len, hyp_, hyp_len,
                      ali_, feat_len, log_prob, sum_entropy, epoch,
                      attempt=0, prompt=None):
        is_ctc = self.spec.recognizer.kind in ("ctc", "transducer")
        stat = {
            'log_prob': round(log_prob, 4),
            'log_prob_per_token': round(log_prob / max(hyp_len, 1), 4),
            'entropy_per_token': round(-sum_entropy / max(hyp_len, 1), 3),
            'prompt': prompt,
        }
        if is_ctc:
            hyp = [int(t) for t in hyp_[:hyp_len]]
        else:
            hyp = [int(t) for t in hyp_[:max(hyp_len - 1, 0)]]
        ali = ([int(t) for t in ali_[:feat_len]] if ali_ is not None
               else [])
        ref = [int(t) for t in np.asarray(ref)[:ref_len]]

        hyp1, hyp_words = self.vocab.decode(hyp)
        ref1, ref_words = self.vocab.decode(ref)

        dist = edit_distance(hyp1, ref1)
        dist['length'] = len(ref1)
        dist['ler'] = round(dist['total'] / max(dist['length'], 1), 2)
        label_error = Counter(dist)
        stat |= dist

        word_dist = edit_distance(hyp_words, ref_words)
        word_dist['length'] = len(ref_words)
        stat['wer'] = round(word_dist['total'] / max(word_dist['length'], 1),
                            2)
        word_error = Counter(word_dist)

        # per-frame alignment row (CTC decodes only; the reference prints
        # it between the ref and stat rows, ha/loop.py:409-410)
        ali_o, _ = self.vocab.decode(ali)

        if isinstance(ref1, list):
            star = '␣'
            hyp_a, ref_a = zip(*align(hyp1, ref1, star)) if (hyp1 or ref1) \
                else ((), ())
            hyp_o, ref_o = list(hyp_a), list(ref_a)
            ali_o = tuple(ali_o)
        elif isinstance(ref1, str):
            star = '␣'
            pairs = align(hyp1, ref1, star)
            hyp_o = ''.join(h for h, _ in pairs)
            ref_o = ''.join(r for _, r in pairs)
        else:
            star = 42
            pairs = align(list(hyp1), list(ref1), star)
            hyp_o = bytes(h for h, _ in pairs)
            ref_o = bytes(r for _, r in pairs)

        if self.args.quiet:
            return label_error, word_error, hyp_o

        print(epoch, dataset_index, f'hyp{attempt}',
              self.vocab.format(hyp_o), sep="\t", flush=True)
        print(epoch, dataset_index, 'ref', self.vocab.format(ref_o),
              sep="\t", flush=True)
        if len(ali_o):
            print(epoch, dataset_index, f'ali{attempt}',
                  self.vocab.format(ali_o), sep="\t", flush=True)
        print(epoch, dataset_index, f'stat{attempt}',
              ' '.join(f'{k}={stat[k]}' for k in stat), sep="\t", flush=True)
        return label_error, word_error, hyp_o

    # -------------------------------------------------------------- score

    def score(self, epoch, loader, tag='score', prompts=["<↑>", "<↓>"],
              attempts=1):
        for (idxs, inputs, condtargets1, input_lengths,
             condtarget_lengths1) in loader:
            feats, feat_lens = self._encode(self.params, inputs,
                                            input_lengths)
            for _ in range(attempts):
                for prompt in prompts:
                    if prompt is not None:
                        pid = self.vocab.raw_encode(prompt)
                        pcol = np.full((len(input_lengths), 1), pid,
                                       condtargets1.dtype)
                        condtargets = np.concatenate([pcol, condtargets1], 1)
                        condtarget_lengths = condtarget_lengths1 + 1
                    else:
                        condtargets = condtargets1
                        condtarget_lengths = condtarget_lengths1
                    losses = np.asarray(self._score_step(
                        self.params, feats, feat_lens, condtargets,
                        condtarget_lengths))
                    for n in range(len(idxs)):
                        ref, _ = self.vocab.decode(
                            [int(t) for t in
                             condtargets[n][:int(condtarget_lengths[n])]])
                        print(tag, int(idxs[n]), prompt, float(losses[n]),
                              self.vocab.format(ref), sep="\t", flush=True)

    # ---------------------------------------------------------- state

    def make_state_dict(self, **extra):
        return {
            'encoder': self.params['encoder'],
            'recognizer': self.params['recognizer'],
            'optimizer': self.opt_state,
            'loop_args': vars(self.args),
        } | extra

    def load_state_dict(self, ckpt):
        self.params = {
            'encoder': jax.tree.map(jnp.asarray, ckpt['encoder']),
            'recognizer': jax.tree.map(jnp.asarray, ckpt['recognizer']),
        }
        self.load_optimizer_state(ckpt)

    def load_optimizer_state(self, ckpt):
        """Resume just the optimizer moments (params come from the
        Initializer, which already handled SWA averaging and whose
        result may be mesh-replicated — overwriting them here would
        clobber both)."""
        if 'optimizer' in ckpt and ckpt['optimizer'] is not None:
            try:
                self.opt_state = jax.tree.map(
                    jnp.asarray, ckpt['optimizer'],
                    is_leaf=lambda x: isinstance(x, np.ndarray))
            except Exception:
                log('warning: could not restore optimizer state')


def make_parser():
    parser = argparse.ArgumentParser(formatter_class=argparse.Formatter)
    Initializer.add_arguments(parser)
    parser.add_argument('--vocab', type=str, default='ascii',
                        help="Vocabulary: bytes|ascii|cmu|xen|words.txt")
    Checkpointer.add_arguments(parser)
    parser.add_argument('--num-epochs', type=int, default=30)
    parser.add_argument('--batch-size', type=int, default=48)
    parser.add_argument('--eval-batch-size', type=int, default=1024)
    parser.add_argument('--accumulate', type=int, default=1)
    parser.add_argument('--entropy', action='store_true',
                        help="Estimate decoder attention entropy (slow)")
    parser.add_argument('--anomaly', action='store_true',
                        help="Enable jax NaN debugging")
    parser.add_argument('--allow-oom', action='store_true')
    parser.add_argument('--rnn-q8', action='store_true',
                        help="int8-resident LSTM recurrence (VMEM-held "
                             "quantized W_hh; ~2x LSTM step, bf16-level "
                             "noise; nn/lstm_pallas.py)")
    parser.add_argument('--prng', choices=['rbg', 'threefry'],
                        default='rbg',
                        help="dropout PRNG: XLA's hardware RngBitGenerator"
                             " (default; threefry costs ~15%% of the "
                             "lstm:512 step) or jax's default threefry")
    parser.add_argument('--log-interval', type=int, default=100)
    LR.add_arguments(parser)
    parser.add_argument('--star-penalty', type=float, default=None,
                        help="Star penalty for Star CTC")
    parser.add_argument('--clip-grad-norm', type=float, default=0.1)
    parser.add_argument('--train', type=str)
    parser.add_argument('--eval', type=str)
    parser.add_argument('--evaluate-every', type=int, default=10000)
    parser.add_argument('--test', type=str, required=False)
    parser.add_argument('--test-attempts', type=int, default=1)
    parser.add_argument('--test-spin-prompts', action='store_true')
    parser.add_argument('--score', type=str, required=False)
    parser.add_argument('--score-attempts', type=int, default=1)
    parser.add_argument('--score-spin-prompts', action='store_true')
    parser.add_argument('--grad-norms', type=str)
    parser.add_argument('--grad-norms-batch-duration', type=int, default=240)
    parser.add_argument('--device-fbank', action='store_true',
                        help="datasets yield raw waveforms (wav: DSL); "
                             "log-mel features are computed on device "
                             "inside the jitted step")
    parser.add_argument('-q', '--quiet', action='store_true')
    parser.add_argument('--wandb', action='store_true')
    parser.add_argument('--num-workers', type=int, default=1)
    parser.add_argument('--dtype', type=str, default='bfloat16',
                        choices=['float32', 'bfloat16'],
                        help="encoder compute dtype (losses stay fp32)")
    parser.add_argument('--beam', type=int, default=1,
                        help="beam width for eval decoding (1=greedy; "
                             "on-device batched prefix beam search for CTC, "
                             "monotonic beam for transducers)")
    parser.add_argument('--lm', type=str, default=None,
                        help="hal RNN-LM checkpoint for shallow fusion "
                             "during --beam decoding")
    parser.add_argument('--lm-weight', type=float, default=0.3,
                        help="shallow-fusion LM weight")
    parser.add_argument('--profile', type=int, default=0,
                        help="capture a jax profiler trace of this many "
                             "training steps into <exp>/profile")
    return parser


def main():
    args = make_parser().parse_args()
    log(args)

    from haloop_tpu.parallel.mesh import maybe_init_distributed, is_master
    maybe_init_distributed()
    shard = (jax.process_index(), jax.process_count())

    if args.anomaly:
        jax.config.update("jax_debug_nans", True)
    if args.rnn_q8:
        import os
        os.environ["HALOOP_RNN_Q8"] = "1"
    # must precede every PRNGKey creation (System.__init__)
    jax.config.update("jax_default_prng_impl", args.prng)

    vocab = symbol_tape.make_vocab(args.vocab)
    if args.device_fbank:
        from haloop_tpu.dataloader import default_frame_buckets
        collator = Collator(vocab,
                            frame_buckets=default_frame_buckets(16000 * 40))
    else:
        collator = Collator(vocab)

    valid_loader = test_loader = score_loader = None
    if args.eval:
        valid_loader = DataLoader(concat_datasets(args.eval), collator,
                                  batch_size=args.eval_batch_size,
                                  num_workers=args.num_workers,
                                  process_shard=shard)
    if args.test:
        test_loader = DataLoader(concat_datasets(args.test), collator,
                                 batch_size=args.eval_batch_size,
                                 num_workers=args.num_workers,
                                 process_shard=shard)
    if args.score:
        score_loader = DataLoader(concat_datasets(args.score), collator,
                                  batch_size=args.eval_batch_size,
                                  num_workers=args.num_workers,
                                  process_shard=shard)

    (spec, params), epoch, global_step = Initializer()(args)
    system = System(args, spec, params, vocab)
    if args.init and len(args.init) == 1:
        # single-checkpoint resume also restores the optimizer moments
        # (the reference's System.load_state_dict, ha/loop.py:99-102);
        # params are NOT reloaded — the Initializer already provided
        # them (possibly SWA-averaged over several --init checkpoints,
        # possibly mesh-replicated by System)
        ckpt = load_checkpoint(args.init[0])
        if 'encoder' in ckpt:
            system.load_optimizer_state(ckpt)

    if (args.train or args.wandb) and is_master():
        wandb.init(project='ha', config=vars(args), name=str(args.exp))

    if args.train:
        train_loader = DataLoader(concat_datasets(args.train), collator,
                                  batch_size=args.batch_size, shuffle=True,
                                  drop_last=True, seed=args.seed,
                                  num_workers=args.num_workers,
                                  process_shard=shard)
        log('total training minibatches:',
            len(train_loader) * args.num_epochs)
        # process-0-gated checkpointing (reference rank-0 gate,
        # ha/attention_loop.py:74,95); params are replicated so every
        # process holds the full state. Orbax sharded saves are
        # COLLECTIVE (multi-writer with barriers): every process must
        # call the Checkpointer or process 0 deadlocks in
        # sync_global_devices (same gating as hala)
        ckpt_collective = (args.ckpt_format == 'sharded'
                           and jax.process_count() > 1)
        checkpoint = Checkpointer(path=args.exp, save=args.save,
                                  fmt=args.ckpt_format) \
            if (is_master() or ckpt_collective) else (lambda **kw: None)
        for epoch in range(epoch, args.num_epochs):
            global_step = system.train_one_epoch(
                epoch, global_step, train_loader, valid_loader)
            valid_loss = system.evaluate(epoch, valid_loader, tag='valid') \
                if valid_loader else float('inf')
            checkpoint(loss=valid_loss, epoch=epoch,
                       checkpoint_fn=lambda: system.make_state_dict(
                           best_valid_loss=valid_loss, epoch=epoch,
                           global_step=global_step))
    elif args.eval:
        system.evaluate(epoch, valid_loader, tag='valid')

    if args.test:
        print('testing', epoch, 'attempts', args.test_attempts, flush=True)
        prompts = ['<↑>', '<↓>'] if args.test_spin_prompts else [None]
        system.evaluate(epoch, test_loader, attempts=args.test_attempts,
                        tag='test', prompts=prompts)

    if args.score:
        print('scoring', epoch, 'attempts', args.score_attempts, flush=True)
        prompts = ['<↑>', '<↓>'] if args.score_spin_prompts else [None]
        system.score(epoch, score_loader, tag='score', prompts=prompts,
                     attempts=args.score_attempts)

    if args.grad_norms:
        from haloop_tpu.grad_norm import compute_grad_norm
        from haloop_tpu.sampler import DurationBatchSampler
        dataset = concat_datasets(args.grad_norms)
        egl_loader = DataLoader(
            dataset, collator,
            batch_sampler=DurationBatchSampler(
                dataset, args.grad_norms_batch_duration))
        compute_grad_norm(system, egl_loader)


if __name__ == '__main__':
    main()
