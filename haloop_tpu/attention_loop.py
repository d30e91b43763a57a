"""hala — GPT pretraining/finetuning on binary token streams
(reference: ha/attention_loop.py).

Capabilities preserved: np.memmap uint16 token bins, lm/denoise/cond
objectives, LoRA adapters with only-LoRA training, gradient
accumulation, grad clipping, cosine/linear LR with fraction-of-total
max_iters, token-weighted validation loss + bits-per-byte, checkpoint
gating on non-NaN val loss, and the same log line format
('iter N: loss ..., time ..ms, grad_norm: .., lr: ..').

TPU-native redesign:
  * DDP/NCCL (ha/attention_loop.py:67-80,196-203) becomes SPMD over a
    1-D 'data' Mesh: the jitted train step consumes batch arrays sharded
    over devices; XLA inserts the gradient reduction. The no_sync
    micro-step dance is unnecessary — gradient accumulation runs as a
    lax.scan over (G, B, T) micro-batches inside ONE jitted step, so
    cross-device reduction happens once per update by construction.
  * bf16 compute with fp32 master params (GradScaler-free).
  * proper main() — the reference trains at module import time
    (quirk noted in SURVEY.md §7); we do not.
  * 'cond' objective: the reference references an undefined ``y``
    (ha/attention_loop.py:116-120, latent bug); implemented here with
    the documented intent: train only on the final non-pad token.
"""

import math
import sys
import time
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
import optax
from jax.sharding import NamedSharding, PartitionSpec as P

from haloop_tpu.argparse import ArgumentParser, Formatter, int_or_float
from haloop_tpu.checkpoint import Checkpointer
from haloop_tpu.init import Initializer, GPTModel, log
from haloop_tpu.mlm import mask_tokens
from haloop_tpu.models import gpt as G
from haloop_tpu.models import lora
from haloop_tpu.optim import LR, decay_mask
from haloop_tpu.parallel import data_mesh, is_master
from haloop_tpu import wandb_compat as wandb


def make_parser():
    parser = ArgumentParser(description="hala trains attention models",
                            formatter_class=Formatter)
    Initializer.add_arguments(parser)
    parser.add_argument("--train", type=str, help="Path to training data")
    parser.add_argument("--eval", type=str, help="Path to validation data")
    parser.add_argument("--mmap-dtype", type=str, default="uint16")
    parser.add_argument("--eval_bytes", default=0.0, type=float,
                        help="How many payload bytes the eval set contains")
    parser.add_argument("--objective", choices=["lm", "denoise", "cond"],
                        default="lm", type=str)
    parser.add_argument("--train-shuffle", action='store_true')
    Checkpointer.add_arguments(parser)
    parser.add_argument("--eval-interval", type=int, default=100)
    parser.add_argument("--log-interval", type=int, default=1)
    parser.add_argument("--gradient_accumulation_steps", type=int, default=2)
    parser.add_argument("--batch_size", type=int, default=4)
    parser.add_argument("--block_size", type=int, default=1024)
    parser.add_argument("--max_iters", type=int_or_float, default=1.0)
    parser.add_argument("--grad_clip", type=float, default=1.0)
    parser.add_argument("--lora", action="store_true")
    LR.add_arguments(parser)
    parser.add_argument("--backend", type=str, default="ici",
                        help="(parity flag; comms ride ICI/DCN via XLA)")
    parser.add_argument("--tensor-parallel", type=int, default=1,
                        help="shard attention/MLP over a 'model' mesh "
                             "axis of this size (Megatron layout); "
                             "composes with data parallelism and with "
                             "--sequence-parallel")
    parser.add_argument("--pipeline-stages", type=int, default=1,
                        help="GPipe-pipeline the block stack over a "
                             "'pipe' mesh axis of this size; composes "
                             "with data parallelism on the remaining "
                             "devices (n_layer %% stages == 0, dropout "
                             "0, single process)")
    parser.add_argument("--sequence-parallel", type=int, default=1,
                        help="shard the time axis over a 'seq' mesh "
                             "axis of this size: attention runs as a "
                             "KV-rotating ring (long-context surface; "
                             "activations scale T/N per device); "
                             "composes with data parallelism on the "
                             "remaining devices and with "
                             "--tensor-parallel (block_size %% N == 0, "
                             "single process)")
    parser.add_argument("--ring-schedule",
                        choices=["contiguous", "striped"],
                        default="contiguous",
                        help="--sequence-parallel KV-ring schedule: "
                             "'striped' (zigzag) interleaves two "
                             "global stripes per device so fully-"
                             "masked causal blocks are skipped (~2x "
                             "less attention arithmetic at long T); "
                             "'contiguous' keeps one chunk per device "
                             "(also valid non-causal, composes with "
                             "--tensor-parallel)")
    parser.add_argument("--dtype", type=str, default="bfloat16")
    parser.add_argument("--prng", choices=["rbg", "threefry"],
                        default="rbg",
                        help="dropout PRNG (see hac --prng)")
    parser.add_argument("--wandb", action="store_true")
    return parser


def get_batch(args, data, step, rng=None, input_dtype=np.int32,
              process_shard=None):
    """(G, B, T) micro-batch stack for one update.

    For the lm objective the targets are the host-free shift of x, so
    this returns (x, None) and the trainer derives Y on device — the
    batch crosses the host->device link once, at ``input_dtype`` width
    (uint16 for GPT-2-sized vocabs), instead of twice at int64. The
    reference hides its host path with pinned-memory async prefetch
    (ha/attention_loop.py:98-127); here a producer thread + the thinner
    transfer does the same job."""
    G_ = args.gradient_accumulation_steps
    B, T = args.batch_size, args.block_size
    n = G_ * B
    if args.train_shuffle:
        ix = rng.integers(0, len(data) - T, n)
    else:
        # multi-process: hosts read disjoint consecutive windows (the
        # SPMD analog of the reference's per-rank DistributedSampler-free
        # striding, ha/attention_loop.py:90-93 + per-rank seed :75)
        pi, pc = process_shard or (0, 1)
        base = (step * pc + pi) * T * n
        ix = [(base + k * T) % max(len(data) - T, 1) for k in range(n)]

    match args.objective:
        case "lm":
            x = np.stack([data[i:i + T].astype(input_dtype) for i in ix])
            return x.reshape(G_, B, T), None
        case "denoise":
            x = np.stack([data[i:i + T].astype(np.int64) for i in ix])
            x, y = mask_tokens(x, rng=rng)
        case "cond":
            x = np.stack([data[i:i + T].astype(np.int64) for i in ix])
            # predict only the final real token of each sequence
            y_full = np.concatenate([x[:, 1:], np.zeros((n, 1), np.int64)],
                                    1)
            final = np.maximum((x != 0).sum(-1) - 2, 0)
            y = np.zeros_like(y_full)
            y[np.arange(n), final] = y_full[np.arange(n), final]
    return (x.reshape(G_, B, T).astype(np.int32),
            y.reshape(G_, B, T).astype(np.int32))


def cast_tree(tree, dtype):
    return jax.tree.map(
        lambda x: x.astype(dtype)
        if jnp.issubdtype(x.dtype, jnp.floating) else x, tree)


def accumulate_micro_grads(loss_fn, params, X, Y, key):
    """THE gradient-accumulation scan — one jitted update's worth of
    (G, B, T) micro-batches pushed through ``value_and_grad(loss_fn)``
    with grads summed in-place and averaged. Every hala step factory
    (plain/dp, sequence-parallel) routes through this one body, so a
    change to the micro-step semantics lands exactly once (the
    reference likewise keeps ONE micro-batching loop,
    ha/attention_loop.py:196-203). Returns (mean grads, mean loss);
    cross-device reductions are the CALLER's job (they differ per
    mesh layout)."""
    def micro(grads, xyk):
        x, y, k = xyk
        loss, g = jax.value_and_grad(loss_fn)(params, x, y, k)
        return jax.tree.map(jnp.add, grads, g), loss

    keys = jax.random.split(key, X.shape[0])
    zero = jax.tree.map(jnp.zeros_like, params)
    grads, losses = jax.lax.scan(micro, zero, (X, Y, keys))
    grads = jax.tree.map(lambda g: g / X.shape[0], grads)
    return grads, jnp.mean(losses)


def finish_update(tx, args, params, opt_state, grads, mean_loss):
    """Shared update tail: grad norm, clip, NaN/Inf gate, optimizer.
    (Reference skips the step on non-finite loss before stepping,
    ha/attention_loop.py:209-214 / :221-228.)"""
    gnorm = jnp.sqrt(sum(jnp.sum(jnp.square(g.astype(jnp.float32)))
                         for g in jax.tree.leaves(grads)))
    if args.grad_clip != 0.0:
        scale = jnp.minimum(1.0, args.grad_clip / (gnorm + 1e-6))
        grads = jax.tree.map(lambda g: g * scale, grads)

    ok = jnp.isfinite(mean_loss) & jnp.isfinite(gnorm)

    def apply(operand):
        params, opt_state, grads = operand
        updates, opt_state = tx.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), opt_state

    def skip(operand):
        params, opt_state, _ = operand
        return params, opt_state

    params, opt_state = jax.lax.cond(ok, apply, skip,
                                     (params, opt_state, grads))
    return params, opt_state, mean_loss, gnorm


def make_pp_train_step(cfg, args, tx, compute_dtype, mesh):
    """GPipe update: the block stack pipelined over the mesh's 'pipe'
    axis (parallel/pipeline.py: ppermute stage hops, M + S - 1 ticks),
    composed with data parallelism over 'data'. The accumulation
    micro-steps ARE the pipeline microbatches — one backward through
    the whole schedule, one optimizer update per call, same contract
    as make_train_step. Dropout-free by construction (gated in main).

    What this buys on real hardware: per-device BLOCK-stack weight and
    optimizer traffic drops to L/S layers per stage; it is a memory
    scaling surface (weight-stationary stages), not a latency win on
    one host — see ROADMAP.md."""
    ndata = mesh.shape['data']
    data_axis = 'data' if ndata > 1 else None
    from haloop_tpu.parallel.pipeline import pipeline_gpt_loss

    def loss_fn(params, X, Y):
        fparams = cast_tree(params, compute_dtype)
        G_, B, T = X.shape
        return pipeline_gpt_loss(
            fparams, cfg, mesh, X.reshape(G_ * B, T),
            Y.reshape(G_ * B, T), n_micro=G_, data_axis=data_axis)

    def step(params, opt_state, X, Y, key):
        del key              # no dropout on the pipeline path
        loss, grads = jax.value_and_grad(loss_fn)(params, X, Y)
        return finish_update(tx, args, params, opt_state, grads, loss)

    return jax.jit(step, donate_argnums=(0, 1))


def sp_local_nll(cfg, compute_dtype, nseq, params, x, y, key=None,
                 train=False, schedule="contiguous"):
    """This shard's per-token NLL on the sequence-parallel path: global
    positions (so wpe AND rotary models see single-device semantics)
    and ring attention over 'seq'. Shared by the sp train micro-step
    and the sp eval — the two must agree on the sharded forward's
    construction, so it exists once. schedule='striped' expects the
    token stream permuted by ring.striped_permutation (the trainer
    does this on device at prep time) and uses the matching striped
    global positions."""
    fparams = cast_tree(params, compute_dtype)
    Tc = x.shape[-1]
    if schedule == "striped":
        from haloop_tpu.parallel.ring import striped_positions
        pos = striped_positions('seq', Tc, nseq)
    else:
        pos = jax.lax.axis_index('seq') * Tc + jnp.arange(Tc)
    return G.forward_all(fparams, cfg, x, y, reduction='none', key=key,
                         train=train, positions=pos,
                         seq_ring=('seq', nseq, schedule))


def make_sp_train_step(cfg, args, tx, compute_dtype, mesh):
    """Sequence-parallel update: the TIME axis shards over the mesh's
    'seq' axis and attention runs as a KV-rotating ring
    (parallel/ring.ring_attend_local — SURVEY §5.7's extension beyond
    the reference, which has no sequence parallelism at all), composed
    with data parallelism over 'data'. Per-device activations and KV
    scale T/n_seq: this is the long-context surface — block sizes whose
    (B, T, C) activations or T^2 attention don't fit one chip train
    across the ring, with only 2*B*H*(T/n)*D bf16 per hop riding ICI.

    Contract matches make_train_step: micro-batch grad accumulation,
    clip, NaN gate, AdamW; positions are global (shard offset + local
    iota) so wpe AND rotary models see single-device semantics; loss
    terms psum over 'seq' (each shard's grad covers its local tokens'
    pathways — the ring's ppermute transpose routes cross-shard KV
    cotangents home — so the 'seq' grad reduction is a SUM, then the
    usual data-parallel pmean)."""
    from jax import shard_map
    from haloop_tpu.ops import dispatch
    nseq = mesh.shape['seq']
    ndata = mesh.shape['data']

    def loss_terms(params, x, y, key):
        nll = sp_local_nll(cfg, compute_dtype, nseq, params, x, y,
                           key=key, train=cfg.dropout > 0,
                           schedule=args.ring_schedule)
        s = jax.lax.psum(jnp.sum(nll), 'seq')
        c = jax.lax.psum(jnp.sum(y != 0), 'seq')
        return s / jnp.maximum(c, 1)

    def sp_step(params, opt_state, X, Y, key):
        with dispatch.force_local():
            key = jax.random.fold_in(key, jax.lax.axis_index('data'))
            key = jax.random.fold_in(key, jax.lax.axis_index('seq'))
            grads, mean_loss = accumulate_micro_grads(
                loss_terms, params, X, Y, key)  # loss global over 'seq'
            grads = jax.lax.psum(grads, 'seq')
            if ndata > 1:
                grads = jax.lax.pmean(grads, 'data')
                mean_loss = jax.lax.pmean(mean_loss, 'data')
            return finish_update(tx, args, params, opt_state, grads,
                                 mean_loss)

    R, B3 = P(), P(None, 'data', 'seq')
    return jax.jit(shard_map(sp_step, mesh=mesh,
                             in_specs=(R, R, B3, B3, R),
                             out_specs=(R, R, R, R), check_vma=False),
                   donate_argnums=(0, 1))


def make_train_step(cfg, args, tx, compute_dtype, mesh=None,
                    ring_spmd=None):
    """One jitted update: scan over micro-batches accumulating grads,
    clip, AdamW. Batch arrays are sharded over the data mesh outside.

    Data-parallel meshes run the step under shard_map with force_local
    — the same one-pattern-for-every-device-path discipline as hac
    (loop.py): Pallas kernels (no GSPMD partitioning rules) stay active
    per-shard, dropout keys fold in the shard index, and lax.pmean is
    the gradient allreduce. Pass mesh=None (or a 1-device / tensor-
    parallel mesh) for the plain-jit GSPMD path."""

    def loss_fn(params, x, y, key):
        # LoRA params (lora_A/lora_B) ride along in the pytree and are
        # consumed by gpt._attn's low-rank path (models/gpt.py).
        # ring_spmd: the composed tp x sp mode — same plain-jit GSPMD
        # step, but attention rings KV over 'seq' (gpt seq_ring_spmd).
        fparams = cast_tree(params, compute_dtype)
        return G.forward_all(fparams, cfg, x, y, key=key,
                             train=cfg.dropout > 0,
                             seq_ring_spmd=ring_spmd)

    def step_impl(params, opt_state, X, Y, key, axis=None):
        if axis is not None:
            # per-shard dropout stream, identical on every host (the
            # shard index is global), unlike a per-process seed which
            # would diverge the replicated params
            key = jax.random.fold_in(key, jax.lax.axis_index(axis))
        grads, mean_loss = accumulate_micro_grads(
            loss_fn, params, X, Y, key)
        if axis is not None:
            # DDP allreduce; every shard then applies the identical
            # clip + update to its replicated params
            grads = jax.lax.pmean(grads, axis)
            mean_loss = jax.lax.pmean(mean_loss, axis)
        return finish_update(tx, args, params, opt_state, grads,
                             mean_loss)

    if mesh is not None:
        from jax import shard_map
        from haloop_tpu.ops import dispatch
        B3, R = P(None, 'data', None), P()

        def dp_step(params, opt_state, X, Y, key):
            with dispatch.force_local():
                return step_impl(params, opt_state, X, Y, key,
                                 axis='data')

        return jax.jit(shard_map(dp_step, mesh=mesh,
                                 in_specs=(R, R, B3, B3, R),
                                 out_specs=(R, R, R, R),
                                 check_vma=False),
                       donate_argnums=(0, 1))

    return jax.jit(step_impl, donate_argnums=(0, 1))


def main():
    args = make_parser().parse_args()
    jax.config.update('jax_default_prng_impl', args.prng)

    from haloop_tpu.parallel.mesh import maybe_init_distributed
    maybe_init_distributed()
    if args.train is None and args.eval is None:
        raise SystemExit("at least one of --train and --eval is required")
    print(args, file=sys.stderr)

    import numpy as _np
    from jax.sharding import Mesh
    tp = max(1, args.tensor_parallel)
    pp = max(1, args.pipeline_stages)
    sp = max(1, args.sequence_parallel)
    n_dev = len(jax.devices())
    if pp > 1 and (tp > 1 or sp > 1):
        raise SystemExit("--pipeline-stages does not compose with "
                         "--tensor-parallel/--sequence-parallel; "
                         "tp and sp compose with each other and each "
                         "of the three composes with data parallelism")
    if tp > 1 and sp > 1:
        # composed tensor x sequence parallelism: params shard over
        # 'model' (Megatron layout, parallel/tensor.py) under GSPMD,
        # the time axis shards over 'seq' and attention runs the ring
        # inside a partial-manual shard_map (gpt._attn seq_ring_spmd)
        # — only the ring's ppermute is hand-written; XLA places every
        # 'model' collective. seq innermost so KV hops ride neighbors.
        if n_dev % (tp * sp):
            raise SystemExit(f"{n_dev} devices not divisible by "
                             f"tp={tp} x sp={sp}")
        mesh = Mesh(_np.array(jax.devices())
                    .reshape(n_dev // (tp * sp), tp, sp),
                    ("data", "model", "seq"))
    elif tp > 1:
        assert n_dev % tp == 0, f"{n_dev} devices not divisible by tp={tp}"
        mesh = Mesh(_np.array(jax.devices()).reshape(n_dev // tp, tp),
                    ("data", "model"))
    elif pp > 1:
        if n_dev % pp:
            raise SystemExit(f"{n_dev} devices not divisible by "
                             f"pipeline stages {pp}")
        # pipe innermost: stage hops (ppermute) ride neighboring devices
        mesh = Mesh(_np.array(jax.devices()).reshape(n_dev // pp, pp),
                    ("data", "pipe"))
    elif sp > 1:
        if n_dev % sp:
            raise SystemExit(f"{n_dev} devices not divisible by "
                             f"sequence-parallel size {sp}")
        # seq innermost: the ring's KV ppermute rides ICI neighbors
        mesh = Mesh(_np.array(jax.devices()).reshape(n_dev // sp, sp),
                    ("data", "seq"))
    else:
        mesh = data_mesh()
    master = is_master()
    pc = jax.process_count()
    multi = pc > 1
    if multi:
        # the reference's distributed surface is DDP-in-hala only
        # (ha/attention_loop.py:67-80); multi-process here is likewise
        # data-parallel: the global batch is assembled across hosts
        if tp > 1 or sp > 1:
            raise SystemExit("--tensor-parallel/--sequence-parallel "
                             "across processes is not supported; multi-"
                             "process hala is data-parallel (the "
                             "reference's DDP surface)")
        if (args.batch_size * pc) % n_dev:
            raise SystemExit(
                f"batch_size {args.batch_size} x {pc} processes does not "
                f"divide the {n_dev}-device mesh")
    rng = np.random.default_rng(1337 + jax.process_index())

    train_data = np.memmap(args.train, dtype=args.mmap_dtype, mode="r") \
        if args.train else None
    val_data = np.memmap(args.eval, dtype=args.mmap_dtype, mode="r") \
        if args.eval else None
    if val_data is not None and \
            len(val_data) < args.block_size * args.batch_size * pc:
        # fail fast: zero eval iterations would silently report
        # val_loss 0.0 and checkpoint it as best (multi-process
        # multiplies the minimum by the process count)
        raise SystemExit(
            f"--eval set has {len(val_data)} tokens; needs at least "
            f"block_size*batch_size*processes = "
            f"{args.block_size * args.batch_size * pc} for one eval batch")

    # pickle saves are master-only (params are replicated; one host
    # writes); orbax sharded saves are collective — every process must
    # construct and call the Checkpointer (multi-writer barriers live in
    # checkpoint.save_checkpoint_sharded)
    ckpt_collective = multi and args.ckpt_format == 'sharded'
    checkpoint = Checkpointer(path=args.exp, save=args.save,
                              fmt=args.ckpt_format) \
        if (master or ckpt_collective) else None

    (spec, params), _, _ = Initializer()(args)
    assert isinstance(spec, GPTModel)
    cfg = spec.config
    assert args.block_size == cfg.block_size, "Block sizes don't match"

    if tp > 1:
        from haloop_tpu.parallel.tensor import shard_gpt_params
        params = shard_gpt_params(mesh, params)

    if pp > 1:
        if multi:
            raise SystemExit("--pipeline-stages is single-process "
                             "(stages shard over local devices); "
                             "multi-process hala is data-parallel")
        if cfg.n_layer % pp:
            raise SystemExit(f"n_layer {cfg.n_layer} not divisible by "
                             f"pipeline stages {pp}")
        if cfg.dropout > 0:
            raise SystemExit("--pipeline-stages trains without dropout; "
                             "use a dropout-0 config")
        # --lora composes: adapters live inside the block pytrees, so
        # stack_blocks pipelines them with their blocks and gpt._attn's
        # low-rank branch runs inside each stage (deterministically —
        # the pipeline is dropout-free); the trainable mask acts in the
        # optimizer, which is step-kind-agnostic (test_hala_pipeline)
        ndata = mesh.shape["data"]
        if ndata > 1 and args.batch_size % ndata:
            raise SystemExit(f"batch_size {args.batch_size} not "
                             f"divisible by the data axis {ndata} of "
                             f"the {n_dev}-device pipeline mesh")

    if sp > 1:
        if args.block_size % sp:
            raise SystemExit(f"block_size {args.block_size} not "
                             f"divisible by --sequence-parallel {sp}")
        ndata = mesh.shape["data"]
        if ndata > 1 and args.batch_size % ndata:
            raise SystemExit(f"batch_size {args.batch_size} not "
                             f"divisible by the data axis {ndata} of "
                             f"the {n_dev}-device sequence-parallel mesh")
    striped = args.ring_schedule == "striped" and sp > 1
    if args.ring_schedule == "striped":
        if sp == 1:
            raise SystemExit("--ring-schedule striped requires "
                             "--sequence-parallel > 1")
        if tp > 1:
            raise SystemExit("--ring-schedule striped does not compose "
                             "with --tensor-parallel; use contiguous")
        if args.block_size % (2 * sp):
            raise SystemExit(f"block_size {args.block_size} not "
                             f"divisible by 2 x sequence-parallel = "
                             f"{2 * sp} (striped holds two stripes per "
                             f"shard)")

    trainable_mask = None
    if args.lora:
        params = lora.attach_to_c_attn(params, jax.random.PRNGKey(7))
        trainable_mask = lora.lora_trainable_mask(params)

    compute_dtype = {"float32": jnp.float32,
                     "bfloat16": jnp.bfloat16}[args.dtype]

    lr_ctl = LR(args)

    iter_num = 0
    if args.train:
        n_update_tokens = args.block_size * args.batch_size * \
            args.gradient_accumulation_steps
        train_updates = len(train_data) // (args.block_size *
                                            args.batch_size)
        train_batches = train_updates // args.gradient_accumulation_steps
        max_iters = args.max_iters if isinstance(args.max_iters, int) \
            else int(train_batches * args.max_iters)
    else:
        max_iters = 0

    tx = optax.adamw(lr_ctl.schedule_fn(max_iters or 200000),
                     b1=args.beta1, b2=args.beta2,
                     weight_decay=args.weight_decay, mask=decay_mask)
    if trainable_mask is not None:
        tx = optax.chain(
            optax.masked(optax.set_to_zero(),
                         jax.tree.map(lambda m: not m, trainable_mask)),
            tx)
    opt_state = tx.init(params)

    if multi:
        # replicate over the global mesh so the jitted step is one
        # collective SPMD program (hac does the same, loop.py System)
        from haloop_tpu.parallel.mesh import replicate
        params = replicate(mesh, params)
        opt_state = replicate(mesh, opt_state)

    # data-parallel meshes take the shard_map step (kernels active
    # per-shard); tensor-parallel and 1-device meshes, or batches that
    # don't divide the mesh, take the plain-jit GSPMD step; pipeline
    # meshes take the GPipe step
    if pp > 1:
        train_step = make_pp_train_step(cfg, args, tx, compute_dtype,
                                        mesh)
    elif sp > 1 and tp > 1:
        # composed mode: plain-jit GSPMD over the 3-D mesh ('model'
        # collectives and 'data' grad reduction placed by XLA), ring
        # attention manual over 'seq' only
        train_step = make_train_step(cfg, args, tx, compute_dtype,
                                     ring_spmd=(mesh, 'seq', sp))
    elif sp > 1:
        train_step = make_sp_train_step(cfg, args, tx, compute_dtype,
                                        mesh)
    else:
        dp_mesh = mesh if (tp == 1 and mesh.devices.size > 1 and
                           (args.batch_size * pc) % n_dev == 0) else None
        train_step = make_train_step(cfg, args, tx, compute_dtype,
                                     mesh=dp_mesh)

    fcast = partial(cast_tree, dtype=compute_dtype)

    if sp > 1 and tp == 1:
        # eval must honor the same T/N per-device scaling the flag
        # exists for — a plain-jit eval would rebuild the full-T
        # activations on one chip at exactly the block sizes
        # --sequence-parallel is chosen to make fit
        from jax import shard_map
        from haloop_tpu.ops import dispatch as _dispatch

        def eval_local(params, x, y):
            with _dispatch.force_local():
                nll = sp_local_nll(cfg, compute_dtype,
                                   mesh.shape['seq'], params, x, y,
                                   schedule=args.ring_schedule)
                loss = jax.lax.psum(jnp.sum(nll), ('data', 'seq'))
                count = jax.lax.psum(jnp.sum(y > 0), ('data', 'seq'))
                return loss, count

        eval_step = jax.jit(shard_map(
            eval_local, mesh=mesh,
            in_specs=(P(), P('data', 'seq'), P('data', 'seq')),
            out_specs=(P(), P()), check_vma=False))
    else:
        ring_kw = {"seq_ring_spmd": (mesh, 'seq', sp)} \
            if (sp > 1 and tp > 1) else {}

        @jax.jit
        def eval_step(params, x, y):
            loss = G.forward_all(fcast(params), cfg, x, y,
                                 reduction='sum', **ring_kw)
            count = jnp.sum(y > 0)
            return loss, count

    def eval_ship(a):
        """Multi-process: each host contributes ITS rows of the global
        eval batch (parallel.mesh.global_batch); single-process: plain
        transfer."""
        if multi:
            from haloop_tpu.parallel.mesh import global_batch
            return global_batch(mesh, a)
        return jnp.asarray(a)

    def evaluate():
        """Collective under multi-process: every host runs the same
        global program over disjoint slices of the val set and sees the
        identical (replicated) total — eval is data-parallel, unlike
        the reference's rank-0-redundant evaluate."""
        B, T = args.batch_size, args.block_size
        eval_iters = len(val_data) // T // (B * pc)
        tot_loss = tot_count = 0.0
        for k in range(eval_iters):
            base = (k * pc + jax.process_index()) * T * B
            x = np.stack([val_data[i:i + T].astype(np.int64)
                          for i in range(base, base + T * B, T)])
            y = np.concatenate([x[:, 1:], np.zeros((len(x), 1), np.int64)],
                               1)
            if striped:
                x, y = x[:, perm_np], y[:, perm_np]
            loss, count = eval_step(params, eval_ship(x), eval_ship(y))
            tot_loss += float(loss)
            tot_count += float(count)
        val_loss = tot_loss / max(tot_count, 1)
        val_bpb = (tot_loss / args.eval_bytes) / math.log(2) \
            if args.eval_bytes else float('nan')
        return val_loss, val_bpb

    if args.wandb and master:
        wandb.init(config=vars(args))

    # ONE global dropout key on every host: the jitted step is a single
    # SPMD program over the global batch, so XLA partitions the dropout
    # mask across devices from the shared key. A per-process key here
    # (the reference's per-rank seed, ha/attention_loop.py:75) would
    # make each host compute different masks for the same global program
    # and silently diverge the replicated params. Per-host randomness
    # belongs host-side only (the data rng above IS per-process).
    key = jax.random.PRNGKey(1337)

    if args.train and master:
        n_trainable = sum(
            x.size for x in jax.tree.leaves(params)) if not args.lora else \
            sum(x.size for x, m in zip(jax.tree.leaves(params),
                                       jax.tree.leaves(trainable_mask))
                if m)
        print("Trainable params", n_trainable)
        print("Train batches, updates:", train_batches, train_updates)
        print("Tokens per step, update:",
              args.block_size * args.batch_size, n_update_tokens)

    # input pipeline: a producer thread keeps the next update's batch
    # ready while the device runs the current step (the reference's
    # pinned-memory async prefetch, ha/attention_loop.py:98-127, done
    # host-side); batches ship at uint16/int32 width and lm targets are
    # derived on device, so the host->device link carries 4-8x less
    input_dtype = np.uint16 if (args.objective == "lm"
                                and cfg.vocab_size <= 65535
                                and args.mmap_dtype == "uint16") \
        else np.int32

    if striped:
        from haloop_tpu.parallel.ring import striped_permutation
        perm_np = striped_permutation(args.block_size, sp)
        perm_T = jnp.asarray(perm_np)

    @jax.jit
    def prep_lm(X):
        X = X.astype(jnp.int32)
        Y = jnp.concatenate([X[:, :, 1:], jnp.zeros_like(X[:, :, :1])], -1)
        if striped:
            # LM targets derive from the ORIGINAL token order; then
            # both streams take the zigzag layout the striped ring
            # (and sp_local_nll's striped positions) expect
            X, Y = X[:, :, perm_T], Y[:, :, perm_T]
        return X, Y

    def ship(A):
        if multi:
            # each process holds its (G, B_local, T) share; the global
            # (G, B_local*pc, T) batch is assembled across hosts — the
            # SPMD analog of DDP's per-rank batches
            from haloop_tpu.parallel.mesh import global_batch
            return global_batch(mesh, A, spec=P(None, 'data', None))
        A = jnp.asarray(A)
        # shard batch rows over the mesh's data axis (its full device
        # set on 1-D meshes; the non-model/pipe dimension otherwise);
        # composed tp x sp additionally shards T over 'seq' (GSPMD
        # reshards if a spec is partial, so this is placement, not
        # correctness)
        t_axis = 'seq' if (tp > 1 and sp > 1) else None
        ndata = dict(zip(mesh.axis_names, mesh.devices.shape))['data']
        if ndata > 1 and A.shape[1] % ndata == 0:
            return jax.device_put(A, NamedSharding(mesh,
                                                   P(None, 'data', t_axis)))
        if t_axis is not None:
            return jax.device_put(A, NamedSharding(mesh,
                                                   P(None, None, t_axis)))
        return A

    if args.train:
        import queue
        import threading
        batch_q = queue.Queue(maxsize=2)

        shard = (jax.process_index(), pc)

        def producer():
            i = 0
            try:
                while True:
                    batch_q.put(get_batch(
                        args, train_data, i % max(train_batches, 1),
                        rng=rng, input_dtype=input_dtype,
                        process_shard=shard))
                    i += 1
            except Exception as e:              # surface in consumer
                batch_q.put(e)

        threading.Thread(target=producer, daemon=True).start()

    def emit_log(entry):
        """Print a (deferred) iteration's stats. On the tunneled
        backend a value fetch synchronizes the whole device queue
        (~30 ms round trip; see .claude/skills/verify), so: the two
        scalars are stacked into ONE fetch, and it happens one
        iteration late — after the next step is dispatched. Per-iter
        logging still costs one sync; --log-interval 10 amortizes it
        to noise (device-step-bound wall time)."""
        it, loss, grad_norm, lr, dt = entry
        train_loss, gnorm = np.asarray(jnp.stack([loss, grad_norm])).tolist()
        if math.isnan(train_loss):
            print("loss is NaN, skipping this update")
        print(f"iter {it}: loss {train_loss:.4f}, "
              f"time {dt*1000:.2f}ms, grad_norm: {gnorm:.3f},"
              f" lr: {lr}")
        if args.wandb:
            wandb.log({"iter": it, "train/loss": train_loss,
                       "train/grad_norm": gnorm, "lr": lr})

    pending_log = None
    t0 = time.time()
    last_logged_iter = 0
    while args.train:
        item = batch_q.get()
        if isinstance(item, Exception):
            raise item
        X, Y = item
        key, k = jax.random.split(key)
        if Y is None:
            XS, YS = prep_lm(ship(X))
        else:
            if striped:        # host-side: X/Y are small int arrays
                X, Y = X[..., perm_np], Y[..., perm_np]
            XS, YS = ship(X), ship(Y)
        params, opt_state, loss, grad_norm = train_step(
            params, opt_state, XS, YS, k)

        lr = lr_ctl.get_lr(iter_num, max_iters)
        # average wall time per iteration since the last log: with no
        # per-iteration sync left in this loop (get_lr is host-pure,
        # stats are fetched deferred) the host dispatches ahead of the
        # device, so a single-iteration t1-t0 would measure dispatch
        # (~6 ms), not the ~70 ms step
        t1 = time.time()
        dt = (t1 - t0) / max(iter_num - last_logged_iter, 1)
        if pending_log is not None:
            emit_log(pending_log)
            pending_log = None
        if iter_num % args.log_interval == 0 and master:
            pending_log = (iter_num, loss, grad_norm, lr, dt)
            last_logged_iter = iter_num
            t0 = t1

        # eval/checkpoint gate is independent of --log-interval (the
        # reference nests it inside the log gate, so --eval-interval
        # silently no-ops unless it is a multiple of --log-interval;
        # fixed here deliberately)
        if iter_num and iter_num % args.eval_interval == 0 and val_data \
                is not None:
            # EVERY process enters: evaluate() is collective under
            # multi-process (global eval batches over replicated
            # params), and all hosts must take the NaN break in
            # lockstep — a master-only gate would leave workers
            # waiting inside the next collective
            if pending_log is not None:     # keep log lines in order
                emit_log(pending_log)
                pending_log = None
            val_loss, val_bpb = evaluate()
            if master:
                print(f"eval {iter_num}: val loss {val_loss:.4f}")
                if args.wandb:
                    wandb.log({"iter": iter_num, "val/loss": val_loss,
                               "val/bpb": val_bpb})
            if not math.isnan(val_loss):
                if checkpoint is not None:
                    checkpoint(loss=val_loss, epoch=iter_num,
                               checkpoint_fn=lambda: {
                                   'model': params,
                                   'optimizer': opt_state,
                                   'model_args': cfg.state_dict(),
                                   'iter_num': iter_num,
                                   'val_loss': val_loss,
                                   'val_bpb': val_bpb,
                                   'args': vars(args),
                               })
            else:
                if master:
                    print("NaN loss detected")
                break

        iter_num += 1
        if iter_num > max_iters:
            break

    if pending_log is not None:
        emit_log(pending_log)

    if args.train and multi:
        # cross-host divergence detector: replicated params must be
        # bit-identical on every host; each process prints its own
        # local checksum to stderr so a launcher (or test) can compare
        checksum = float(jnp.stack(
            [jnp.sum(jnp.abs(x.astype(jnp.float32)))
             for x in jax.tree.leaves(params)]).sum())
        print(f"process {jax.process_index()}: param checksum "
              f"{checksum:.9e} after {iter_num} iters", file=sys.stderr)

    if args.eval and not args.train:
        val_loss, val_bpb = evaluate()   # collective under multi-process
        if master:
            print(f"step {iter_num}: val loss {val_loss:.4f}, "
                  f"val bpb {val_bpb:.4f}. final eval")


if __name__ == '__main__':
    main()
