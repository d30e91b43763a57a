"""Pipeline parallelism for the GPT block stack (GPipe schedule).

Stages are laid over a 'pipe' mesh axis; the stacked per-layer params
are sharded on their leading (layer-group) axis so each device owns
L/S consecutive blocks. Inside ``shard_map`` a ``lax.scan`` runs the
M + S - 1 tick schedule: stage 0 injects microbatches, activations hop
stage-to-stage with ``ppermute`` (riding ICI), the last stage banks its
outputs, and one ``psum`` replicates them at the end. Autodiff flows
through scan/ppermute, so the same function serves the training step.

Embeddings / final LN / lm_head stay outside the pipelined region
(replicated): pipelining pays off for the block stack, which carries
virtually all the FLOPs.
"""

import jax
import jax.numpy as jnp
from jax.sharding import PartitionSpec as P

try:
    from jax import shard_map as _shard_map
    _CHECK_KW = {"check_vma": False}
except ImportError:                      # older jax: check_rep, not check_vma
    from jax.experimental.shard_map import shard_map as _shard_map
    _CHECK_KW = {"check_rep": False}


def stack_blocks(blocks):
    """List of per-layer param dicts -> one pytree with leading L axis."""
    return jax.tree.map(lambda *xs: jnp.stack(xs), *blocks)


def pipeline_blocks(mesh, cfg, stacked, x_micro, *, axis="pipe",
                    block_apply, data_axis=None):
    """Run the block stack as a pipeline.

    stacked: pytree with leading dim L (= n_layer), L % S == 0.
    x_micro: (M, mb, T, C) microbatched activations.
    block_apply(block_params, cfg, x) -> y  (single block, no dropout).
    Returns (M, mb, T, C) outputs, replicated across the pipe group.

    data_axis: optional mesh axis to shard the microbatch rows (mb)
    over — composes data parallelism with the pipeline: each data
    group runs an independent copy of the schedule on its slice of
    the rows while sharing the pipe-sharded blocks. Activations that
    hop stages via ppermute stay within a data group (the ppermute
    rides the 'pipe' mesh dimension only).
    """
    S = mesh.shape[axis]
    M = x_micro.shape[0]
    L = jax.tree.leaves(stacked)[0].shape[0]
    assert L % S == 0, f"n_layer {L} not divisible by stages {S}"
    Lps = L // S

    # regroup layers: (L, ...) -> (S, L/S, ...) so axis 0 shards cleanly
    grouped = jax.tree.map(
        lambda a: a.reshape((S, Lps) + a.shape[1:]), stacked)

    def stage(local_blocks, x_all):
        # local_blocks leaves: (1, L/S, ...); x_all: (M, mb, T, C)
        idx = jax.lax.axis_index(axis)
        mb_shape = x_all.shape[1:]
        zero = jnp.zeros(mb_shape, x_all.dtype)
        perm = [(i, (i + 1) % S) for i in range(S)]

        def apply_my_stage(x):
            y = x
            for i in range(Lps):
                block = jax.tree.map(lambda a: a[0, i], local_blocks)
                y = block_apply(block, cfg, y)
            return y

        def tick(carry, t):
            state, outputs = carry
            # stage 0 injects microbatch t (zeros once drained)
            inject = jnp.where(t < M, t, M - 1)
            x_in = jnp.where(idx == 0, x_all[inject], state)
            y = apply_my_stage(x_in)
            # last stage banks microbatch t - (S - 1)
            slot = jnp.clip(t - (S - 1), 0, M - 1)
            banked = jnp.where((idx == S - 1) & (t >= S - 1),
                               y, outputs[slot])
            outputs = jax.lax.dynamic_update_index_in_dim(
                outputs, banked, slot, axis=0)
            state = jax.lax.ppermute(y, axis, perm)
            return (state, outputs), None

        outputs0 = jnp.zeros_like(x_all)
        (_, outputs), _ = jax.lax.scan(
            tick, (zero, outputs0), jnp.arange(M + S - 1))
        # replicate the last stage's bank everywhere
        outputs = jnp.where(idx == S - 1, outputs, jnp.zeros_like(outputs))
        return jax.lax.psum(outputs, axis)

    x_spec = P(None, data_axis) if data_axis else P()
    specs_in = (jax.tree.map(lambda _: P(axis), grouped), x_spec)
    return _shard_map(stage, mesh=mesh, in_specs=specs_in,
                      out_specs=x_spec, **_CHECK_KW)(grouped, x_micro)


def gpt_block_apply_nodrop(block, cfg, x):
    """Single GPT block without dropout/caching (pipeline stage body)."""
    from haloop_tpu.models.gpt import _block_apply
    y, _, _ = _block_apply(block, cfg, x)
    return y


def pipeline_gpt_loss(params, cfg, mesh, input_ids, target_ids,
                      n_micro=4, axis="pipe", data_axis=None):
    """Full GPT LM loss with the block stack pipelined over `axis`.

    With ``data_axis`` set, batch rows additionally shard over that
    mesh axis (dp x pp): embeddings / final LN / lm_head run under
    GSPMD on the sharded batch; only the block-stack schedule runs
    under shard_map. hala exposes this as ``--pipeline-stages N``."""
    from haloop_tpu.models import gpt as G
    from haloop_tpu.nn.core import layer_norm, linear

    B, T = input_ids.shape
    assert B % n_micro == 0
    x = G._embed(params, cfg, input_ids, 0)
    x_micro = x.reshape(n_micro, B // n_micro, T, cfg.n_embd)

    stacked = stack_blocks(params["transformer"]["h"])
    y_micro = pipeline_blocks(mesh, cfg, stacked, x_micro, axis=axis,
                              block_apply=gpt_block_apply_nodrop,
                              data_axis=data_axis)
    y = y_micro.reshape(B, T, cfg.n_embd)
    y = layer_norm(params["transformer"]["ln_f"], y)
    logits = linear(params["lm_head"], y).astype(jnp.float32)
    logp = jax.nn.log_softmax(logits, axis=-1)
    nll = -jnp.take_along_axis(logp, target_ids[..., None], axis=-1)[..., 0]
    valid = target_ids != 0
    return jnp.sum(jnp.where(valid, nll, 0.0)) / \
        jnp.maximum(jnp.sum(valid), 1)
