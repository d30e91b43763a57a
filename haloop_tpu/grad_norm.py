"""Per-sample gradient norms via vmap'd value_and_grad
(reference: ha/grad_norm.py; powers EGL active learning).

JAX-native: ``jax.vmap(jax.value_and_grad(loss))`` over the batch axis —
the exact construct torch.func emulates. For CTC-attention models the
CTC head is skipped like the reference's MiniSystem (there the reason
was a missing vmap batching rule; here we keep the behavior for output
parity). Prints 'grad_norm,loss\\tindex\\tnorm\\tloss' TSV rows parsed by
the active loop (ha/active_loop.py:90-97).
"""

import jax
import jax.numpy as jnp
import numpy as np


def norm_batched(x, p=2.0, eps=1e-6):
    """Stable p-norm over per-sample flattened grads (N, ...)."""
    N = x.shape[0]
    x = x.reshape(N, -1)
    a = jnp.max(jnp.abs(x), axis=-1, keepdims=True) + eps
    return a[:, 0] * jnp.sum(jnp.abs(x / a) ** p, axis=-1) ** (1.0 / p)


def make_per_sample_loss(system):
    """Single-sample loss closure over the System's spec (CTC head
    stripped for ctc-attention, MiniSystem semantics)."""
    spec = system.spec
    star_penalty = system.args.star_penalty

    def loss_fn(params, inputs, condtargets, input_lengths,
                condtarget_lengths, key):
        feats, feat_lens, _ = spec.encoder.apply(
            params["encoder"], inputs, input_lengths, train=True, key=key)
        rec_params = params["recognizer"]
        rec = spec.recognizer
        if rec.kind == "ctc-attention":
            from haloop_tpu.models import transformer as TR
            loss, _ = TR.decoder_forward(
                rec_params["decoder"], rec.tcfg, feats, condtargets,
                feat_lens, condtarget_lengths, drop_labels=False,
                train=False)
        else:
            loss, _ = rec.loss(rec_params, feats, condtargets, feat_lens,
                               condtarget_lengths, star_penalty=star_penalty,
                               drop_labels=False, train=False)
        return loss

    return loss_fn


def gradient_norms(system, inputs, condtargets, input_lengths,
                   condtarget_lengths, key, params=None):
    """(norms (N,), losses (N,)) — one backward per sample, batched by
    vmap, run as one jitted program. Pass ``params`` explicitly when
    calling under jit (avoids closure-baking them as constants)."""
    loss_fn = make_per_sample_loss(system)
    if params is None:
        params = system.params

    def single(params, x, t, il, tl, k):
        return jax.value_and_grad(loss_fn)(
            params, x[None], t[None], il[None], tl[None], k)

    keys = jax.random.split(key, inputs.shape[0])
    losses, grads = jax.vmap(single, in_axes=(None, 0, 0, 0, 0, 0))(
        params, inputs, condtargets, input_lengths,
        condtarget_lengths, keys)
    flat = jax.tree.leaves(grads)
    per_leaf = jnp.stack([norm_batched(g) for g in flat], axis=1)  # (N, L)
    return norm_batched(per_leaf), losses


def compute_grad_norm(system, loader):
    # params are a TRACED argument: a closure would bake every param
    # leaf into the executable as constants — a full extra model copy
    # in HBM per compiled (T, U) bucket shape
    jitted = jax.jit(lambda params, inputs, ct, il, tl, key:
                     gradient_norms(system, inputs, ct, il, tl, key,
                                    params=params))
    for idxs, inputs, condtargets, input_lengths, condtarget_lengths \
            in loader:
        norms, losses = jitted(system.params, inputs, condtargets,
                               input_lengths, condtarget_lengths,
                               system.next_key())
        norms = np.asarray(norms)
        losses = np.asarray(losses)
        for i in range(len(idxs)):
            print('grad_norm,loss', int(idxs[i]), float(norms[i]),
                  float(losses[i]), sep='\t', flush=True)
