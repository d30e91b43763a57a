"""GPT language model, nanoGPT-flavored for uk4b checkpoints
(reference: ha/attention.py).

Parity surface:
  * GPTConfig fields match ha/init.py:24-39 (incl. stable_embedding,
    causal, rotary_emb_dim).
  * learned absolute wpe zero-init, wte scaled 0.02, weight tying
    wte = lm_head (stored once under lm_head; wte reads it).
  * forward_all: teacher-forced CE with ignore_index=0 and selectable
    reduction; forward_context: bidirectional features + cache;
    forward: last-token logits + KV cache.
  * rotary_emb_dim > 0 swaps learned positions for interleaved GPT-J
    RoPE inside attention (replacing the reference's flash-attn MHA
    dependency) — same q/k rotation as ops/rope.py.

TPU-native decode: fixed-size KV cache (L, 2, B, nh, block_size, hs)
with a scalar fill level, so every generate step has a static shape and
compiles once; ``generate`` runs the whole token loop on device via
``lax.scan`` with temperature/top-k sampling and stop-token masking.
"""

import dataclasses
import functools

import jax
import jax.numpy as jnp

from haloop_tpu.nn.core import (
    dropout, embedding, layer_norm, layer_norm_init,
    linear, linear_init, new_gelu)
from haloop_tpu.ops.attention import attend
from haloop_tpu.ops.rope import rotate_interleaved


@dataclasses.dataclass(frozen=True)
class GPTConfig:
    block_size: int = 1024
    vocab_size: int = 50304
    n_layer: int = 12
    n_head: int = 12
    n_embd: int = 768
    dropout: float = 0.0
    bias: bool = False
    stable_embedding: bool = False
    causal: bool = True
    d_input: int = 1
    rotary_emb_dim: int = 0

    def state_dict(self):
        return dataclasses.asdict(self)


def gpt_init(key, cfg: GPTConfig):
    ks = jax.random.split(key, cfg.n_layer + 4)
    p = {
        "transformer": {
            "wpe": {"weight": jnp.zeros((cfg.block_size, cfg.n_embd))},
            "h": [_block_init(ks[i], cfg) for i in range(cfg.n_layer)],
            "ln_f": layer_norm_init(cfg.n_embd, bias=cfg.bias),
        },
        # wte is TIED to lm_head; stored once here.
        "lm_head": {"weight":
                    jax.random.normal(ks[-1], (cfg.vocab_size, cfg.n_embd))
                    * 0.02},
    }
    if cfg.stable_embedding:
        # the reference's StableEmbedding (ha/attention.py:32-61) wraps
        # BOTH wte and wpe, each with its own LayerNorm
        p["transformer"]["wte_norm"] = layer_norm_init(cfg.n_embd)
        p["transformer"]["wpe_norm"] = layer_norm_init(cfg.n_embd)
    return p


def _block_init(key, cfg):
    ks = jax.random.split(key, 4)
    p = {
        "ln_1": layer_norm_init(cfg.n_embd, bias=cfg.bias),
        "attn": {
            "c_attn": linear_init(ks[0], cfg.n_embd, 3 * cfg.n_embd,
                                  bias=cfg.bias),
            "c_proj": linear_init(ks[1], cfg.n_embd, cfg.n_embd,
                                  bias=cfg.bias),
        },
        "ln_2": layer_norm_init(cfg.n_embd, bias=cfg.bias),
        "mlp": {
            "c_fc": linear_init(ks[2], cfg.n_embd, 4 * cfg.n_embd,
                                bias=cfg.bias),
            "c_proj": linear_init(ks[3], 4 * cfg.n_embd, cfg.n_embd,
                                  bias=cfg.bias),
        },
    }
    return p


def _embed(p, cfg, input_ids, t0, key=None, train=False, positions=None):
    tok = embedding(p["lm_head"], input_ids)   # tied wte
    if cfg.stable_embedding:
        tok = layer_norm(p["transformer"]["wte_norm"], tok)
    if cfg.rotary_emb_dim:
        return dropout(key, tok, cfg.dropout, deterministic=not train)
    if positions is not None:
        # packed rows: per-token positions restart at segment starts
        pos_emb = embedding(p["transformer"]["wpe"], positions)
    else:
        T = input_ids.shape[-1]
        pos = t0 + jnp.arange(T)
        pos_emb = embedding(p["transformer"]["wpe"], pos)[None]
    # StableEmbedding wraps wpe too (ha/attention.py:192,54-61); older
    # native checkpoints may predate the wpe_norm parameter
    if cfg.stable_embedding and "wpe_norm" in p["transformer"]:
        pos_emb = layer_norm(p["transformer"]["wpe_norm"], pos_emb)
    x = tok + pos_emb
    return dropout(key, x, cfg.dropout, deterministic=not train)


def _attn(p, cfg, x, *, past=None, t0=0, measure_entropy=False, key=None,
          train=False, positions=None, segment_ids=None, seq_ring=None,
          seq_ring_spmd=None):
    """Fused qkv self-attention. past: optional dict with fixed-size
    FLAT cache {"k","v" (B, block, n_embd) head-major rows, "length"
    scalar} — see init_cache / ops/decode_attn.py for the layout
    rationale.
    segment_ids (B, T): packed rows — tokens attend only within their
    own segment (block-diagonal x causal), 0 marks padding.
    seq_ring: optional (axis_name, n) — the sequence axis is sharded
    over that mesh axis of an ENCLOSING shard_map and attention runs
    as a KV-rotating ring (parallel/ring.ring_attend_local); the
    caller must pass global ``positions`` for this shard's chunk.
    seq_ring_spmd: optional (mesh, axis_name, n) — like seq_ring but
    for callers running under PLAIN jit/GSPMD (shapes here are the
    full logical T): attention wraps ring_attend_local in its own
    PARTIAL-MANUAL shard_map (axis_names={axis}), so only the ring's
    ppermute is hand-written while every other dimension — including
    heads sharded over a 'model' axis by parallel/tensor.py — stays
    under GSPMD. This is what lets --tensor-parallel compose with
    --sequence-parallel (attention_loop.py)."""
    B, T, C = x.shape
    nh, hs = cfg.n_head, cfg.n_embd // cfg.n_head
    if "lora_A" in p["c_attn"]:
        from haloop_tpu.models.lora import lora_linear
        qkv = lora_linear(p["c_attn"], x, key=key, train=train)
    else:
        qkv = linear(p["c_attn"], x)
    q, k, v = jnp.split(qkv, 3, axis=-1)
    q = q.reshape(B, T, nh, hs).swapaxes(1, 2)
    k = k.reshape(B, T, nh, hs).swapaxes(1, 2)
    v = v.reshape(B, T, nh, hs).swapaxes(1, 2)

    if cfg.rotary_emb_dim:
        q = rotate_interleaved(q, t0=t0, positions=positions)
        k = rotate_interleaved(k, t0=t0, positions=positions)

    if past is None:
        if seq_ring is not None or seq_ring_spmd is not None:
            assert segment_ids is None and not measure_entropy, \
                "sequence-parallel attention: no packing/entropy"
            from haloop_tpu.parallel.ring import (
                ring_attend_local, ring_attend_local_striped)
            if seq_ring is not None:
                ring_axis, ring_n, *sched = seq_ring
                if sched and sched[0] == "striped":
                    # zigzag layout: the caller permuted the token
                    # stream (striped_permutation) and passes striped
                    # global positions; masked future chunks are
                    # SKIPPED, not computed (parallel/ring.py)
                    assert cfg.causal, "striped ring is causal-only"
                    y = ring_attend_local_striped(
                        q, k, v, axis=ring_axis, n=ring_n)
                else:
                    y = ring_attend_local(q, k, v, axis=ring_axis,
                                          n=ring_n, causal=cfg.causal)
            else:
                # plain-jit/GSPMD caller: q/k/v here are the FULL
                # logical (B, H, T, D) — open a partial-manual
                # shard_map that hand-shards only the ring axis (T);
                # every other dim, incl. heads sharded over 'model'
                # by parallel/tensor.py, stays GSPMD-partitioned.
                # The lambda closes over nothing traced, so the ring's
                # ppermute transpose gives exact grads (probed vs the
                # materialized reference in tests/test_parallel.py).
                from jax import shard_map
                from jax.sharding import PartitionSpec
                smesh, ring_axis, ring_n = seq_ring_spmd
                spec = PartitionSpec(None, None, ring_axis, None)
                y = shard_map(
                    lambda ql, kl, vl: ring_attend_local(
                        ql, kl, vl, axis=ring_axis, n=ring_n,
                        causal=cfg.causal),
                    mesh=smesh, in_specs=(spec,) * 3, out_specs=spec,
                    axis_names={ring_axis}, check_vma=False)(q, k, v)
            # entropy is not measured on the ring paths (asserted
            # above); 0.0 rather than -inf so a future consumer that
            # aggregates entropies can't silently absorb an -inf
            ent = jnp.float32(0.0)
        else:
            from haloop_tpu.ops.attention import mha
            y, ent = mha(q, k, v, causal=cfg.causal,
                         segment_ids=segment_ids,
                         measure_entropy=measure_entropy)
        present = (k, v)
    else:
        # FLAT cache (B, S, E): E = n_embd is a multiple of the 128-lane
        # tile, so the scan-carry layout is exactly the logical bytes —
        # a head-split (B, H, S, D) carry is tile-padded (H, D) ->
        # (16, 128) = 2.66x physical HBM on every decode step (measured:
        # scripts/exp_decode_hlo.py, ops/decode_attn.py docstring).
        S = past["k"].shape[1]
        total = past["length"] + T
        k_flat = k.swapaxes(1, 2).reshape(B, T, C)   # post-rotary rows
        v_flat = v.swapaxes(1, 2).reshape(B, T, C)
        from haloop_tpu.ops import dispatch
        # the single-block kernel holds both (1, S, E) cache blocks in
        # VMEM; past that, the S-gridded online-softmax variant streams
        # block_s-row blocks (same semantics, flash-decode accumulation)
        vmem_need = 2 * S * C * past["k"].dtype.itemsize
        fused = None
        if T == 1 and not measure_entropy and dispatch.use_pallas():
            from haloop_tpu.ops import decode_attn as da
            if vmem_need <= 10 * 2**20:
                fused = functools.partial(da.decode_attend_update,
                                          n_head=nh)
            else:
                sb = da.pick_s_block(S, C, past["k"].dtype.itemsize)
                if sb is not None:
                    fused = functools.partial(
                        da.decode_attend_update_gridded,
                        n_head=nh, block_s=sb)
        if fused is not None:
            y, pk_flat, pv_flat = fused(
                q[:, :, 0, :].reshape(B, C), k_flat[:, 0], v_flat[:, 0],
                past["k"], past["v"], past["length"],
                starts=past.get("starts"))
            y = y[:, None, :]                         # (B, 1, E)
            ent = jnp.float32(0.0)
            present = dict(past, k=pk_flat, v=pv_flat, length=total)
            y = linear(p["c_proj"], y)
            y = dropout(key, y, cfg.dropout, deterministic=not train)
            return y, ent, present
        # XLA fallback (prefill, draft-verify blocks, entropy, CPU):
        # write the flat rows, attend through a head-split VIEW of the
        # same buffer — identical values to the kernel path
        # (tests/test_decode_attn.py pins interpret-mode parity)
        pk_flat = jax.lax.dynamic_update_slice(
            past["k"], k_flat, (0, past["length"], 0))
        pv_flat = jax.lax.dynamic_update_slice(
            past["v"], v_flat, (0, past["length"], 0))
        pk = pk_flat.reshape(B, S, nh, hs).swapaxes(1, 2)
        pv = pv_flat.reshape(B, S, nh, hs).swapaxes(1, 2)
        if "starts" in past:
            # left-padded batch (generate(prompt_lengths=...)): row b's
            # real tokens start at column starts[b]; pad columns are
            # masked out so their (garbage) K/V are never attended
            cols = jnp.arange(S)[None, :]
            valid = (cols < total) & (cols >= past["starts"][:, None])
            if cfg.causal:
                rows = past["length"] + jnp.arange(T)[:, None]
                mask = ~((cols[None] <= rows[None]) & valid[:, None, :])
            else:
                mask = ~jnp.broadcast_to(valid[:, None, :],
                                         (valid.shape[0], T, S))
            y, ent = attend(q, pk, pv, mask=mask[:, None],
                            measure_entropy=measure_entropy)
        else:
            valid = jnp.arange(S)[None, :] < total
            if cfg.causal:
                rows = past["length"] + jnp.arange(T)[:, None]
                mask = ~((jnp.arange(S)[None, :] <= rows)
                         & valid[0][None, :])
            else:
                mask = ~valid
                mask = jnp.broadcast_to(mask, (T, S))
            y, ent = attend(q, pk, pv, mask=mask[None, None],
                            measure_entropy=measure_entropy)
        # dict(past, ...) keeps optional keys ("starts") so the scan
        # carry structure is stable
        present = dict(past, k=pk_flat, v=pv_flat, length=total)

    y = y.swapaxes(1, 2).reshape(B, T, C)
    y = linear(p["c_proj"], y)
    y = dropout(key, y, cfg.dropout, deterministic=not train)
    return y, ent, present


def _block_apply(p, cfg, x, past=None, t0=0, measure_entropy=False,
                 key=None, train=False, positions=None, segment_ids=None,
                 seq_ring=None, seq_ring_spmd=None):
    k1 = k2 = None
    if key is not None:
        k1, k2 = jax.random.split(key)
    a, ent, present = _attn(p["attn"], cfg, layer_norm(p["ln_1"], x),
                            past=past, t0=t0, measure_entropy=measure_entropy,
                            key=k1, train=train, positions=positions,
                            segment_ids=segment_ids, seq_ring=seq_ring,
                            seq_ring_spmd=seq_ring_spmd)
    x = x + a
    h = linear(p["mlp"]["c_fc"], layer_norm(p["ln_2"], x))
    h = linear(p["mlp"]["c_proj"], new_gelu(h))
    h = dropout(k2, h, cfg.dropout, deterministic=not train)
    return x + h, ent, present


def _trunk(p, cfg, input_ids, past_list=None, t0=0, key=None, train=False,
           measure_entropy=False, activation_spec=None, positions=None,
           segment_ids=None, seq_ring=None, seq_ring_spmd=None):
    """activation_spec: optional jax.sharding.PartitionSpec constraining
    hidden activations between blocks — e.g. P('data', 'model', None)
    shards the SEQUENCE axis over the model-parallel group in the
    layernorm/dropout regions (Megatron-style sequence parallelism);
    GSPMD inserts the all-gather/reduce-scatter pairs at block edges."""
    ke = None
    if key is not None:
        ke, key = jax.random.split(key)
    x = _embed(p, cfg, input_ids, t0, key=ke, train=train,
               positions=positions)
    presents = []
    entropies = []
    for i, block in enumerate(p["transformer"]["h"]):
        if activation_spec is not None:
            x = jax.lax.with_sharding_constraint(x, activation_spec)
        kb = None
        if key is not None:
            kb, key = jax.random.split(key)
        past = past_list[i] if past_list is not None else None
        x, ent, present = _block_apply(block, cfg, x, past=past, t0=t0,
                                       measure_entropy=measure_entropy,
                                       key=kb, train=train,
                                       positions=positions,
                                       segment_ids=segment_ids,
                                       seq_ring=seq_ring,
                                       seq_ring_spmd=seq_ring_spmd)
        presents.append(present)
        entropies.append(ent)
    x = layer_norm(p["transformer"]["ln_f"], x)
    return x, presents, entropies


def forward_all(p, cfg, input_ids, target_ids, reduction="mean", key=None,
                train=False, activation_spec=None, positions=None,
                segment_ids=None, seq_ring=None, seq_ring_spmd=None):
    """Teacher-forced loss over all positions; CE ignore_index=0
    (reference ha/attention.py:205-232).

    positions/segment_ids: packed-row scoring (hap --pack) — several
    sentences share a row, attention is block-diagonal x causal and
    learned/rotary positions restart at each segment start.

    seq_ring: (axis_name, n) sequence parallelism — input_ids/target_ids
    are this shard's T-chunk inside an enclosing shard_map, attention
    rings KV over the axis, and the returned reduction is LOCAL (the
    caller psums; hala --sequence-parallel does)."""
    x, _, _ = _trunk(p, cfg, input_ids, key=key, train=train,
                     activation_spec=activation_spec, positions=positions,
                     segment_ids=segment_ids, seq_ring=seq_ring,
                     seq_ring_spmd=seq_ring_spmd)
    from haloop_tpu.ops.dispatch import use_pallas
    from haloop_tpu.ops.fused_ce import pick_tv
    B, T = target_ids.shape
    if (use_pallas() and cfg.vocab_size >= 4096
            and "bias" not in p["lm_head"] and activation_spec is None
            and seq_ring_spmd is None
            and pick_tv(x.shape[-1], x.dtype.itemsize) is not None):
        # fused lm_head+CE kernel: the (B, T, V) logits never hit HBM
        # (ops/fused_ce.py; the GPT-2-vocab scoring hot spot)
        from haloop_tpu.ops.fused_ce import fused_ce_nll
        w = p["lm_head"]["weight"]
        if "qscale" in p["lm_head"]:
            # scoring is batched (MXU-bound): dequantize ONCE at the
            # jit level — XLA hoists it out of any batch loop, which
            # is exactly right here (unlike single-stream decode,
            # where the same hoist voids --q8's memory point;
            # PERFORMANCE.md). Keeps hap --q8 on the fused kernel
            # instead of falling back to materialized logits.
            w = w.astype(x.dtype) * \
                p["lm_head"]["qscale"].astype(x.dtype)[:, None]
        nll = fused_ce_nll(
            x.reshape(B * T, -1), w,
            target_ids.reshape(B * T).astype(jnp.int32)).reshape(B, T)
    else:
        logits = linear(p["lm_head"], x).astype(jnp.float32)
        # nll = logsumexp - target logit: avoids materializing a second
        # (B, T, V) log-softmax array (HBM-bound for GPT-2 vocab sizes)
        lse = jax.scipy.special.logsumexp(logits, axis=-1)
        tgt = jnp.take_along_axis(logits, target_ids[..., None],
                                  axis=-1)[..., 0]
        nll = lse - tgt
    valid = target_ids != 0
    nll = jnp.where(valid, nll, 0.0)
    if reduction == "mean":
        return jnp.sum(nll) / jnp.maximum(jnp.sum(valid), 1)
    if reduction == "sum":
        return jnp.sum(nll)
    return nll                                   # 'none': (B, T)


def forward_context(p, cfg, input_ids):
    """Bidirectional features + present (reference ha/attention.py:234-252)."""
    x, presents, _ = _trunk(p, cfg, input_ids)
    return x, presents


def lm_logits(p, x):
    return linear(p["lm_head"], x)


def param_dtype(p):
    """Activation dtype implied by a GPT param tree: lm_head's weight
    dtype — or its per-channel qscale's when the weight is int8
    weight-only quantized (quant.py); k/v activations are always fp."""
    lm = p["lm_head"]
    return lm["qscale"].dtype if "qscale" in lm else lm["weight"].dtype


def init_cache(cfg, batch, dtype=jnp.float32, size=None):
    """Fixed-size KV cache pytree (static shapes for jit). Rows are
    stored FLAT (batch, size, n_embd), head-major within a row — the
    layout the decode step reads at exactly its logical bytes
    (ops/decode_attn.py)."""
    size = size or cfg.block_size
    return [{"k": jnp.zeros((batch, size, cfg.n_embd), dtype),
             "v": jnp.zeros((batch, size, cfg.n_embd), dtype),
             "length": jnp.int32(0)}
            for _ in range(cfg.n_layer)]


def cache_len_for(cfg, prompt_len, new_tokens, extra=0):
    """Smallest 128-aligned KV capacity covering prompt + generation,
    capped at block_size. Cached attention reads the WHOLE buffer every
    step (length-masked), so capacity — not tokens written — sets the
    per-step bandwidth: right-sizing 1024 -> 256 measured +23% on
    GPT-2S decode (scripts/exp_decode_decomp.py). 128-alignment keeps
    the jit shape-bucket count small for interactive prompts."""
    need = prompt_len + new_tokens + extra
    return min(cfg.block_size, max(128, -(-need // 128) * 128))


def forward(p, cfg, input_ids, past=None, positions=None):
    """Last-token logits + updated cache (reference ha/attention.py:254-281).

    positions: optional (B, T) per-row absolute positions for
    left-padded batches (wpe lookup / rotary angles); defaults to
    cache-length + arange."""
    t0 = past[0]["length"] if past is not None else 0
    if past is None:
        # cache dtype must match the params' k/v activations —
        # dynamic_update_slice rejects a float32 cache under bf16 params
        past = init_cache(cfg, input_ids.shape[0],
                          dtype=param_dtype(p))
    x, presents, _ = _trunk(p, cfg, input_ids, past_list=past, t0=t0,
                            positions=positions)
    logits = linear(p["lm_head"], x[:, -1:, :])
    return logits, presents


def forward_logits(p, cfg, input_ids, past):
    """Like ``forward`` but returns logits at EVERY input position
    (needed to verify a drafted token block in one call)."""
    t0 = past[0]["length"]
    x, presents, _ = _trunk(p, cfg, input_ids, past_list=past, t0=t0)
    return linear(p["lm_head"], x), presents


def _rewind(cache, new_len):
    """Drop cache entries past ``new_len`` (rejected draft positions).
    The stale K/V stay in the buffers but attention masks by length,
    and the next block write at ``new_len`` overwrites them."""
    return [dict(c, length=new_len) for c in cache]


def speculative_verify(p, cfg, toks, cache):
    """One draft-verify step for greedy speculative decoding.

    toks: (1, K+1) int32 = [current_token, draft_1..draft_K]. Returns
    (emitted (K+1,) int32, n_emitted scalar, cache) where the first
    ``n`` emitted tokens are exactly what greedy single-token decoding
    would produce: the accepted draft prefix plus the model's
    correction token. The cache is rewound to cover only verified
    positions, so the OUTPUT STREAM IS IDENTICAL to ``generate`` with
    top_k=1 regardless of draft quality — drafts only buy speed.
    """
    K1 = toks.shape[1]
    t0 = cache[0]["length"]
    logits, cache = forward_logits(p, cfg, toks, cache)
    preds = jnp.argmax(logits[0], axis=-1).astype(jnp.int32)  # (K+1,)
    match = (toks[0, 1:] == preds[:-1]).astype(jnp.int32)     # (K,)
    acc = jnp.sum(jnp.cumprod(match))                         # 0..K
    idx = jnp.arange(K1)
    emitted = jnp.where(idx < acc, toks[0, 1:].take(jnp.minimum(idx, K1 - 2)),
                        jnp.where(idx == acc, preds[acc], -1))
    return emitted, acc + 1, _rewind(cache, t0 + acc + 1)


def generate_speculative(p, cfg, input_ids, max_new_tokens, draft_len=8,
                         stop_token=50256, draft_fn=None):
    """Greedy generation with speculative decoding: drafts of
    ``draft_len`` tokens are verified in one device call per block
    instead of one per token. Output is bit-identical to
    ``generate(..., top_k=1)`` for ANY draft source (wrong drafts are
    merely rejected). Host-driven, so this is the hat/serving path, not
    a jit building block.

    draft_fn(hist) -> K tokens supplies the draft; None uses prompt
    lookup (n-gram copy from the already-seen context — free, strong on
    repetitive text). ``make_gpt_draft_fn`` builds a learned draft from
    a smaller GPT checkpoint (strong everywhere the draft model is).
    """
    import numpy as np

    B, T0 = input_ids.shape
    assert B == 1, "speculative decoding is a single-stream path"
    K = draft_len
    # right-sized (see cache_len_for); +K+2 so the last accepted token
    # can still be followed by a full draft block before the capacity
    # guard below stops the loop
    cache = init_cache(cfg, 1, dtype=param_dtype(p),
                       size=cache_len_for(cfg, T0, max_new_tokens,
                                          extra=K + 2))
    # jitted prefill: a bare forward() here would dispatch the whole
    # trunk op-by-op once per prompt (hundreds of device calls)
    logits, cache = _spec_prefill_jit(cfg)(p, input_ids, cache)
    cur = int(jnp.argmax(logits[0, -1]))

    # params must be a TRACED argument (closing over them would bake
    # 124M constants into the program and recompile per call); the jit
    # is cached on the (hashable, frozen) config
    verify = _spec_verify_jit(cfg)

    hist = list(np.asarray(input_ids[0])) + [cur]
    out = [cur]
    while len(out) < max_new_tokens and out[-1] != stop_token \
            and cache[0]["length"] + K + 1 < cache[0]["k"].shape[-2]:
        draft = draft_fn(hist) if draft_fn is not None \
            else _prompt_lookup_draft(hist, K)
        draft = (list(draft) + [hist[-1]] * K)[:K]
        toks = jnp.asarray([[hist[-1]] + draft], jnp.int32)
        emitted, n, cache = verify(p, toks, cache)
        for t in np.asarray(emitted)[:int(n)].tolist():
            out.append(t)
            hist.append(t)
            if t == stop_token or len(out) >= max_new_tokens:
                break
    if out and out[-1] == stop_token:
        out = out[:-1]
    return out[:max_new_tokens]


def make_gpt_draft_fn(p_d, cfg_d, draft_len, window=64):
    """Learned draft for ``generate_speculative``: greedy-roll
    ``draft_len`` tokens from a (smaller) GPT over a fixed context
    window — prefill + lax.scan compile to ONE program per
    (window, draft_len), so every draft is a single device call with no
    cross-call cache to roll back. Short histories left-pad with token
    0 (slightly degraded drafts there; rejections are harmless)."""
    import numpy as np

    window = min(window, cfg_d.block_size - draft_len - 1)

    @functools.lru_cache(maxsize=4)
    def rollout(cfg, K):
        def f(p, ids):
            toks, _ = generate(p, cfg, ids, K, top_k=1, stop_token=-1)
            return toks
        return jax.jit(f)

    def draft_fn(hist):
        ctx = [int(t) % cfg_d.vocab_size for t in hist[-window:]]
        ids = [0] * (window - len(ctx)) + ctx
        toks = rollout(cfg_d, draft_len)(
            p_d, jnp.asarray([ids], jnp.int32))
        return np.asarray(toks)[0].tolist()

    return draft_fn


@functools.lru_cache(maxsize=8)
def _spec_verify_jit(cfg):
    return jax.jit(lambda p, toks, cache:
                   speculative_verify(p, cfg, toks, cache))


@functools.lru_cache(maxsize=8)
def _spec_prefill_jit(cfg):
    return jax.jit(lambda p, ids, cache: forward(p, cfg, ids, past=cache))


def _prompt_lookup_draft(hist, K, ngram=2):
    """Draft K tokens by copying what followed the most recent earlier
    occurrence of the current ``ngram``-token suffix; falls back to
    repeating the last token (any wrong draft is merely rejected)."""
    if len(hist) > ngram:
        suffix = hist[-ngram:]
        for j in range(len(hist) - ngram - 1, -1, -1):
            if hist[j:j + ngram] == suffix:
                cont = hist[j + ngram:j + ngram + K]
                if cont:
                    return (cont + [hist[-1]] * K)[:K]
                break
    return [hist[-1]] * K


def generate(p, cfg, input_ids, max_new_tokens, temperature=1.0, top_k=None,
             stop_token=50256, key=None, prompt_lengths=None):
    """On-device autoregressive generation: prefill once, then a
    ``lax.scan`` over single-token steps against the fixed-size cache
    (replaces the reference's python streaming loop ha/attention.py:284-325).

    prompt_lengths: optional (B,) — input_ids is a LEFT-padded batch of
    variable-length prompts (row b's real tokens are its last
    prompt_lengths[b] columns). Pad columns are attention-masked and
    positions count from each row's own start, so every row generates
    exactly what a solo ``generate`` on its unpadded prompt would
    (tests/test_generate_batch.py) — the batched-serving surface
    (hat --batch): one weight stream amortized over B streams.

    Returns (tokens (B, max_new_tokens), valid mask) — tokens after a
    stop_token are masked out.
    """
    B, T0 = input_ids.shape
    if key is None:
        key = jax.random.PRNGKey(0)
    cache = init_cache(cfg, B, dtype=param_dtype(p),
                       size=cache_len_for(cfg, T0, max_new_tokens))
    positions = None
    if prompt_lengths is not None:
        starts = (T0 - prompt_lengths).astype(jnp.int32)      # (B,)
        cache = [dict(c, starts=starts) for c in cache]
        # pads get position 0; harmless — their K/V are masked out
        positions = jnp.maximum(
            jnp.arange(T0)[None, :] - starts[:, None], 0)
    logits, cache = forward(p, cfg, input_ids, past=cache,
                            positions=positions)

    def sample(logits, key):
        logits = logits[:, -1, :] / temperature
        if top_k is not None and top_k == 1:
            return jnp.argmax(logits, axis=-1)
        if top_k is not None:
            kth = jnp.sort(logits, axis=-1)[:, -top_k][:, None]
            logits = jnp.where(logits < kth, -jnp.inf, logits)
        return jax.random.categorical(key, logits, axis=-1)

    k0, key = jax.random.split(key)
    tok = sample(logits, k0)

    def step(carry, key):
        tok, cache, alive = carry
        pos = None
        if prompt_lengths is not None:
            # per-row position of the token being fed: cache fill level
            # minus that row's left-pad offset
            pos = (cache[0]["length"] - cache[0]["starts"])[:, None]
        logits, cache = forward(p, cfg, tok[:, None], past=cache,
                                positions=pos)
        nxt = sample(logits, key)
        alive = alive & (tok != stop_token)
        return (nxt, cache, alive), (tok, alive)

    keys = jax.random.split(key, max_new_tokens)
    (_, _, _), (tokens, alive) = jax.lax.scan(
        step, (tok, cache, jnp.ones((B,), bool)), keys)
    return tokens.swapaxes(0, 1), alive.swapaxes(0, 1)  # (B, steps)
