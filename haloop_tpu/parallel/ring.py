"""Ring attention: sequence-parallel self-attention across the mesh
(SURVEY.md §5.7's designed extension beyond reference parity; the math
spec is the blockwise online-softmax of ha/transformer.py:374-410 —
`attend_chunked` — lifted from query chunks on one device to KV chunks
rotating around a mesh axis).

Layout: q/k/v (B, H, T, D) with T sharded over the ring axis — each
device owns T/n queries and starts with its own T/n keys/values. n
ring steps: every step computes the local (Tq_local x Tkv_chunk)
attention block and folds it into per-row online-softmax accumulators
(m, s, o), then the KV chunk hops to the next device with
``lax.ppermute`` (one ICI neighbor exchange, overlapped by XLA with
the next step's matmuls). After n steps every query row has seen every
key exactly once; no (T, T) tensor ever exists on any chip, and no
gather of the full sequence happens anywhere.

``causal=True`` masks by GLOBAL position (row = ring_index*Tc + local
row, col = chunk origin*Tc + local col), so the result equals
single-device causal attention on the unsharded sequence. The ring
schedule delivers the diagonal chunk FIRST (hop r carries the chunk
that originated on device idx-r), so the running max is finite from
step 0 and fully-masked future chunks contribute exp(-inf - m) = 0.
Future chunks still occupy MXU ticks (masked, not skipped) — causal
ring does ~2x the useful FLOPs; the win is memory (T/n activations
and KV per chip), not arithmetic.

When it pays: T too long for one chip's HBM/VMEM comfort (activations
scale T/n per device) or T^2 attention dominating the step — the
per-step comm is 2 * B*H*(T/n)*D bf16 riding ICI while the MXU chews
an equal-sized block. See PERFORMANCE.md "ring attention". User
surface: ``hala --sequence-parallel N`` (attention_loop.py).
"""

import functools
import math

import jax
import jax.numpy as jnp
from jax.sharding import PartitionSpec as P

try:
    from jax import shard_map as _shard_map
    _CHECK_KW = {"check_vma": False}
except ImportError:                      # older jax
    from jax.experimental.shard_map import shard_map as _shard_map
    _CHECK_KW = {"check_rep": False}

NEG = -1e30


def ring_attend_local(q_l, k_l, v_l, *, axis, n, causal=False, lens=None):
    """The per-shard ring body: call INSIDE an enclosing shard_map whose
    mesh has ``axis`` of size ``n``. q_l/k_l/v_l: (B, H, Tc, D) — this
    shard's contiguous T-chunk (global rows idx*Tc..(idx+1)*Tc-1).
    lens: optional (B,) GLOBAL valid-key counts (padding mask).
    Returns the local (B, H, Tc, D) attention output.

    Exposed separately from :func:`ring_self_attention` so model code
    that already runs under shard_map (e.g. gpt._attn on the hala
    --sequence-parallel path) can drop it in where ``ops.attention.mha``
    would run on one device.
    """
    B, H, Tc, D = q_l.shape
    scale = 1.0 / math.sqrt(D)
    perm = [(i, (i + 1) % n) for i in range(n)]
    idx = jax.lax.axis_index(axis)

    def step(carry, r):
        kc, vc, m, s, o = carry
        # the chunk in hand after r hops originated on device idx-r
        src = (idx - r) % n
        scores = jnp.einsum(
            "bhtd,bhsd->bhts", q_l, kc,
            preferred_element_type=jnp.float32) * scale
        col = src * Tc + jax.lax.broadcasted_iota(
            jnp.int32, scores.shape, 3)
        if lens is not None:
            scores = jnp.where(
                col < lens[:, None, None, None], scores, NEG)
        if causal:
            row = idx * Tc + jax.lax.broadcasted_iota(
                jnp.int32, scores.shape, 2)
            scores = jnp.where(col <= row, scores, NEG)
        m_new = jnp.maximum(m, jnp.max(scores, -1, keepdims=True))
        p = jnp.exp(scores - m_new)
        alpha = jnp.exp(m - m_new)
        s = s * alpha + jnp.sum(p, -1, keepdims=True)
        o = o * alpha + jnp.einsum(
            "bhts,bhsd->bhtd", p.astype(q_l.dtype), vc,
            preferred_element_type=jnp.float32)
        kc, vc = jax.lax.ppermute((kc, vc), axis, perm)
        return (kc, vc, m_new, s, o), None

    m0 = jnp.full((B, H, Tc, 1), NEG, jnp.float32)
    s0 = jnp.zeros((B, H, Tc, 1), jnp.float32)
    o0 = jnp.zeros((B, H, Tc, D), jnp.float32)
    (_, _, _, s, o), _ = jax.lax.scan(
        step, (k_l, v_l, m0, s0, o0), jnp.arange(n))
    out = o / jnp.maximum(s, jnp.finfo(jnp.float32).tiny)
    if lens is not None:
        # rows with NO valid key would otherwise softmax uniformly
        # over the masked scores (exp(NEG - NEG) == 1 — NEG is finite)
        # and return the mean of V; force the zero rows the padding
        # contract promises
        out = jnp.where(lens[:, None, None, None] > 0, out, 0.0)
    return out.astype(q_l.dtype)


def ring_self_attention(mesh, q, k, v, kv_lengths=None, axis="data",
                        causal=False):
    """Self-attention with the sequence axis sharded over ``axis``.
    q/k/v: (B, H, T, D), T % mesh.shape[axis] == 0;
    kv_lengths: optional (B,) valid-key counts (padding mask), global.
    Returns (B, H, T, D), T sharded like the inputs.

    Equivalent to ops.attention.attend / ops.flash at fp32 tolerance
    (tests/test_parallel.py::test_ring_attention_matches_single_device,
    ::test_ring_attention_causal).
    """
    n = mesh.shape[axis]
    T = q.shape[2]
    assert T % n == 0, f"T={T} not divisible by ring size {n}"

    def body(q_l, k_l, v_l, lens):
        return ring_attend_local(q_l, k_l, v_l, axis=axis, n=n,
                                 causal=causal, lens=lens)

    seq = P(None, None, axis, None)
    if kv_lengths is None:
        fn = _shard_map(functools.partial(body, lens=None), mesh=mesh,
                        in_specs=(seq, seq, seq), out_specs=seq,
                        **_CHECK_KW)
        return fn(q, k, v)
    fn = _shard_map(body, mesh=mesh, in_specs=(seq, seq, seq, P()),
                    out_specs=seq, **_CHECK_KW)
    return fn(q, k, v, kv_lengths)


def striped_permutation(T, n):
    """Global permutation (numpy, host-side) mapping token order ->
    striped device layout: device i's contiguous shard of the PERMUTED
    sequence holds global stripes (i, 2n-1-i), each of height
    h = T/(2n). Apply to ids/targets BEFORE sharding the time axis over
    the ring ('x[:, perm]'); per-token losses come back permuted, which
    any sum/mean reduction is invariant to."""
    import numpy as np
    assert T % (2 * n) == 0, f"T={T} not divisible by 2*ring={2 * n}"
    h = T // (2 * n)
    out = np.empty(T, np.int64)
    for i in range(n):
        out[i * 2 * h: i * 2 * h + h] = np.arange(i * h, (i + 1) * h)
        out[i * 2 * h + h: (i + 1) * 2 * h] = np.arange(
            (2 * n - 1 - i) * h, (2 * n - i) * h)
    return out


def striped_positions(axis, Tc, n):
    """This shard's GLOBAL token positions under the striped layout
    (call inside shard_map): rows [0, h) are stripe idx, rows [h, 2h)
    are stripe 2n-1-idx."""
    idx = jax.lax.axis_index(axis)
    h = Tc // 2
    r = jnp.arange(h)
    return jnp.concatenate([idx * h + r, (2 * n - 1 - idx) * h + r])


def ring_attend_local_striped(q_l, k_l, v_l, *, axis, n):
    """CAUSAL ring attention with the zigzag/striped layout: the
    contiguous ring (ring_attend_local, causal=True) computes every
    future chunk and masks it — ~2x the useful FLOPs. Here device i's
    local rows are two global STRIPES (i, 2n-1-i) of height h = Tc/2
    (see striped_permutation), which balances early and late rows
    across devices so that after hop 0 every hop computes exactly TWO
    fully-visible (h x h) blocks and skips the masked work entirely:

      hop 0 (local kv):  (q_a, kv_a) and (q_b, kv_b) diagonal blocks
                         (triangular mask) + (q_b, kv_a) full block
      hop r >= 1 (kv originated on device j = idx - r mod n):
        * (q_b, kv_a) — stripe 2n-1-idx > stripe j always: full block
        * one of (q_a, kv_a) [r <= idx] / (q_b, kv_b) [r > idx] —
          both strictly visible, selected by a dynamic h-row slice

    Total (2n+1) h^2-blocks vs the contiguous causal ring's 4n — the
    masked half of the arithmetic is recovered. Every (row, col <= row)
    pair is computed exactly once (coverage enumeration in
    tests/test_parallel.py::test_ring_attention_striped_causal). Comm
    is identical: one (k, v) ppermute per hop. The math spec is the
    same order-invariant online-softmax merge as ring_attend_local
    (ha/transformer.py:374-410's blockwise form), which is what makes
    reordering the schedule safe."""
    B, H, Tc, D = q_l.shape
    assert Tc % 2 == 0, f"striped ring needs even local rows, got {Tc}"
    h = Tc // 2
    scale = 1.0 / math.sqrt(D)
    perm = [(i, (i + 1) % n) for i in range(n)]
    idx = jax.lax.axis_index(axis)

    def block(q_b, k_b, v_b, m_b, s_b, o_b, mask=None):
        """Fold one (h x h) score block into the online-softmax
        accumulators of the q rows it covers."""
        scores = jnp.einsum(
            "bhtd,bhsd->bhts", q_b, k_b,
            preferred_element_type=jnp.float32) * scale
        if mask is not None:
            scores = jnp.where(mask, scores, NEG)
        m_new = jnp.maximum(m_b, jnp.max(scores, -1, keepdims=True))
        p = jnp.exp(scores - m_new)
        alpha = jnp.exp(m_b - m_new)
        s_new = s_b * alpha + jnp.sum(p, -1, keepdims=True)
        o_new = o_b * alpha + jnp.einsum(
            "bhts,bhsd->bhtd", p.astype(q_b.dtype), v_b,
            preferred_element_type=jnp.float32)
        return m_new, s_new, o_new

    qa, qb = q_l[:, :, :h], q_l[:, :, h:]
    m0 = jnp.full((B, H, h, 1), NEG, jnp.float32)
    s0 = jnp.zeros((B, H, h, 1), jnp.float32)
    o0 = jnp.zeros((B, H, h, D), jnp.float32)

    # hop 0: local kv — two diagonal blocks + (q_b, kv_a)
    tri = jnp.tril(jnp.ones((h, h), bool))[None, None]
    ma, sa, oa = block(qa, k_l[:, :, :h], v_l[:, :, :h],
                       m0, s0, o0, mask=tri)
    mb, sb, ob = block(qb, k_l[:, :, h:], v_l[:, :, h:],
                       m0, s0, o0, mask=tri)
    mb, sb, ob = block(qb, k_l[:, :, :h], v_l[:, :, :h], mb, sb, ob)
    m = jnp.concatenate([ma, mb], 2)
    s = jnp.concatenate([sa, sb], 2)
    o = jnp.concatenate([oa, ob], 2)

    kc, vc = jax.lax.ppermute((k_l, v_l), axis, perm)

    def step(carry, r):
        kc, vc, m, s, o = carry
        # block 1 (every hop): q_b x kv stripe a — strictly visible
        m1, s1, o1 = block(qb, kc[:, :, :h], vc[:, :, :h],
                           m[:, :, h:], s[:, :, h:], o[:, :, h:])
        m = jnp.concatenate([m[:, :, :h], m1], 2)
        s = jnp.concatenate([s[:, :, :h], s1], 2)
        o = jnp.concatenate([o[:, :, :h], o1], 2)
        # block 2: halves selected by r <= idx — strictly visible
        # either way; reads AFTER block 1's update so off == h chains
        off = jnp.where(r <= idx, 0, h)
        sl = lambda a: jax.lax.dynamic_slice_in_dim(a, off, h, 2)
        m2, s2, o2 = block(sl(q_l), sl(kc), sl(vc),
                           sl(m), sl(s), sl(o))
        up = lambda a, b: jax.lax.dynamic_update_slice_in_dim(
            a, b, off, 2)
        m, s, o = up(m, m2), up(s, s2), up(o, o2)
        kc, vc = jax.lax.ppermute((kc, vc), axis, perm)
        return (kc, vc, m, s, o), None

    if n > 1:
        (_, _, _, s, o), _ = jax.lax.scan(
            step, (kc, vc, m, s, o), jnp.arange(1, n))
    out = o / jnp.maximum(s, jnp.finfo(jnp.float32).tiny)
    return out.astype(q_l.dtype)
