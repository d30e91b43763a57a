"""Ablate the batched-decode step cost (the hat --batch serving path).

GPT-2S bf16, prompt 32 + 128 new tokens, equal-length rows, one jitted
prefill+scan program per variant. The measured aggregate at B=64 sits
well above the KV+weight bandwidth ideal, so this script decomposes the
step with semantically-local variants of the cached-attention inner
loop (a scratch copy of gpt._attn's past-branch — experiment only, the
shipped path stays models/gpt.py):

  base    shipped G.generate (reference point)
  local   this script's re-implementation, same semantics (sanity: must
          match base's time; outputs asserted identical to base)
  noupd   cache writes skipped (WRONG results): prices the two
          dynamic_update_slice writes per layer — if XLA updates
          in place this should be ~free, if it copies it saves
          2 * B*H*S*D bytes/layer/step
  noattn  cache reads skipped (WRONG results): everything except
          attention-over-cache (weight stream + scan floor)
  kT      k cache stored transposed (B, H, D, S): tests whether the
          qk batched matvec's layout forces a per-step transpose
  kv8     int8 k/v cache + per-row bf16 scales, scale folded into
          scores/probs (halves KV HBM reads; quantization noise only)
  flat    cache stored FLAT (B, S, E): minor dim E=768 is a multiple
          of the 128-lane tile, so the carry layout has ZERO padding
          (the head-split (B,H,S,D) carry gets tiled {3,1,0,2:T(8,128)}
          = (H,D)->(16,128) = 2.66x physical bytes — see
          exp_decode_hlo.py). scores via one masked matmul
          (B,S,E)x(B,E,H) that consumes the flat layout directly;
          out via a broadcast-probs mul-reduce over S.
  flatv   like flat but scores ALSO via VPU mul-reduce (no MXU
          N=12-padded matmul)
  flatsep seprate read/write on the flat cache: attend over the OLD
          buffer + the new token scored directly, so the DUS result's
          only consumer is the scan carry (in-place eligible)

Run on a QUIET chip (PERFORMANCE.md methodology); interleaved reps.
"""

import sys
import time
import pathlib

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

import numpy as np


def main(argv=()):
    import jax
    import jax.numpy as jnp
    from haloop_tpu.models import gpt as G
    from haloop_tpu.nn.core import linear, layer_norm, embedding, new_gelu
    from haloop_tpu.ops.attention import attend

    smoke = "--smoke" in argv        # tiny shapes: correctness on CPU
    if smoke:
        cfg = G.GPTConfig(block_size=128, vocab_size=256, n_layer=2,
                          n_head=2, n_embd=32)
        T0, NEW, BATCHES = 8, 16, (2,)
    else:
        cfg = G.GPTConfig(block_size=1024, vocab_size=50304, n_layer=12,
                          n_head=12, n_embd=768)
        T0, NEW, BATCHES = 32, 128, (16, 32, 64)
    params = jax.tree.map(
        lambda x: x.astype(jnp.bfloat16)
        if jnp.issubdtype(x.dtype, jnp.floating) else x,
        G.gpt_init(jax.random.PRNGKey(0), cfg))
    S = G.cache_len_for(cfg, T0, NEW)
    nh, hs = cfg.n_head, cfg.n_embd // cfg.n_head

    def qkv_split(p, x, B, T):
        q, k, v = jnp.split(linear(p["attn"]["c_attn"],
                                   layer_norm(p["ln_1"], x)), 3, axis=-1)
        return tuple(a.reshape(B, T, nh, hs).swapaxes(1, 2)
                     for a in (q, k, v))

    def mlp_tail(p, x, a):
        x = x + a
        h = linear(p["mlp"]["c_fc"], layer_norm(p["ln_2"], x))
        return x + linear(p["mlp"]["c_proj"], new_gelu(h))

    def quant_rows(a):
        # per-(B,H,T) absmax over the head dim -> int8 + bf16 scale
        m = jnp.max(jnp.abs(a.astype(jnp.float32)), axis=-1, keepdims=True)
        scale = jnp.maximum(m, 1e-8) / 127.0
        q = jnp.clip(jnp.round(a.astype(jnp.float32) / scale),
                     -127, 127).astype(jnp.int8)
        return q, scale.astype(jnp.bfloat16)

    head_eye = np.repeat(np.eye(nh, dtype=np.float32), hs, axis=0)  # (E,H)

    def make_variant(kind):
        """One (prefill+scan) jitted program with the kind's inner loop."""

        def attn_step_flat(p, past, x, B, T):
            # cache (B, S, E) flat
            qkv = linear(p["attn"]["c_attn"], layer_norm(p["ln_1"], x))
            q, k, v = jnp.split(qkv, 3, axis=-1)        # (B, T, E)
            if kind == "pallas" and T == 1:
                from haloop_tpu.ops.decode_attn import decode_attend_update
                L = past["length"]
                y, pk, pv = decode_attend_update(
                    q[:, 0], k[:, 0], v[:, 0], past["k"], past["v"], L,
                    n_head=nh, interpret=jax.default_backend() != "tpu")
                present = dict(past, k=pk, v=pv, length=L + 1)
                return (linear(p["attn"]["c_proj"], y[:, None]),
                        present)
            if T > 1:
                # prefill (always from the empty cache here): local
                # causal attention; write the flat rows
                L = past["length"]
                pk = jax.lax.dynamic_update_slice(past["k"], k, (0, L, 0))
                pv = jax.lax.dynamic_update_slice(past["v"], v, (0, L, 0))
                qh, kh, vh = (a.reshape(B, T, nh, hs).swapaxes(1, 2)
                              for a in (q, k, v))
                mask = (jnp.arange(T)[:, None]
                        < jnp.arange(T)[None, :])[None, None]
                y, _ = attend(qh, kh, vh, mask=mask)
                y = y.swapaxes(1, 2).reshape(B, T, cfg.n_embd)
                present = dict(past, k=pk, v=pv, length=L + T)
                return linear(p["attn"]["c_proj"], y), present
            L = past["length"]
            total = L + 1
            if kind == "flatsep":
                old_k, old_v = past["k"], past["v"]
                pk = jax.lax.dynamic_update_slice(past["k"], k, (0, L, 0))
                pv = jax.lax.dynamic_update_slice(past["v"], v, (0, L, 0))
                kv_k, kv_v, n_extra = old_k, old_v, 1
            else:
                pk = jax.lax.dynamic_update_slice(past["k"], k, (0, L, 0))
                pv = jax.lax.dynamic_update_slice(past["v"], v, (0, L, 0))
                kv_k, kv_v, n_extra = pk, pv, 0
            if kind == "flatv":
                # scores on the VPU: fused mul + segmented reduce over
                # each head's 64 lanes — reads k once, flat layout
                prod = (kv_k.astype(jnp.float32)
                        * q.astype(jnp.float32))          # (B,S,E)
                s = prod.reshape(B, S, nh, hs).sum(-1)    # (B,S,H)
            else:
                # one masked matmul consuming (B,S,E) directly:
                # qM[b,e,h] = q[b,e] * [e in head h]
                qM = q[:, 0, :, None] * head_eye[None]    # (B,E,H) f32
                s = jnp.einsum("bse,beh->bsh", kv_k, qM.astype(kv_k.dtype),
                               preferred_element_type=jnp.float32)
            s = s / np.sqrt(hs)
            smask = jnp.arange(S)[None, :, None] >= total
            if kind == "flatsep":
                smask = jnp.arange(S)[None, :, None] >= L
            s = jnp.where(smask, -1e30, s)
            if n_extra:
                # the new token attends to itself: score q.k per head
                s_new = (q.astype(jnp.float32)
                         * k.astype(jnp.float32)
                         ).reshape(B, 1, nh, hs).sum(-1) / np.sqrt(hs)
                s = jnp.concatenate([s, s_new], axis=1)   # (B,S+1,H)
            pattn = jax.nn.softmax(s, axis=1)
            p_old = pattn[:, :S].astype(kv_v.dtype)
            pexp = jnp.repeat(p_old, hs, axis=-1)         # (B,S,E)
            y = jnp.einsum("bse,bse->be", kv_v, pexp,
                           preferred_element_type=jnp.float32)
            if n_extra:
                p_new = jnp.repeat(pattn[:, S, :], hs, axis=-1)  # (B,E)
                y = y + (p_new.astype(jnp.float32)
                         * v[:, 0].astype(jnp.float32))
            y = y.astype(v.dtype)[:, None, :]
            present = dict(past, k=pk, v=pv, length=total)
            return linear(p["attn"]["c_proj"], y), present

        def attn_step(p, past, x, B, T):
            if kind.startswith("flat"):
                return attn_step_flat(p, past, x, B, T)
            q, k, v = qkv_split(p, x, B, T)
            L = past["length"]
            if kind == "kv8":
                k8, ks = quant_rows(k)
                v8, vs = quant_rows(v)
                pk = jax.lax.dynamic_update_slice(past["k"], k8,
                                                  (0, 0, L, 0))
                pv = jax.lax.dynamic_update_slice(past["v"], v8,
                                                  (0, 0, L, 0))
                pks = jax.lax.dynamic_update_slice(past["ks"], ks,
                                                   (0, 0, L, 0))
                pvs = jax.lax.dynamic_update_slice(past["vs"], vs,
                                                   (0, 0, L, 0))
                total = L + T
                # scores: (q . k8^T) * ks^T  — scale per key row folds
                # into the score column, keeping the HBM read int8
                qk = jnp.einsum("bhtd,bhsd->bhts", q,
                                pk.astype(jnp.bfloat16),
                                preferred_element_type=jnp.float32)
                qk = qk * pks[..., 0][:, :, None, :] / np.sqrt(hs)
                rows = L + jnp.arange(T)[:, None]
                mask = (jnp.arange(S)[None, :] > rows) | \
                       (jnp.arange(S)[None, :] >= total)
                qk = jnp.where(mask[None, None], -1e30, qk)
                att = jax.nn.softmax(qk, axis=-1)
                # probs * vs folds the v scale row-wise before the
                # int8 v matmul
                att = (att.astype(jnp.bfloat16)
                       * pvs[..., 0][:, :, None, :])
                y = jnp.einsum("bhts,bhsd->bhtd", att,
                               pv.astype(jnp.bfloat16),
                               preferred_element_type=jnp.float32
                               ).astype(jnp.bfloat16)
                present = dict(past, k=pk, v=pv, ks=pks, vs=pvs,
                               length=total)
            elif kind in ("sep", "sep8"):
                # decouple the cache READ from the cache WRITE: attend
                # over the OLD buffer (cols < L) plus the new tokens'
                # k/v scored directly (T x T causal block). The
                # dynamic_update_slice result's ONLY consumer is the
                # scan carry, making it eligible for in-place update —
                # the read-after-write variant forces XLA to copy the
                # whole cache every step (see measurements below).
                if kind == "sep8":
                    k8, ks = quant_rows(k)
                    v8, vs = quant_rows(v)
                    pk = jax.lax.dynamic_update_slice(past["k"], k8,
                                                      (0, 0, L, 0))
                    pv = jax.lax.dynamic_update_slice(past["v"], v8,
                                                      (0, 0, L, 0))
                    pks = jax.lax.dynamic_update_slice(past["ks"], ks,
                                                       (0, 0, L, 0))
                    pvs = jax.lax.dynamic_update_slice(past["vs"], vs,
                                                       (0, 0, L, 0))
                    old_k = (past["k"].astype(jnp.bfloat16)
                             * past["ks"])
                    old_v = (past["v"].astype(jnp.bfloat16)
                             * past["vs"])
                else:
                    pk = jax.lax.dynamic_update_slice(past["k"], k,
                                                      (0, 0, L, 0))
                    pv = jax.lax.dynamic_update_slice(past["v"], v,
                                                      (0, 0, L, 0))
                    old_k, old_v = past["k"], past["v"]
                total = L + T
                s_old = jnp.einsum("bhtd,bhsd->bhts", q, old_k,
                                   preferred_element_type=jnp.float32
                                   ) / np.sqrt(hs)
                s_old = jnp.where(jnp.arange(S)[None, None, None, :] >= L,
                                  -1e30, s_old)
                s_new = jnp.einsum("bhtd,bhsd->bhts", q, k,
                                   preferred_element_type=jnp.float32
                                   ) / np.sqrt(hs)
                s_new = jnp.where(jnp.arange(T)[None, None, :, None]
                                  < jnp.arange(T)[None, None, None, :],
                                  -1e30, s_new)
                att = jax.nn.softmax(
                    jnp.concatenate([s_old, s_new], axis=-1), axis=-1)
                a_old = att[..., :S].astype(old_v.dtype)
                a_new = att[..., S:].astype(v.dtype)
                y = (jnp.einsum("bhts,bhsd->bhtd", a_old, old_v,
                                preferred_element_type=jnp.float32)
                     + jnp.einsum("bhts,bhsd->bhtd", a_new, v,
                                  preferred_element_type=jnp.float32)
                     ).astype(v.dtype)
                if kind == "sep8":
                    present = dict(past, k=pk, v=pv, ks=pks, vs=pvs,
                                   length=total)
                else:
                    present = dict(past, k=pk, v=pv, length=total)
            elif kind == "kT":
                kT = k.swapaxes(-1, -2)          # (B, H, D, T)
                pk = jax.lax.dynamic_update_slice(past["k"], kT,
                                                  (0, 0, 0, L))
                pv = jax.lax.dynamic_update_slice(past["v"], v,
                                                  (0, 0, L, 0))
                total = L + T
                qk = jnp.einsum("bhtd,bhds->bhts", q, pk,
                                preferred_element_type=jnp.float32
                                ) / np.sqrt(hs)
                rows = L + jnp.arange(T)[:, None]
                mask = (jnp.arange(S)[None, :] > rows) | \
                       (jnp.arange(S)[None, :] >= total)
                qk = jnp.where(mask[None, None], -1e30, qk)
                att = jax.nn.softmax(qk, axis=-1)
                y = jnp.einsum("bhts,bhsd->bhtd",
                               att.astype(pv.dtype), pv,
                               preferred_element_type=jnp.float32
                               ).astype(pv.dtype)
                present = dict(past, k=pk, v=pv, length=total)
            else:
                if kind == "noupd":
                    pk, pv = past["k"], past["v"]
                else:
                    pk = jax.lax.dynamic_update_slice(past["k"], k,
                                                      (0, 0, L, 0))
                    pv = jax.lax.dynamic_update_slice(past["v"], v,
                                                      (0, 0, L, 0))
                total = L + T
                if kind == "noattn":
                    y = q
                else:
                    rows = L + jnp.arange(T)[:, None]
                    mask = (jnp.arange(S)[None, :] > rows) | \
                           (jnp.arange(S)[None, :] >= total)
                    y, _ = attend(q, pk, pv, mask=mask[None, None])
                present = dict(past, k=pk, v=pv, length=total)
            B_, T_ = x.shape[:2]
            y = y.swapaxes(1, 2).reshape(B_, T_, cfg.n_embd)
            return linear(p["attn"]["c_proj"], y), present

        def trunk(p, past_list, ids, t0):
            B, T = ids.shape
            x = embedding(p["lm_head"], ids) \
                + embedding(p["transformer"]["wpe"],
                            t0 + jnp.arange(T))[None]
            presents = []
            for blk, past in zip(p["transformer"]["h"], past_list):
                a, present = attn_step(blk, past, x, B, T)
                x = mlp_tail(blk, x, a)
                presents.append(present)
            x = layer_norm(p["transformer"]["ln_f"], x)
            return linear(p["lm_head"], x[:, -1:, :]), presents

        def gen(p, ids):
            B = ids.shape[0]
            dt = jnp.int8 if kind in ("kv8", "sep8") else jnp.bfloat16
            cache = []
            for _ in range(cfg.n_layer):
                if kind.startswith("flat"):
                    kshape = vshape = (B, S, cfg.n_embd)
                elif kind == "kT":
                    kshape, vshape = (B, nh, hs, S), (B, nh, S, hs)
                else:
                    kshape = vshape = (B, nh, S, hs)
                c = {"k": jnp.zeros(kshape, dt),
                     "v": jnp.zeros(vshape, dt),
                     "length": jnp.int32(0)}
                if kind in ("kv8", "sep8"):
                    c["ks"] = jnp.zeros((B, nh, S, 1), jnp.bfloat16)
                    c["vs"] = jnp.zeros((B, nh, S, 1), jnp.bfloat16)
                cache.append(c)
            logits, cache = trunk(p, cache, ids, 0)
            tok = jnp.argmax(logits[:, -1, :], axis=-1)

            def step(carry, _):
                tok, cache = carry
                logits, cache = trunk(p, cache, tok[:, None],
                                      cache[0]["length"])
                return (jnp.argmax(logits[:, -1, :], -1), cache), tok

            (_, _), toks = jax.lax.scan(step, (tok, cache), None,
                                        length=NEW)
            return toks.swapaxes(0, 1)

        return jax.jit(gen)

    @jax.jit
    def base_gen(p, ids):
        return G.generate(p, cfg, ids, max_new_tokens=NEW, top_k=1,
                          stop_token=-1)[0]

    rng = np.random.default_rng(0)
    kinds = ["base", "local", "sep", "sep8", "noupd", "noattn", "kT",
             "kv8", "flat", "flatv", "flatsep", "pallas"]
    for a in argv:
        if a.startswith("--kinds="):
            keep = a.split("=", 1)[1].split(",")
            kinds = ["base"] + [k for k in kinds if k in keep and
                                k != "base"]
    fns = {"base": base_gen}
    fns.update({k: make_variant(k) for k in kinds[1:]})

    for B in BATCHES:
        ids = jnp.asarray(rng.integers(1, cfg.vocab_size - 1, (B, T0)))
        out = {}
        for k in kinds:
            out[k] = np.asarray(fns[k](params, ids))   # compile+warm
        if "local" in out:
            assert (out["local"] == out["base"]).all(), "local != shipped"
        best = {k: float("inf") for k in kinds}
        for _ in range(3):                              # interleaved
            for k in kinds:
                t0 = time.perf_counter()
                np.asarray(fns[k](params, ids))
                best[k] = min(best[k], time.perf_counter() - t0)
        line = " ".join(f"{k}={B * NEW / best[k]:>7.0f}" for k in kinds)
        print(f"B={B:>3} tok/s: {line}", flush=True)
        agree = {k: (out[k] == out["base"]).mean()
                 for k in ("sep", "sep8", "kv8", "flat", "flatv",
                           "flatsep", "pallas") if k in out}
        print(f"      step ms: "
              + " ".join(f"{k}={best[k] / NEW * 1e3:.3f}" for k in kinds)
              + "   greedy-agreement "
              + " ".join(f"{k}={v:.3f}" for k, v in agree.items()),
              flush=True)


if __name__ == "__main__":
    main(sys.argv[1:])
