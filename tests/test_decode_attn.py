"""Parity for the fused decode-attention kernel (ops/decode_attn.py).

The kernel is the TPU hot path of gpt._attn's T==1 cached branch
(hat / hat --batch / generate); CPU CI pins its interpret-mode values
against a head-split XLA oracle with identical semantics, and the
model-level incremental-vs-full parity in tests/test_models.py pins the
fallback the kernel must match.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from haloop_tpu.ops.decode_attn import (decode_attend_update,
                                        decode_attend_update_gridded,
                                        decode_attend_reference,
                                        pick_s_block)


@pytest.mark.parametrize("B,S,H,D", [(2, 128, 2, 16), (3, 256, 12, 64),
                                     (1, 128, 4, 32)])
@pytest.mark.parametrize("dtype", [jnp.float32, jnp.bfloat16])
@pytest.mark.parametrize("with_starts", [False, True])
def test_kernel_matches_oracle(B, S, H, D, dtype, with_starts):
    E = H * D
    rng = np.random.default_rng(hash((B, S, H, with_starts)) % 2**32)
    q, kn, vn = (jnp.asarray(rng.standard_normal((B, E)), dtype)
                 for _ in range(3))
    kc, vc = (jnp.asarray(rng.standard_normal((B, S, E)), dtype)
              for _ in range(2))
    L = jnp.int32(S // 2 + 3)
    starts = (jnp.asarray(rng.integers(0, 5, (B,)), jnp.int32)
              if with_starts else None)

    y0, k0, v0 = decode_attend_reference(q, kn, vn, kc, vc, L, starts,
                                         n_head=H)
    y1, k1, v1 = decode_attend_update(q, kn, vn, kc, vc, L, starts,
                                      n_head=H, interpret=True)
    # caches: bit-identical (row write, no arithmetic)
    np.testing.assert_array_equal(np.asarray(k0), np.asarray(k1))
    np.testing.assert_array_equal(np.asarray(v0), np.asarray(v1))
    tol = 1e-5 if dtype == jnp.float32 else 2e-2
    np.testing.assert_allclose(np.asarray(y0, np.float32),
                               np.asarray(y1, np.float32),
                               rtol=tol, atol=tol)


@pytest.mark.parametrize("S,block_s", [(256, 128), (512, 128),
                                       (512, 256)])
@pytest.mark.parametrize("dtype", [jnp.float32, jnp.bfloat16])
@pytest.mark.parametrize("L", ["first", "boundary", "mid", "last"])
def test_gridded_matches_oracle(S, block_s, dtype, L):
    # the online-softmax variant for caches too large for one VMEM
    # block; L placements cover the new row landing in the first block,
    # exactly on a block boundary, mid-stream, and in the last block
    B, H, D = 2, 4, 32
    E = H * D
    rng = np.random.default_rng(hash((S, block_s, L)) % 2**32)
    q, kn, vn = (jnp.asarray(rng.standard_normal((B, E)), dtype)
                 for _ in range(3))
    kc, vc = (jnp.asarray(rng.standard_normal((B, S, E)), dtype)
              for _ in range(2))
    length = jnp.int32({"first": 3, "boundary": block_s,
                        "mid": S // 2 + 5, "last": S - 1}[L])
    starts = jnp.asarray(rng.integers(0, 3, (B,)), jnp.int32)

    y0, k0, v0 = decode_attend_reference(q, kn, vn, kc, vc, length,
                                         starts, n_head=H)
    y1, k1, v1 = decode_attend_update_gridded(
        q, kn, vn, kc, vc, length, starts, n_head=H, block_s=block_s,
        interpret=True)
    np.testing.assert_array_equal(np.asarray(k0), np.asarray(k1))
    np.testing.assert_array_equal(np.asarray(v0), np.asarray(v1))
    tol = 1e-5 if dtype == jnp.float32 else 2e-2
    np.testing.assert_allclose(np.asarray(y0, np.float32),
                               np.asarray(y1, np.float32),
                               rtol=tol, atol=tol)


def test_gridded_fully_masked_leading_blocks():
    # starts beyond the first block(s): those blocks are entirely
    # invalid — the finite _NEG masking must leave no NaN/garbage in
    # the online accumulation once a real block arrives
    B, S, H, D, block_s = 2, 512, 4, 32, 128
    E = H * D
    rng = np.random.default_rng(7)
    q, kn, vn = (jnp.asarray(rng.standard_normal((B, E)), jnp.float32)
                 for _ in range(3))
    kc, vc = (jnp.asarray(rng.standard_normal((B, S, E)), jnp.float32)
              for _ in range(2))
    length = jnp.int32(S - 2)
    starts = jnp.asarray([3 * block_s + 1, 2 * block_s], jnp.int32)

    y0, _, _ = decode_attend_reference(q, kn, vn, kc, vc, length,
                                       starts, n_head=H)
    y1, _, _ = decode_attend_update_gridded(
        q, kn, vn, kc, vc, length, starts, n_head=H, block_s=block_s,
        interpret=True)
    assert np.isfinite(np.asarray(y1, np.float32)).all()
    np.testing.assert_allclose(np.asarray(y0, np.float32),
                               np.asarray(y1, np.float32),
                               rtol=1e-5, atol=1e-5)


def test_gridded_under_scan_matches_single_block():
    # serving shape: both kernels stepped under a lax.scan over the
    # same stream must produce identical caches and matching outputs
    B, S, H, D, block_s, steps = 2, 256, 4, 16, 128, 6
    E = H * D
    rng = np.random.default_rng(11)
    qs, ks, vs = (jnp.asarray(rng.standard_normal((steps, B, E)),
                              jnp.float32) for _ in range(3))
    kc = vc = jnp.zeros((B, S, E), jnp.float32)

    def make_step(fn, **kw):
        def step(carry, inp):
            kc, vc, L = carry
            y, kc, vc = fn(*inp, kc, vc, L, interpret=True, n_head=H,
                           **kw)
            return (kc, vc, L + 1), y
        return step

    (k1, v1, _), ys1 = jax.lax.scan(
        make_step(decode_attend_update), (kc, vc, jnp.int32(0)),
        (qs, ks, vs))
    (k2, v2, _), ys2 = jax.lax.scan(
        make_step(decode_attend_update_gridded, block_s=block_s),
        (kc, vc, jnp.int32(0)), (qs, ks, vs))
    np.testing.assert_array_equal(np.asarray(k1), np.asarray(k2))
    np.testing.assert_array_equal(np.asarray(v1), np.asarray(v2))
    np.testing.assert_allclose(np.asarray(ys1), np.asarray(ys2),
                               rtol=1e-5, atol=1e-5)


def test_pick_s_block():
    # GPT-2S bf16: whole-cache blocks fit until the budget, then 128s
    assert pick_s_block(4096, 768, 2) == 1024   # 2*1024*768*2 = 3 MiB
    assert pick_s_block(4096, 4096, 2) == 256   # big-E model
    assert pick_s_block(160, 768, 2) is None    # no pow2 divisor
    assert pick_s_block(2048, 768, 2) == 1024


def test_kernel_first_token_empty_cache():
    # L = 0: only the just-written row is attended -> y == v_new
    B, S, H, D = 2, 128, 2, 32
    E = H * D
    rng = np.random.default_rng(0)
    q, kn, vn = (jnp.asarray(rng.standard_normal((B, E)), jnp.float32)
                 for _ in range(3))
    kc = vc = jnp.zeros((B, S, E), jnp.float32)
    y, _, _ = decode_attend_update(q, kn, vn, kc, vc, jnp.int32(0),
                                   n_head=H, interpret=True)
    np.testing.assert_allclose(np.asarray(y), np.asarray(vn),
                               rtol=1e-6, atol=1e-6)


def test_kernel_under_scan_carry():
    # the serving shape: cache as a lax.scan carry, kernel each step —
    # must equal feeding the steps through the oracle
    B, S, H, D, steps = 2, 64, 4, 16, 5
    E = H * D
    rng = np.random.default_rng(1)
    qs, ks, vs = (jnp.asarray(rng.standard_normal((steps, B, E)),
                              jnp.float32) for _ in range(3))
    kc = vc = jnp.zeros((B, S, E), jnp.float32)

    def step_kernel(carry, inp):
        kc, vc, L = carry
        q, kn, vn = inp
        y, kc, vc = decode_attend_update(q, kn, vn, kc, vc, L,
                                         n_head=H, interpret=True)
        return (kc, vc, L + 1), y

    (_, _, _), ys = jax.lax.scan(step_kernel, (kc, vc, jnp.int32(0)),
                                 (qs, ks, vs))

    kc2, vc2, L = kc, vc, jnp.int32(0)
    for t in range(steps):
        y0, kc2, vc2 = decode_attend_reference(qs[t], ks[t], vs[t],
                                               kc2, vc2, L, n_head=H)
        np.testing.assert_allclose(np.asarray(ys[t]), np.asarray(y0),
                                   rtol=1e-5, atol=1e-5)
        L = L + 1
