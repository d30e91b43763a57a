"""Pallas int8-weight matmul: y = (x @ w_q.T) * scale.

Why a kernel: single-stream GPT decode re-reads every weight per token
and is HBM-bandwidth-bound, so int8 weights should run ~2x bf16 — but
expressing the dequant as ``x @ w_q.astype(bf16).T`` in XLA does NOT
deliver it: the convert is loop-invariant inside the decode
``lax.scan``, XLA hoists it and materializes bf16 copies once, and the
per-token HBM traffic is bf16 again (measured 1.02x on GPT-2S decode —
scripts/bench_hat_q8.py). Here the int8 tile is what the DMA streams
from HBM; the VPU converts it in VMEM right before the MXU dot, and
nothing bf16-sized ever exists in HBM.

Inference-only (weight-only quantization has no training story);
no VJP on purpose. Dispatched by nn.core.linear for small-M matmuls
over int8 weights (the decode shape); everything else keeps the XLA
epilogue form, which is exact and fuses fine at large M where the
matmul is MXU-bound anyway.
"""

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from haloop_tpu.ops.ctc_pallas import _interp, _round_up

# decode shapes: beyond this many rows the matmul turns MXU-bound and
# the XLA path (which fuses the convert into large tiled matmuls
# without a per-step HBM penalty outside scans) is the simpler choice
MAX_ROWS = 64


def _kernel(x_ref, w_ref, s_ref, out_ref, acc_ref, *, out_dtype):
    k = pl.program_id(1)

    @pl.when(k == 0)
    def _():
        acc_ref[:] = jnp.zeros_like(acc_ref)

    # the int8 bytes crossed HBM; convert in VMEM, feed the MXU.
    # fp32 operands need explicit HIGHEST precision: Mosaic's default
    # runs fp32 dots as single-pass bf16 (measured 0.8% error on TPU
    # where XLA's own fp32 matmul gives 3e-7); bf16 operands take the
    # native MXU path either way
    w = w_ref[:].astype(x_ref.dtype)                     # (BN, BK)
    prec = jax.lax.Precision.HIGHEST \
        if x_ref.dtype == jnp.float32 else jax.lax.Precision.DEFAULT
    acc_ref[:] += jnp.dot(x_ref[:], w.T, precision=prec,
                          preferred_element_type=jnp.float32)

    @pl.when(k == pl.num_programs(1) - 1)
    def _():
        out_ref[:] = (acc_ref[:] *
                      s_ref[:].astype(jnp.float32)).astype(out_dtype)


def _pick_bk(K):
    """(bk, padded_K): K tiles must be large — a 64 KB DMA per grid
    step starves the pipeline (measured: GPT-2 XL's K=1600 forced
    bk=128 under a divisor-only rule and decode dropped to 0.54x;
    whole-K tiles run 365 GB/s at the 9.8B scale). Whole K when it
    fits VMEM comfortably; otherwise the 128-multiple in [1024, 2048]
    that wastes the least zero-padding."""
    KP = _round_up(K, 128)
    if KP <= 2048:
        return KP, KP
    best = None
    for bk in range(1024, 2049, 128):
        padded = _round_up(KP, bk)
        key = (padded - KP, -bk)
        if best is None or key < best[0]:
            best = (key, bk, padded)
    return best[1], best[2]


def q8_matmul(x, w_q, scale, *, bn=512, interpret=False):
    """x (M, K) bf16/f32, w_q (N, K) int8, scale (N,) fp -> (M, N) in
    x.dtype. Equals ``(x @ w_q.T.astype(f32)) * scale`` at fp32
    accumulation (tests/test_quant.py::test_q8_matmul_kernel)."""
    M, K = x.shape
    N = w_q.shape[0]
    bk, KP = _pick_bk(K)
    MP = _round_up(M, 16)
    NP = _round_up(N, bn)
    if KP != K:
        # pad only the ACTIVATIONS (per-step, tiny). The weights stay
        # unpadded on purpose: a jnp.pad here would be loop-invariant
        # inside decode scans and XLA would hoist a second, padded
        # int8 copy of every unaligned weight into HBM for the whole
        # program (r4 review). Trailing w/scale blocks read out of
        # bounds instead — int8 garbage is finite (no NaN encoding)
        # and meets x's ZERO K-padding, so ragged-K contributions are
        # exactly 0; ragged-N rows land past N and are sliced off.
        # CAVEAT: this leans on Pallas-TPU edge-block semantics that
        # are not a documented contract (verified on jax 0.9.0 /
        # TPU v5e); a Mosaic change to OOB block reads would break
        # unaligned shapes — scripts/q8_tpu_check.py is the
        # compiled-mode ragged-shape parity canary, run it on the
        # chip after any JAX upgrade.
        x = jnp.pad(x, ((0, 0), (0, KP - K)))
    if MP != M:
        x = jnp.pad(x, ((0, MP - M), (0, 0)))
    s2 = scale.astype(jnp.float32)[None, :]              # (1, N)

    grid = (NP // bn, KP // bk)
    out = pl.pallas_call(
        functools.partial(_kernel, out_dtype=x.dtype),
        grid=grid,
        in_specs=[
            pl.BlockSpec((MP, bk), lambda i, k: (0, k),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((bn, bk), lambda i, k: (i, k),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, bn), lambda i, k: (0, i),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((MP, bn), lambda i, k: (0, i),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((MP, NP), x.dtype),
        scratch_shapes=[pltpu.VMEM((MP, bn), jnp.float32)],
        interpret=_interp(interpret),
    )(x, w_q, s2)
    return out[:M, :N]


def wants_kernel(x2, w):
    """Dispatch gate for nn.core.linear: int8 weights, a decode-sized
    row count, TPU kernels on (every K is tileable — _pick_bk pads)."""
    from haloop_tpu.ops.dispatch import use_pallas
    return (w.dtype == jnp.int8 and x2.shape[0] <= MAX_ROWS
            and use_pallas())
