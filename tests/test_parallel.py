"""Parallelism tests on the 8-virtual-device CPU mesh: data/tensor
shardings, sequence-parallel constraints, and the GPipe pipeline."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from haloop_tpu.models import gpt as G
from haloop_tpu.parallel.tensor import gpt_param_spec
from haloop_tpu.parallel.pipeline import pipeline_gpt_loss


def need_devices(n):
    if len(jax.devices()) < n:
        pytest.skip(f"needs {n} devices")


def _tiny(n_layer=2):
    cfg = G.GPTConfig(block_size=16, vocab_size=32, n_layer=n_layer,
                      n_head=2, n_embd=16)
    return cfg, G.gpt_init(jax.random.PRNGKey(0), cfg)


def test_tensor_parallel_matches_single_device():
    need_devices(4)
    cfg, params = _tiny()
    rng = np.random.default_rng(0)
    ids = jnp.asarray(rng.integers(1, 32, (4, 16)))
    tgt = jnp.asarray(rng.integers(1, 32, (4, 16)))
    ref = float(G.forward_all(params, cfg, ids, tgt))

    mesh = Mesh(np.array(jax.devices()[:4]).reshape(2, 2),
                ("data", "model"))
    pspecs = gpt_param_spec(params)
    shard = jax.tree.map(
        lambda x, s: jax.device_put(x, NamedSharding(mesh, s)),
        params, pspecs)
    xb = jax.device_put(ids, NamedSharding(mesh, P("data", None)))
    yb = jax.device_put(tgt, NamedSharding(mesh, P("data", None)))
    with mesh:
        loss = float(jax.jit(
            lambda p, x, y: G.forward_all(p, cfg, x, y))(shard, xb, yb))
    np.testing.assert_allclose(loss, ref, rtol=1e-5)


def test_pipeline_matches_single_device():
    need_devices(4)
    cfg, params = _tiny(n_layer=4)
    rng = np.random.default_rng(1)
    ids = jnp.asarray(rng.integers(1, 32, (8, 16)))
    tgt = jnp.asarray(rng.integers(1, 32, (8, 16)))
    ref_loss = float(G.forward_all(params, cfg, ids, tgt))
    ref_grad = jax.grad(lambda p: G.forward_all(p, cfg, ids, tgt))(params)

    mesh = Mesh(np.array(jax.devices()[:4]), ("pipe",))
    with mesh:
        loss, grads = jax.jit(jax.value_and_grad(
            lambda p: pipeline_gpt_loss(p, cfg, mesh, ids, tgt,
                                        n_micro=4)))(params)
    np.testing.assert_allclose(float(loss), ref_loss, rtol=1e-5)
    for a, b in zip(jax.tree.leaves(grads), jax.tree.leaves(ref_grad)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-4, atol=1e-5)


def test_sequence_parallel_constraint():
    need_devices(4)
    cfg, params = _tiny()
    rng = np.random.default_rng(2)
    ids = jnp.asarray(rng.integers(1, 32, (4, 16)))
    tgt = jnp.asarray(rng.integers(1, 32, (4, 16)))
    ref = float(G.forward_all(params, cfg, ids, tgt))
    mesh = Mesh(np.array(jax.devices()[:4]).reshape(2, 2),
                ("data", "model"))
    with mesh:
        loss = float(jax.jit(lambda p: G.forward_all(
            p, cfg, ids, tgt,
            activation_spec=P("data", "model", None)))(params))
    np.testing.assert_allclose(loss, ref, rtol=1e-5)


def test_hac_data_parallel_matches_single_device():
    """hac's System with the batch sharded over an 8-device 'data' mesh
    produces the same loss and updated params as single-device
    (VERDICT r1 item 2: the flagship trainer must shard its batch)."""
    need_devices(8)
    from haloop_tpu.data import make_dataset
    from haloop_tpu.dataloader import Collator
    from haloop_tpu.init import create_model
    from haloop_tpu.loop import System, make_parser
    from haloop_tpu.parallel import data_mesh
    from haloop_tpu.symbol_tape import make_vocab

    args = make_parser().parse_args(
        ['--arch', 'lstm-tiny:512', '--vocab', '512', '--dtype', 'float32'])
    vocab = make_vocab('512')
    spec = create_model(args.arch)
    params0 = spec.init(jax.random.PRNGKey(0))

    ds = make_dataset('head:sinusoids0')
    batch = Collator(vocab)([ds[i] for i in range(8)])
    _, inputs, ct, il, tl = batch

    results = []
    for mesh in (None, data_mesh()):
        system = System(args, spec,
                        jax.tree.map(jnp.copy, params0), vocab, mesh=mesh)
        sharded = system.shard(inputs, ct, il, tl)
        if mesh is not None:
            assert sharded[0].sharding.spec == P('data')

        # deterministic forward (no dropout): sharded == single exactly
        eval_loss, _, _ = system._eval_forward(
            system.params, *sharded, jax.random.PRNGKey(9), train=False)
        for step in range(3):
            (system.params, system.opt_state, loss, gn, bad) = \
                system._train_step(system.params, system.opt_state,
                                   *sharded, jax.random.PRNGKey(step),
                                   jnp.int32(step))
        results.append((float(eval_loss), float(loss),
                        jax.tree.map(np.asarray, system.params)))

    (ev_a, loss_a, params_a), (ev_b, loss_b, params_b) = results
    np.testing.assert_allclose(ev_a, ev_b, rtol=1e-5)
    # the train step draws per-shard dropout keys inside shard_map (the
    # reference's per-rank seeds, ha/attention_loop.py:75), so the DP
    # run matches single-device only up to dropout-mask noise
    np.testing.assert_allclose(loss_a, loss_b, rtol=1e-2)
    for a, b in zip(jax.tree.leaves(params_a), jax.tree.leaves(params_b)):
        np.testing.assert_allclose(a, b, rtol=2e-2, atol=2e-3)


def test_hac_data_parallel_exact_parity_no_dropout():
    """Dropout-free variant of the DP parity test: with every dropout
    layer forced off, the shard_map step must match single-device to
    float tolerance — per-shard dropout keys are the ONLY intended
    divergence, so this catches real gradient-averaging or shard_map
    regressions the loose-tolerance test above would mask (ADVICE r2)."""
    need_devices(8)
    from haloop_tpu.data import make_dataset
    from haloop_tpu.dataloader import Collator
    from haloop_tpu.init import create_model
    from haloop_tpu.loop import System, make_parser
    from haloop_tpu.nn.core import no_dropout
    from haloop_tpu.parallel import data_mesh
    from haloop_tpu.symbol_tape import make_vocab

    args = make_parser().parse_args(
        ['--arch', 'lstm-tiny:512', '--vocab', '512', '--dtype', 'float32'])
    vocab = make_vocab('512')
    spec = create_model(args.arch)
    params0 = spec.init(jax.random.PRNGKey(0))

    ds = make_dataset('head:sinusoids0')
    _, inputs, ct, il, tl = Collator(vocab)([ds[i] for i in range(8)])

    results = []
    with no_dropout():
        for mesh in (None, data_mesh()):
            system = System(args, spec,
                            jax.tree.map(jnp.copy, params0), vocab,
                            mesh=mesh)
            sharded = system.shard(inputs, ct, il, tl)
            for step in range(3):
                (system.params, system.opt_state, loss, gn, bad) = \
                    system._train_step(system.params, system.opt_state,
                                       *sharded, jax.random.PRNGKey(step),
                                       jnp.int32(step))
            results.append((float(loss),
                            jax.tree.map(np.asarray, system.params)))

    (loss_a, params_a), (loss_b, params_b) = results
    np.testing.assert_allclose(loss_a, loss_b, rtol=1e-5)
    for a, b in zip(jax.tree.leaves(params_a), jax.tree.leaves(params_b)):
        np.testing.assert_allclose(a, b, rtol=1e-5, atol=1e-6)


def test_sharded_checkpoint_roundtrip(tmp_path):
    """orbax sharded save/restore of TP-sharded GPT params + opt state
    over the 8-device mesh: values and shardings both round-trip
    (VERDICT r1 item 9)."""
    need_devices(8)
    import optax
    from haloop_tpu.checkpoint import (load_checkpoint,
                                       load_checkpoint_sharded,
                                       save_checkpoint_sharded)
    from haloop_tpu.optim import decay_mask

    cfg, params = _tiny()
    mesh = Mesh(np.array(jax.devices()[:8]).reshape(4, 2),
                ("data", "model"))
    pspecs = gpt_param_spec(params)
    params = jax.tree.map(
        lambda x, s: jax.device_put(x, NamedSharding(mesh, s)),
        params, pspecs)
    tx = optax.adamw(1e-3, mask=decay_mask)
    opt_state = tx.init(params)

    path = tmp_path / "step-7"
    save_checkpoint_sharded(path, {"model": params, "optimizer": opt_state,
                                   "iter_num": 7})

    restored = load_checkpoint_sharded(
        path, template={"model": params, "optimizer": opt_state,
                        "iter_num": 7})
    assert restored["iter_num"] == 7
    for a, b in zip(jax.tree.leaves(params),
                    jax.tree.leaves(restored["model"])):
        assert a.sharding == b.sharding, (a.sharding, b.sharding)
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    for a, b in zip(jax.tree.leaves(opt_state),
                    jax.tree.leaves(restored["optimizer"])):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    # load_checkpoint dispatches on the directory; template-less
    # restores land as host numpy (topology-independent)
    again = load_checkpoint(path)
    assert again["iter_num"] == 7
    leaf = jax.tree.leaves(again["model"])[0]
    assert isinstance(leaf, np.ndarray)


def _hac_system(mesh, extra_args=(), batch=8):
    from haloop_tpu.data import make_dataset
    from haloop_tpu.dataloader import Collator
    from haloop_tpu.init import create_model
    from haloop_tpu.loop import System, make_parser
    from haloop_tpu.symbol_tape import make_vocab

    args = make_parser().parse_args(
        ['--arch', 'lstm-tiny:512', '--vocab', '512', '--dtype', 'float32']
        + list(extra_args))
    vocab = make_vocab('512')
    spec = create_model(args.arch)
    params = spec.init(jax.random.PRNGKey(0))
    system = System(args, spec, jax.tree.map(jnp.copy, params), vocab,
                    mesh=mesh)
    ds = make_dataset('head:sinusoids0')
    batch = Collator(vocab)([ds[i] for i in range(batch)])
    return system, batch


def test_hac_accumulate_matches_single_device():
    """--accumulate>1 now runs its micro-grads through the same
    shard_map-with-force_local pattern as the fused step; dropout-free,
    the accumulated update must match single-device to float tolerance
    (VERDICT r2 item 2)."""
    need_devices(8)
    from haloop_tpu.nn.core import no_dropout
    from haloop_tpu.parallel import data_mesh

    results = []
    with no_dropout():
        for mesh in (None, data_mesh()):
            system, (_, inputs, ct, il, tl) = _hac_system(
                mesh, ['--accumulate', '2'])
            sharded = system.shard(inputs, ct, il, tl)
            acc = None
            for micro in range(2):
                loss, grads = system._micro_grads(
                    *sharded, jax.random.PRNGKey(micro))
                acc = grads if acc is None else jax.tree.map(
                    jnp.add, acc, grads)
            (system.params, system.opt_state, gn, bad) = \
                system._apply_grads(system.params, system.opt_state, acc)
            assert not bool(bad)
            results.append((float(loss), float(gn),
                            jax.tree.map(np.asarray, system.params)))

    (loss_a, gn_a, params_a), (loss_b, gn_b, params_b) = results
    np.testing.assert_allclose(loss_a, loss_b, rtol=1e-5)
    np.testing.assert_allclose(gn_a, gn_b, rtol=1e-5)
    for a, b in zip(jax.tree.leaves(params_a), jax.tree.leaves(params_b)):
        np.testing.assert_allclose(a, b, rtol=1e-5, atol=1e-6)


def test_hac_apply_grads_nan_gate():
    """A finite loss with non-finite accumulated grads must leave params
    untouched (the reference skips on grad_norm, ha/loop.py:185-189;
    r2 applied updates unconditionally on the accumulate path)."""
    system, _ = _hac_system(None)
    before = jax.tree.map(np.asarray, system.params)
    poisoned = jax.tree.map(lambda x: jnp.full_like(x, jnp.inf),
                            system.params)
    (system.params, system.opt_state, gn, bad) = system._apply_grads(
        system.params, system.opt_state, poisoned)
    assert bool(bad) and not np.isfinite(float(gn))
    for a, b in zip(jax.tree.leaves(before),
                    jax.tree.leaves(system.params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_hac_ragged_tail_on_mesh():
    """A batch that doesn't divide the mesh must fall back to the
    replicated step/decode and still train+evaluate (VERDICT r2 item 2:
    the ragged fallback was untested)."""
    need_devices(8)
    from haloop_tpu.parallel import data_mesh

    system, (_, inputs, ct, il, tl) = _hac_system(data_mesh(), batch=6)
    sharded = system.shard(inputs, ct, il, tl)
    assert sharded[0] is inputs            # 6 % 8 != 0: no-op shard
    (system.params, system.opt_state, loss, gn, bad) = \
        system._train_step_ragged(system.params, system.opt_state,
                                  *sharded, jax.random.PRNGKey(0),
                                  jnp.int32(0))
    assert np.isfinite(float(loss))
    out = system._run_eval_forward(*sharded, jax.random.PRNGKey(1),
                                   train=False)
    assert np.isfinite(float(out[0]))


def test_hac_beam_decode_on_mesh(capsys):
    """CTC prefix beam search under the data mesh: the sharded decode
    path must produce the full TSV contract (hyp/ref/ali/stat rows)."""
    need_devices(8)
    from haloop_tpu.dataloader import DataLoader, Collator
    from haloop_tpu.data import make_dataset
    from haloop_tpu.parallel import data_mesh
    from haloop_tpu.symbol_tape import make_vocab

    system, _ = _hac_system(data_mesh(), ['--beam', '4'])
    vocab = make_vocab('512')
    loader = DataLoader(make_dataset('head:sinusoids0'), Collator(vocab),
                        batch_size=8)
    loss = system.evaluate(0, loader, tag='valid')
    out = capsys.readouterr().out
    assert np.isfinite(loss)
    for tag in ('\thyp0\t', '\tref\t', '\tali0\t', '\tstat0\t'):
        assert tag in out, tag


def test_ring_attention_matches_single_device():
    """Sequence-parallel ring attention over the 8-device mesh equals
    single-device flash/attend at fp32 tolerance, with and without
    kv_lengths padding masks, and differentiates (VERDICT r3 item 8)."""
    need_devices(8)
    from haloop_tpu.ops.attention import attend
    from haloop_tpu.ops.flash import flash_attention
    from haloop_tpu.parallel.ring import ring_self_attention

    B, H, T, D = 2, 2, 512, 32
    rng = np.random.default_rng(0)
    q = jnp.asarray(rng.normal(size=(B, H, T, D)), jnp.float32)
    k = jnp.asarray(rng.normal(size=(B, H, T, D)), jnp.float32)
    v = jnp.asarray(rng.normal(size=(B, H, T, D)), jnp.float32)
    lens = jnp.asarray([T, T - 200], jnp.int32)

    mesh = Mesh(np.array(jax.devices()[:8]), ("data",))
    seq_sh = NamedSharding(mesh, P(None, None, "data", None))
    qs, ks, vs = (jax.device_put(x, seq_sh) for x in (q, k, v))

    # no mask
    with mesh:
        out = jax.jit(lambda q, k, v: ring_self_attention(
            mesh, q, k, v))(qs, ks, vs)
    ref, _ = attend(q, k, v)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=2e-5, atol=2e-5)

    # kv_lengths padding mask: vs the flash kernel's masking semantics
    with mesh:
        out_m = jax.jit(lambda q, k, v, l: ring_self_attention(
            mesh, q, k, v, kv_lengths=l))(qs, ks, vs, lens)
    ref_m = flash_attention(q, k, v, kv_lengths=lens, interpret=True)
    np.testing.assert_allclose(np.asarray(out_m), np.asarray(ref_m),
                               rtol=2e-5, atol=2e-5)

    # gradients flow through the ring (scan + ppermute transpose)
    def loss(q):
        return jnp.sum(ring_self_attention(mesh, q, ks, vs) ** 2)

    def ref_loss(q):
        return jnp.sum(attend(q, k, v)[0] ** 2)

    with mesh:
        g = jax.jit(jax.grad(loss))(qs)
    g_ref = jax.grad(ref_loss)(q)
    np.testing.assert_allclose(np.asarray(g), np.asarray(g_ref),
                               rtol=1e-4, atol=1e-4)


def test_ring_attention_zero_length_rows_are_zero():
    """kv_length 0 must produce ZERO output rows — with a finite NEG
    mask value, exp(NEG - NEG) == 1 and a fully-masked row would
    otherwise return the mean of V (caught by the r4 review)."""
    need_devices(8)
    from haloop_tpu.parallel.ring import ring_self_attention

    B, H, T, D = 2, 2, 64, 16
    rng = np.random.default_rng(3)
    q, k, v = (jnp.asarray(rng.normal(size=(B, H, T, D)), jnp.float32)
               for _ in range(3))
    lens = jnp.asarray([0, T], jnp.int32)
    mesh = Mesh(np.array(jax.devices()[:8]), ("data",))
    with mesh:
        out = jax.jit(lambda q, k, v, l: ring_self_attention(
            mesh, q, k, v, kv_lengths=l))(q, k, v, lens)
    out = np.asarray(out)
    assert (out[0] == 0.0).all()
    assert np.abs(out[1]).sum() > 0


def test_ring_attention_causal():
    """Causal ring attention (global-position masking; the diagonal
    chunk arrives first, so the running max is finite from step 0)
    equals single-device causal attention."""
    need_devices(8)
    from haloop_tpu.ops.attention import mha
    from haloop_tpu.parallel.ring import ring_self_attention

    B, H, T, D = 2, 2, 256, 16
    rng = np.random.default_rng(1)
    q = jnp.asarray(rng.normal(size=(B, H, T, D)), jnp.float32)
    k = jnp.asarray(rng.normal(size=(B, H, T, D)), jnp.float32)
    v = jnp.asarray(rng.normal(size=(B, H, T, D)), jnp.float32)

    mesh = Mesh(np.array(jax.devices()[:8]), ("data",))
    seq_sh = NamedSharding(mesh, P(None, None, "data", None))
    qs, ks, vs = (jax.device_put(x, seq_sh) for x in (q, k, v))
    with mesh:
        out = jax.jit(lambda q, k, v: ring_self_attention(
            mesh, q, k, v, causal=True))(qs, ks, vs)
    ref, _ = mha(q, k, v, causal=True, use_flash="never")
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=2e-5, atol=2e-5)

    # grads through the causal masks + ppermute transpose
    def loss(q):
        return jnp.sum(ring_self_attention(mesh, q, ks, vs,
                                            causal=True) ** 2)

    def ref_loss(q):
        return jnp.sum(mha(q, k, v, causal=True, use_flash="never")[0]
                       ** 2)

    with mesh:
        g = jax.jit(jax.grad(loss))(qs)
    g_ref = jax.grad(ref_loss)(q)
    np.testing.assert_allclose(np.asarray(g), np.asarray(g_ref),
                               rtol=1e-4, atol=1e-4)


@pytest.mark.parametrize("rotary", [0, 8], ids=["wpe", "rotary"])
def test_forward_all_seq_ring_matches_single_device(rotary):
    """GPT forward_all under sequence sharding (seq_ring + global
    positions, the hala --sequence-parallel compute path) equals the
    unsharded loss — values AND parameter grads (psum over 'seq')."""
    need_devices(8)
    from jax import shard_map

    cfg = G.GPTConfig(block_size=64, vocab_size=32, n_layer=2, n_head=2,
                      n_embd=16, rotary_emb_dim=rotary,
                      stable_embedding=bool(rotary))
    params = G.gpt_init(jax.random.PRNGKey(0), cfg)
    rng = np.random.default_rng(2)
    ids = jnp.asarray(rng.integers(1, 32, (4, 64)))
    tgt = jnp.asarray(rng.integers(1, 32, (4, 64)))

    def ref_loss(p):
        return G.forward_all(p, cfg, ids, tgt)

    n = 8
    mesh = Mesh(np.array(jax.devices()[:n]), ("seq",))

    def local_loss(p, x, y):
        Tc = x.shape[-1]
        pos = jax.lax.axis_index("seq") * Tc + jnp.arange(Tc)
        nll = G.forward_all(p, cfg, x, y, reduction="none",
                            positions=pos, seq_ring=("seq", n))
        s = jax.lax.psum(jnp.sum(nll), "seq")
        c = jax.lax.psum(jnp.sum(y != 0), "seq")
        return s / jnp.maximum(c, 1)

    S = P(None, "seq")
    sharded = shard_map(local_loss, mesh=mesh, in_specs=(P(), S, S),
                        out_specs=P(), check_vma=False)
    loss = float(jax.jit(sharded)(params, ids, tgt))
    np.testing.assert_allclose(loss, float(ref_loss(params)), rtol=1e-5)

    def sp_loss(p):
        return sharded(p, ids, tgt)

    # differentiating THROUGH the shard_map: the transpose of the
    # replicated (P()) param input psums each shard's partial cotangent,
    # so the grads must equal the dense single-device grads
    g_sp = jax.jit(jax.grad(sp_loss))(params)
    g_ref = jax.grad(ref_loss)(params)
    for a, b in zip(jax.tree.leaves(g_sp), jax.tree.leaves(g_ref)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=5e-4, atol=5e-5)


def test_forward_all_tp_sp_composed_matches_single_device():
    """Composed tensor x sequence parallelism (the hala
    --tensor-parallel N --sequence-parallel M mode): params Megatron-
    sharded over 'model' under GSPMD while attention runs the KV ring
    inside a PARTIAL-MANUAL shard_map over 'seq' only
    (gpt._attn seq_ring_spmd). Loss AND param grads must match the
    plain single-device forward — the ring's ppermute transpose routes
    cross-shard KV cotangents home and GSPMD places every 'model'
    collective."""
    need_devices(8)
    cfg, params = _tiny()
    rng = np.random.default_rng(7)
    ids = jnp.asarray(rng.integers(1, 32, (4, 16)))
    tgt = jnp.asarray(rng.integers(1, 32, (4, 16)))
    ref = float(G.forward_all(params, cfg, ids, tgt))
    gref = jax.grad(lambda p: G.forward_all(p, cfg, ids, tgt))(params)

    mesh = Mesh(np.array(jax.devices()).reshape(2, 2, 2),
                ("data", "model", "seq"))
    pspecs = gpt_param_spec(params)
    shard = jax.tree.map(
        lambda x, s: jax.device_put(x, NamedSharding(mesh, s)),
        params, pspecs)
    xb = jax.device_put(ids, NamedSharding(mesh, P("data", "seq")))
    yb = jax.device_put(tgt, NamedSharding(mesh, P("data", "seq")))

    def loss_fn(p, x, y):
        return G.forward_all(p, cfg, x, y,
                             seq_ring_spmd=(mesh, "seq", 2))

    loss, grads = jax.jit(jax.value_and_grad(loss_fn))(shard, xb, yb)
    np.testing.assert_allclose(float(loss), ref, rtol=1e-5)
    flat_ref = jax.tree.leaves(gref)
    flat_got = jax.tree.leaves(grads)
    for a, b in zip(flat_ref, flat_got):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a),
                                   rtol=2e-4, atol=2e-6)


def test_ring_attention_striped_causal():
    """Zigzag/striped causal ring (parallel/ring.py): device i holds
    global stripes (i, 2n-1-i) so fully-masked future blocks are
    SKIPPED instead of computed — must equal single-device causal
    attention (values AND grads) after undoing the stripe permutation,
    at several ring sizes including the n=1 degenerate."""
    need_devices(8)
    from jax import shard_map
    from haloop_tpu.ops.attention import mha
    from haloop_tpu.parallel.ring import (ring_attend_local_striped,
                                          striped_permutation)

    B, H, D = 2, 2, 16
    rng = np.random.default_rng(5)
    for n, T in [(8, 256), (4, 64), (2, 32), (1, 16)]:
        q, k, v = (jnp.asarray(rng.normal(size=(B, H, T, D)),
                               jnp.float32) for _ in range(3))
        ref, _ = mha(q, k, v, causal=True, use_flash="never")
        perm = striped_permutation(T, n)
        inv = np.argsort(perm)
        mesh = Mesh(np.array(jax.devices()[:n]), ("seq",))
        spec = P(None, None, "seq", None)
        fn = shard_map(
            lambda ql, kl, vl: ring_attend_local_striped(
                ql, kl, vl, axis="seq", n=n),
            mesh=mesh, in_specs=(spec,) * 3, out_specs=spec,
            check_vma=False)
        out = jax.jit(fn)(q[:, :, perm], k[:, :, perm], v[:, :, perm])
        np.testing.assert_allclose(np.asarray(out[:, :, inv]),
                                   np.asarray(ref),
                                   rtol=2e-5, atol=2e-5)

        g = jax.jit(jax.grad(
            lambda ql: jnp.sum(fn(ql, k[:, :, perm],
                                  v[:, :, perm]) ** 2)))(q[:, :, perm])
        g_ref = jax.grad(
            lambda q: jnp.sum(mha(q, k, v, causal=True,
                                  use_flash="never")[0] ** 2))(q)
        np.testing.assert_allclose(np.asarray(g[:, :, inv]),
                                   np.asarray(g_ref),
                                   rtol=1e-4, atol=1e-4)


@pytest.mark.parametrize("rotary", [0, 8], ids=["wpe", "rotary"])
def test_forward_all_striped_ring_matches_single_device(rotary):
    """GPT forward_all under the STRIPED sequence sharding (permuted
    token stream + striped global positions — the hala
    --ring-schedule striped compute path) equals the unsharded loss,
    values AND param grads, for wpe and rotary position codes."""
    need_devices(8)
    from jax import shard_map
    from haloop_tpu.parallel.ring import (striped_permutation,
                                          striped_positions)

    cfg = G.GPTConfig(block_size=64, vocab_size=32, n_layer=2, n_head=2,
                      n_embd=16, rotary_emb_dim=rotary,
                      stable_embedding=bool(rotary))
    params = G.gpt_init(jax.random.PRNGKey(0), cfg)
    rng = np.random.default_rng(6)
    ids = jnp.asarray(rng.integers(1, 32, (4, 64)))
    tgt = jnp.asarray(rng.integers(1, 32, (4, 64)))

    def ref_loss(p):
        return G.forward_all(p, cfg, ids, tgt)

    n = 8
    perm = striped_permutation(64, n)
    ids_s, tgt_s = ids[:, perm], tgt[:, perm]
    mesh = Mesh(np.array(jax.devices()[:n]), ("seq",))

    def local_loss(p, x, y):
        Tc = x.shape[-1]
        pos = striped_positions("seq", Tc, n)
        nll = G.forward_all(p, cfg, x, y, reduction="none",
                            positions=pos,
                            seq_ring=("seq", n, "striped"))
        s = jax.lax.psum(jnp.sum(nll), "seq")
        c = jax.lax.psum(jnp.sum(y != 0), "seq")
        return s / jnp.maximum(c, 1)

    S = P(None, "seq")
    sharded = shard_map(local_loss, mesh=mesh, in_specs=(P(), S, S),
                        out_specs=P(), check_vma=False)
    loss = float(jax.jit(sharded)(params, ids_s, tgt_s))
    np.testing.assert_allclose(loss, float(ref_loss(params)), rtol=1e-5)

    g_sp = jax.jit(jax.grad(lambda p: sharded(p, ids_s, tgt_s)))(params)
    g_ref = jax.grad(ref_loss)(params)
    for a, b in zip(jax.tree.leaves(g_sp), jax.tree.leaves(g_ref)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=5e-4, atol=5e-5)
