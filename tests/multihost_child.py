"""Child process for the virtual multi-host tests
(tests/test_multihost.py). Launched JAX_NUM_PROCESSES times (2x4dev and
4x2dev configs); exercises the REAL multi-host code paths:
maybe_init_distributed env rendezvous, DataLoader process_shard,
global-batch assembly from per-process local data, the shard_map train
step over the global mesh, process-0-gated checkpointing, and the
multi-writer orbax sharded save/restore."""

import json
import os
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax  # noqa: E402
jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402
import jax.numpy as jnp  # noqa: E402


def main():
    out_dir = Path(sys.argv[1])

    from haloop_tpu.parallel.mesh import maybe_init_distributed, is_master
    maybe_init_distributed()

    pid, pc = jax.process_index(), jax.process_count()
    report = {"pid": pid, "pc": pc,
              "global_devices": jax.device_count(),
              "local_devices": len(jax.local_devices())}
    expected_pc = int(os.environ["JAX_NUM_PROCESSES"])
    assert pc == expected_pc, f"expected {expected_pc} processes, got {pc}"
    n_global = pc * len(jax.local_devices())
    assert jax.device_count() == n_global

    from haloop_tpu.data import make_dataset
    from haloop_tpu.dataloader import Collator, DataLoader
    from haloop_tpu.init import create_model
    from haloop_tpu.loop import System, make_parser
    from haloop_tpu.symbol_tape import make_vocab

    args = make_parser().parse_args(
        ["--arch", "lstm-tiny:512", "--vocab", "512", "--dtype", "float32"])
    vocab = make_vocab("512")
    spec = create_model(args.arch)
    params = spec.init(jax.random.PRNGKey(0))
    system = System(args, spec, params, vocab)   # auto global mesh
    assert system.mesh is not None
    assert system.mesh.devices.size == n_global

    # disjoint per-process dataset shards (DistributedSampler analog)
    loader = DataLoader(make_dataset("head:sinusoids0"), Collator(vocab),
                        batch_size=4, drop_last=True, shuffle=True,
                        seed=7, process_shard=(pid, pc))
    report["indices"] = sorted(int(i) for i in loader._indices())

    # two global train steps from per-process local batches
    losses = []
    for step, batch in enumerate(loader):
        _, inputs, ct, il, tl = batch
        sharded = system.shard(inputs, ct, il, tl)
        # global batch: per-process rows x process count
        assert sharded[0].shape[0] == 4 * pc, sharded[0].shape
        (system.params, system.opt_state, loss, gn, bad) = \
            system._train_step(system.params, system.opt_state, *sharded,
                               jax.random.PRNGKey(step), jnp.int32(step))
        losses.append(float(loss))
        if step == 1:
            break
    report["losses"] = losses
    # params are replicated: every process must hold identical values
    report["param_sum"] = float(sum(
        jnp.sum(x.astype(jnp.float64)) for x in
        jax.tree.leaves(system.params)))

    # per-process LOCAL eval + decode: multi-host keeps eval batches
    # host-local (System._use_collective_eval) — each process prints its
    # own loader shard's rows; a global eval array would span
    # non-addressable devices and np.asarray would throw
    import contextlib
    import io
    eval_loader = DataLoader(make_dataset("head:sinusoids0"),
                             Collator(vocab), batch_size=4,
                             process_shard=(pid, pc))
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        vloss = system.evaluate(0, eval_loader, tag="valid")
    report["eval_loss_finite"] = bool(np.isfinite(vloss))
    report["eval_rows"] = buf.getvalue().count("\thyp")

    # lockstep ragged skip: batches of 3 x pc processes (6 or 12 global
    # rows) don't divide the 8-device mesh; every host must skip (no
    # host may fall
    # into a local-jit step that would skip the allreduce and diverge
    # the replicated params — and no host may hang in a collective)
    ragged_loader = DataLoader(make_dataset("head:sinusoids0"),
                               Collator(vocab), batch_size=3,
                               drop_last=True, shuffle=True, seed=7,
                               process_shard=(pid, pc))
    p_before = float(sum(jnp.sum(x.astype(jnp.float64))
                         for x in jax.tree.leaves(system.params)))
    with contextlib.redirect_stdout(io.StringIO()):
        step_after = system.train_one_epoch(0, 0, ragged_loader, None)
    p_after = float(sum(jnp.sum(x.astype(jnp.float64))
                        for x in jax.tree.leaves(system.params)))
    report["ragged_steps"] = step_after
    report["ragged_params_frozen"] = bool(p_before == p_after)

    # process-0-only pickle checkpointing (loop.main's gate)
    from haloop_tpu.checkpoint import Checkpointer
    ckpt_dir = out_dir / "exp"
    checkpoint = Checkpointer(path=ckpt_dir, save="last+best") \
        if is_master() else (lambda **kw: None)
    checkpoint(loss=losses[-1], epoch=0,
               checkpoint_fn=lambda: system.make_state_dict(epoch=0))
    report["is_master"] = bool(is_master())

    # multi-writer orbax sharded save + restore round-trip
    from haloop_tpu.checkpoint import (load_checkpoint_sharded,
                                       save_checkpoint_sharded)
    sharded_path = out_dir / "sharded"
    save_checkpoint_sharded(sharded_path,
                            {"model": system.params, "step": 2})
    restored = load_checkpoint_sharded(
        sharded_path, template={"model": system.params, "step": 2})
    for a, b in zip(jax.tree.leaves(system.params),
                    jax.tree.leaves(restored["model"])):
        np.testing.assert_array_equal(
            np.asarray(jax.device_get(a)), np.asarray(jax.device_get(b)))
    report["sharded_roundtrip"] = True

    with open(out_dir / f"report_{pid}.json", "w") as f:
        json.dump(report, f)
    print("CHILD-OK", pid, flush=True)


if __name__ == "__main__":
    main()
