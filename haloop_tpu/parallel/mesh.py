"""Device mesh and sharding helpers — the TPU-native replacement for the
reference's DDP/NCCL path (SURVEY.md §5.8; ha/attention_loop.py:67-80).

Design: SPMD over a ``jax.sharding.Mesh``. Data parallelism shards the
leading batch axis with a NamedSharding over the 'data' axis; parameters
are replicated (or sharded over 'model' for tensor parallelism — see
parallel/tensor.py). Gradients are averaged by XLA-inserted collectives
when the jitted step consumes sharded batches and produces replicated
params — no hand-written allreduce, no no_sync() micro-batch tricks
(accumulate locally, reduce once is the natural consequence of jit).

Multi-host: ``jax.distributed.initialize`` + ``jax.process_index() == 0``
replaces RANK env rendezvous and rank-0 gating.
"""

import numpy as np
import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(axes=None):
    """Build a mesh over all visible devices. axes: dict name->size, e.g.
    {'data': 4, 'model': 2}; None = 1-D 'data' mesh over everything."""
    devices = np.array(jax.devices())
    if axes is None:
        return Mesh(devices, ('data',))
    names = tuple(axes.keys())
    shape = tuple(axes.values())
    return Mesh(devices.reshape(shape), names)


def data_mesh():
    return make_mesh()


def shard_batch(mesh, batch, axis='data'):
    """Place host arrays with the leading dim sharded over `axis`."""
    sharding = NamedSharding(mesh, P(axis))
    return jax.tree.map(
        lambda x: jax.device_put(x, sharding)
        if getattr(x, 'ndim', 0) >= 1 else x, batch)


def global_batch(mesh, x, axis='data', spec=None):
    """Shard a batch's leading axis over ``axis`` (or an explicit
    PartitionSpec ``spec`` for non-leading batch axes), multi-host
    aware.

    Single-process: a plain device_put of the (global) host array.
    Multi-process: each process holds only ITS slice of the global
    batch (DataLoader process_shard), so the global array is assembled
    from per-process local data — the jit step then sees one logical
    batch of size local*process_count, the SPMD analog of DDP's
    per-rank DataLoader shards (ha/attention_loop.py:90-93)."""
    sharding = NamedSharding(mesh, P(axis) if spec is None else spec)
    if jax.process_count() > 1:
        return jax.make_array_from_process_local_data(
            sharding, np.asarray(x))
    return jax.device_put(x, sharding)


def replicate(mesh, tree):
    sharding = NamedSharding(mesh, P())
    return jax.tree.map(lambda x: jax.device_put(x, sharding), tree)


def is_master():
    return jax.process_index() == 0


def maybe_init_distributed():
    """Multi-host bring-up: call jax.distributed.initialize() when a
    coordinator is configured (the TPU-native replacement for the
    reference's RANK/LOCAL_RANK NCCL rendezvous,
    ha/attention_loop.py:67-73). No-op on single-host runs.

    JAX_COORDINATOR_ADDRESS alone defers to jax's cluster
    auto-detection; with JAX_NUM_PROCESSES + JAX_PROCESS_ID the
    rendezvous is fully explicit (works for ad-hoc launches, e.g. the
    two-process virtual multi-host test)."""
    import os
    addr = os.environ.get("JAX_COORDINATOR_ADDRESS") or \
        os.environ.get("COORDINATOR_ADDRESS")
    if not addr:
        return
    kw = {"coordinator_address": addr}
    if os.environ.get("JAX_NUM_PROCESSES") and \
            os.environ.get("JAX_PROCESS_ID") is not None:
        kw["num_processes"] = int(os.environ["JAX_NUM_PROCESSES"])
        kw["process_id"] = int(os.environ["JAX_PROCESS_ID"])
    try:
        jax.distributed.initialize(**kw)
    except Exception as e:  # already initialized / single process
        print(f"jax.distributed.initialize skipped: {e}")
