"""Checkpointer with the reference's policy surface
(reference: ha/checkpoint.py): --save all|best|last+best|none writing
epoch-N.pt / last.pt / best.pt under --exp, tracking the best loss.

Native format: a plain pickle of a numpy-ified pytree (torch-free,
host-side; device arrays are pulled once). ``load_checkpoint`` also
ingests reference torch ``.pt`` zip archives via pt_loader.
"""

import pickle
from pathlib import Path
from typing import Dict, List, Literal, Optional

import jax
import numpy as np


def _to_host(tree):
    # pull only device arrays; leave strings/bytes/ints untouched
    return jax.tree.map(
        lambda x: np.asarray(x) if isinstance(x, jax.Array) else x, tree)


def save_checkpoint(path, obj):
    path = Path(path)
    path.parent.mkdir(parents=True, exist_ok=True)
    with open(path, "wb") as f:
        pickle.dump(_to_host(obj), f, protocol=pickle.HIGHEST_PROTOCOL)


def load_checkpoint(path):
    """Load a native pickle checkpoint, an orbax sharded checkpoint
    directory, or a reference torch .pt archive."""
    path = Path(path)
    if path.is_dir():
        return load_checkpoint_sharded(path)
    with open(path, "rb") as f:
        magic = f.read(4)
    if magic[:2] == b"PK":                   # torch zip serialization
        from haloop_tpu.pt_loader import load_pt
        return load_pt(path)
    with open(path, "rb") as f:
        return pickle.load(f)


# ------------------------------------------------- sharded (multi-host)

class _Shard:
    """Placeholder for an array leaf stored in the orbax directory."""

    def __init__(self, index):
        self.index = index


def _is_array(x):
    return isinstance(x, (jax.Array, np.ndarray))


def save_checkpoint_sharded(path, obj):
    """Sharded checkpoint via orbax: every process writes only its
    addressable shards (the multi-host story the pickle path cannot
    cover — np.asarray of a non-fully-addressable array is an error).
    ``path`` becomes a directory: arrays land in <path>/arrays (orbax),
    non-array leaves (flags, strings, counters) in <path>/meta.pkl."""
    import shutil

    import orbax.checkpoint as ocp

    path = Path(path).resolve()
    tmp = path.with_name(path.name + ".tmp")

    # multi-writer discipline: orbax's array save is collective (every
    # process writes its addressable shards), but the surrounding
    # filesystem moves are process-0-only with barriers between phases
    multi = jax.process_count() > 1

    def barrier(tag):
        if multi:
            from jax.experimental import multihost_utils
            multihost_utils.sync_global_devices(f"haloop-ckpt-{tag}")

    master = jax.process_index() == 0
    if master:
        shutil.rmtree(tmp, ignore_errors=True)
        tmp.mkdir(parents=True)
    barrier("mkdir")

    counter = iter(range(1 << 30))
    arrays = {}

    def mark(x):
        i = next(counter)
        if _is_array(x):
            arrays[str(i)] = x
            return _Shard(i)
        return x

    skeleton = jax.tree.map(mark, obj)
    if master:
        with open(tmp / "meta.pkl", "wb") as f:
            pickle.dump(skeleton, f, protocol=pickle.HIGHEST_PROTOCOL)
    with ocp.StandardCheckpointer() as ckptr:
        ckptr.save(tmp / "arrays", arrays)
    barrier("saved")
    if master:
        shutil.rmtree(path, ignore_errors=True)
        tmp.rename(path)
    barrier("renamed")


def load_checkpoint_sharded(path, template=None):
    """Restore a sharded checkpoint directory.

    template: optional pytree of arrays or jax.ShapeDtypeStruct whose
    shardings dictate the restored layout (pass the TP/DP-sharded
    params skeleton to land shards directly on the right devices).
    Without a template, arrays restore unsharded on the default device.
    """
    import orbax.checkpoint as ocp

    path = Path(path).resolve()
    with open(path / "meta.pkl", "rb") as f:
        skeleton = pickle.load(f)

    shard_leaves = [s for s in jax.tree.leaves(
        skeleton, is_leaf=lambda x: isinstance(x, _Shard))
        if isinstance(s, _Shard)]
    if template is not None:
        abstract = {}
        # the template filter must mirror the SAVE side's _is_array
        # exactly (plus ShapeDtypeStructs): a looser hasattr-'shape'
        # test also admits numpy scalars, shifting every subsequent
        # zip pairing onto the wrong shard
        t_arrays = [t for t in jax.tree.leaves(template)
                    if _is_array(t) or isinstance(t, jax.ShapeDtypeStruct)]
        assert len(t_arrays) == len(shard_leaves), \
            (f"template has {len(t_arrays)} array leaves but the "
             f"checkpoint stores {len(shard_leaves)} shards")
        for s, t in zip(shard_leaves, t_arrays):
            abstract[str(s.index)] = jax.ShapeDtypeStruct(
                t.shape, t.dtype, sharding=getattr(t, "sharding", None))
        with ocp.StandardCheckpointer() as ckptr:
            arrays = ckptr.restore(path / "arrays", abstract)
    else:
        # no template: restore as host numpy, ignoring saved shardings
        # (the save may have happened on a different device topology)
        rargs = {str(s.index): ocp.RestoreArgs(restore_type=np.ndarray)
                 for s in shard_leaves}
        with ocp.Checkpointer(ocp.PyTreeCheckpointHandler()) as ckptr:
            arrays = ckptr.restore(
                path / "arrays",
                args=ocp.args.PyTreeRestore(restore_args=rargs))
    return jax.tree.map(
        lambda x: arrays[str(x.index)] if isinstance(x, _Shard) else x,
        skeleton, is_leaf=lambda x: isinstance(x, _Shard))


class Checkpointer:
    def __init__(self, path: Path,
                 save: Literal['all', 'best', 'last+best', 'none'] = 'best',
                 fmt: Literal['pickle', 'sharded'] = 'pickle'):
        self.best_loss = float('inf')
        self.save = save
        self.fmt = fmt
        self.path = Path(path)
        self.path.mkdir(parents=True, exist_ok=True)

    def _save(self, path, checkpoint):
        if jax.process_index() == 0:
            print(f'saving checkpoint to {path}', flush=True)
        if self.fmt == 'sharded':
            save_checkpoint_sharded(path, checkpoint)
        else:
            save_checkpoint(path, checkpoint)

    def __call__(self, loss, epoch, checkpoint_fn):
        checkpoint = None
        if best := (loss <= self.best_loss):
            self.best_loss = loss

        if self.save == 'none':
            return

        if self.save == 'all':
            checkpoint = checkpoint_fn()
            self._save(self.path / f'epoch-{epoch}.pt', checkpoint)
        elif self.save == 'last+best':
            checkpoint = checkpoint_fn()
            self._save(self.path / 'last.pt', checkpoint)

        if best:
            if checkpoint is None:
                checkpoint = checkpoint_fn()
            self._save(self.path / 'best.pt', checkpoint)

    @classmethod
    def add_arguments(cls, parser):
        parser.add_argument('--exp', type=Path, default=Path('exp/haloop'),
                            help="Path to checkpoint directory")
        parser.add_argument('--save', type=str, default='last+best',
                            choices=['all', 'last+best', 'best', 'none'],
                            help='What checkpoints to save after evaluation')
        parser.add_argument('--ckpt-format', type=str, default='pickle',
                            choices=['pickle', 'sharded'],
                            help='pickle: single-host pytree pickle; '
                                 'sharded: orbax directory, each process '
                                 'writes its addressable shards')


def construct_path_suffix(
    config: Dict,
    base_config: Dict,
    always_include: Optional[List[str]] = None,
    always_ignore: Optional[List[str]] = None,
) -> str:
    """Experiment naming from config diffs (ha/checkpoint.py:44-62)."""
    suffix_parts: List[str] = []
    always_include = always_include or []
    always_ignore = always_ignore or []
    for k in sorted(config.keys()):
        if k in always_ignore:
            continue
        if k in always_include or config[k] != base_config.get(k):
            val = str(config[k]).replace('.', '_').replace('/', '_')
            suffix_parts.append(f"{k}-{val}")
    return ".".join(suffix_parts)
