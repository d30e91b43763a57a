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
    """Load a native pickle checkpoint or a reference torch .pt archive."""
    path = Path(path)
    with open(path, "rb") as f:
        magic = f.read(4)
    if magic[:2] == b"PK":                   # torch zip serialization
        from haloop_tpu.pt_loader import load_pt
        return load_pt(path)
    with open(path, "rb") as f:
        return pickle.load(f)


class Checkpointer:
    def __init__(self, path: Path,
                 save: Literal['all', 'best', 'last+best', 'none'] = 'best'):
        self.best_loss = float('inf')
        self.save = save
        self.path = Path(path)
        self.path.mkdir(parents=True, exist_ok=True)

    def __call__(self, loss, epoch, checkpoint_fn):
        checkpoint = None
        if best := (loss <= self.best_loss):
            self.best_loss = loss

        if self.save == 'none':
            return

        if self.save == 'all':
            checkpoint = checkpoint_fn()
            path = self.path / f'epoch-{epoch}.pt'
            print(f'saving checkpoint to {path}', flush=True)
            save_checkpoint(path, checkpoint)
        elif self.save == 'last+best':
            checkpoint = checkpoint_fn()
            path = self.path / 'last.pt'
            print(f'saving checkpoint to {path}', flush=True)
            save_checkpoint(path, checkpoint)

        if best:
            path = self.path / 'best.pt'
            if checkpoint is None:
                checkpoint = checkpoint_fn()
            print(f'saving checkpoint to {path}', flush=True)
            save_checkpoint(path, checkpoint)

    @classmethod
    def add_arguments(cls, parser):
        parser.add_argument('--exp', type=Path, default=Path('exp/haloop'),
                            help="Path to checkpoint directory")
        parser.add_argument('--save', type=str, default='last+best',
                            choices=['all', 'last+best', 'best', 'none'],
                            help='What checkpoints to save after evaluation')


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
