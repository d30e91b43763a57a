"""Export native checkpoints to reference torch ``.pt`` format.

The migration path OUT of this framework: a hala/hat GPT checkpoint
becomes a torch-zip archive the reference stack loads directly
(``torch.load`` + ``GPT.load_state_dict``, /root/reference/ha/init.py:64-84)
— the write-side complement of the reference-checkpoint ingestion in
pt_loader.py/init.py. No torch required (pt_saver.py emits the format
from scratch).

    python -m haloop_tpu.export exp/best.pt out.pt          # GPT ckpt
    python -m haloop_tpu.export --raw any.pt out.pt         # raw pytree

GPT mode emits ``{'model': <reference state dict>, 'model_args': ...}``
with tied wte/lm_head sharing one storage; ``--raw`` dumps any native
checkpoint pytree as nested tensors for torch-side inspection.
"""

import sys

import numpy as np

from haloop_tpu import argparse
from haloop_tpu.checkpoint import load_checkpoint
from haloop_tpu.pt_saver import save_pt


def _flatten(tree, prefix="", dtype=None, out=None):
    """Nested pytree -> flat torch state-dict names (lists by index).
    Our module pytrees already use the reference's attribute names
    (lstm.weight_ih_l0, subsample.weight, classifier.bias, ...), so the
    dotted flatten IS the reference state dict."""
    if out is None:
        out = {}
    items = list(enumerate(tree)) if isinstance(tree, (list, tuple)) \
        else list(tree.items())
    for k, v in items:
        key = f"{prefix}{k}"
        if isinstance(v, (dict, list, tuple)):
            _flatten(v, key + ".", dtype, out)
        else:
            a = np.asarray(v)
            if dtype is not None and a.dtype.kind not in 'iub':
                a = a.astype(dtype)
            out[key] = np.ascontiguousarray(a)
    return out


def _export_hac(ckpt, output, dtype):
    """hac checkpoints split into per-module raw state dicts — the
    reference consumes them via ``--init enc.pt,rec.pt``
    (/root/reference/ha/init.py:282-302, module.load_state_dict on the
    raw file contents)."""
    from pathlib import Path
    base = Path(output)
    stem = base.with_suffix('') if base.suffix == '.pt' else base
    for mod in ('encoder', 'recognizer'):
        sd = _flatten(ckpt[mod], dtype=dtype)
        # r9 (FixupResNet) 2D convs are stored HWIO (TPU layout); torch
        # modules expect OIHW — 1D convs and linears are already in
        # torch layout (nn/core.py), only 4-dim weights need the flip
        sd = {k: (np.ascontiguousarray(v.transpose(3, 2, 0, 1))
                  if getattr(v, 'ndim', 0) == 4 else v)
              for k, v in sd.items()}
        path = Path(f'{stem}.{mod}.pt')
        save_pt(path, sd)
        n = sum(v.size for v in sd.values())
        print(f'wrote {mod}: {n/1e6:.1f}M params -> {path}',
              file=sys.stderr)


def _export_hal(ckpt, output, dtype):
    """hal checkpoints keep the reference rnnlm schema: a flat
    ha.rnn.Decoder state dict under 'model' (tied out_layer.weight
    shares the embedding storage), plus the vocab/step metadata."""
    sd = _flatten(ckpt['model'], dtype=dtype)
    if 'embedding.weight' in sd and 'out_layer.weight' not in sd:
        sd['out_layer.weight'] = sd['embedding.weight']  # tied, one storage
    out = {'model': sd}
    for k in ('vocab', 'step', 'prompt', 'args'):
        if k in ckpt:
            out[k] = ckpt[k]
    save_pt(output, out)
    n = sum(v.size for v in sd.values())
    print(f'wrote hal LM: {n/1e6:.1f}M params -> {output}', file=sys.stderr)


def main():
    parser = argparse.ArgumentParser(
        description='export a native checkpoint to torch .pt format',
        formatter_class=argparse.Formatter)
    parser.add_argument('ckpt', type=str, help='native checkpoint path')
    parser.add_argument('output', type=str, help='output .pt path')
    parser.add_argument('--raw', action='store_true',
                        help='dump the raw checkpoint pytree instead of '
                             'mapping GPT params to reference names')
    parser.add_argument('--keep-dtype', action='store_true',
                        help='keep bf16/f16 params instead of upcasting '
                             'model weights to float32')
    args = parser.parse_args()

    ckpt = load_checkpoint(args.ckpt)
    dtype = None if args.keep_dtype else np.float32

    if args.raw:
        save_pt(args.output, ckpt)
        print(f'wrote raw pytree to {args.output}', file=sys.stderr)
        return

    if isinstance(ckpt, dict) and 'encoder' in ckpt and 'recognizer' in ckpt:
        _export_hac(ckpt, args.output, dtype)
        return
    if isinstance(ckpt, dict) and 'model' in ckpt and 'vocab' in ckpt \
            and 'model_args' not in ckpt:
        _export_hal(ckpt, args.output, dtype)
        return
    if not (isinstance(ckpt, dict) and 'model' in ckpt
            and 'model_args' in ckpt):
        raise SystemExit('not a GPT/hac/hal checkpoint; '
                         'use --raw for arbitrary pytrees')

    import dataclasses
    from haloop_tpu.init import gpt_state_dict_from_params
    from haloop_tpu.models.gpt import GPTConfig
    model_args = dict(ckpt['model_args'])
    model_args.pop('arch', None)
    known = {f.name for f in dataclasses.fields(GPTConfig)}
    cfg = GPTConfig(**{k: v for k, v in model_args.items() if k in known})

    sd = ckpt['model']
    if isinstance(sd, dict) and any('.' in k for k in sd):
        pass  # already flat reference names (round-tripping a .pt)
    else:
        sd = gpt_state_dict_from_params(sd, cfg, dtype=dtype)

    out = {'model': sd, 'model_args': model_args}
    for k in ('iter_num', 'val_loss', 'val_bpb', 'epoch', 'loss'):
        if k in ckpt:
            out[k] = ckpt[k]
    save_pt(args.output, out)
    n = sum(v.size for v in sd.values() if hasattr(v, 'size'))
    print(f'wrote {n/1e6:.1f}M-param reference-format checkpoint to '
          f'{args.output}', file=sys.stderr)


if __name__ == '__main__':
    main()
