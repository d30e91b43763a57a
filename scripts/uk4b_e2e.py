"""BASELINE config 2 end-to-end: the uk4b-style loop on one artifact.

hala-trains a byte-level GPT on an in-repo corpus (this repository's
own documentation) to a falling val_bpb, then feeds the SAME saved
checkpoint through hap sentence scoring and hat --chunk / --spec
generation — train -> score -> REPL as one pipeline, the workflow of
/root/reference/ha/attention_loop.py + ha/score.py + ha/attention.py.

Usage: python scripts/uk4b_e2e.py [--workdir DIR] [--iters N]
Writes a summary table to stdout; exits nonzero if val_bpb does not
fall or any stage fails.
"""

import argparse
import re
import subprocess
import sys
import time
from pathlib import Path

import numpy as np

REPO = Path(__file__).resolve().parent.parent


def run(cmd, **kw):
    print('$', ' '.join(map(str, cmd)), file=sys.stderr, flush=True)
    t0 = time.time()
    r = subprocess.run([str(c) for c in cmd], capture_output=True,
                       text=True, **kw)
    print(f'  ({time.time()-t0:.1f}s rc={r.returncode})', file=sys.stderr)
    if r.returncode != 0:
        sys.stderr.write(r.stdout[-2000:] + r.stderr[-2000:])
        raise SystemExit(f'stage failed: {cmd[:3]}')
    return r


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument('--workdir', default='/tmp/uk4b_e2e')
    ap.add_argument('--iters', type=int, default=600)
    ap.add_argument('--eval-interval', type=int, default=150)
    args = ap.parse_args()
    wd = Path(args.workdir)
    wd.mkdir(parents=True, exist_ok=True)

    # ---- corpus: the repo's own docs + sources, as bytes ----
    text = b''
    for pat in ('*.md', 'haloop_tpu/*.py', 'haloop_tpu/*/*.py'):
        for p in sorted(REPO.glob(pat)):
            text += p.read_bytes() + b'\n'
    arr = np.frombuffer(text, np.uint8).astype(np.uint16)
    split = int(len(arr) * 0.9)
    arr[:split].tofile(wd / 'train.bin')
    arr[split:].tofile(wd / 'val.bin')
    eval_bytes = len(arr) - split
    print(f'corpus: {len(arr)} bytes ({split} train / {eval_bytes} val)')

    # ---- stage 1: hala train to falling val_bpb ----
    r = run([sys.executable, '-m', 'haloop_tpu.attention_loop',
             '--arch', 'gpt-nano:256:256', '--train', wd / 'train.bin',
             '--eval', wd / 'val.bin', '--eval_bytes', eval_bytes,
             '--batch_size', 16, '--block_size', 256,
             '--max_iters', args.iters, '--eval-interval',
             args.eval_interval, '--log-interval', 50,
             '--lr', '1e-3', '--exp', wd / 'exp'], cwd=REPO)
    bpbs = [float(m.group(1)) for m in
            re.finditer(r'val loss ([\d.]+)', r.stdout)]
    # val_bpb = val_loss/ln2 for byte corpora; track loss directly
    print('val losses:', ' '.join(f'{b:.3f}' for b in bpbs))
    assert len(bpbs) >= 2 and bpbs[-1] < bpbs[0] * 0.98, \
        f'val loss did not fall: {bpbs}'
    ckpt = wd / 'exp' / 'best.pt'
    assert ckpt.exists(), 'no checkpoint written'

    # ---- stage 2: hap scores sentences with the trained ckpt ----
    lines = ('the flash attention kernel runs on the MXU\n'
             'zzzzqqqq xxxx jjjj wwww\n'
             'import jax.numpy as jnp\n')
    r = run([sys.executable, '-m', 'haloop_tpu.score', '--bytes',
             '--tokens-per-batch', 2048, ckpt], input=lines, cwd=REPO)
    rows = [l.split('\t') for l in r.stdout.strip().split('\n')]
    assert len(rows) == 3 and all(len(x) == 3 for x in rows), r.stdout
    nlls = [float(x[0]) for x in rows]
    print('hap NLL/token:', nlls)
    # trained-on-code model: python-ish text should beat junk
    assert nlls[2] < nlls[1], 'code line should score better than junk'

    # ---- stage 3: hat generation (chunked + speculative) ----
    for extra, tag in ((['--chunk', 16], 'chunk16'),
                       (['--spec', 8], 'spec8')):
        r = run([sys.executable, '-m', 'haloop_tpu.repl', '--bytes',
                 '--steps', 64] + extra + [ckpt],
                input='import jax\n', cwd=REPO)
        gen = [l for l in r.stdout.split('\n') if not l.startswith('>')]
        tput = re.search(r'\((\d+) tokens in ([\d.]+)s\)', r.stderr)
        rate = (f'{int(tput.group(1))/float(tput.group(2)):.0f} tok/s'
                if tput else 'n/a')
        print(f'hat {tag}: {rate} | {r.stdout.strip()[:70]!r}')

    print('\nuk4b-style config-2 loop: train -> score -> generate '
          'all ran from ONE checkpoint:', ckpt)


if __name__ == '__main__':
    main()
