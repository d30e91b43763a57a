"""Dump the optimized HLO of the batched decode step and count the
per-iteration traffic: which big buffers get copied/transposed inside
the scan's while body? (Companion to exp_decode_kv.py — that script
measures, this one explains.)

Usage: python scripts/exp_decode_hlo.py [B] [--variant base|sep|kT]
"""

import re
import sys
import pathlib

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))


def main(argv=()):
    import jax
    import jax.numpy as jnp
    from haloop_tpu.models import gpt as G

    B = int(argv[0]) if argv and not argv[0].startswith("-") else 64
    cfg = G.GPTConfig(block_size=1024, vocab_size=50304, n_layer=12,
                      n_head=12, n_embd=768)
    T0, NEW = 32, 128
    params = jax.tree.map(
        lambda x: x.astype(jnp.bfloat16)
        if jnp.issubdtype(x.dtype, jnp.floating) else x,
        G.gpt_init(jax.random.PRNGKey(0), cfg))

    @jax.jit
    def base_gen(p, ids):
        return G.generate(p, cfg, ids, max_new_tokens=NEW, top_k=1,
                          stop_token=-1)[0]

    ids = jnp.zeros((B, T0), jnp.int32)
    txt = base_gen.lower(params, ids).compile().as_text()
    out = pathlib.Path("/tmp/decode_hlo.txt")
    out.write_text(txt)
    print(f"wrote {out} ({len(txt) / 1e6:.1f} MB)")

    # Find the while body computation and count copy/transpose/fusion
    # instructions touching big (>= 1 MB) buffers.
    def shape_bytes(s):
        m = re.match(r"(\w+)\[([\d,]*)\]", s)
        if not m:
            return 0
        dt, dims = m.groups()
        n = 1
        for d in dims.split(","):
            if d:
                n *= int(d)
        size = {"bf16": 2, "f32": 4, "s32": 4, "s8": 1, "u8": 1,
                "pred": 1, "f16": 2, "s64": 8}.get(dt, 4)
        return n * size

    big = []
    for line in txt.splitlines():
        ls = line.strip()
        m = re.match(r"%?[\w.-]+ = (\S+) (copy|transpose|fusion|"
                     r"dynamic-update-slice|dynamic-slice|bitcast)\(",
                     ls)
        if not m:
            continue
        nbytes = shape_bytes(m.group(1))
        if nbytes >= 1 << 20:
            big.append((nbytes, m.group(2), ls[:240]))
    big.sort(reverse=True)
    print(f"\n{len(big)} big (>=1MB) copy/transpose/DUS/fusion "
          f"instructions; top 40 by size:")
    for nbytes, kind, ls in big[:40]:
        print(f"  {nbytes / 1e6:8.1f} MB {kind:22s} {ls}")

    # crude per-kind byte totals
    tot = {}
    for nbytes, kind, _ in big:
        tot[kind] = tot.get(kind, 0) + nbytes
    print("\nper-kind totals (MB):",
          {k: round(v / 1e6, 1) for k, v in tot.items()})


if __name__ == "__main__":
    main(sys.argv[1:])
