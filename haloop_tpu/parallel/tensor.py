"""Tensor-parallel sharding rules (Megatron-style) for the GPT family.

Layout over a ('data', 'model') mesh:
  * c_attn / mlp.c_fc: row-sharded over 'model' (column-parallel matmul —
    each shard computes a head/neuron slice, no comms in forward)
  * c_proj (attn + mlp): column-sharded over 'model' (row-parallel —
    XLA inserts ONE all-reduce per block, riding ICI)
  * lm_head/wte: vocab rows sharded over 'model' (logits all-gathered at
    the loss only)
  * everything else (layernorms, positions) replicated

With pjit/GSPMD we express the layout as a PartitionSpec pytree and let
XLA insert the collectives (the scaling-book recipe) — no hand-written
allreduce. The same spec tree doubles for FSDP-style sharding when
'model' is replaced by a 'fsdp' axis on the data dimension.
"""

import jax
from jax.sharding import NamedSharding, PartitionSpec as P


def gpt_param_spec(params, model_axis="model"):
    """PartitionSpec pytree matching gpt_init's structure."""
    M = model_axis

    def spec_for(path, leaf):
        names = [str(getattr(k, "key", getattr(k, "idx", k))) for k in path]
        joined = ".".join(names)
        nd = leaf.ndim
        if "lm_head" in joined and names[-1] == "weight":
            return P(M, None)
        if names[-1].startswith("lora_"):
            return P()
        if "c_attn" in joined or "c_fc" in joined:
            return P(M, None) if nd == 2 else P(M)
        if "c_proj" in joined:
            return P(None, M) if nd == 2 else P()
        return P()

    return jax.tree_util.tree_map_with_path(spec_for, params)


def shard_gpt_params(mesh, params):
    specs = gpt_param_spec(params)
    return jax.tree.map(
        lambda x, s: jax.device_put(x, NamedSharding(mesh, s)),
        params, specs)


def batch_spec():
    return P("data", None)
