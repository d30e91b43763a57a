"""Model lifecycle: the ``create_model(arch)`` string DSL, checkpoint
ingestion (native + reference torch .pt), the Initializer flag surface,
and the ``hai`` CLI (reference: ha/init.py).

Models are (spec, params) pairs: the spec is a frozen dataclass of pure
apply methods + static config (safe to close over under jit); params are
plain pytrees. The arch registry reproduces every reference arch string
(ha/init.py:93-258).
"""

import argparse
import dataclasses
import sys
from pathlib import Path
from typing import Any, Optional

import jax
import jax.numpy as jnp
import numpy as np

from haloop_tpu.checkpoint import Checkpointer, load_checkpoint
from haloop_tpu.models import audio as AU
from haloop_tpu.models import gpt as G
from haloop_tpu.models import recognizer as RE
from haloop_tpu.models import resnet as RN
from haloop_tpu.models import rnn as R
from haloop_tpu.models import transformer as TR


def log(*args, flush=False, **kwargs):
    print(*args, **kwargs, flush=flush, file=sys.stderr)


GPTConfig = G.GPTConfig
AudioEncoderConfig = AU.AudioEncoderConfig
StridingAudioEncoderConfig = AU.StridingAudioEncoderConfig


# ------------------------------------------------------------ encoder spec

@dataclasses.dataclass(frozen=True)
class EncoderSpec:
    kind: str                      # lstm | gpt-audio | gpt-striding | tr-audio | r9
    cfg: Any = None
    hidden_dim: int = 1024
    input_dim: int = 80

    @property
    def feat_dim(self):
        if self.kind == "lstm":
            return self.hidden_dim
        if self.kind in ("gpt-audio", "gpt-striding"):
            return self.cfg.n_embd
        if self.kind == "tr-audio":
            return self.cfg.head_dim * self.cfg.heads
        if self.kind == "r9":
            return 256 * (self.input_dim // 4)
        raise ValueError(self.kind)

    def init(self, key):
        if self.kind == "lstm":
            return R.encoder_init(key, input_dim=self.input_dim,
                                  hidden_dim=self.hidden_dim)
        if self.kind == "gpt-audio":
            return AU.audio_encoder_init(key, self.cfg)
        if self.kind == "gpt-striding":
            return AU.striding_audio_encoder_init(key, self.cfg)
        if self.kind == "tr-audio":
            return TR.audio_encoder_init(key, self.cfg)
        if self.kind == "r9":
            return RN.fixup_resnet_init(key, (5, 5, 5))
        raise ValueError(self.kind)

    def apply(self, params, x, input_lengths, *, train=False, key=None,
              measure_entropy=False, collect_activations=False):
        if self.kind == "lstm":
            return R.encoder_apply(params, x, input_lengths, key=key,
                                   train=train,
                                   collect_activations=collect_activations)
        if self.kind == "gpt-audio":
            return AU.audio_encoder_apply(
                params, self.cfg, x, input_lengths, measure_entropy, key,
                train, collect_activations=collect_activations)
        if self.kind == "gpt-striding":
            return AU.striding_audio_encoder_apply(
                params, self.cfg, x, input_lengths, measure_entropy, key,
                train, collect_activations=collect_activations)
        if self.kind == "tr-audio":
            return TR.audio_encoder_apply(
                params, self.cfg, x, input_lengths, measure_entropy, key,
                train, collect_activations=collect_activations)
        if self.kind == "r9":
            return RN.fixup_resnet_apply(params, x, input_lengths)
        raise ValueError(self.kind)

    def subsampled_lengths(self, input_lengths):
        input_lengths = jnp.asarray(input_lengths)
        if self.kind == "lstm":
            return R.encoder_subsampled_lengths(input_lengths)
        if self.kind == "gpt-audio":
            return AU.audio_encoder_subsampled_lengths(self.cfg, input_lengths)
        if self.kind == "gpt-striding":
            return AU.striding_subsampled_lengths(self.cfg, input_lengths)
        if self.kind == "tr-audio":
            return TR.audio_encoder_subsampled_lengths(self.cfg, input_lengths)
        if self.kind == "r9":
            return input_lengths // 4
        raise ValueError(self.kind)


# --------------------------------------------------------- recognizer spec

@dataclasses.dataclass(frozen=True)
class RecognizerSpec:
    kind: str                      # ctc | transducer | decoder | ctc-attention
    vocab: int
    feat_dim: int
    tcfg: Optional[TR.TransformerConfig] = None

    def init(self, key):
        if self.kind == "ctc":
            return RE.temporal_classifier_init(key, self.feat_dim, self.vocab)
        if self.kind == "transducer":
            return RE.transducer_init(key, self.feat_dim, self.vocab)
        if self.kind == "decoder":
            return TR.decoder_init(key, self.tcfg)
        if self.kind == "ctc-attention":
            return TR.ctc_attention_decoder_init(key, self.tcfg)
        raise ValueError(self.kind)

    def loss(self, params, features, condtargets, input_lengths,
             condtarget_lengths, *, star_penalty=None, measure_entropy=False,
             drop_labels=False, train=False, key=None):
        if self.kind == "ctc":
            return RE.temporal_classifier_loss(
                params, features, condtargets, input_lengths,
                condtarget_lengths, star_penalty, key=key, train=train)
        if self.kind == "transducer":
            return RE.transducer_loss(
                params, features, condtargets, input_lengths,
                condtarget_lengths, key=key, train=train)
        if self.kind == "decoder":
            return TR.decoder_forward(
                params, self.tcfg, features, condtargets, input_lengths,
                condtarget_lengths, star_penalty, measure_entropy,
                drop_labels, key=key, train=train)
        if self.kind == "ctc-attention":
            return TR.ctc_attention_decoder_forward(
                params, self.tcfg, features, condtargets, input_lengths,
                condtarget_lengths, star_penalty, measure_entropy,
                drop_labels, key=key, train=train)
        raise ValueError(self.kind)

    def decode(self, params, features, input_lengths, target_lengths,
               prompt=None, max_steps=None, key=None, train=False):
        """Greedy decode. Returns (hyps, lengths, log_probs, entropies,
        alignments); alignments are the per-frame argmax labels for CTC
        (printed as aliN TSV rows, ha/loop.py:409-410) and None for the
        other recognizers (the reference's attention decoder returns
        [None]*N, ha/transformer.py:198). train=True keeps dropout
        active (test-time-dropout attempts)."""
        if self.kind == "ctc":
            hyps, lens, ali, scores, sum_ent = RE.temporal_classifier_decode(
                params, features, input_lengths, key=key, train=train)
            return hyps, lens, jnp.sum(
                jnp.where(jnp.arange(scores.shape[1])[None] <
                          input_lengths[:, None], scores, 0.0), -1), \
                sum_ent, ali
        if self.kind == "decoder":
            return TR.decoder_decode(params, self.tcfg, features,
                                     input_lengths, target_lengths,
                                     prompt=prompt, max_steps=max_steps,
                                     key=key, train=train) + (None,)
        if self.kind == "ctc-attention":
            return TR.decoder_decode(params["decoder"], self.tcfg, features,
                                     input_lengths, target_lengths,
                                     prompt=prompt, max_steps=max_steps,
                                     key=key, train=train) + (None,)
        if self.kind == "transducer":
            hyps, lens, sum_ent, scores = RE.transducer_greedy_decode(
                params, features, input_lengths,
                max_symbols=max_steps or features.shape[1])
            return hyps, lens, scores, sum_ent, None
        raise NotImplementedError(self.kind)


@dataclasses.dataclass(frozen=True)
class AcousticModel:
    """encoder + recognizer pair (the hac model)."""
    arch: str
    encoder: EncoderSpec
    recognizer: RecognizerSpec

    def init(self, key):
        k1, k2 = jax.random.split(key)
        return {"encoder": self.encoder.init(k1),
                "recognizer": self.recognizer.init(k2)}


@dataclasses.dataclass(frozen=True)
class GPTModel:
    arch: str
    config: G.GPTConfig

    def init(self, key):
        return G.gpt_init(key, self.config)


@dataclasses.dataclass(frozen=True)
class RNNLMModel:
    arch: str
    vocab_size: int = 256
    emb_dim: int = 2048
    hidden_dim: int = 2048
    num_layers: int = 1
    dropout: float = 0.0

    def init(self, key):
        return R.decoder_init(key, self.vocab_size, self.emb_dim,
                              self.hidden_dim, self.num_layers)


@dataclasses.dataclass(frozen=True)
class EncoderOnlyModel:
    arch: str
    encoder: EncoderSpec

    def init(self, key):
        return {"encoder": self.encoder.init(key)}


def _digits(s):
    return int("".join(filter(str.isdigit, s)))


def create_model(arch: str, compile: bool = True):
    """
    Model architectures to initialize. Possible options:

        decoder
        decoder:vocab_size
        decoder:vocab_size:block_size
        encoder
        lstm
        rnnlm
        r9
        audio-encoder
        recognizer:encoder:vocab_size
        rnn-transducer:encoder:vocab_size
        audio-transformer
    """
    def striding(vocab=16384, **kw):
        return StridingAudioEncoderConfig(vocab_size=vocab, **kw)

    def pair(enc, rec):
        return AcousticModel(arch, enc, rec)

    def enc_dec(vocab, enc_layers, dec_layers, with_ctc, strides=(2, 2, 1),
                n_embd=512, n_head=8):
        cfg = striding(vocab=vocab, dropout=0.2, n_layer=enc_layers,
                       n_head=n_head, n_embd=n_embd, conv_strides=strides)
        enc = EncoderSpec("gpt-striding", cfg)
        tcfg = TR.TransformerConfig(vocab=vocab, head_dim=n_embd // n_head,
                                    heads=n_head, p_drop=0.2,
                                    layers=dec_layers)
        rec = RecognizerSpec("ctc-attention" if with_ctc else "decoder",
                             vocab, n_embd, tcfg)
        return pair(enc, rec)

    match arch.split(':'):
        case ['decoder']:
            return GPTModel(arch, GPTConfig())
        case ['decoder', vocab]:
            return GPTModel(arch, GPTConfig(block_size=2048,
                                            vocab_size=_digits(vocab)))
        case ['decoder', vocab, block]:
            return GPTModel(arch, GPTConfig(block_size=int(block),
                                            vocab_size=_digits(vocab)))
        case ['encoder']:
            return GPTModel(arch, GPTConfig(block_size=128, causal=False))
        case ['gpt-nano', vocab, block]:
            # small-footprint extension arch for CPU tests/smoke runs
            return GPTModel(arch, GPTConfig(
                block_size=int(block), vocab_size=_digits(vocab),
                n_layer=2, n_head=2, n_embd=64))
        case ['lstm']:
            return EncoderOnlyModel(arch, EncoderSpec("lstm", input_dim=13))
        case ['rnnlm']:
            return RNNLMModel(arch)
        case ['r9']:
            return EncoderOnlyModel(arch, EncoderSpec("r9"))
        case ['audio-encoder']:
            cfg = dataclasses.replace(AudioEncoderConfig(), rotary_emb_dim=0)
            return pair(EncoderSpec("gpt-audio", cfg),
                        RecognizerSpec("ctc", cfg.vocab_size, cfg.n_embd))
        case ['audio-encoder-rotary']:
            cfg = AudioEncoderConfig()
            return pair(EncoderSpec("gpt-audio", cfg),
                        RecognizerSpec("ctc", cfg.vocab_size, cfg.n_embd))
        case ['audio-encoder-rotary-dropout']:
            cfg = AudioEncoderConfig(dropout=0.1)
            return pair(EncoderSpec("gpt-audio", cfg),
                        RecognizerSpec("ctc", cfg.vocab_size, cfg.n_embd))
        case ['audio-encoder-rotary-dropout-e8']:
            cfg = AudioEncoderConfig(dropout=0.1, n_layer=8)
            return pair(EncoderSpec("gpt-audio", cfg),
                        RecognizerSpec("ctc", cfg.vocab_size, cfg.n_embd))
        case ['striding-e8']:
            cfg = StridingAudioEncoderConfig(dropout=0.1, n_layer=8)
            return pair(EncoderSpec("gpt-striding", cfg),
                        RecognizerSpec("ctc", cfg.vocab_size, cfg.n_embd))
        case ['lstm', vocab]:
            enc = EncoderSpec("lstm", hidden_dim=1536, input_dim=80)
            return pair(enc, RecognizerSpec("ctc", int(vocab), 1536))
        case ['e2ctc-d2', vocab]:
            # small-footprint extension arch for CPU tests/smoke runs
            return enc_dec(int(vocab), 2, 2, with_ctc=True, n_embd=64,
                           n_head=2)
        case ['lstm-tiny', vocab]:
            # small-footprint extension arch for CPU tests/smoke runs
            enc = EncoderSpec("lstm", hidden_dim=256, input_dim=80)
            return pair(enc, RecognizerSpec("ctc", int(vocab), 256))
        case ['rnn-transducer-tiny', vocab]:
            # small-footprint extension arch for CPU tests/smoke runs
            enc = EncoderSpec("lstm", hidden_dim=256, input_dim=80)
            return pair(enc, RecognizerSpec("transducer", int(vocab), 256))
        case ['recognizer', enc_arch, vocab]:
            enc = create_model(enc_arch, compile=False).encoder
            return pair(enc, RecognizerSpec("ctc", int(vocab), 1024))
        case ['rnn-transducer', enc_arch, vocab]:
            enc = create_model(enc_arch, compile=False).encoder
            return pair(enc, RecognizerSpec("transducer", int(vocab),
                                            enc.feat_dim))
        case ['audio-transformer']:
            return enc_dec(16384, 6, 4, with_ctc=False)
        case ['audio-transformer-ctc']:
            return create_model('e6ctc-d4:16384', compile=compile)
        case ['e6ctc-d4', vocab]:
            return enc_dec(int(vocab), 6, 4, with_ctc=True)
        case ['e6ctc-d6', vocab]:
            return enc_dec(int(vocab), 6, 6, with_ctc=True)
        case ['e6d6', vocab]:
            return enc_dec(int(vocab), 6, 6, with_ctc=False)
        case ['e12ctc-d12', vocab]:
            return enc_dec(int(vocab), 12, 12, with_ctc=True)
        case ['s222e12ctc-d12', vocab]:
            return enc_dec(int(vocab), 12, 12, with_ctc=True,
                           strides=(2, 2, 2))
        case ['transformer', vocab]:
            ecfg = TR.AudioEncoderConfig(head_dim=64, heads=8, layers=12,
                                         p_drop=0.2)
            tcfg = TR.TransformerConfig(vocab=int(vocab), head_dim=64,
                                        heads=8, p_drop=0.2, layers=12)
            return pair(EncoderSpec("tr-audio", ecfg),
                        RecognizerSpec("ctc-attention", int(vocab), 512, tcfg))
        case ['e12d12', vocab]:
            ecfg = TR.AudioEncoderConfig(head_dim=64, heads=8, layers=12,
                                         p_drop=0.2)
            tcfg = TR.TransformerConfig(vocab=int(vocab), head_dim=64,
                                        heads=8, p_drop=0.2, layers=12)
            return pair(EncoderSpec("tr-audio", ecfg),
                        RecognizerSpec("decoder", int(vocab), 512, tcfg))
        case _:
            raise ValueError(f'unknown architecture {arch}')


# ------------------------------------------------- torch GPT checkpoint map

def gpt_params_from_state_dict(sd, cfg):
    """Map a (numpy-fied) reference GPT state dict into our pytree.
    Handles '_orig_mod.' prefixes and LoRA keys (ha/init.py:63-90)."""
    sd = {k.removeprefix("_orig_mod."): v for k, v in sd.items()
          if isinstance(v, np.ndarray) or hasattr(v, "shape")}

    def get(k):
        return jnp.asarray(np.ascontiguousarray(sd[k]))

    p = {
        "transformer": {
            "wpe": {"weight": get("transformer.wpe.weight")},
            "ln_f": {"weight": get("transformer.ln_f.weight")},
            "h": [],
        },
        "lm_head": {"weight": get("lm_head.weight")},
    }
    if "transformer.ln_f.bias" in sd:
        p["transformer"]["ln_f"]["bias"] = get("transformer.ln_f.bias")
    if cfg.stable_embedding and "transformer.wte.norm.weight" in sd:
        p["transformer"]["wte_norm"] = {
            "weight": get("transformer.wte.norm.weight"),
            "bias": get("transformer.wte.norm.bias")}
    if cfg.stable_embedding and "transformer.wpe.norm.weight" in sd:
        # StableEmbedding wraps wpe too (ha/attention.py:192)
        p["transformer"]["wpe_norm"] = {
            "weight": get("transformer.wpe.norm.weight"),
            "bias": get("transformer.wpe.norm.bias")}
    for i in range(cfg.n_layer):
        pre = f"transformer.h.{i}."
        blk = {
            "ln_1": {"weight": get(pre + "ln_1.weight")},
            "attn": {"c_attn": {"weight": get(pre + "attn.c_attn.weight")},
                     "c_proj": {"weight": get(pre + "attn.c_proj.weight")}},
            "ln_2": {"weight": get(pre + "ln_2.weight")},
            "mlp": {"c_fc": {"weight": get(pre + "mlp.c_fc.weight")},
                    "c_proj": {"weight": get(pre + "mlp.c_proj.weight")}},
        }
        for ln in ("ln_1", "ln_2"):
            if pre + ln + ".bias" in sd:
                blk[ln]["bias"] = get(pre + ln + ".bias")
        for mod, sub in (("attn", "c_attn"), ("attn", "c_proj"),
                         ("mlp", "c_fc"), ("mlp", "c_proj")):
            if pre + f"{mod}.{sub}.bias" in sd:
                blk[mod][sub]["bias"] = get(pre + f"{mod}.{sub}.bias")
        if pre + "attn.c_attn.lora_A.weight" in sd:
            blk["attn"]["c_attn"]["lora_A"] = get(
                pre + "attn.c_attn.lora_A.weight")
            blk["attn"]["c_attn"]["lora_B"] = get(
                pre + "attn.c_attn.lora_B.weight")
        p["transformer"]["h"].append(blk)
    return p


def gpt_state_dict_from_params(params, cfg, dtype=np.float32):
    """Inverse of gpt_params_from_state_dict: flatten our GPT pytree
    into the reference's torch state-dict names (ha/attention.py
    module tree) for .pt export. The tied wte/lm_head entries share
    ONE numpy object so the exporter emits one storage for both
    (ha/attention.py:203 weight tying)."""

    def arr(a):
        a = np.asarray(a)
        if dtype is not None and a.dtype.kind not in "iub":
            a = a.astype(dtype)  # floats (incl. ml_dtypes bf16) upcast
        return np.ascontiguousarray(a)

    sd = {}
    tied = arr(params["lm_head"]["weight"])
    sd["transformer.wte.weight"] = tied
    sd["lm_head.weight"] = tied
    tr = params["transformer"]
    sd["transformer.wpe.weight"] = arr(tr["wpe"]["weight"])
    sd["transformer.ln_f.weight"] = arr(tr["ln_f"]["weight"])
    if "bias" in tr["ln_f"]:
        sd["transformer.ln_f.bias"] = arr(tr["ln_f"]["bias"])
    for emb, ours in (("wte", "wte_norm"), ("wpe", "wpe_norm")):
        if ours in tr:
            sd[f"transformer.{emb}.norm.weight"] = arr(tr[ours]["weight"])
            sd[f"transformer.{emb}.norm.bias"] = arr(tr[ours]["bias"])
    for i, blk in enumerate(tr["h"]):
        pre = f"transformer.h.{i}."
        for ln in ("ln_1", "ln_2"):
            sd[pre + ln + ".weight"] = arr(blk[ln]["weight"])
            if "bias" in blk[ln]:
                sd[pre + ln + ".bias"] = arr(blk[ln]["bias"])
        for mod, sub in (("attn", "c_attn"), ("attn", "c_proj"),
                         ("mlp", "c_fc"), ("mlp", "c_proj")):
            leaf = blk[mod][sub]
            sd[pre + f"{mod}.{sub}.weight"] = arr(leaf["weight"])
            if "bias" in leaf:
                sd[pre + f"{mod}.{sub}.bias"] = arr(leaf["bias"])
            if "lora_A" in leaf:
                sd[pre + f"{mod}.{sub}.lora_A.weight"] = arr(leaf["lora_A"])
                sd[pre + f"{mod}.{sub}.lora_B.weight"] = arr(leaf["lora_B"])
    return sd


def load_model(ckpt_path, **_):
    """Load a GPT checkpoint (native or reference .pt). Returns
    (GPTModel spec, params). Large-checkpoint defaults per
    ha/init.py:66-75."""
    ckpt = load_checkpoint(ckpt_path)
    model_args = dict(ckpt["model_args"])
    model_args.pop("arch", None)
    if "vocab_size" not in model_args:
        model_args.update(stable_embedding=True, vocab_size=50257, bias=True)
    known = {f.name for f in dataclasses.fields(GPTConfig)}
    cfg = GPTConfig(**{k: v for k, v in model_args.items() if k in known})
    sd = ckpt["model"]
    if isinstance(sd, dict) and any("." in k for k in sd):
        params = gpt_params_from_state_dict(sd, cfg)
    else:
        params = jax.tree.map(jnp.asarray, sd)
    return GPTModel("decoder", cfg), params


# ------------------------------------------------------------- Initializer

def average_params(trees):
    """SWA-style parameter averaging across checkpoints
    (ha/init.py:292-306). Accumulate in HOST float64 (np.asarray —
    jnp.astype(float64) silently yields float32 under the default x64
    config) and round once, at mean magnitude, after dividing."""
    n = len(trees)
    return jax.tree.map(
        lambda *xs: (sum(np.asarray(x, np.float64) for x in xs) / n)
        .astype(np.asarray(xs[0]).dtype), *trees)


class Initializer:
    @classmethod
    def add_arguments(cls, parser):
        parser.add_argument('--init', type=Path, nargs='+',
                            help="Path to checkpoint(s) to initialize from")
        parser.add_argument('--reset', action='store_true',
                            help="Reset checkpoint epoch count")
        parser.add_argument('--arch', type=str, default='transformer:512',
                            help=create_model.__doc__)
        parser.add_argument('--compile', action='store_true',
                            help="(always on under jit; kept for parity)")
        parser.add_argument('--device', type=str, default='tpu',
                            help="jax platform to prefer")
        parser.add_argument('--seed', type=int, default=1337)

    def __call__(self, args, make_module=lambda spec, params: (spec, params)):
        epoch, global_step = 0, 0
        key = jax.random.PRNGKey(getattr(args, 'seed', 1337))

        if args.arch == "uk4b":
            assert args.init, "pass --init ckpt10m.pt"
            spec, params = load_model(args.init[0])
            log("initializing uk4b model")
        elif args.init:
            spec = create_model(args.arch, compile=False)
            # no random init here: the checkpoint(s) fully define the
            # params below — for 100M+-param archs spec.init would be
            # seconds of discarded device work on every resume
            loaded = []
            ckpt = None
            for path in args.init:
                ckpt = load_checkpoint(path)
                if "encoder" in ckpt:       # hac System checkpoint layout
                    state = {"encoder": ckpt["encoder"],
                             "recognizer": ckpt["recognizer"]}
                else:
                    state = ckpt.get("model", ckpt)
                if isinstance(spec, GPTModel) and any(
                        "." in str(k) for k in state):
                    loaded.append(gpt_params_from_state_dict(state,
                                                             spec.config))
                else:
                    loaded.append(jax.tree.map(jnp.asarray, state))
            params = loaded[0] if len(loaded) == 1 else average_params(loaded)
            if len(loaded) > 1:
                log('averaging models')
            if not args.reset and isinstance(ckpt, dict):
                epoch = ckpt.get('epoch', -1) + 1
                global_step = ckpt.get('global_step', -1) + 1
        else:
            spec = create_model(args.arch, compile=False)
            params = spec.init(key)
            log('initializing randomly')

        spec, params = make_module(spec, params)
        n_params = sum(x.size for x in jax.tree.leaves(params))
        log('model parameters', n_params)
        return (spec, params), epoch, global_step


def main():
    from haloop_tpu.argparse import Formatter

    parser = argparse.ArgumentParser(description='hai initializes models',
                                     formatter_class=Formatter)
    parser.add_argument('--seed', type=int, default=1337)
    parser.add_argument('arch', type=str, help=create_model.__doc__)
    parser.add_argument('path', type=Path)
    args = parser.parse_args()

    spec = create_model(args.arch)
    params = spec.init(jax.random.PRNGKey(args.seed))
    print('creating a new model')
    print(spec)
    model_args = {"arch": args.arch}
    if isinstance(spec, GPTModel):
        model_args.update(spec.config.state_dict())
        print(spec.config)
    Checkpointer(args.path, save='all')(
        loss=float('inf'), epoch=-1,
        checkpoint_fn=lambda: {'model': jax.tree.map(np.asarray, params),
                               'model_args': model_args})


if __name__ == '__main__':
    main()
