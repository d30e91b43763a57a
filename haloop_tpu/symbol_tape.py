"""Vocabularies, tokenizers, and symbol tapes (reference:
ha/symbol_tape.py — behavior/API parity only; the implementation is
numpy-first and organized as glyph tables + thin classes).

Everything here is host-side and torch-free: token streams are numpy
arrays, binarized corpora are ``np.memmap`` uint16 views (replacing
torch ShortStorage), and the long-stream batcher is a strided reshape
rather than a per-tape copy loop.
"""

import math
import sys
from typing import Protocol

import numpy as np

from haloop_tpu import xen

# ---------------------------------------------------------- glyph tables

# printable-ascii id space with control-picture glyphs for 0..31 and 127
# (id 0 renders as ε; '\n' as ␤, '\t' as ⇥ — ha/symbol_tape.py:106-120)
_ASCII_GLYPHS = (
    "ε␁␂␃␄␅␆␇␈␉␤⇥␌␍␎␏␐␑␒␓␔␕␖␗␘␙␚␛␜␝␞␟"
    " !\"#$%&'()*+,-./0123456789:;<=>?"
    "@ABCDEFGHIJKLMNOPQRSTUVWXYZ[\\]^_"
    "`abcdefghijklmnopqrstuvwxyz{|}~␡"
)

_SPIN_TOKENS = ('<↓>', '<s>', '<↑>')          # prompt-control vocabulary
_BEL = 7                                       # unk id in byte/ascii modes


class DictionaryLike(Protocol):
    def encode(self, text, extend_vocab=False): ...
    def decode(self, ids): ...
    def format(self, s) -> str: ...
    def get_idx(self, string, extend_vocab=False) -> int: ...


# ------------------------------------------------------------ vocabularies

class Vocabulary(DictionaryLike):
    """Generic id<->symbol table. ``id_to_string``/``string_to_id`` are
    plain dict attributes (callers mutate them directly, and hal
    checkpoints persist them via state_dict)."""

    def __init__(self, pad_token="·"):
        self.id_to_string = {0: pad_token}
        self.string_to_id = {pad_token: 0}
        self.pad_id = self.unk_id = 0

    # -- persistence (hal checkpoints carry the vocab) --
    def state_dict(self):
        return {'id_to_string': self.id_to_string, 'pad_id': self.pad_id,
                'unk_id': self.unk_id}

    def load_state_dict(self, state_dict):
        self.id_to_string = state_dict['id_to_string']
        self.string_to_id = {v: k for k, v in self.id_to_string.items()}
        self.pad_id = state_dict['pad_id']
        self.unk_id = state_dict['unk_id']

    def __len__(self):
        return len(self.id_to_string)

    # -- construction --
    @classmethod
    def _from_symbols(cls, symbols, pad_id=0, unk_id=_BEL):
        self = cls.__new__(cls)
        self.id_to_string = dict(enumerate(symbols))
        self.string_to_id = {s: i for i, s in self.id_to_string.items()}
        self.pad_id = pad_id
        self.unk_id = unk_id
        return self

    @classmethod
    def bytes(cls, n=256):
        """One id per byte value; BEL (7) doubles as unk."""
        return cls._from_symbols(bytes([x]) for x in range(n))

    @classmethod
    def ascii(cls):
        return cls._from_symbols(_ASCII_GLYPHS)

    # -- lookup --
    def add_new_word(self, string):
        idx = len(self.string_to_id)
        self.string_to_id[string] = idx
        self.id_to_string[len(self.id_to_string)] = string
        return idx

    def get_idx(self, string, extend_vocab=False):
        try:
            as_byte = bytes([string if isinstance(string, int)
                             else ord(string)])
        except (ValueError, TypeError):
            as_byte = None
        if as_byte is not None and as_byte in self.string_to_id:
            return self.string_to_id[as_byte]
        if string in self.string_to_id:
            return self.string_to_id[string]
        return (self.add_new_word(string) if extend_vocab
                else self.unk_id)

    # -- codec --
    def encode(self, text, extend_vocab=False):
        ids = [self.get_idx(c, extend_vocab=extend_vocab) for c in text]
        return np.array(ids, dtype=np.int64)

    def decode(self, ids):
        symbols = [self.id_to_string[int(i)] for i in ids]
        if symbols and isinstance(symbols[0], bytes) or \
                isinstance(self.id_to_string.get(0), bytes):
            labels = b''.join(symbols)
            return labels, labels.split(b' ')
        labels = ''.join(symbols)
        return labels, labels.split(' ')

    def format(self, s):
        if isinstance(s, bytes):
            try:
                return s.decode('utf-8')
            except UnicodeDecodeError:
                return s
        return s


class WordVocabulary(Vocabulary):
    """One id per word/BPE piece, plus spin-prompt normalization: the
    control tokens <↑>/<↓>/<?>/<s> at the front of a sentence merge
    under fixed rules (ha/symbol_tape.py:131-187)."""

    def __init__(self):
        self.id_to_string = {}
        self.string_to_id = {}
        self.pad_id = self.unk_id = 0

    def get_idx(self, string, extend_vocab=False):
        idx = self.string_to_id.get(string)
        if idx is not None:
            return idx
        return (self.add_new_word(string) if extend_vocab
                else self.pad_id)

    raw_encode = get_idx

    @staticmethod
    def _merge_prompts(prompts):
        match prompts:
            case [] | [_]:
                return prompts
            case ["<↓>", _] | [_, "<↓>"]:
                return ["<↓>"]
            case ["<?>", _] | [_, "<?>"]:
                return ["<?>"]
            case ["<↑>", "<↑>"]:
                return ["<↑>"]
        raise AssertionError(prompts)

    def encode(self, text, extend_vocab=False):
        prompts, words = [], []
        for tok in text.split():
            (prompts if tok in _SPIN_TOKENS else words).append(tok)
        seq = self._merge_prompts(prompts) + words
        return np.array([self.get_idx(t, extend_vocab=extend_vocab)
                         for t in seq], dtype=np.int64)

    def decode(self, ids):
        labels = [self.id_to_string[int(i)] for i in ids]
        return labels, ''.join(labels).lstrip('▁').split('▁')

    def format(self, s):
        return ' '.join(s)


# ------------------------------------------------------------- tokenizers

def tokenize_bytes(text_file, vocab, extend_vocab=False):
    if vocab is None:
        vocab = Vocabulary.bytes()
    print(f"Reading bytes from: {text_file}", file=sys.stderr)
    with open(text_file, 'rb') as f:
        data = np.frombuffer(f.read(), dtype=np.uint8).copy()
    return data, vocab


def tokenize_chars(text_file, vocab, extend_vocab=True):
    if vocab is None:
        vocab = Vocabulary()
    print(f"Reading text file from: {text_file}", file=sys.stderr)
    with open(text_file) as f:
        ids = [vocab.get_idx(ch, extend_vocab=extend_vocab)
               for line in f for ch in line]
    return np.array(ids, dtype=np.int16), vocab


def tokenize_words(text_file, vocab, extend_vocab=True):
    if vocab is None:
        vocab = WordVocabulary()
    print(f"Using word vocabulary from first column of: {text_file}",
          file=sys.stderr)
    with open(text_file) as f:
        ids = [vocab.get_idx(line.strip().split(maxsplit=1)[0],
                             extend_vocab=extend_vocab) for line in f]
    sample = ' '.join(vocab.id_to_string[i]
                      for i in range(min(32, len(vocab))))
    print(f"Vocabulary size {len(vocab)}, samples:", sample, '...',
          file=sys.stderr)
    return np.array(ids, dtype=np.int32), vocab


def load_u16(filename):
    data = np.memmap(filename, dtype=np.uint16, mode='r')
    print(f"Memory mapping u16 from: {filename}, shape: {data.shape}",
          file=sys.stderr)
    return data


# ------------------------------------------------------------ symbol tape

class SymbolTapeNoPad:
    """Cut one long token stream into ``batch_size`` parallel tapes
    served in ``bptt_len`` chunks (ha/symbol_tape.py:239-279 semantics:
    tape k starts at offset k*(tape_len-1), so tape 0's leading slot
    acts as the one-token pad)."""

    def __init__(self, data, batch_size, bptt_len):
        self.batch_size = batch_size
        self.bptt_len = bptt_len
        self.tape_len = math.ceil(len(data) / batch_size)
        self.tape_parts, self.trailing_tokens = divmod(self.tape_len,
                                                       bptt_len)
        self.data = data
        self.pad_value = 0

    def __len__(self):
        return self.tape_parts + bool(self.trailing_tokens)

    def __getitem__(self, i):
        width = (self.trailing_tokens if i == self.tape_parts
                 else self.bptt_len)
        dtype = np.asarray(self.data).dtype
        out = np.full((width, self.batch_size), self.pad_value, dtype)
        starts = (np.arange(self.batch_size) * (self.tape_len - 1)
                  + i * self.bptt_len)
        for k, start in enumerate(starts):
            chunk = self.data[start:start + width]
            out[:len(chunk), k] = chunk
        return out


# ----------------------------------------------------------- descriptors

def _word_file_vocab(path):
    _, vocab = tokenize_words(path, None)
    return vocab


def _numeric_vocab(n):
    vocab = WordVocabulary()
    for word in range(int(n)):
        vocab.get_idx(str(word), extend_vocab=True)
    return vocab


_VOCAB_FACTORIES = {
    'bytes': Vocabulary.bytes,
    'ascii': Vocabulary.ascii,
    'cmu': lambda: xen.Vocabulary(add_closures=False),
    'xen': lambda: xen.Vocabulary(add_closures=True),
    '512': lambda: _numeric_vocab(512),
}


def make_vocab(vocab_descriptor):
    "Possible values: bytes|ascii|cmu|xen|words:path/to/words.txt|path/to/words.txt"
    head, _, rest = vocab_descriptor.partition(':')
    if not rest and head in _VOCAB_FACTORIES:
        return _VOCAB_FACTORIES[head]()
    if head == 'words' and rest:
        return _word_file_vocab(rest)
    if not rest:
        return _word_file_vocab(head)
    raise ValueError("Unknown vocabulary descriptor. "
                     + make_vocab.__doc__)
