"""Fake `sentencepiece` module for tests (VERDICT r3 next-round item 4).

No sentencepiece wheel exists in this image, so the spm-reachable code
in spm_train/spm_encode/score(hap)/repl(hat) had never executed. This
stub implements the exact API subset those modules call, with the real
library's id layout (0 <unk>, 1 <s>, 2 </s>, 3..258 byte pieces
<0x00>..<0xFF>, then learned word pieces '▁word'), so the surrounding
binarization / packing / decode logic runs for real in CI. Injected via
PYTHONPATH (subprocess CLI tests) or sys.modules (in-process); the
production modules keep their real-library imports and gates untouched.

Model file format: JSON {"pieces": [...]} — NOT the real spm proto; a
real .model will fail loudly here (json decode error), never silently
misparse.
"""

import collections
import json


def _specials():
    return ["<unk>", "<s>", "</s>"] + [f"<0x{b:02X}>" for b in range(256)]


class SentencePieceProcessor:
    def __init__(self, model_file=None):
        if model_file is None:
            raise TypeError("model_file is required")
        with open(model_file) as f:
            self._pieces = json.load(f)["pieces"]
        self._ids = {p: i for i, p in enumerate(self._pieces)}

    # -- real-library API subset used by haloop_tpu --------------------

    def encode(self, text):
        if isinstance(text, (list, tuple)):
            return [self.encode(t) for t in text]
        ids = []
        for word in text.split():
            piece = "▁" + word
            if piece in self._ids:
                ids.append(self._ids[piece])
            else:
                # byte fallback over the piece's utf-8 bytes
                ids.extend(3 + b for b in piece.encode("utf-8"))
        return ids

    def decode(self, ids):
        out, byte_run = [], bytearray()

        def flush():
            if byte_run:
                out.append(byte_run.decode("utf-8", "replace"))
                byte_run.clear()

        for i in ids:
            if 3 <= i < 259:
                byte_run.append(i - 3)
                continue
            flush()
            if 0 <= i < len(self._pieces) and i not in (0, 1, 2):
                out.append(self._pieces[i])
        flush()
        return "".join(out).replace("▁", " ").lstrip(" ")

    def id_to_piece(self, i):
        return self._pieces[i]

    def piece_size(self):
        return len(self._pieces)

    def vocab_size(self):
        return len(self._pieces)

    def __len__(self):
        return len(self._pieces)


class SentencePieceTrainer:
    @staticmethod
    def train(input=None, model_prefix=None, vocab_size=512,
              model_type="bpe", byte_fallback=True,
              normalization_rule_name="nfkc", split_digits=True, **kw):
        assert byte_fallback, "stub mimics byte_fallback id layout"
        counts = collections.Counter()
        with open(input) as f:
            for line in f:
                counts.update("▁" + w for w in line.split())
        pieces = _specials()
        budget = vocab_size - len(pieces)
        assert budget >= 0, f"vocab_size {vocab_size} < specials"
        pieces += [w for w, _ in counts.most_common(budget)]
        with open(f"{model_prefix}.model", "w") as f:
            json.dump({"pieces": pieces}, f)
        with open(f"{model_prefix}.vocab", "w") as f:
            for p in pieces:
                f.write(f"{p}\t0\n")
