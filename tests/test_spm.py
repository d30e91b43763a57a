"""Execute every spm-reachable line of OUR code against the fake
sentencepiece stub (tests/_spm_stub): spm_train, spm_encode --model in
block and stream modes, hap --spm (packed scorer + --verbose pieces),
and hat --spm generation. The real-library calls stay gated; the stub
implements the API subset with the real id layout (specials + 256 byte
pieces + word pieces). VERDICT r3 Missing #3 / next-round item 4."""

import json
import os
import pathlib
import subprocess
import sys

import numpy as np
import pytest

STUB = str(pathlib.Path(__file__).parent / "_spm_stub")


def run(cmd, **kw):
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    env["PALLAS_AXON_POOL_IPS"] = ""
    env["PYTHONPATH"] = STUB + os.pathsep + env.get("PYTHONPATH", "")
    return subprocess.run(cmd, env=env, capture_output=True, text=True,
                          **kw)


CORPUS = ("hello world\n"
          "hello there world\n"
          "the quick brown fox\n"
          "hello fox\n")


@pytest.fixture(scope="module")
def spm_model(tmp_path_factory):
    d = tmp_path_factory.mktemp("spm")
    corpus = d / "corpus.txt"
    corpus.write_text(CORPUS)
    prefix = d / "m"
    r = run([sys.executable, "-m", "haloop_tpu.spm_train",
             "--vocab-size", "280", "--model-prefix", str(prefix),
             str(corpus)])
    assert r.returncode == 0, r.stderr
    return str(prefix) + ".model"


def _sp(spm_model):
    sys.path.insert(0, STUB)
    try:
        import sentencepiece as spm
    finally:
        sys.path.remove(STUB)
    return spm.SentencePieceProcessor(model_file=spm_model)


def test_spm_train_writes_model_and_vocab(spm_model):
    pieces = json.load(open(spm_model))["pieces"]
    assert pieces[:3] == ["<unk>", "<s>", "</s>"]
    assert pieces[3] == "<0x00>" and pieces[258] == "<0xFF>"
    assert "▁hello" in pieces and "▁fox" in pieces
    assert len(pieces) <= 280
    vocab_file = spm_model[:-len(".model")] + ".vocab"
    assert len(open(vocab_file).readlines()) == len(pieces)


def test_stub_round_trip_and_byte_fallback(spm_model):
    sp = _sp(spm_model)
    ids = sp.encode("hello fox")
    assert sp.decode(ids) == "hello fox"
    assert all(i >= 259 for i in ids)           # both are learned pieces
    oov = sp.encode("zebra")                    # unseen: byte fallback
    assert all(3 <= i < 259 for i in oov)
    assert sp.decode(oov) == "zebra"
    assert sp.encode(["hello fox", "zebra"]) == [ids, oov]


def test_spm_encode_block_mode(spm_model, tmp_path):
    inp = tmp_path / "in.txt"
    inp.write_text("hello world\nthe quick brown fox\n")
    out = tmp_path / "out.bin"
    r = run([sys.executable, "-m", "haloop_tpu.spm_encode",
             "--model", spm_model, "--block", "8", str(inp), str(out)])
    assert r.returncode == 0, r.stderr

    sp = _sp(spm_model)
    expect = []
    for line in ["hello world", "the quick brown fox"]:
        ids = sp.encode("\n" + line + "\n")
        expect.extend(ids + [0] * (8 - len(ids)))
    got = np.fromfile(out, dtype=np.uint16)
    np.testing.assert_array_equal(got, np.asarray(expect, np.uint16))

    # real bytes = payload for bpb: sum(len(utf8('\n'+line+'\n')) - 1)
    real = (len("\nhello world\n") - 1) + (len("\nthe quick brown fox\n") - 1)
    assert f"real bytes {real}" in r.stdout


def test_spm_encode_block_too_long_fails(spm_model, tmp_path):
    inp = tmp_path / "in.txt"
    inp.write_text("one tiny line\n"
                   "aaa bbb ccc ddd eee fff ggg hhh iii jjj kkk lll\n")
    r = run([sys.executable, "-m", "haloop_tpu.spm_encode",
             "--model", spm_model, "--block", "4",
             str(inp), str(tmp_path / "out.bin")])
    assert r.returncode != 0
    assert "too long" in (r.stderr + r.stdout)


def test_spm_encode_stream_mode(spm_model, tmp_path):
    inp = tmp_path / "in.txt"
    inp.write_text(CORPUS)
    out = tmp_path / "out.bin"
    r = run([sys.executable, "-m", "haloop_tpu.spm_encode",
             "--model", spm_model, "--repeat", "2", str(inp), str(out)])
    assert r.returncode == 0, r.stderr
    sp = _sp(spm_model)
    expect = sp.encode(CORPUS) * 2
    got = np.fromfile(out, dtype=np.uint16)
    np.testing.assert_array_equal(got, np.asarray(expect, np.uint16))
    assert f"real bytes {2 * len(CORPUS.encode())}" in r.stdout


@pytest.fixture(scope="module")
def nano_ckpt(tmp_path_factory):
    exp = tmp_path_factory.mktemp("spm_gpt") / "nano"
    r = run([sys.executable, "-m", "haloop_tpu.init",
             "gpt-nano:300:64", str(exp)])
    assert r.returncode == 0, r.stderr
    return str(exp / "best.pt")


def test_hap_spm_scores(spm_model, nano_ckpt):
    lines = "hello world\nthe quick brown fox\nzebra\n"
    r = run([sys.executable, "-m", "haloop_tpu.score",
             "--spm", spm_model, nano_ckpt], input=lines)
    assert r.returncode == 0, r.stderr
    rows = [l.split("\t") for l in r.stdout.strip().split("\n")]
    assert len(rows) == 3 and all(len(row) == 3 for row in rows)
    sp = _sp(spm_model)
    for row, line in zip(rows, lines.strip().split("\n")):
        assert int(row[1]) == len(sp.encode(line))   # token count column
        float(row[0])                                # nll parses


def test_hap_spm_verbose_pieces(spm_model, nano_ckpt):
    r = run([sys.executable, "-m", "haloop_tpu.score", "--verbose",
             "--spm", spm_model, nano_ckpt], input="hello fox\n")
    assert r.returncode == 0, r.stderr
    assert "▁hello" in r.stdout and "▁fox" in r.stdout


def test_hat_spm_generates(spm_model, nano_ckpt, tmp_path):
    r = run([sys.executable, "-m", "haloop_tpu.repl",
             "--spm", spm_model, "--steps", "8",
             "--histfile", str(tmp_path / "hist"), nano_ckpt],
            input="hello world\n")
    assert r.returncode == 0, r.stderr[-2000:]
    assert "tok/s" in r.stderr or len(r.stdout) > 0
