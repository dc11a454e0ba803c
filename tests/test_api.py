"""KuiperModel facade tests (the reference model::Model surface)."""

import struct

import numpy as np
import pytest
import jax.numpy as jnp

from kuiperllama_tpu.api import KuiperModel
from kuiperllama_tpu.checkpoint.binfmt import write_v0
from kuiperllama_tpu.config import tiny_config
from kuiperllama_tpu.errors import PathNotValid
from kuiperllama_tpu.params import random_params
from kuiperllama_tpu.ops.linear import set_use_pallas


@pytest.fixture(autouse=True)
def _xla_path():
    set_use_pallas(False)
    yield
    set_use_pallas(True)


def _write_tok(path, pieces_scores):
    with open(path, "wb") as f:
        f.write(struct.pack("<i", 16))
        for piece, score in pieces_scores:
            raw = piece.encode("utf-8")
            f.write(struct.pack("<f", score))
            f.write(struct.pack("<i", len(raw)))
            f.write(raw)


@pytest.fixture(scope="module")
def ckpt(tmp_path_factory):
    d = tmp_path_factory.mktemp("api")
    cfg = tiny_config("llama2", seq_len=64)
    params = random_params(cfg, seed=7)
    mp = str(d / "m.bin")
    write_v0(mp, cfg, params)
    vocab = [("<unk>", 0.0), ("\n<s>\n", 0.0), ("\n</s>\n", 0.0),
             (" ", -2.0), ("h", -3.0), ("i", -3.1), ("hi", -1.0), (" hi", -0.5)]
    tp = str(d / "tok.bin")
    _write_tok(tp, vocab)
    return mp, tp


def test_facade_lifecycle(ckpt):
    mp, tp = ckpt
    m = KuiperModel.from_checkpoint(mp, tp, family="llama2").init(
        dtype=jnp.float32, cache_len=64
    )
    ids = m.encode("hi")
    assert ids[0] == 1
    assert m.decode(ids) == "hi"
    assert m.is_sentence_ending(2)
    emb = m.embedding(ids)
    assert emb.shape == (len(ids), m.cfg.dim)
    logits = m.forward(ids)
    assert logits.shape == (len(ids), m.cfg.vocab_size)
    nxt = m.predict(ids)
    assert 0 <= nxt < m.cfg.vocab_size
    # predict must agree with a generate() first token (greedy)
    res = m.generate("hi", max_new_tokens=3)
    assert res.tokens[0] == nxt


def test_facade_missing_path():
    with pytest.raises(PathNotValid):
        KuiperModel.from_checkpoint("/nonexistent.bin")


def test_facade_requires_init(ckpt):
    mp, tp = ckpt
    m = KuiperModel.from_checkpoint(mp, tp)
    with pytest.raises(Exception):
        m.forward([1, 2])
