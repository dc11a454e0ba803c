"""High-level model facade.

Mirrors the reference's `model::Model` public interface
(kuiper/include/model/model.h:15-95: init / predict / forward / encode /
decode / is_sentence_ending / embedding) so a KuiperLLama user finds the
same surface, while everything underneath is the functional TPU engine.

    model = KuiperModel.from_checkpoint("m.q8.bin", "tokenizer.model",
                                        family="llama2")
    model.init()                       # device placement (mesh optional)
    text = model.generate("hi", 128)   # the demo loop, batched prefill
    ids = model.encode("hi"); model.decode(ids)
    logits = model.forward(ids)        # [T, vocab] fp32
    next_id = model.predict(ids)       # argmax over the last position
"""

from __future__ import annotations

import os
from typing import List, Optional, Sequence

import jax.numpy as jnp
import numpy as np

from .config import ModelConfig
from .errors import InvalidArgument, ModelParseError, PathNotValid, check
from .models import decoder
from .params import to_device
from .serving.generate import GenerateResult, Generator
from .tokenizer import Tokenizer, load_tokenizer


class KuiperModel:
    def __init__(self, cfg: ModelConfig, raw_params, tokenizer: Optional[Tokenizer] = None):
        self.cfg = cfg
        self._raw_params = raw_params
        self.tokenizer = tokenizer
        self.params = None
        self._generator: Optional[Generator] = None
        self._mesh = None
        self._forward_fn = None

    # ---- construction (reference Model ctor + gen_model_from_file)

    @classmethod
    def from_checkpoint(cls, model_path: str, tokenizer_path: Optional[str] = None,
                        family: str = "llama2", quantized: Optional[bool] = None,
                        ) -> "KuiperModel":
        if not os.path.exists(model_path):
            raise PathNotValid(model_path)
        if os.path.isdir(model_path):
            from .checkpoint.hf import load_hf

            cfg, params = load_hf(model_path)
        else:
            from .checkpoint.binfmt import load_bin

            cfg, params = load_bin(model_path, family=family, quantized=quantized)
        tok = None
        if tokenizer_path:
            if not os.path.exists(tokenizer_path):
                raise PathNotValid(tokenizer_path)
            tok = load_tokenizer(tokenizer_path, family=cfg.family,
                                 vocab_size=cfg.vocab_size)
            # the reference overrides vocab_size from the tokenizer
            # (model.cpp:172); we keep the checkpoint's, but a tokenizer
            # bigger than the model vocab would encode ids the embedding
            # cannot look up — reject it
            check(tok.vocab_size <= cfg.vocab_size,
                  f"tokenizer vocab {tok.vocab_size} exceeds model vocab "
                  f"{cfg.vocab_size}", ModelParseError)
        return cls(cfg, params, tok)

    # ---- init (reference Model::init: device select + weight upload)

    def init(self, dtype=jnp.bfloat16, mesh=None, cache_len: Optional[int] = None):
        """Device placement (reference Model::init). With `mesh`, weights
        are tensor-sharded and the DENSE-cache Generator runs under
        shard_map (ShardedForward). Note the engine asymmetry: the
        continuous-batching serving path accepts `mesh` only through
        serving.engine.PagedEngine(mesh=...) — the paged backend is the
        production sharded-serving path; the dense Engine is single-device
        by design (short-context, simple)."""
        if mesh is not None:
            from .parallel.sharded import ShardedForward
            from .parallel.shardings import shard_params

            self.params = to_device(self._raw_params, dtype=dtype)
            self._forward_fn = ShardedForward(self.cfg, mesh, self.params)
            self.params = shard_params(self.params, mesh, self.cfg)
            self._mesh = mesh
        else:
            self.params = to_device(self._raw_params, dtype=dtype)
        self._generator = Generator(
            self.cfg, self.params, self.tokenizer,
            cache_len=cache_len, forward_fn=self._forward_fn,
        )
        return self

    def _ready(self):
        check(self.params is not None, "call init() first", InvalidArgument)

    # ---- tokenizer passthrough (model.h encode/decode/is_sentence_ending)

    def encode(self, text: str) -> List[int]:
        check(self.tokenizer is not None, "no tokenizer configured")
        return self.tokenizer.encode(text)

    def decode(self, ids: Sequence[int]) -> str:
        check(self.tokenizer is not None, "no tokenizer configured")
        return self.tokenizer.decode(ids)

    def is_sentence_ending(self, token_id: int) -> bool:
        check(self.tokenizer is not None, "no tokenizer configured")
        return self.tokenizer.is_stop(token_id)

    # ---- embedding (model.h embedding/fill_input)

    def embedding(self, ids: Sequence[int]):
        """Token embeddings [len(ids), dim] (reference EmbeddingOutput)."""
        self._ready()
        return self.params["tok_emb"][jnp.asarray(list(ids), jnp.int32)]

    # ---- forward/predict (model.h forward/predict + post_processing)

    def forward(self, ids: Sequence[int]):
        """Full-sequence logits [T, vocab] fp32."""
        self._ready()
        ids = list(ids)
        cache = decoder.init_kv_cache(self.cfg, 1, max_len=max(len(ids), 8))
        positions = jnp.asarray(np.arange(len(ids), dtype=np.int32)[None])
        logits, _ = decoder.forward(
            self.cfg, self.params, jnp.asarray([ids], jnp.int32), positions,
            cache,
        )
        return logits[0]

    def predict(self, ids: Sequence[int]) -> int:
        """Greedy next token after the sequence (reference predict +
        ArgmaxSampler)."""
        logits = self.forward(ids)
        return int(jnp.argmax(logits[-1]))

    # ---- generation (reference demo generate loop)

    def generate(self, prompt: str, max_new_tokens: int = 128, **kw) -> GenerateResult:
        self._ready()
        check(self.tokenizer is not None, "no tokenizer configured")
        return self._generator.generate(prompt, max_new_tokens, **kw)

    def generate_ids(self, prompt_ids: Sequence[int], max_new_tokens: int = 128,
                     **kw):
        self._ready()
        ids, _, _ = self._generator.generate_ids(prompt_ids, max_new_tokens, **kw)
        return ids
