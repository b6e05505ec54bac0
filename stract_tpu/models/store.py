"""Encoder checkpoint store — save/load the dual- and cross-encoder models as
self-contained directories (role of the reference's on-disk model dirs read by
config, config/mod.rs:270-272 crossencoder_model_path/dual_encoder_model_path;
the reference loads candle safetensors — here the native format is flax
msgpack + vocab.txt, with HF safetensors dirs accepted too).

Layout:
    <path>/config.json     BertConfig fields + {"max_len", "kind"}
    <path>/params.msgpack  flax.serialization.to_bytes(params)
    <path>/vocab.txt       one wordpiece per line, line number = id
or an HF-style dir containing model.safetensors + vocab.txt (loaded through
bert.load_hf_safetensors).
"""

from __future__ import annotations

import dataclasses
import json
import os

import jax
import jax.numpy as jnp
from flax import serialization

from .bert import BertConfig, load_hf_safetensors
from .wordpiece import WordPieceTokenizer


def _cfg_to_json(cfg: BertConfig) -> dict:
    d = dataclasses.asdict(cfg)
    d["dtype"] = jnp.dtype(cfg.dtype).name if cfg.dtype is not None else "bfloat16"
    return d


def _cfg_from_json(d: dict) -> BertConfig:
    d = dict(d)
    d["dtype"] = jnp.dtype(d.get("dtype", "bfloat16"))
    fields = {f.name for f in dataclasses.fields(BertConfig)}
    return BertConfig(**{k: v for k, v in d.items() if k in fields})


def save_encoder(path: str, cfg: BertConfig, params, tokenizer: WordPieceTokenizer,
                 max_len: int, kind: str) -> None:
    os.makedirs(path, exist_ok=True)
    meta = _cfg_to_json(cfg)
    meta["max_len"] = int(max_len)
    meta["kind"] = kind
    with open(os.path.join(path, "config.json"), "w") as fh:
        json.dump(meta, fh, indent=1)
    import flax.linen as nn

    with open(os.path.join(path, "params.msgpack"), "wb") as fh:
        fh.write(serialization.to_bytes(nn.meta.unbox(jax.device_get(params))))
    with open(os.path.join(path, "vocab.txt"), "w", encoding="utf-8") as fh:
        for piece, _ in sorted(tokenizer.vocab.items(), key=lambda kv: kv[1]):
            fh.write(piece + "\n")


def load_encoder(path: str, model_ctor, kind: str):
    """→ (cfg, params, tokenizer, max_len). model_ctor(cfg) → flax module
    (builds the param template for msgpack restore). An HF safetensors dir
    (model.safetensors present) loads through load_hf_safetensors instead —
    its config.json uses HF field names."""
    tok = WordPieceTokenizer.from_vocab_file(os.path.join(path, "vocab.txt"))
    with open(os.path.join(path, "config.json")) as fh:
        meta = json.load(fh)

    if os.path.exists(os.path.join(path, "model.safetensors")):
        cfg = BertConfig(
            vocab_size=meta["vocab_size"],
            hidden_size=meta["hidden_size"],
            num_layers=meta.get("num_hidden_layers", meta.get("num_layers", 12)),
            num_heads=meta.get("num_attention_heads", meta.get("num_heads", 12)),
            intermediate_size=meta["intermediate_size"],
            max_position_embeddings=meta["max_position_embeddings"],
            type_vocab_size=meta.get("type_vocab_size", 2),
        )
        head = "score" if kind == "cross" else None
        params = load_hf_safetensors(os.path.join(path, "model.safetensors"), cfg, head=head)
        return cfg, params, tok, min(cfg.max_position_embeddings, 512)

    if meta.get("kind") not in (None, kind):
        raise ValueError(f"{path} holds a {meta['kind']!r} encoder, wanted {kind!r}")
    cfg = _cfg_from_json(meta)
    model = model_ctor(cfg)
    import flax.linen as nn

    dummy = jnp.zeros((1, 8), dtype=jnp.int32)
    template = nn.meta.unbox(
        jax.eval_shape(lambda: model.init(jax.random.PRNGKey(0), dummy, jnp.ones((1, 8), jnp.int32)))
    )
    with open(os.path.join(path, "params.msgpack"), "rb") as fh:
        params = serialization.from_bytes(template, fh.read())
    return cfg, params, tok, int(meta.get("max_len", 128))
