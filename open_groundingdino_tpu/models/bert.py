"""BERT text encoder in Flax.

A from-scratch implementation of the BERT encoder stack with the one
capability the reference had to monkey-patch HuggingFace for
(reference bertwarper.py:17-166): a custom *3-D* self-attention mask
(block-diagonal between '.'-delimited phrases) and custom per-phrase
position ids are first-class inputs.

Only the pieces GroundingDINO uses are implemented: embeddings + encoder
returning `last_hidden_state`.  The pooler is omitted — the reference
freezes it and never consumes its output (reference groundingdino.py:113-114).

Weight layout matches HuggingFace `BertModel` 1:1 via
utils/torch_convert.convert_bert_state_dict, so the text tower of published
GroundingDINO checkpoints loads exactly.
"""
from __future__ import annotations

from dataclasses import dataclass

import flax.linen as nn
import jax.numpy as jnp


@dataclass(frozen=True)
class BertConfig:
    vocab_size: int = 30522
    hidden_size: int = 768
    num_hidden_layers: int = 12
    num_attention_heads: int = 12
    intermediate_size: int = 3072
    max_position_embeddings: int = 512
    type_vocab_size: int = 2
    layer_norm_eps: float = 1e-12
    hidden_dropout_prob: float = 0.1
    attention_probs_dropout_prob: float = 0.1

    @property
    def head_dim(self) -> int:
        return self.hidden_size // self.num_attention_heads


_MASK_NEG = -1e9  # additive mask value; softmax saturates identically to HF's dtype.min


class BertEmbeddings(nn.Module):
    cfg: BertConfig

    @nn.compact
    def __call__(self, input_ids, token_type_ids, position_ids, deterministic=True):
        c = self.cfg
        x = (
            nn.Embed(c.vocab_size, c.hidden_size, name="word_embeddings")(input_ids)
            + nn.Embed(
                c.max_position_embeddings, c.hidden_size, name="position_embeddings"
            )(position_ids)
            + nn.Embed(c.type_vocab_size, c.hidden_size, name="token_type_embeddings")(
                token_type_ids
            )
        )
        x = nn.LayerNorm(epsilon=c.layer_norm_eps, name="ln")(x)
        return nn.Dropout(c.hidden_dropout_prob)(x, deterministic=deterministic)


class BertLayer(nn.Module):
    cfg: BertConfig

    @nn.compact
    def __call__(self, x, attn_bias, deterministic=True):
        c = self.cfg
        B, T, _ = x.shape
        H, D = c.num_attention_heads, c.head_dim

        q = nn.Dense(c.hidden_size, name="q")(x).reshape(B, T, H, D)
        k = nn.Dense(c.hidden_size, name="k")(x).reshape(B, T, H, D)
        v = nn.Dense(c.hidden_size, name="v")(x).reshape(B, T, H, D)

        scores = jnp.einsum("bfhd,bthd->bhft", q, k) / jnp.sqrt(D).astype(x.dtype)
        scores = scores + attn_bias  # (B, 1, F, T) additive
        probs = nn.softmax(scores, axis=-1)
        probs = nn.Dropout(c.attention_probs_dropout_prob)(
            probs, deterministic=deterministic
        )
        ctx = jnp.einsum("bhft,bthd->bfhd", probs, v).reshape(B, T, c.hidden_size)

        attn_out = nn.Dense(c.hidden_size, name="attn_out")(ctx)
        attn_out = nn.Dropout(c.hidden_dropout_prob)(attn_out, deterministic=deterministic)
        x = nn.LayerNorm(epsilon=c.layer_norm_eps, name="attn_ln")(x + attn_out)

        h = nn.Dense(c.intermediate_size, name="inter")(x)
        h = nn.gelu(h, approximate=False)
        h = nn.Dense(c.hidden_size, name="out")(h)
        h = nn.Dropout(c.hidden_dropout_prob)(h, deterministic=deterministic)
        return nn.LayerNorm(epsilon=c.layer_norm_eps, name="out_ln")(x + h)


class BertModel(nn.Module):
    """Returns last_hidden_state: (B, T, hidden)."""

    cfg: BertConfig

    @nn.compact
    def __call__(
        self,
        input_ids,                 # (B, T) int32
        attention_mask,            # (B, T) or (B, T, T); 1/True = attend
        token_type_ids=None,       # (B, T) int32
        position_ids=None,         # (B, T) int32
        deterministic: bool = True,
    ):
        B, T = input_ids.shape
        if token_type_ids is None:
            token_type_ids = jnp.zeros((B, T), jnp.int32)
        if position_ids is None:
            position_ids = jnp.broadcast_to(jnp.arange(T, dtype=jnp.int32), (B, T))

        if attention_mask.ndim == 2:
            bias = (1.0 - attention_mask.astype(jnp.float32))[:, None, None, :]
        elif attention_mask.ndim == 3:
            bias = (1.0 - attention_mask.astype(jnp.float32))[:, None, :, :]
        else:
            raise ValueError(f"attention_mask ndim must be 2 or 3, got {attention_mask.ndim}")
        bias = bias * _MASK_NEG

        x = BertEmbeddings(self.cfg, name="embeddings")(
            input_ids, token_type_ids, position_ids, deterministic
        )
        for i in range(self.cfg.num_hidden_layers):
            x = BertLayer(self.cfg, name=f"layer_{i}")(x, bias, deterministic)
        return x
