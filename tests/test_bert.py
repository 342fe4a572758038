"""Flax BERT parity vs HuggingFace torch BertModel (random weights, local
config — no network), including the 3-D block-diagonal mask + custom
position-id path that GroundingDINO depends on."""
import numpy as np
import pytest
import torch

from open_groundingdino_tpu.models.bert import BertConfig, BertModel
from open_groundingdino_tpu.utils.torch_convert import convert_bert_state_dict

CFG = BertConfig(
    vocab_size=60,
    hidden_size=32,
    num_hidden_layers=2,
    num_attention_heads=4,
    intermediate_size=64,
    max_position_embeddings=40,
    hidden_dropout_prob=0.0,
    attention_probs_dropout_prob=0.0,
)


@pytest.fixture(scope="module")
def torch_bert():
    import transformers

    cfg = transformers.BertConfig(
        vocab_size=CFG.vocab_size,
        hidden_size=CFG.hidden_size,
        num_hidden_layers=CFG.num_hidden_layers,
        num_attention_heads=CFG.num_attention_heads,
        intermediate_size=CFG.intermediate_size,
        max_position_embeddings=CFG.max_position_embeddings,
        hidden_dropout_prob=0.0,
        attention_probs_dropout_prob=0.0,
    )
    torch.manual_seed(0)
    model = transformers.BertModel(cfg, add_pooling_layer=False)
    model.eval()
    return model


def _convert(torch_bert):
    sd = {k: v for k, v in torch_bert.state_dict().items()}
    return {"params": convert_bert_state_dict(sd, num_layers=CFG.num_hidden_layers)}


def test_parity_2d_mask(torch_bert):
    rng = np.random.RandomState(0)
    ids = rng.randint(1, CFG.vocab_size, size=(2, 9)).astype(np.int32)
    mask = np.ones((2, 9), np.int32)
    mask[1, 6:] = 0

    with torch.no_grad():
        ref = torch_bert(
            input_ids=torch.from_numpy(ids).long(),
            attention_mask=torch.from_numpy(mask).long(),
        ).last_hidden_state.numpy()

    out = BertModel(CFG).apply(_convert(torch_bert), ids, mask)
    np.testing.assert_allclose(np.asarray(out), ref, rtol=1e-3, atol=5e-4)


def test_parity_3d_mask_and_position_ids(torch_bert):
    rng = np.random.RandomState(1)
    B, T = 2, 8
    ids = rng.randint(1, CFG.vocab_size, size=(B, T)).astype(np.int32)
    # block-diagonal-ish mask and per-phrase position ids
    mask3 = np.tile(np.eye(T, dtype=np.int64)[None], (B, 1, 1))
    mask3[:, 1:4, 1:4] = 1
    mask3[:, 4:7, 4:7] = 1
    pos = np.asarray([[0, 0, 1, 2, 0, 1, 2, 0]] * B, np.int32)

    with torch.no_grad():
        ref = torch_bert(
            input_ids=torch.from_numpy(ids).long(),
            attention_mask=torch.from_numpy(mask3),
            position_ids=torch.from_numpy(pos).long(),
        ).last_hidden_state.numpy()

    out = BertModel(CFG).apply(
        _convert(torch_bert), ids, mask3.astype(bool), position_ids=pos
    )
    np.testing.assert_allclose(np.asarray(out), ref, rtol=1e-3, atol=5e-4)
