"""Tokenizer parity vs HuggingFace's slow BertTokenizer on a shared local
vocab (the HF tokenizer is the oracle the reference uses)."""
import numpy as np
import pytest

from open_groundingdino_tpu.data.tokenization import (
    BertWordPieceTokenizer,
    build_caption,
    build_label_maps,
    create_positive_map,
    generate_masks_with_special_tokens,
)

VOCAB = (
    "[PAD] [UNK] [CLS] [SEP] [MASK] . ? , a the dog cat person fire hyd "
    "##rant traffic light bi ##cy ##cle car zebra gira ##ffe un ##believ "
    "##able running park in"
).split()


@pytest.fixture(scope="module")
def vocab_file(tmp_path_factory):
    p = tmp_path_factory.mktemp("vocab") / "vocab.txt"
    p.write_text("\n".join(VOCAB) + "\n")
    return str(p)


@pytest.fixture(scope="module")
def tok(vocab_file):
    return BertWordPieceTokenizer(vocab_file)


def test_ids_match_hf_slow_tokenizer(vocab_file, tok):
    from transformers import BertTokenizer

    hf = BertTokenizer(vocab_file=vocab_file, do_lower_case=True)
    caps = [
        "dog . cat . fire hydrant .",
        "a Zebra and an UNBELIEVABLE giraffe?",
        "bicycle, traffic light .",
    ]
    ours = tok(caps, padding="longest")
    theirs = hf(caps, padding="longest", return_tensors="np")
    np.testing.assert_array_equal(ours.input_ids, theirs["input_ids"].astype(np.int32))
    np.testing.assert_array_equal(
        ours.attention_mask, theirs["attention_mask"].astype(np.int32)
    )


def test_char_to_token_offsets(tok):
    cap = "dog . fire hydrant ."
    t = tok([cap])
    # [CLS] dog . fire hyd ##rant . [SEP]
    assert t.char_to_token(0, 0) == 1          # 'd' of dog
    assert t.char_to_token(0, 2) == 1          # 'g' of dog
    assert t.char_to_token(0, 4) == 2          # '.'
    assert t.char_to_token(0, 6) == 3          # 'f' of fire
    assert t.char_to_token(0, 11) == 4         # 'h' of hydrant -> 'hyd'
    assert t.char_to_token(0, 14) == 5         # 'r' -> '##rant'
    assert t.char_to_token(0, 3) is None       # space


def test_fixed_width_padding(tok):
    t = tok(["dog ."], padding=16)
    assert t.input_ids.shape == (1, 16)
    assert t.attention_mask.sum() == 4  # CLS dog . SEP


def test_special_token_masks(tok):
    caps = ["dog . cat .", "zebra ."]
    t = tok(caps, padding="longest")
    attn, pos = generate_masks_with_special_tokens(
        t.input_ids, tok.special_token_ids()
    )
    B, T = t.input_ids.shape
    assert attn.shape == (B, T, T) and pos.shape == (B, T)
    # row 0: [CLS] dog . cat . [SEP] ...  -> 'dog' and '.' form a block
    assert attn[0, 1, 2] and attn[0, 2, 1]          # dog <-> its '.'
    assert not attn[0, 1, 3]                        # dog x cat blocked
    assert attn[0, 3, 4] and not attn[0, 3, 1]
    # diagonal always allowed (incl. pads)
    assert attn[1].diagonal().all()
    # position ids restart per phrase
    assert pos[0, 1] == 0 and pos[0, 2] == 1 and pos[0, 3] == 0


def test_positive_map(tok):
    cats = ["dog", "fire hydrant", "cat"]
    cap = build_caption(cats)
    assert cap == "dog . fire hydrant . cat ."
    t = tok([cap], padding=32)
    pm = create_positive_map(t, 0, [0, 1, 2], cats, cap, max_text_len=32)
    assert pm.shape == (3, 32)
    np.testing.assert_array_equal(np.nonzero(pm[0])[0], [1])       # dog
    np.testing.assert_array_equal(np.nonzero(pm[1])[0], [3, 4, 5])  # fire hyd ##rant
    np.testing.assert_array_equal(np.nonzero(pm[2])[0], [7])       # cat

    maps = build_label_maps(t, [cats], [cap], max_text_len=32)
    np.testing.assert_array_equal(maps[0], pm)
