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


# ---------------------------------------------------------------------------
# RoBERTa byte-level BPE (reference get_tokenlizer.py:22-29 roberta-base
# path) — parity vs HuggingFace's RobertaTokenizerFast on shared local files
# ---------------------------------------------------------------------------

BPE_MERGES = [
    ("Ġ", "d"), ("Ġd", "o"), ("Ġdo", "g"),
    ("Ġ", "c"), ("Ġc", "a"), ("Ġca", "t"),
    ("h", "e"), ("l", "l"), ("he", "ll"), ("hell", "o"),
    ("Ġ", "."), ("1", "2"), ("12", "3"),
    ("w", "o"), ("wo", "r"), ("wor", "l"), ("worl", "d"),
    ("Ġ", "z"), ("e", "b"), ("r", "a"), ("eb", "ra"), ("Ġz", "ebra"),
    ("Ġ", "h"), ("Ġh", "y"), ("Ġhy", "d"),
]


@pytest.fixture(scope="module")
def bpe_files(tmp_path_factory):
    import json

    from open_groundingdino_tpu.data.tokenization import _bytes_to_unicode

    d = tmp_path_factory.mktemp("bpe")
    toks = (["<s>", "<pad>", "</s>", "<unk>", "<mask>"]
            + list(_bytes_to_unicode().values())
            + [a + b for a, b in BPE_MERGES])
    vocab = {t: i for i, t in enumerate(dict.fromkeys(toks))}
    (d / "vocab.json").write_text(json.dumps(vocab))
    (d / "merges.txt").write_text(
        "#version: 0.2\n" + "\n".join(f"{a} {b}" for a, b in BPE_MERGES) + "\n"
    )
    return str(d / "vocab.json"), str(d / "merges.txt")


CAPS = [
    "dog . cat . zebra .",
    "hello world's 123 hydrant?",
    "cat  dog\nhello .",
]


def test_roberta_ids_match_hf_fast(bpe_files):
    from transformers import RobertaTokenizerFast

    from open_groundingdino_tpu.data.tokenization import RobertaBPETokenizer

    vj, mt = bpe_files
    ours = RobertaBPETokenizer(vj, mt)
    hf = RobertaTokenizerFast(vocab_file=vj, merges_file=mt)
    enc = ours(CAPS, padding="longest")
    ref = hf(CAPS, padding="longest", return_tensors="np")
    np.testing.assert_array_equal(enc.input_ids,
                                  ref["input_ids"].astype(np.int32))
    np.testing.assert_array_equal(enc.attention_mask,
                                  ref["attention_mask"].astype(np.int32))


def test_roberta_offsets_match_hf_fast(bpe_files):
    from transformers import RobertaTokenizerFast

    from open_groundingdino_tpu.data.tokenization import RobertaBPETokenizer

    vj, mt = bpe_files
    ours = RobertaBPETokenizer(vj, mt)
    hf = RobertaTokenizerFast(vocab_file=vj, merges_file=mt)
    for cap in CAPS:
        enc = ours([cap])
        ref = hf([cap], return_offsets_mapping=True)
        for t, (a, b) in enumerate(ref["offset_mapping"][0]):
            if a == b == 0:  # special token
                assert enc.offsets[0][t] is None
            else:
                assert enc.offsets[0][t] == (a, b), (cap, t)


def test_roberta_positive_map_flow(bpe_files):
    """char_to_token + create_positive_map through the BPE offsets (the
    grounding consumers of the tokenizer protocol)."""
    from open_groundingdino_tpu.data.tokenization import RobertaBPETokenizer

    vj, mt = bpe_files
    tok = RobertaBPETokenizer(vj, mt)
    cats = ["dog", "cat", "zebra"]
    cap = build_caption(cats)  # "dog . cat . zebra ."
    t = tok([cap], padding=16)
    pm = create_positive_map(t, 0, [0, 1, 2], cats, cap, max_text_len=16)
    assert pm.shape == (3, 16)
    for row in range(3):
        assert pm[row].sum() > 0
        on = np.nonzero(pm[row])[0]
        got = tok.decode(t.input_ids[0][on])
        assert cats[row].replace(" ", "") in got.replace(" ", "")
    # delimiter ids include the leading-space form
    sids = tok.special_token_ids()
    assert tok.vocab["Ġ."] in sids and tok.cls_token_id in sids


def test_build_tokenizer_dispatch(bpe_files, vocab_file, tmp_path):
    import shutil

    from open_groundingdino_tpu.data.tokenization import (
        RobertaBPETokenizer, build_tokenizer,
    )

    vj, mt = bpe_files
    assert isinstance(build_tokenizer(vocab_file), BertWordPieceTokenizer)
    assert isinstance(build_tokenizer(vj), RobertaBPETokenizer)
    d = tmp_path / "hub"
    d.mkdir()
    shutil.copy(vj, d / "vocab.json")
    shutil.copy(mt, d / "merges.txt")
    assert isinstance(build_tokenizer(str(d)), RobertaBPETokenizer)
