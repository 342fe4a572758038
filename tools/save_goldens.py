#!/usr/bin/env python3
"""Golden-activation capture for checkpoint-parity debugging.

Given a config + checkpoint + image + caption, saves the tensors that
determine mAP parity (text features, backbone levels, encoder memory, final
logits/boxes) to an .npz.  Compare against the same capture from the PyTorch
reference (the reference fork's own torch.save debugging style,
engine_multi.py:494-502) to localize any conversion drift module by module.

    python tools/save_goldens.py -c CONFIG -p CKPT --vocab vocab.txt \
        -i image.jpg -t "dog . cat ." -o goldens.npz
"""
from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
from PIL import Image


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--config_file", "-c", required=True)
    ap.add_argument("--checkpoint_path", "-p", required=True)
    ap.add_argument("--vocab", required=True)
    ap.add_argument("--image_path", "-i", required=True)
    ap.add_argument("--text_prompt", "-t", required=True)
    ap.add_argument("--output", "-o", default="goldens.npz")
    ap.add_argument("--size", type=int, default=800)
    ap.add_argument("--max_size", type=int, default=1333)
    args = ap.parse_args()

    import jax.numpy as jnp

    from open_groundingdino_tpu.data.tokenization import (
        generate_masks_with_special_tokens,
    )
    from open_groundingdino_tpu.data.transforms import (
        EvalTransform, Sample, normalize_image,
    )
    from open_groundingdino_tpu.inference import load_model, preprocess_caption
    from open_groundingdino_tpu.models.bert import BertModel
    from open_groundingdino_tpu.models.swin import SwinTransformer

    im = load_model(args.config_file, args.checkpoint_path, args.vocab)
    caption = preprocess_caption(args.text_prompt)
    image = Image.open(args.image_path).convert("RGB")
    sample = EvalTransform(args.size, args.max_size)(
        Sample(image=image, boxes=np.zeros((0, 4), np.float32),
               labels=np.zeros((0,), np.int64))
    )
    arr = normalize_image(sample.image)
    images, image_sizes = im.bucketer.pad_batch([arr])

    tok = im.tokenizer([caption], padding=im.max_text_len)
    attn_mask, position_ids = generate_masks_with_special_tokens(
        tok.input_ids, im.tokenizer.special_token_ids()
    )

    goldens = {
        "input_ids": tok.input_ids,
        "attention_mask": tok.attention_mask,
        "position_ids": position_ids,
        "image": images,
        "image_sizes": image_sizes,
    }

    # submodule captures with the converted params
    bert = BertModel(im.model.bert_cfg)
    goldens["bert_last_hidden"] = np.asarray(
        bert.apply(
            {"params": im.params["bert"]},
            jnp.asarray(tok.input_ids), jnp.asarray(attn_mask),
            position_ids=jnp.asarray(position_ids.astype(np.int32)),
        )
    )
    swin = SwinTransformer(im.model.swin_cfg)
    feats = swin.apply({"params": im.params["backbone"]}, jnp.asarray(images))
    for i, f in enumerate(feats):
        goldens[f"backbone_level_{i}"] = np.asarray(f)

    out = im.forward_fn()(
        im.params, jnp.asarray(images), jnp.asarray(image_sizes),
        jnp.asarray(tok.input_ids), jnp.asarray(tok.attention_mask.astype(bool)),
        jnp.asarray(position_ids.astype(np.int32)), jnp.asarray(attn_mask),
    )
    goldens["pred_logits"] = np.asarray(out["pred_logits"], np.float32)
    goldens["pred_boxes"] = np.asarray(out["pred_boxes"], np.float32)

    np.savez_compressed(args.output, **goldens)
    print(f"saved {len(goldens)} tensors -> {args.output}")
    for k, v in goldens.items():
        print(f"  {k}: {np.asarray(v).shape}")


if __name__ == "__main__":
    main()
