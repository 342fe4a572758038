"""Library inference API (reference groundingdino/util/inference.py:53-259).

    model = load_model(cfg_path, checkpoint_path, vocab_path)
    boxes, scores, phrases = predict(model, image, caption,
                                     box_threshold=0.35, text_threshold=0.25)

Images are resized shortest-edge 800 / max 1333 and bucket-padded; the
forward is jit-cached per bucket.  Boxes return normalized cxcywh like the
reference's `predict`.
"""
from __future__ import annotations

from dataclasses import dataclass, field
from functools import partial
from typing import Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from PIL import Image

from .config import SLConfig
from .data.tokenization import (
    BertWordPieceTokenizer,
    build_tokenizer,
    generate_masks_with_special_tokens,
)
from .data.transforms import Bucketer, EvalTransform, Sample, normalize_image
from .models.groundingdino import build_groundingdino
from .utils.checkpoint import (
    convert_groundingdino_checkpoint,
    load_torch_state_dict,
    restore_checkpoint,
)


@dataclass
class InferenceModel:
    model: object
    params: Dict
    tokenizer: BertWordPieceTokenizer
    args: SLConfig
    bucketer: Bucketer = None
    max_text_len: int = 256
    _jitted: Dict = field(default_factory=dict)

    def forward_fn(self):
        model = self.model

        @jax.jit
        def fn(params, images, image_sizes, input_ids, text_token_mask,
               position_ids, text_self_attention_masks):
            out = model.apply(
                {"params": params}, images=images, image_sizes=image_sizes,
                input_ids=input_ids, text_token_mask=text_token_mask,
                position_ids=position_ids,
                text_self_attention_masks=text_self_attention_masks,
            )
            return {
                "pred_logits": out["pred_logits"],
                "pred_boxes": out["pred_boxes"],
            }

        return fn


def load_model(
    config_path: str,
    checkpoint_path: Optional[str] = None,
    vocab_path: Optional[str] = None,
) -> InferenceModel:
    args = SLConfig.fromfile(config_path)
    model = build_groundingdino(args)

    if vocab_path is None:
        raise ValueError(
            "vocab_path to a bert-base-uncased vocab.txt is required "
            "(this framework ships its own WordPiece tokenizer)"
        )
    tokenizer = build_tokenizer(vocab_path)

    params = None
    if checkpoint_path:
        if checkpoint_path.endswith((".pth", ".pt")):
            sd = load_torch_state_dict(checkpoint_path)
            if str(args.backbone).startswith("resnet"):
                from .models.resnet import RESNET_VARIANTS

                depths = tuple(RESNET_VARIANTS[args.backbone]["depths"])
            else:
                from .models.swin import SWIN_VARIANTS

                depths = tuple(SWIN_VARIANTS[args.backbone]["depths"])
            params = convert_groundingdino_checkpoint(
                sd,
                swin_depths=depths,
                out_indices=tuple(args.return_interm_indices),
                num_feature_levels=args.num_feature_levels,
                enc_layers=args.enc_layers,
                dec_layers=args.dec_layers,
                bert_layers=int(getattr(args, "bert_layers", 12)),
            )
        else:
            params = restore_checkpoint(checkpoint_path)
            from .utils.checkpoint import adapt_encoder_layout

            params = adapt_encoder_layout(params.get("params", params))
    if params is None:
        raise ValueError("checkpoint_path required for inference")

    return InferenceModel(
        model=model,
        params={"params": params}["params"],
        tokenizer=tokenizer,
        args=args,
        bucketer=Bucketer(args.image_buckets),
        max_text_len=args.max_text_len,
    )


def preprocess_caption(caption: str) -> str:
    c = caption.lower().strip()
    return c if c.endswith(".") else c + "."


def predict(
    im: InferenceModel,
    image: Image.Image,
    caption: str,
    box_threshold: float = 0.35,
    text_threshold: float = 0.25,
    size: int = 800,
    max_size: int = 1333,
) -> Tuple[np.ndarray, np.ndarray, List[str]]:
    """Returns (boxes cxcywh normalized (N,4), scores (N,), phrases)."""
    caption = preprocess_caption(caption)
    sample = EvalTransform(size, max_size)(
        Sample(image=image, boxes=np.zeros((0, 4), np.float32),
               labels=np.zeros((0,), np.int64))
    )
    arr = normalize_image(sample.image)
    images, image_sizes = im.bucketer.pad_batch([arr])

    tok = im.tokenizer([caption], padding=im.max_text_len)
    attn_mask, position_ids = generate_masks_with_special_tokens(
        tok.input_ids, im.tokenizer.special_token_ids()
    )

    key = "fwd"
    if key not in im._jitted:
        im._jitted[key] = im.forward_fn()
    out = im._jitted[key](
        im.params,
        jnp.asarray(images),
        jnp.asarray(image_sizes),
        jnp.asarray(tok.input_ids),
        jnp.asarray(tok.attention_mask.astype(bool)),
        jnp.asarray(position_ids.astype(np.int32)),
        jnp.asarray(attn_mask),
    )
    logits = jax.nn.sigmoid(np.asarray(out["pred_logits"], np.float32))[0]
    boxes = np.asarray(out["pred_boxes"], np.float32)[0]

    valid_tokens = tok.attention_mask[0].astype(bool)
    logits = np.where(valid_tokens[None, :], logits, 0.0)

    max_logits = logits.max(axis=1)
    keep = max_logits > box_threshold
    boxes_k = boxes[keep]
    logits_k = logits[keep]
    scores = max_logits[keep]

    phrases = []
    for row in logits_k:
        posmap = row > text_threshold
        ids = tok.input_ids[0][posmap]
        # drop special tokens from the phrase (reference get_phrases_from_posmap)
        ids = [
            i for i in ids.tolist()
            if i not in (im.tokenizer.cls_token_id, im.tokenizer.sep_token_id)
        ]
        phrases.append(im.tokenizer.decode(ids))
    return boxes_k, scores, phrases


def predict_with_spans(
    im: InferenceModel,
    image: Image.Image,
    caption: str,
    token_spans,
    box_threshold: float = 0.35,
    size: int = 800,
    max_size: int = 1333,
) -> Tuple[np.ndarray, np.ndarray, List[str]]:
    """Given-phrase mode (reference tools/inference_on_a_image.py:116-142):
    `token_spans` is a list of phrases, each a list of (beg, end) char spans
    into the caption; each query is scored per phrase by the mean probability
    over the phrase's tokens."""
    from .data.vl_utils import create_positive_map_from_span

    caption = preprocess_caption(caption)
    sample = EvalTransform(size, max_size)(
        Sample(image=image, boxes=np.zeros((0, 4), np.float32),
               labels=np.zeros((0,), np.int64))
    )
    arr = normalize_image(sample.image)
    images, image_sizes = im.bucketer.pad_batch([arr])

    tok = im.tokenizer([caption], padding=im.max_text_len)
    attn_mask, position_ids = generate_masks_with_special_tokens(
        tok.input_ids, im.tokenizer.special_token_ids()
    )
    if "fwd" not in im._jitted:
        im._jitted["fwd"] = im.forward_fn()
    out = im._jitted["fwd"](
        im.params, jnp.asarray(images), jnp.asarray(image_sizes),
        jnp.asarray(tok.input_ids), jnp.asarray(tok.attention_mask.astype(bool)),
        jnp.asarray(position_ids.astype(np.int32)), jnp.asarray(attn_mask),
    )
    logits = jax.nn.sigmoid(np.asarray(out["pred_logits"], np.float32))[0]
    boxes = np.asarray(out["pred_boxes"], np.float32)[0]

    pos_map = create_positive_map_from_span(tok, token_spans, im.max_text_len)
    phrases_text = ["".join(caption[b:e] for b, e in spans) for spans in token_spans]

    scores_per_phrase = logits @ pos_map.T  # (Q, n_phrases), rows normalized
    all_boxes, all_scores, all_phrases = [], [], []
    for p in range(scores_per_phrase.shape[1]):
        keep = scores_per_phrase[:, p] > box_threshold
        all_boxes.append(boxes[keep])
        all_scores.append(scores_per_phrase[keep, p])
        all_phrases.extend([phrases_text[p]] * int(keep.sum()))
    boxes_k = np.concatenate(all_boxes) if all_boxes else np.zeros((0, 4))
    scores_k = np.concatenate(all_scores) if all_scores else np.zeros((0,))
    return boxes_k, scores_k, all_phrases


# ---------------------------------------------------------------------------
# Class-based "new API" (reference groundingdino/util/inference.py:139-259):
# Model.predict_with_caption / predict_with_classes return Detections — the
# supervision-free equivalent of sv.Detections — plus phrases; annotate()
# renders boxes with PIL instead of cv2/supervision.
# ---------------------------------------------------------------------------


@dataclass
class Detections:
    """Minimal stand-in for supervision.Detections: absolute-pixel xyxy
    boxes, per-box confidence, optional class ids (None = unmatched, exactly
    like the reference's phrases2classes sentinel)."""

    xyxy: np.ndarray                      # (N, 4) float32, abs pixels
    confidence: np.ndarray                # (N,) float32
    class_id: Optional[np.ndarray] = None  # (N,) object/int, None entries ok

    def __len__(self):
        return len(self.xyxy)


def annotate(
    image_source: np.ndarray,
    boxes: np.ndarray,
    logits: np.ndarray,
    phrases: List[str],
) -> np.ndarray:
    """Draw normalized-cxcywh boxes with "phrase score" labels on an RGB
    uint8 array (reference inference.py:100-115; PIL replaces cv2 +
    supervision, and the result stays RGB rather than flipping to BGR)."""
    from .utils.visualizer import draw_cxcywh_norm

    img = Image.fromarray(np.asarray(image_source, np.uint8))
    out = draw_cxcywh_norm(img, np.asarray(boxes, np.float32),
                           labels=phrases, scores=np.asarray(logits))
    return np.asarray(out)


class Model:
    """Reference groundingdino/util/inference.py:124-259.

    model = Model(cfg_path, ckpt_path, vocab_path)
    detections, phrases = model.predict_with_caption(image_rgb, "cat. dog.")
    detections = model.predict_with_classes(image_rgb, ["cat", "dog"], .35, .25)
    """

    def __init__(self, model_config_path: str, model_checkpoint_path: str,
                 vocab_path: str):
        self.im = load_model(model_config_path, model_checkpoint_path,
                             vocab_path)

    def predict_with_caption(
        self,
        image: np.ndarray,
        caption: str,
        box_threshold: float = 0.35,
        text_threshold: float = 0.25,
    ) -> Tuple[Detections, List[str]]:
        """image: RGB uint8 HWC array (the reference takes BGR from
        cv2.imread and converts; we take RGB directly — documented delta)."""
        pil = Image.fromarray(np.asarray(image, np.uint8))
        boxes, scores, phrases = predict(
            self.im, pil, caption,
            box_threshold=box_threshold, text_threshold=text_threshold,
        )
        h, w = image.shape[:2]
        return self.post_process_result(h, w, boxes, scores), phrases

    def predict_with_classes(
        self,
        image: np.ndarray,
        classes: List[str],
        box_threshold: float = 0.35,
        text_threshold: float = 0.25,
    ) -> Detections:
        caption = ". ".join(classes)
        detections, phrases = self.predict_with_caption(
            image, caption, box_threshold, text_threshold
        )
        detections.class_id = self.phrases2classes(phrases, classes)
        return detections

    @staticmethod
    def post_process_result(
        source_h: int, source_w: int, boxes: np.ndarray, logits: np.ndarray
    ) -> Detections:
        """Normalized cxcywh -> absolute xyxy Detections (reference
        inference.py:242-252)."""
        b = np.asarray(boxes, np.float32).reshape(-1, 4)
        scale = np.asarray([source_w, source_h, source_w, source_h], np.float32)
        b = b * scale
        xyxy = np.stack(
            [b[:, 0] - b[:, 2] / 2, b[:, 1] - b[:, 3] / 2,
             b[:, 0] + b[:, 2] / 2, b[:, 1] + b[:, 3] / 2], axis=1,
        )
        return Detections(xyxy=xyxy,
                          confidence=np.asarray(logits, np.float32))

    @staticmethod
    def phrases2classes(phrases: List[str], classes: List[str]) -> np.ndarray:
        """First class whose name is a substring of the phrase wins; no
        match -> None (reference inference.py:254-259 exactly)."""
        class_ids = []
        for phrase in phrases:
            for class_ in classes:
                if class_ in phrase:
                    class_ids.append(classes.index(class_))
                    break
            else:
                class_ids.append(None)
        return np.array(class_ids)
