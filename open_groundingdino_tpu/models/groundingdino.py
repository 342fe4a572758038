"""GroundingDINO top-level model (reference models/GroundingDINO/groundingdino.py:55-402).

Open-set text-conditioned detector: BERT-encode the caption with sub-sentence
masks, project to d_model (feat_map), run the Swin backbone, project
multi-level features (1x1 conv + GroupNorm + extra stride-2 level), run the
two-stage deformable transformer with image<->text fusion, and read out
per-layer contrastive token logits + refined boxes.

Host/device contract (all static shapes):
  images         (B, Hb, Wb, 3) float   — bucket-padded, ImageNet-normalized
  image_sizes    (B, 2) int32           — valid (h, w) before padding
  input_ids      (B, T) int32           — T = max_text_len (fixed)
  text_token_mask(B, T) bool            — True = real token
  position_ids   (B, T) int32           — per-phrase positions
  text_self_attention_masks (B, T, T) bool — block-diagonal, True = attend

Tokenization and mask construction happen on host (data/tokenization.py),
mirroring the reference's host-side tokenizer calls (groundingdino.py:237-257).
"""
from __future__ import annotations

from typing import List, Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from .bert import BertConfig, BertModel
from .layers import contrastive_embed
from .position_encoding import position_embedding_sine_hw
from .registry import MODULE_BUILD_FUNCS
from .resnet import ResNet, ResNetConfig
from .swin import SwinConfig, SwinTransformer
from .transformer import Transformer, make_level_masks

Shapes = Tuple[Tuple[int, int], ...]


def level_spatial_shapes(
    image_hw: Tuple[int, int], num_levels: int, first_stride: int = 8
) -> Shapes:
    """Static per-level feature shapes for a bucket: strides 8/16/32(/64...).
    Matches Swin's ceil-division downsampling for non-divisible sizes."""
    H, W = image_hw
    shapes = []
    h, w = -(-H // 4), -(-W // 4)  # patch embed stride 4
    h, w = -(-h // 2), -(-w // 2)  # stage 1 (stride 8) — first output level
    for _ in range(num_levels):
        shapes.append((h, w))
        h, w = -(-h // 2), -(-w // 2)
    return tuple(shapes)


class GroundingDINO(nn.Module):
    swin_cfg: SwinConfig
    bert_cfg: BertConfig = BertConfig()
    hidden_dim: int = 256
    num_queries: int = 900
    nheads: int = 8
    num_feature_levels: int = 4
    enc_layers: int = 6
    dec_layers: int = 6
    dim_feedforward: int = 2048
    enc_n_points: int = 4
    dec_n_points: int = 4
    max_text_len: int = 256
    pe_temperature_h: float = 20.0
    pe_temperature_w: float = 20.0
    use_checkpoint: bool = False
    use_transformer_ckpt: bool = False
    use_text_enhancer: bool = True
    use_fusion_layer: bool = True
    use_text_cross_attention: bool = True
    msda_impl: str = "auto"
    fusion_droppath: float = 0.0
    aux_loss: bool = True
    # when set, a ResNet trunk replaces Swin as the image backbone
    # (reference backbone.py:182-196 selects by args.backbone name)
    resnet_cfg: Optional[ResNetConfig] = None

    @nn.compact
    def __call__(
        self,
        images: jnp.ndarray,
        image_sizes: jnp.ndarray,
        input_ids: jnp.ndarray,
        text_token_mask: jnp.ndarray,
        position_ids: jnp.ndarray,
        text_self_attention_masks: jnp.ndarray,
        deterministic: bool = True,
    ):
        B, Hb, Wb, _ = images.shape
        C = self.hidden_dim

        # ---- text tower -------------------------------------------------
        bert_out = BertModel(self.bert_cfg, name="bert")(
            input_ids,
            text_self_attention_masks,
            position_ids=position_ids,
            deterministic=deterministic,
        )
        encoded_text = nn.Dense(C, name="feat_map")(bert_out)
        text_dict = {
            "encoded_text": encoded_text,
            "text_token_mask": text_token_mask,
            "position_ids": position_ids,
            "text_self_attention_masks": text_self_attention_masks,
        }

        # ---- image tower -------------------------------------------------
        if self.resnet_cfg is not None:
            feats: List[jnp.ndarray] = ResNet(self.resnet_cfg, name="backbone")(
                images
            )
            out_indices = self.resnet_cfg.out_indices
        else:
            feats = SwinTransformer(self.swin_cfg, name="backbone")(images)
            out_indices = self.swin_cfg.out_indices
        num_backbone_outs = len(feats)

        srcs = []
        for l, feat in enumerate(feats):
            x = nn.Conv(C, (1, 1), name=f"input_proj_{l}_conv")(feat)
            x = nn.GroupNorm(epsilon=1e-5, num_groups=32, name=f"input_proj_{l}_gn")(x)
            srcs.append(x)
        for l in range(num_backbone_outs, self.num_feature_levels):
            src_in = feats[-1] if l == num_backbone_outs else srcs[-1]
            x = nn.Conv(
                C, (3, 3), strides=(2, 2), padding=((1, 1), (1, 1)),
                name=f"input_proj_{l}_conv",
            )(src_in)
            x = nn.GroupNorm(epsilon=1e-5, num_groups=32, name=f"input_proj_{l}_gn")(x)
            srcs.append(x)

        shapes: Shapes = tuple((s.shape[1], s.shape[2]) for s in srcs)
        # per-level strides follow the backbone's out_indices (stage i has
        # stride 4*2^i); extra pyramid levels halve again.  With ResNet
        # last-stage dilation, stage 3 keeps stride 16.
        base = [4 * (2 ** i) for i in out_indices]
        if self.resnet_cfg is not None and self.resnet_cfg.dilation:
            base = [s // 2 if i == 3 else s for s, i in zip(base, out_indices)]
        while len(base) < self.num_feature_levels:
            base.append(base[-1] * 2)
        strides = tuple(base[: self.num_feature_levels])
        masks = make_level_masks(image_sizes, shapes, strides)
        poss = [
            position_embedding_sine_hw(
                m, C // 2, self.pe_temperature_h, self.pe_temperature_w
            ).astype(srcs[0].dtype)
            for m in masks
        ]

        # ---- transformer -------------------------------------------------
        t_out = Transformer(
            d_model=C,
            nhead=self.nheads,
            num_queries=self.num_queries,
            num_encoder_layers=self.enc_layers,
            num_decoder_layers=self.dec_layers,
            dim_feedforward=self.dim_feedforward,
            num_feature_levels=self.num_feature_levels,
            enc_n_points=self.enc_n_points,
            dec_n_points=self.dec_n_points,
            use_text_enhancer=self.use_text_enhancer,
            use_fusion_layer=self.use_fusion_layer,
            use_text_cross_attention=self.use_text_cross_attention,
            use_checkpoint=self.use_checkpoint,
            use_transformer_ckpt=self.use_transformer_ckpt,
            max_text_len=self.max_text_len,
            msda_impl=self.msda_impl,
            fusion_droppath=self.fusion_droppath,
            spatial_shapes=shapes,
            name="transformer",
        )(srcs, masks, poss, text_dict, deterministic=deterministic)

        # ---- heads ---------------------------------------------------------
        memory_text = t_out["memory_text"]
        outputs_class = [
            contrastive_embed(hs_i, memory_text, text_token_mask, self.max_text_len)
            for hs_i in t_out["hs"]
        ]
        outputs_coord = t_out["outputs_coord"]

        out = {
            "pred_logits": outputs_class[-1],
            "pred_boxes": outputs_coord[-1],
            "text_mask": text_token_mask,
        }
        if self.aux_loss:
            out["aux_outputs"] = [
                {"pred_logits": c, "pred_boxes": b}
                for c, b in zip(outputs_class[:-1], outputs_coord[:-1])
            ]
        interm_class = contrastive_embed(
            t_out["hs_enc"], memory_text, text_token_mask, self.max_text_len
        )
        out["interm_outputs"] = {
            "pred_logits": interm_class,
            "pred_boxes": t_out["ref_enc"],
        }
        # Emitted for output-dict parity with the reference
        # (groundingdino.py:361); unused by any criterion there as well —
        # the reference's own consumer is commented out (:386).
        out["interm_outputs_for_matching_pre"] = {
            "pred_logits": interm_class,
            "pred_boxes": t_out["init_box_proposal"],
        }
        return out


@MODULE_BUILD_FUNCS.registe_with_name("groundingdino")
def build_groundingdino(args) -> GroundingDINO:
    """Build from an SLConfig-style args namespace (reference
    groundingdino.py:726-806 registry entry)."""
    resnet_cfg = None
    swin_cfg = None
    if str(args.backbone).startswith("resnet"):
        # reference backbone.py:182-196: torchvision resnet50/101 trunk
        resnet_cfg = ResNetConfig(
            name=args.backbone,
            out_indices=tuple(args.return_interm_indices),
            dilation=bool(getattr(args, "dilation", False)),
            use_checkpoint=bool(getattr(args, "use_checkpoint", False)),
        )
    else:
        swin_cfg = SwinConfig.from_name(
            args.backbone,
            out_indices=tuple(args.return_interm_indices),
            use_checkpoint=bool(getattr(args, "use_checkpoint", False)),
        )
    bert_cfg = BertConfig(
        vocab_size=int(getattr(args, "bert_vocab_size", 30522)),
        hidden_size=int(getattr(args, "bert_hidden_size", 768)),
        num_hidden_layers=int(getattr(args, "bert_layers", 12)),
        num_attention_heads=int(getattr(args, "bert_heads", 12)),
        intermediate_size=int(getattr(args, "bert_intermediate", 3072)),
        max_position_embeddings=int(getattr(args, "bert_max_position", 512)),
        # roberta-base geometry (reference get_tokenlizer.py:22-29 +
        # RobertaModel): vocab 50265, max_position 514, type_vocab_size 1 —
        # the encoder stack is architecturally identical to BERT once
        # position_ids are passed explicitly (bertwarper semantics), so the
        # same BertModel serves both; set bert_vocab_size/bert_max_position/
        # bert_type_vocab in the config and pair with a RobertaBPETokenizer
        hidden_dropout_prob=float(getattr(args, "text_dropout", 0.0)),
        attention_probs_dropout_prob=float(getattr(args, "text_dropout", 0.0)),
        type_vocab_size=int(getattr(args, "bert_type_vocab", 2)),
    )
    return GroundingDINO(
        swin_cfg=swin_cfg,
        bert_cfg=bert_cfg,
        hidden_dim=args.hidden_dim,
        num_queries=args.num_queries,
        nheads=args.nheads,
        num_feature_levels=args.num_feature_levels,
        enc_layers=args.enc_layers,
        dec_layers=args.dec_layers,
        dim_feedforward=args.dim_feedforward,
        enc_n_points=args.enc_n_points,
        dec_n_points=args.dec_n_points,
        max_text_len=args.max_text_len,
        pe_temperature_h=float(args.pe_temperatureH),
        pe_temperature_w=float(args.pe_temperatureW),
        use_checkpoint=bool(getattr(args, "use_checkpoint", False)),
        use_transformer_ckpt=bool(getattr(args, "use_transformer_ckpt", False)),
        use_text_enhancer=bool(args.use_text_enhancer),
        use_fusion_layer=bool(args.use_fusion_layer),
        use_text_cross_attention=bool(args.use_text_cross_attention),
        msda_impl=getattr(args, "msda_impl", "auto"),
        fusion_droppath=float(getattr(args, "fusion_droppath", 0.0)),
        aux_loss=bool(args.aux_loss),
        resnet_cfg=resnet_cfg,
    )
