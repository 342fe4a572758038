# Base model/train hyper-parameters for the TPU GroundingDINO rebuild.
# Values mirror the reference's authoritative config/cfg_coco.py +
# tools/GroundingDINO_SwinT_OGC.py; TPU-specific keys are grouped at the end.

modelname = "groundingdino"

# ---- backbone ----------------------------------------------------------------
backbone = "swin_T_224_1k"
position_embedding = "sine"
pe_temperatureH = 20
pe_temperatureW = 20
return_interm_indices = [1, 2, 3]

# ---- transformer --------------------------------------------------------------
enc_layers = 6
dec_layers = 6
pre_norm = False
dim_feedforward = 2048
hidden_dim = 256
dropout = 0.0
nheads = 8
num_queries = 900
query_dim = 4
num_patterns = 0
num_feature_levels = 4
enc_n_points = 4
dec_n_points = 4
two_stage_type = "standard"
two_stage_bbox_embed_share = False
two_stage_class_embed_share = False
transformer_activation = "relu"
dec_pred_bbox_embed_share = True
embed_init_tgt = True

# ---- text ----------------------------------------------------------------
max_text_len = 256
text_encoder_type = "bert-base-uncased"
use_text_enhancer = True
use_fusion_layer = True
steps_per_call = 1               # optimizer steps per device dispatch
                                 # (>1 scans N stacked batches per call;
                                 # -10% wall/step measured on the tunnel)
use_checkpoint = True            # remat fusion layers
use_transformer_ckpt = True      # remat deformable encoder layers
use_text_cross_attention = True
text_dropout = 0.0
fusion_dropout = 0.0
fusion_droppath = 0.1
sub_sentence_present = True

# ---- losses / matching ---------------------------------------------------
aux_loss = True
set_cost_class = 1.0
set_cost_bbox = 5.0
set_cost_giou = 2.0
cls_loss_coef = 2.0
bbox_loss_coef = 5.0
giou_loss_coef = 2.0
interm_loss_coef = 1.0
no_interm_box_loss = False
focal_alpha = 0.25
focal_gamma = 2.0
matcher_type = "HungarianMatcher"
num_select = 300
nms_iou_threshold = -1

# ---- optimisation -------------------------------------------------------------
lr = 1e-4
lr_backbone = 1e-5
lr_backbone_names = ["backbone.0", "bert"]
lr_linear_proj_mult = 0.1
lr_linear_proj_names = ["ref_point_head", "sampling_offsets"]
param_dict_type = "ddetr_in_mmdet"
weight_decay = 1e-4
epochs = 12
lr_drop = 11
save_checkpoint_interval = 1
clip_max_norm = 0.1
onecyclelr = False
multi_step_lr = False
lr_drop_list = [33, 45]
freeze_keywords = None
batch_size = 4

# ---- data augmentation (reference datasets/transforms.py semantics) -------
data_aug_scales = [480, 512, 544, 576, 608, 640, 672, 704, 736, 768, 800]
data_aug_max_size = 1333
data_aug_scales2_resize = [400, 500, 600]
data_aug_scales2_crop = [384, 600]
max_labels = 80  # ODVG pos+neg category sampling cap

use_coco_eval = True
label_list = None
dn_labelbook_size = 91

# ---- TPU-native keys (no reference equivalent) -----------------------------
# static-shape buckets (H, W): the padded canonical shapes replacing
# NestedTensor dynamic padding.  Images resize-shortest-edge then pad up to
# the smallest bucket that fits.  All multiples of 32 (Swin stride) so no
# ragged window padding inside the backbone.
image_buckets = [
    (480, 736), (736, 480),
    (608, 928), (928, 608),
    (800, 1216), (1216, 800),
    (800, 1344), (1344, 800),
    (1024, 1024),
]
eval_shortest_edge = 800
eval_max_size = 1333
max_gt_boxes = 128          # static per-image GT padding for the criterion
compute_dtype = "bfloat16"  # activations; params/optimizer always fp32
u8_images = True             # ship uint8 pixels, normalize on device: 4x
                             # less host->device input bandwidth, measured
                             # +66% e2e eval-pipeline img/s on chip
                             # (2.25 vs 1.35, BENCH_NOTES 2026-08-20);
                             # exact vs the f32 path (pad re-zeroed) —
                             # tests/test_data_pipeline.py
use_ema = False             # reference cfg use_ema (util/utils.py ModelEma)
ema_decay = 0.9997
ema_epoch = 0
msda_impl = "auto"         # 'pallas' | 'xla' | 'auto' (pallas on TPU)
mesh_shape = {"data": -1}   # -1: all devices on the data axis
