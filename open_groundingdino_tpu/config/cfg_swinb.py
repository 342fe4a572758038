# Swin-B variant (reference tools/GroundingDINO_SwinB_cfg.py analog)
_base_ = "cfg_base.py"
backbone = "swin_B_384_22k"
