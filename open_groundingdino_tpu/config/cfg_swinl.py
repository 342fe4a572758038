# Swin-L variant (reference models/GroundingDINO/backbone/swin_transformer.py
# swin_L_384_22k entry; the reference exposes T/B/L via the same build path,
# backbone.py:221-238)
_base_ = "cfg_base.py"
backbone = "swin_L_384_22k"
