"""COCO config with a ResNet-50 frozen-BN backbone (reference
backbone.py:182-196 resnet path; dilation off, interm indices [1,2,3])."""
_base_ = ["cfg_coco.py"]

backbone = "resnet50"
dilation = False
return_interm_indices = [1, 2, 3]
