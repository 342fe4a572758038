# ODVG mixed OD+VG pretrain/fine-tune config (reference config/cfg_odvg.py analog)
_base_ = "cfg_base.py"
use_coco_eval = False
label_list = []
