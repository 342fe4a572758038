"""open_groundingdino_tpu — a TPU-native open-set object-detection framework.

A from-scratch JAX/XLA/Pallas re-design with the capabilities of
Open-GroundingDino (text-conditioned open-set detection: Swin backbone +
BERT text encoder + bidirectional image<->text fusion + two-stage deformable
DETR transformer with contrastive token-level classification), covering
single-image & batched inference, COCO zero-shot evaluation and ODVG-format
fine-tuning with Hungarian matching.

Design stance (vs the CUDA/torch reference at /root/reference):
  * static shapes everywhere: bucketed image sizes + fixed max_text_len
    replace NestedTensor dynamic padding (reference util/misc.py:285-397)
  * the hand-written CUDA MSDeformAttn op (reference
    models/GroundingDINO/ops/) becomes a Pallas bilinear-gather kernel with
    a pure-XLA gather reference path (ops/msda.py)
  * data parallelism via jax.sharding.Mesh + jit, not DDP/NCCL
  * host/device split: tokenization and positive maps run on host; the
    Hungarian assignment runs ON DEVICE inside the jitted train step
    (ops/hungarian.py Jonker-Volgenant — the axon TPU runtime has no
    host-callback support, and it removes the reference's per-step
    C.cpu() sync); compute in bf16 with fp32 master params.
"""

__version__ = "0.1.0"
