"""Multi-scale deformable attention module (projections around the core op).

Semantics of reference models/GroundingDINO/ms_deform_attn.py:137-363
(mmcv MultiScaleDeformableAttention): value projection with padding-mask
zeroing, per-query sampling offsets + softmaxed attention weights, sampling
grid construction from 2-d or 4-d reference points, output projection.
The gather itself is ops/msda (Pallas kernel on TPU, XLA gather fallback).

Includes the module's distinctive initialization: sampling_offsets starts at
zero weight with a rotated-grid bias (reference ms_deform_attn.py:198-221) —
required both for train-from-scratch parity and because published
checkpoints are fine-tuned from it.
"""
from __future__ import annotations

import math
from typing import Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from ..ops.msda import ms_deform_attn


def _sampling_offsets_bias_init(num_heads: int, num_levels: int, num_points: int):
    thetas = np.arange(num_heads, dtype=np.float32) * (2.0 * math.pi / num_heads)
    grid = np.stack([np.cos(thetas), np.sin(thetas)], -1)  # (H, 2)
    grid = grid / np.abs(grid).max(-1, keepdims=True)
    grid = np.tile(grid.reshape(num_heads, 1, 1, 2), (1, num_levels, num_points, 1))
    for i in range(num_points):
        grid[:, :, i, :] *= i + 1
    flat = grid.reshape(-1)

    def init(key, shape, dtype=jnp.float32):
        assert tuple(shape) == flat.shape, (shape, flat.shape)
        return jnp.asarray(flat, dtype)

    return init


class _DenseParams(nn.Module):
    """Parameter container with nn.Dense's exact tree ({kernel, bias}) for
    projections applied via custom einsums (checkpoint-converter compatible)."""

    in_features: int
    features: int
    kernel_init: object = None
    bias_init: object = None

    @nn.compact
    def __call__(self):
        k = self.param(
            "kernel", self.kernel_init or nn.initializers.lecun_normal(),
            (self.in_features, self.features),
        )
        b = self.param(
            "bias", self.bias_init or nn.initializers.zeros,
            (self.features,),
        )
        return k, b


def resolve_msda_impl(impl: str) -> str:
    """'auto' -> 'pallas' on TPU else 'xla' (single resolution point so the
    transformer's value-layout choice always matches the kernel choice)."""
    if impl != "auto":
        return impl
    try:
        return "pallas" if jax.devices()[0].platform == "tpu" else "xla"
    except Exception:
        return "xla"


class MSDeformAttn(nn.Module):
    embed_dim: int = 256
    num_heads: int = 8
    num_levels: int = 4
    num_points: int = 4
    impl: str = "auto"  # ops/msda dispatch
    # 'interleaved': the value tokens arrive in ops/interleave row-band
    # order (encoder path) — tap positions are remapped in closed form and
    # the kernel sweeps one merged range per query block
    value_layout: str = "raster"
    # queries already arrive spatially coherent (encoder row-band order) —
    # skip the banded path's decoder-style sort even when Q != L (the
    # encoder stream may carry 128-alignment pad queries)
    presorted_queries: bool = False

    @nn.compact
    def __call__(
        self,
        query: jnp.ndarray,              # (B, Q, C) — query (+pos already added)
        value: jnp.ndarray,              # (B, L, C) — flattened multi-level features
        reference_points: jnp.ndarray,   # (B, Q, num_levels, 2|4) normalized
        spatial_shapes: Tuple[Tuple[int, int], ...],  # static
        key_padding_mask: jnp.ndarray = None,  # (B, L) bool, True = pad
    ) -> jnp.ndarray:
        B, Q, C = query.shape
        L = value.shape[1]
        H, NL, P = self.num_heads, self.num_levels, self.num_points
        D = C // H
        assert sum(h * w for h, w in spatial_shapes) == L

        impl = resolve_msda_impl(self.impl)
        if impl == "pallas":
            return self._transposed_path(
                query, value, reference_points, spatial_shapes,
                key_padding_mask, B, Q, C, L, H, NL, P, D,
            )
        assert self.value_layout == "raster", (
            "interleaved value layout requires the pallas impl"
        )

        v = nn.Dense(C, name="value_proj")(value)
        if key_padding_mask is not None:
            v = jnp.where(key_padding_mask[..., None], 0.0, v)
        v = v.reshape(B, L, H, D)

        offsets = nn.Dense(
            H * NL * P * 2,
            kernel_init=nn.initializers.zeros,
            bias_init=_sampling_offsets_bias_init(H, NL, P),
            name="sampling_offsets",
        )(query).reshape(B, Q, H, NL, P, 2)

        attn = nn.Dense(
            H * NL * P,
            kernel_init=nn.initializers.zeros,
            bias_init=nn.initializers.zeros,
            name="attention_weights",
        )(query).reshape(B, Q, H, NL * P)
        attn = nn.softmax(attn.astype(jnp.float32), axis=-1).astype(query.dtype)
        attn = attn.reshape(B, Q, H, NL, P)

        if reference_points.shape[-1] == 2:
            # normalize offsets by each level's (W, H)
            wh = jnp.asarray(
                [[w, h] for h, w in spatial_shapes], jnp.float32
            )  # (NL, 2) as (W, H)
            locs = (
                reference_points[:, :, None, :, None, :]
                + offsets / wh[None, None, None, :, None, :]
            )
        elif reference_points.shape[-1] == 4:
            locs = (
                reference_points[:, :, None, :, None, :2]
                + offsets / P * reference_points[:, :, None, :, None, 2:] * 0.5
            )
        else:
            raise ValueError("reference_points last dim must be 2 or 4")

        out = ms_deform_attn(v, spatial_shapes, locs, attn, impl=impl)
        return nn.Dense(C, name="output_proj")(out)

    def _transposed_path(
        self, query, value, reference_points, spatial_shapes,
        key_padding_mask, B, Q, C, L, H, NL, P, D,
    ):
        """Kernel-layout flow: every projection is emitted directly in the
        Pallas kernel's transposed layout via einsum (XLA folds the
        transposition into the matmul), skipping the (B,L,H,D)<->(BH,D,L)
        value flip and the (B,Q,...)<->(...,Q) tap flips — ~2.8 ms/encoder
        layer of pure layout copies at bench shapes.  Parameter trees are
        identical to the nn.Dense path (same names/shapes/inits), so both
        paths load the same checkpoints and can be mixed freely."""
        from ..ops.msda_pallas import ms_deform_attn_pallas_t

        import os as _os

        # default ON: measured 19.44 vs 14.27 img/s e2e (BENCH_NOTES r3) —
        # the banded kernel replaces the sweep's per-position VPU S-build
        # with one full-width MXU dot per (point, band).  Decoder-style
        # query sets (Q != L) go through the sorted wrapper.
        use_banded = (
            bool(int(_os.environ.get("MSDA_BANDED", "1")))
            and self.value_layout == "raster"
        )
        # decoder-style call = query set decoupled from the value stream;
        # this identifies the path whether the queries arrive unsorted (the
        # sorted wrapper handles them) or presorted by transformer._decode's
        # sort-once, so the MSDA_BANDED_DEC / MSDA_BAND_DEC knobs keep
        # gating the decoder in both regimes
        is_dec = Q != L
        banded_sorted = use_banded and is_dec and not self.presorted_queries
        if (use_banded and is_dec) and not bool(
            int(_os.environ.get("MSDA_BANDED_DEC", "1"))
        ):
            use_banded = banded_sorted = False

        if use_banded:
            # per-level (BH, H_l*D, W_l) value layout for the banded kernel
            # (y-major rows, D on sublanes, x on lanes) emitted directly by
            # the projection einsum — same value_proj params
            kv, bv = _DenseParams(C, C, name="value_proj")()
            kv_r = kv.reshape(C, H, D).astype(value.dtype)
            bv_r = bv.reshape(1, H, 1, D, 1).astype(value.dtype)
            values = []
            start = 0
            for (hl, wl) in spatial_shapes:
                vl = value[:, start : start + hl * wl].reshape(B, hl, wl, C)
                pv = jnp.einsum("byxc,chd->bhydx", vl, kv_r) + bv_r
                if key_padding_mask is not None:
                    ml = key_padding_mask[:, start : start + hl * wl].reshape(
                        B, 1, hl, 1, wl
                    )
                    pv = jnp.where(ml, 0.0, pv)
                values.append(pv.reshape(B * H, hl * D, wl))
                start += hl * wl
        else:
            v_t = nn.Einsum((C, C), "blc,ce->bel", name="value_proj")(value)
            if key_padding_mask is not None:
                v_t = jnp.where(key_padding_mask[:, None, :], 0.0, v_t)
            v_t = v_t.reshape(B * H, D, L)

        O = H * NL * P * 2
        # MSDA_XY=1: emit the sampling locations XY-MAJOR — (BH, 2, NL, P,
        # Q) instead of (BH, NL, P, 2, Q) — so no tensor in the locs chain
        # has a minor-2 dim (XLA tiles those T(2,128) and materializes
        # relayout copies, ~0.26 ms x 6/fwd at bench shapes).  The param
        # keeps the reference (C, H*NL*P*2) layout; only the einsum's
        # output columns are reordered (a (C, O) weight shuffle, free).
        use_xy = use_banded and bool(int(_os.environ.get("MSDA_XY", "1")))
        if use_xy:
            ko, bo = _DenseParams(
                C, O,
                kernel_init=nn.initializers.zeros,
                bias_init=_sampling_offsets_bias_init(H, NL, P),
                name="sampling_offsets",
            )()
            ko_r = jnp.transpose(
                ko.reshape(C, H, NL, P, 2), (0, 1, 4, 2, 3)
            ).reshape(C, O).astype(query.dtype)
            bo_r = jnp.transpose(
                bo.reshape(H, NL, P, 2), (0, 3, 1, 2)
            ).reshape(O).astype(query.dtype)
            offs_t = (
                jnp.einsum("bqc,co->boq", query, ko_r)
                + bo_r[None, :, None]
            ).reshape(B, H, 2, NL, P, Q)
        else:
            offs_t = nn.Einsum(
                (C, O), "bqc,co->boq",
                kernel_init=nn.initializers.zeros,
                bias_init=_sampling_offsets_bias_init(H, NL, P),
                name="sampling_offsets",
            )(query).reshape(B, H, NL, P, 2, Q)

        attn_t = nn.Einsum(
            (C, H * NL * P), "bqc,co->boq",
            kernel_init=nn.initializers.zeros,
            bias_init=nn.initializers.zeros,
            name="attention_weights",
        )(query)
        attn_t = nn.softmax(
            attn_t.reshape(B, H, NL * P, Q).astype(jnp.float32), axis=2
        )
        attn_t = attn_t.reshape(B * H, NL, P, Q)

        offs_t = offs_t.astype(jnp.float32)
        if use_xy:
            # rp: (B, Q, NL, 2|4) -> coord-major (B, 2|4, NL, Q)
            rp2 = jnp.transpose(
                reference_points.astype(jnp.float32), (0, 3, 2, 1)
            )
            if reference_points.shape[-1] == 2:
                wh2 = jnp.asarray(
                    [[w for h, w in spatial_shapes],
                     [h for h, w in spatial_shapes]], jnp.float32
                ).reshape(1, 1, 2, NL, 1, 1)
                locs_t = rp2[:, None, :, :, None, :] + offs_t / wh2
            elif reference_points.shape[-1] == 4:
                locs_t = (
                    rp2[:, None, :2, :, None, :]
                    + offs_t / P * rp2[:, None, 2:, :, None, :] * 0.5
                )
            else:
                raise ValueError(
                    "reference_points last dim must be 2 or 4")
            locs_t = locs_t.reshape(B * H, 2, NL, P, Q)
        else:
            rp_t = jnp.moveaxis(
                reference_points.astype(jnp.float32), 1, -1
            )  # (B, NL, 2|4, Q)
            if reference_points.shape[-1] == 2:
                wh = jnp.asarray(
                    [[w, h] for h, w in spatial_shapes], jnp.float32
                ).reshape(1, 1, NL, 1, 2, 1)
                locs_t = rp_t[:, None, :, None, :, :] + offs_t / wh
            elif reference_points.shape[-1] == 4:
                locs_t = (
                    rp_t[:, None, :, None, :2, :]
                    + offs_t / P * rp_t[:, None, :, None, 2:, :] * 0.5
                )
            else:
                raise ValueError(
                    "reference_points last dim must be 2 or 4")
            locs_t = locs_t.reshape(B * H, NL, P, 2, Q)

        k, b = _DenseParams(C, C, name="output_proj")()
        if use_banded:
            from ..ops.msda_banded import (
                ms_deform_attn_banded,
                ms_deform_attn_banded_sorted,
            )

            fn = (ms_deform_attn_banded_sorted if banded_sorted
                  else ms_deform_attn_banded)
            band = int(_os.environ.get(
                "MSDA_BAND_DEC" if is_dec else "MSDA_BAND_ENC", "0"
            )) or None
            out_dq = fn(
                tuple(values), spatial_shapes, locs_t, attn_t, P, band,
                xy=use_xy,
            )  # (BH, D, Q)
            # Remat policy hook: naming the RAW kernel output (before the
            # output projection) lets save_only_these_names("msda_out")
            # keep the backward from replaying the Pallas kernel — the
            # projection's weight grad reads this saved tensor, and the
            # kernel's own bwd residuals (values/px/py/wa) are cheap XLA
            # prep that recomputes without the kernel (DCE drops the
            # pallas_call from the replayed fwd).  Naming only the
            # post-projection tensor (the round-3 first attempt) still
            # replayed the kernel: the projection bwd needed its input.
            from jax.ad_checkpoint import checkpoint_name as _ckpt_nm
            out_dq = _ckpt_nm(out_dq, "msda_out")
            out4 = out_dq.reshape(B, H, D, Q)
            return jnp.einsum(
                "bhdq,hdf->bqf", out4, k.reshape(H, D, C).astype(out4.dtype)
            ) + b.astype(out4.dtype)

        out = ms_deform_attn_pallas_t(
            v_t, spatial_shapes, locs_t, attn_t, self.value_layout
        )  # (BH, Q, D)
        from jax.ad_checkpoint import checkpoint_name as _ckpt_nm
        out = _ckpt_nm(out, "msda_out")  # see banded branch comment
        out4 = out.reshape(B, H, Q, D)
        return jnp.einsum(
            "bhqd,hdf->bqf", out4, k.reshape(H, D, C).astype(out4.dtype)
        ) + b.astype(out4.dtype)
