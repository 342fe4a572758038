"""Swin backbone: structural tests + converter key-mapping check against a
synthetic state_dict using the official Swin checkpoint key names."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from open_groundingdino_tpu.models.swin import (
    SwinConfig,
    SwinTransformer,
    window_partition,
    window_reverse,
    _shift_attn_mask,
)
from open_groundingdino_tpu.utils.torch_convert import convert_swin_state_dict

TINY = SwinConfig(
    embed_dim=8, depths=(1, 1, 2, 1), num_heads=(1, 2, 2, 4), window_size=4,
    out_indices=(1, 2, 3),
)


def test_window_partition_roundtrip():
    x = jnp.asarray(np.random.RandomState(0).randn(2, 8, 12, 5).astype(np.float32))
    w = window_partition(x, 4)
    assert w.shape == (2 * 2 * 3, 16, 5)
    back = window_reverse(w, 4, 2, 8, 12)
    np.testing.assert_array_equal(np.asarray(back), np.asarray(x))


def test_shift_mask_blocks():
    m = _shift_attn_mask(8, 8, 4, 2)
    assert m.shape == (4, 16, 16)
    # top-left window is interior: fully visible
    assert (m[0] == 0).all()
    # other windows have some blocked pairs
    assert (m[1] == -100).any()


def test_forward_shapes_and_grad():
    model = SwinTransformer(TINY)
    x = jnp.zeros((1, 64, 96, 3))
    params = model.init(jax.random.PRNGKey(0), x)
    outs = model.apply(params, x)
    assert len(outs) == 3
    assert outs[0].shape == (1, 8, 12, 16)   # stride 8, 2*embed
    assert outs[1].shape == (1, 4, 6, 32)    # stride 16
    assert outs[2].shape == (1, 2, 3, 64)    # stride 32

    def loss(p):
        return sum(jnp.sum(o ** 2) for o in model.apply(p, x))

    g = jax.grad(loss)(params)
    leaves = jax.tree_util.tree_leaves(g)
    assert all(np.isfinite(np.asarray(l)).all() for l in leaves)


def test_remat_matches_no_remat():
    x = jnp.asarray(np.random.RandomState(1).randn(1, 32, 32, 3).astype(np.float32))
    m1 = SwinTransformer(TINY)
    params = m1.init(jax.random.PRNGKey(0), x)
    m2 = SwinTransformer(
        SwinConfig(**{**TINY.__dict__, "use_checkpoint": True})
    )
    o1 = m1.apply(params, x)
    o2 = m2.apply(params, x)
    for a, b in zip(o1, o2):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-6)


def test_converter_matches_init_tree():
    """Synthetic torch state_dict with official Swin key names -> converted
    tree must exactly match the flax init tree (names + shapes)."""
    rng = np.random.RandomState(0)
    c = TINY
    sd = {}
    ps, ed = c.patch_size, c.embed_dim
    sd["patch_embed.proj.weight"] = rng.randn(ed, 3, ps, ps).astype(np.float32)
    sd["patch_embed.proj.bias"] = rng.randn(ed).astype(np.float32)
    sd["patch_embed.norm.weight"] = rng.randn(ed).astype(np.float32)
    sd["patch_embed.norm.bias"] = rng.randn(ed).astype(np.float32)
    for i, depth in enumerate(c.depths):
        dim = c.num_features[i]
        for b in range(depth):
            pre = f"layers.{i}.blocks.{b}"
            sd[f"{pre}.norm1.weight"] = rng.randn(dim).astype(np.float32)
            sd[f"{pre}.norm1.bias"] = rng.randn(dim).astype(np.float32)
            t = (2 * c.window_size - 1) ** 2
            sd[f"{pre}.attn.relative_position_bias_table"] = rng.randn(
                t, c.num_heads[i]
            ).astype(np.float32)
            sd[f"{pre}.attn.qkv.weight"] = rng.randn(3 * dim, dim).astype(np.float32)
            sd[f"{pre}.attn.qkv.bias"] = rng.randn(3 * dim).astype(np.float32)
            sd[f"{pre}.attn.proj.weight"] = rng.randn(dim, dim).astype(np.float32)
            sd[f"{pre}.attn.proj.bias"] = rng.randn(dim).astype(np.float32)
            sd[f"{pre}.norm2.weight"] = rng.randn(dim).astype(np.float32)
            sd[f"{pre}.norm2.bias"] = rng.randn(dim).astype(np.float32)
            hid = int(dim * c.mlp_ratio)
            sd[f"{pre}.mlp.fc1.weight"] = rng.randn(hid, dim).astype(np.float32)
            sd[f"{pre}.mlp.fc1.bias"] = rng.randn(hid).astype(np.float32)
            sd[f"{pre}.mlp.fc2.weight"] = rng.randn(dim, hid).astype(np.float32)
            sd[f"{pre}.mlp.fc2.bias"] = rng.randn(dim).astype(np.float32)
        if i < len(c.depths) - 1:
            sd[f"layers.{i}.downsample.norm.weight"] = rng.randn(4 * dim).astype(np.float32)
            sd[f"layers.{i}.downsample.norm.bias"] = rng.randn(4 * dim).astype(np.float32)
            sd[f"layers.{i}.downsample.reduction.weight"] = rng.randn(
                2 * dim, 4 * dim
            ).astype(np.float32)
    for i in c.out_indices:
        sd[f"norm{i}.weight"] = rng.randn(c.num_features[i]).astype(np.float32)
        sd[f"norm{i}.bias"] = rng.randn(c.num_features[i]).astype(np.float32)

    converted = convert_swin_state_dict(sd, c.depths, c.out_indices)
    init = SwinTransformer(c).init(jax.random.PRNGKey(0), jnp.zeros((1, 32, 32, 3)))[
        "params"
    ]
    ref_shapes = jax.tree_util.tree_map(lambda a: a.shape, init)
    got_shapes = jax.tree_util.tree_map(lambda a: a.shape, converted)
    assert ref_shapes == got_shapes

    # converted params must run
    out = SwinTransformer(c).apply({"params": converted}, jnp.zeros((1, 32, 32, 3)))
    assert len(out) == 3


def test_window_attention_headloop_parity(monkeypatch):
    """SWIN_HEADLOOP=1 (per-head 3-D batched dots, no 4-D head-split
    tensors) is a pure layout choice — outputs must match the default
    form exactly, with and without a shift mask."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from open_groundingdino_tpu.models.swin import WindowAttention

    rng = np.random.RandomState(11)
    x = jnp.asarray(rng.randn(12, 16, 32), jnp.float32)
    mask = jnp.asarray(rng.choice([0.0, -100.0], size=(3, 16, 16)), jnp.float32)

    for m in (None, mask):
        def run(env):
            monkeypatch.setenv("SWIN_HEADLOOP", env)
            mod = WindowAttention(dim=32, num_heads=4, window_size=4)
            p = mod.init(jax.random.PRNGKey(0), x, m)
            return p, mod.apply(p, x, m)

        p0, o0 = run("0")
        p1, o1 = run("1")
        assert jax.tree_util.tree_structure(p0) == jax.tree_util.tree_structure(p1)
        np.testing.assert_allclose(np.asarray(o0), np.asarray(o1),
                                   rtol=1e-5, atol=1e-5)
