"""ViTDet-style ViT backbone (models/backbones.py) vs a pure-torch oracle
re-stating the reference visiontransformer.py math (Attention with decomposed
relative position bias, window partition without shift, pre-LN block).
"""

import numpy as np
import torch
import jax
import jax.numpy as jnp

from nuhtc_tpu.models.backbones import ViT, ViTAttention, _rel_pos_1d


def _torch_attention(x, wqkv, bqkv, wproj, bproj, num_heads, rel_h=None, rel_w=None):
    """Reference visiontransformer.py Attention.forward (q_size == k_size)."""
    b, h, w, c = x.shape
    hd = c // num_heads
    qkv = (x.reshape(b, h * w, c) @ wqkv.T + bqkv).reshape(
        b, h * w, 3, num_heads, hd
    ).permute(2, 0, 3, 1, 4)
    q, k, v = qkv.reshape(3, b * num_heads, h * w, hd).unbind(0)
    attn = (q * hd**-0.5) @ k.transpose(-2, -1)
    if rel_h is not None:
        coords_h = torch.arange(h)[:, None] - torch.arange(h)[None, :] + (h - 1)
        coords_w = torch.arange(w)[:, None] - torch.arange(w)[None, :] + (w - 1)
        rh = rel_h[coords_h]  # (h, h, hd)
        rw = rel_w[coords_w]
        r_q = q.reshape(b * num_heads, h, w, hd)
        bias_h = torch.einsum("bhwc,hkc->bhwk", r_q, rh)
        bias_w = torch.einsum("bhwc,wkc->bhwk", r_q, rw)
        attn = (
            attn.view(b * num_heads, h, w, h, w)
            + bias_h[:, :, :, :, None]
            + bias_w[:, :, :, None, :]
        ).view(b * num_heads, h * w, h * w)
    attn = attn.softmax(dim=-1)
    out = (attn @ v).view(b, num_heads, h, w, hd).permute(0, 2, 3, 1, 4)
    out = out.reshape(b, h, w, c)
    return out @ wproj.T + bproj


def test_vit_attention_rel_pos_torch_parity():
    rng = np.random.RandomState(0)
    b, h, w, c, nh = 2, 5, 6, 16, 2
    x = rng.randn(b, h, w, c).astype(np.float32)

    attn = ViTAttention(dim=c, num_heads=nh, use_rel_pos=True, input_size=(h, w))
    params = attn.init(jax.random.PRNGKey(0), jnp.asarray(x))
    # non-trivial rel-pos tables (init is zeros)
    p = jax.tree_util.tree_map(np.asarray, params)["params"]
    p["rel_pos_h"] = rng.randn(2 * h - 1, c // nh).astype(np.float32) * 0.1
    p["rel_pos_w"] = rng.randn(2 * w - 1, c // nh).astype(np.float32) * 0.1
    got = attn.apply({"params": jax.tree_util.tree_map(jnp.asarray, p)}, jnp.asarray(x))

    t = lambda a: torch.from_numpy(np.asarray(a, np.float32))
    want = _torch_attention(
        t(x), t(p["qkv"]["kernel"]).T, t(p["qkv"]["bias"]),
        t(p["proj"]["kernel"]).T, t(p["proj"]["bias"]), nh,
        rel_h=t(p["rel_pos_h"]), rel_w=t(p["rel_pos_w"]),
    )
    np.testing.assert_allclose(
        np.asarray(got), want.numpy(), rtol=1e-4, atol=1e-4
    )


def test_vit_backbone_shapes_windowed():
    """Windowed blocks (incl. non-divisible padding), abs-pos resize from the
    pretrain grid, outputs after every 3rd block."""
    model = ViT(
        img_size=80, patch_size=16, embed_dims=32, depth=6, num_heads=2,
        window_size=3, window_block_indexes=(0, 1, 3, 4), use_rel_pos=True,
        pretrain_img_size=224,
    )
    x = jnp.asarray(np.random.RandomState(1).randn(1, 80, 80, 3).astype(np.float32))
    params = model.init(jax.random.PRNGKey(0), x)
    outs = model.apply(params, x)
    assert len(outs) == 2  # depth 6 / every 3
    for o in outs:
        assert o.shape == (1, 5, 5, 32)
        assert np.isfinite(np.asarray(o)).all()


def test_rel_pos_1d_matches_reference_indexing():
    rng = np.random.RandomState(2)
    table = rng.randn(9, 4).astype(np.float32)  # size 5 → 2*5-1
    got = np.asarray(_rel_pos_1d(jnp.asarray(table), 5, 5))
    coords = np.arange(5)[:, None] - np.arange(5)[None, :] + 4
    np.testing.assert_array_equal(got, table[coords])
