"""Numeric parity of the Swin backbone blocks against a pure-torch oracle of
the mmdet SwinTransformer semantics (reference thirdparty/mmdetection/mmdet/
models/backbones/swin.py: WindowMSA :15-123, ShiftWindowMSA :126-260,
SwinBlock :263-341, PatchMerging via nn.Unfold), with weights flowing through
the checkpoint-converter key mapping. This is the strongest accuracy check
available without the reference checkpoint: it pins qkv packing, the
relative-position index convention (mmdet's double_step_seq + flip ≡ the
standard (dy+w-1)(2w-1)+(dx+w-1) table), window partition order, shift masks,
FFN layout, and the Unfold channel ordering in PatchMerging."""

import numpy as np
import pytest
import torch
import torch.nn.functional as F

import jax
import jax.numpy as jnp

from nuhtc_tpu.models.swin import PatchMergingMM, SwinBlock
from nuhtc_tpu.utils.checkpoint import map_torch_key

WS, C, NH = 7, 32, 4
H, W, B = 14, 21, 2
HD = C // NH


def _rel_index_mmdet(ws):
    """mmdet WindowMSA.__init__ double_step_seq + flip (swin.py:64-67)."""
    seq = (torch.arange(ws)[:, None] * (2 * ws - 1) + torch.arange(ws)[None, :]).reshape(1, -1)
    idx = seq + seq.T
    return idx.flip(1).contiguous()


def _torch_window_attn(wins, sd, p, mask=None):
    """wins: (nW*B, N, C) torch. mmdet WindowMSA.forward semantics."""
    bw, n, c = wins.shape
    qkv = F.linear(wins, sd[f"{p}.attn.w_msa.qkv.weight"], sd[f"{p}.attn.w_msa.qkv.bias"])
    qkv = qkv.reshape(bw, n, 3, NH, HD).permute(2, 0, 3, 1, 4)
    q, k, v = qkv[0], qkv[1], qkv[2]
    attn = (q * HD**-0.5) @ k.transpose(-2, -1)
    table = sd[f"{p}.attn.w_msa.relative_position_bias_table"]
    idx = _rel_index_mmdet(WS)
    bias = table[idx.reshape(-1)].reshape(n, n, NH).permute(2, 0, 1)
    attn = attn + bias[None]
    if mask is not None:
        nw = mask.shape[0]
        attn = attn.view(bw // nw, nw, NH, n, n) + mask[None, :, None]
        attn = attn.view(bw, NH, n, n)
    attn = attn.softmax(dim=-1)
    out = (attn @ v).transpose(1, 2).reshape(bw, n, c)
    return F.linear(out, sd[f"{p}.attn.w_msa.proj.weight"], sd[f"{p}.attn.w_msa.proj.bias"])


def _torch_block(x, sd, p, shift):
    """x: (B, H, W, C) torch. mmdet SwinBlock.forward (eval: drop_path=id)."""
    b, h, w, c = x.shape
    ws = WS
    shortcut = x
    y = F.layer_norm(x, (c,), sd[f"{p}.norm1.weight"], sd[f"{p}.norm1.bias"], eps=1e-5)
    pb, pr = (-h) % ws, (-w) % ws
    y = F.pad(y, (0, 0, 0, pr, 0, pb))
    hp, wp = h + pb, w + pr
    s = ws // 2 if shift else 0
    if s:
        y = torch.roll(y, (-s, -s), dims=(1, 2))
        img_mask = torch.zeros(hp, wp)
        cnt = 0
        for hs in (slice(0, -ws), slice(-ws, -s), slice(-s, None)):
            for wss in (slice(0, -ws), slice(-ws, -s), slice(-s, None)):
                img_mask[hs, wss] = cnt
                cnt += 1
        m = img_mask.view(hp // ws, ws, wp // ws, ws).permute(0, 2, 1, 3).reshape(-1, ws * ws)
        mask = torch.where(m[:, :, None] != m[:, None, :], -100.0, 0.0)
    else:
        mask = None
    wins = (
        y.view(b, hp // ws, ws, wp // ws, ws, c)
        .permute(0, 1, 3, 2, 4, 5)
        .reshape(-1, ws * ws, c)
    )
    wins = _torch_window_attn(wins, sd, p, mask)
    y = (
        wins.view(b, hp // ws, wp // ws, ws, ws, c)
        .permute(0, 1, 3, 2, 4, 5)
        .reshape(b, hp, wp, c)
    )
    if s:
        y = torch.roll(y, (s, s), dims=(1, 2))
    x = shortcut + y[:, :h, :w, :]

    z = F.layer_norm(x, (c,), sd[f"{p}.norm2.weight"], sd[f"{p}.norm2.bias"], eps=1e-5)
    z = F.linear(z, sd[f"{p}.ffn.layers.0.0.weight"], sd[f"{p}.ffn.layers.0.0.bias"])
    z = F.gelu(z)
    z = F.linear(z, sd[f"{p}.ffn.layers.1.weight"], sd[f"{p}.ffn.layers.1.bias"])
    return x + z


def _rand_block_sd(rng, p):
    t = lambda *s: torch.tensor(rng.randn(*s).astype(np.float32) * 0.1)
    return {
        f"{p}.norm1.weight": t(C) + 1.0,
        f"{p}.norm1.bias": t(C),
        f"{p}.norm2.weight": t(C) + 1.0,
        f"{p}.norm2.bias": t(C),
        f"{p}.attn.w_msa.qkv.weight": t(3 * C, C),
        f"{p}.attn.w_msa.qkv.bias": t(3 * C),
        f"{p}.attn.w_msa.proj.weight": t(C, C),
        f"{p}.attn.w_msa.proj.bias": t(C),
        f"{p}.attn.w_msa.relative_position_bias_table": t((2 * WS - 1) ** 2, NH),
        f"{p}.ffn.layers.0.0.weight": t(4 * C, C),
        f"{p}.ffn.layers.0.0.bias": t(4 * C),
        f"{p}.ffn.layers.1.weight": t(C, 4 * C),
        f"{p}.ffn.layers.1.bias": t(C),
    }


def _params_from_sd(sd, template):
    """Route torch tensors through map_torch_key into a SwinBlock param tree."""
    out = jax.tree.map(lambda x: np.array(x), template)
    for key, tensor in sd.items():
        path, tf = map_torch_key(key)
        assert path[:2] == ("backbone", "stage0_block0"), (key, path)
        node = out["params"]
        for part in path[2:-1]:
            node = node[part]
        val = np.asarray(tf(tensor.numpy()))
        assert node[path[-1]].shape == val.shape, (key, node[path[-1]].shape, val.shape)
        node[path[-1]] = val
    return out


@pytest.mark.parametrize("shift", [False, True])
def test_swin_block_matches_torch(shift):
    rng = np.random.RandomState(0 if not shift else 1)
    x_np = rng.randn(B, H, W, C).astype(np.float32)
    p = "backbone.stages.0.blocks.0"
    sd = _rand_block_sd(rng, p)
    want = _torch_block(torch.tensor(x_np), sd, p, shift).numpy()

    blk = SwinBlock(dim=C, num_heads=NH, window_size=WS, shift=shift, dtype=jnp.float32)
    template = blk.init(jax.random.PRNGKey(0), jnp.asarray(x_np))
    params = _params_from_sd(sd, template)
    with jax.default_matmul_precision("float32"):
        got = np.asarray(blk.apply(params, jnp.asarray(x_np)))
    np.testing.assert_allclose(got, want, atol=2e-4, rtol=1e-3)


def test_patch_merging_matches_torch():
    """mmdet PatchMerging: Unfold(2,2) channel order (c, kh, kw) → LN → linear."""
    rng = np.random.RandomState(2)
    x_np = rng.randn(B, H + 0, W + 1, C).astype(np.float32)  # odd W → pad path
    t = lambda *s: torch.tensor(rng.randn(*s).astype(np.float32) * 0.1)
    sd = {
        "backbone.stages.0.downsample.norm.weight": t(4 * C) + 1.0,
        "backbone.stages.0.downsample.norm.bias": t(4 * C),
        "backbone.stages.0.downsample.reduction.weight": t(2 * C, 4 * C),
    }

    x_t = torch.tensor(x_np).permute(0, 3, 1, 2)  # NCHW
    x_t = F.pad(x_t, (0, x_t.shape[3] % 2, 0, x_t.shape[2] % 2))
    unf = F.unfold(x_t, kernel_size=2, stride=2)  # (B, 4C, L), (c, kh, kw) order
    h2, w2 = x_t.shape[2] // 2, x_t.shape[3] // 2
    y = unf.transpose(1, 2)  # (B, L, 4C)
    y = F.layer_norm(y, (4 * C,), sd["backbone.stages.0.downsample.norm.weight"],
                     sd["backbone.stages.0.downsample.norm.bias"], eps=1e-5)
    y = F.linear(y, sd["backbone.stages.0.downsample.reduction.weight"])
    want = y.reshape(B, h2, w2, 2 * C).numpy()

    pm = PatchMergingMM(out_dim=2 * C, dtype=jnp.float32)
    template = pm.init(jax.random.PRNGKey(0), jnp.asarray(x_np))
    out = jax.tree.map(lambda x: np.array(x), template)
    for key, tensor in sd.items():
        path, tf = map_torch_key(key)
        assert path[:2] == ("backbone", "downsample0"), (key, path)
        node = out["params"]
        for part in path[2:-1]:
            node = node[part]
        node[path[-1]] = np.asarray(tf(tensor.numpy()))
    with jax.default_matmul_precision("float32"):
        got = np.asarray(pm.apply(out, jnp.asarray(x_np)))
    np.testing.assert_allclose(got, want, atol=2e-4, rtol=1e-3)
