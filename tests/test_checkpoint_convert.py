"""Torch→flax checkpoint converter mechanics (key mapping + layout transposes)."""

import numpy as np
import pytest


def test_map_torch_keys_cover_model():
    from nuhtc_tpu.utils.checkpoint import map_torch_key

    cases = {
        "backbone.patch_embed.projection.weight": ("backbone", "patch_embed", "kernel"),
        "backbone.patch_embed.norm.weight": ("backbone", "patch_norm", "scale"),
        "backbone.stages.0.blocks.1.attn.w_msa.qkv.weight": (
            "backbone", "stage0_block1", "attn", "qkv", "kernel"),
        "backbone.stages.2.blocks.3.attn.w_msa.relative_position_bias_table": (
            "backbone", "stage2_block3", "attn", "relative_position_bias_table"),
        "backbone.stages.0.blocks.0.ffn.layers.0.0.weight": (
            "backbone", "stage0_block0", "ffn", "fc1", "kernel"),
        "backbone.stages.0.blocks.0.ffn.layers.1.bias": (
            "backbone", "stage0_block0", "ffn", "fc2", "bias"),
        "backbone.stages.1.downsample.reduction.weight": (
            "backbone", "downsample1", "reduction", "kernel"),
        "backbone.norm3.bias": ("backbone", "out_norm3", "bias"),
        "neck.lateral_convs.2.conv.weight": ("neck", "lateral2", "kernel"),
        "neck.fpn_convs.0.conv.bias": ("neck", "fpn0", "bias"),
        "rpn_head.rpn_cls.weight": ("rpn_head", "rpn_cls", "kernel"),
        "roi_head.semantic_head.lateral_convs.1.conv.weight": (
            "semantic_head", "lateral1", "kernel"),
        "roi_head.semantic_head.conv_logits.weight": ("semantic_head", "conv_logits", "kernel"),
        "roi_head.bbox_head.2.shared_fcs.1.weight": ("bbox_heads_2", "shared_fc1", "kernel"),
        "roi_head.bbox_head.0.fc_cls.weight": ("bbox_heads_0", "fc_cls", "kernel"),
        "roi_head.mask_head.0.convs.3.conv.weight": ("mask_head", "conv3", "kernel"),
        "roi_head.mask_head.0.upsample.weight": ("mask_head", "upsample", "kernel"),
        "roi_head.mask_head.0.conv_logits.bias": ("mask_head", "conv_logits", "bias"),
    }
    for torch_key, want_path in cases.items():
        mapped = map_torch_key(torch_key)
        assert mapped is not None, torch_key
        assert mapped[0] == want_path, (torch_key, mapped[0])
    # skipped keys
    assert map_torch_key("backbone.stages.0.blocks.0.attn.w_msa.relative_position_index") is None


def test_convert_state_dict_on_tiny_model():
    import jax
    import jax.numpy as jnp

    from nuhtc_tpu.models.detector import NuHTC
    from nuhtc_tpu.utils.checkpoint import convert_torch_state_dict
    from flax import traverse_util

    model = NuHTC(
        num_classes=5, fpn_channels=32,
        backbone_cfg=dict(embed_dims=32, depths=(1, 1, 1, 1), num_heads=(1, 2, 4, 8)),
    )
    img = jnp.zeros((1, 64, 64, 3), jnp.float32)
    params = model.init(jax.random.PRNGKey(0), img, method="init_forward")

    # synthesize a torch-style state dict for a couple of leaves
    sd = {
        # conv (O, I, kh, kw) for patch_embed: flax kernel (4, 4, 3, 32)
        "backbone.patch_embed.projection.weight": np.arange(32 * 3 * 4 * 4, dtype=np.float32).reshape(32, 3, 4, 4),
        "backbone.patch_embed.projection.bias": np.ones(32, np.float32),
        # linear (O, I): qkv flax kernel (32, 96)
        "backbone.stages.0.blocks.0.attn.w_msa.qkv.weight": np.arange(96 * 32, dtype=np.float32).reshape(96, 32),
        "roi_head.mask_head.0.upsample.weight": np.arange(32 * 32 * 2 * 2, dtype=np.float32).reshape(32, 32, 2, 2),
        "backbone.stages.0.blocks.0.attn.w_msa.relative_position_index": np.zeros((49, 49)),
    }
    new_params, info = convert_torch_state_dict(sd, params)
    assert info["matched"] == 4
    assert info["unmatched_torch"] == []
    flat = traverse_util.flatten_dict(new_params["params"])
    pe = flat[("backbone", "patch_embed", "kernel")]
    assert pe.shape == (4, 4, 3, 32)
    np.testing.assert_allclose(
        np.asarray(pe), sd["backbone.patch_embed.projection.weight"].transpose(2, 3, 1, 0)
    )
    qkv = flat[("backbone", "stage0_block0", "attn", "qkv", "kernel")]
    assert qkv.shape == (32, 96)
    np.testing.assert_allclose(np.asarray(qkv), sd["backbone.stages.0.blocks.0.attn.w_msa.qkv.weight"].T)
    up = flat[("mask_head", "upsample", "kernel")]
    assert up.shape == (2, 2, 32, 32)
