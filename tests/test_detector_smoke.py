import numpy as np
import jax
import jax.numpy as jnp
import pytest

from nuhtc_tpu.models.detector import NuHTC


@pytest.fixture(scope="module")
def tiny_detector():
    model = NuHTC(
        num_classes=5,
        fpn_channels=32,
        backbone_cfg=dict(
            embed_dims=32,
            depths=(1, 1, 1, 1),
            num_heads=(1, 2, 4, 8),
            window_size=7,
        ),
        rpn_nms_pre=256,
        rpn_max_per_img=64,
        rpn_min_bbox_size=0.0,
        rcnn_max_per_img=32,
        watershed_max=32,
        nms_candidates=256,
        scale_factor=2.0,
    )
    img = jnp.zeros((1, 64, 64, 3), jnp.float32)
    params = model.init(jax.random.PRNGKey(0), img)
    return model, params


def test_detector_forward_shapes(tiny_detector):
    model, params = tiny_detector
    img = jnp.asarray(np.random.RandomState(0).randn(2, 64, 64, 3).astype(np.float32))
    out = jax.jit(lambda p, x: model.apply(p, x))(params, img)
    assert out["boxes"].shape == (2, 32, 4)
    assert out["scores"].shape == (2, 32)
    assert out["labels"].shape == (2, 32)
    assert out["probs"].shape == (2, 32, 5)
    assert out["mask_probs"].shape == (2, 32, 28, 28)
    assert out["valid"].shape == (2, 32)
    # boxes are in the original (rescaled-down) frame: <= 32
    assert float(jnp.max(out["boxes"])) <= 32.0 + 1e-3
    mp = np.asarray(out["mask_probs"])
    assert np.isfinite(mp).all() and (mp >= 0).all() and (mp <= 1).all()


def test_detector_batch_consistency(tiny_detector):
    """Same image alone vs in a batch must give identical detections."""
    model, params = tiny_detector
    rng = np.random.RandomState(1)
    img1 = rng.randn(1, 64, 64, 3).astype(np.float32)
    img2 = rng.randn(1, 64, 64, 3).astype(np.float32)
    f = jax.jit(lambda p, x: model.apply(p, x))
    out_single = f(params, jnp.asarray(img1))
    out_batch = f(params, jnp.asarray(np.concatenate([img1, img2])))
    for k in ("boxes", "scores", "valid"):
        np.testing.assert_allclose(
            np.asarray(out_single[k][0]), np.asarray(out_batch[k][0]), rtol=1e-4, atol=1e-4
        )
