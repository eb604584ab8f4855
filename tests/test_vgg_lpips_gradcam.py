"""VGG16 / LPIPS / Grad-CAM tests, incl. converter parity vs torch."""

import pytest

pytestmark = pytest.mark.slow
import jax
import jax.numpy as jnp
import numpy as np
import torch
import torch.nn.functional as F

from tpugan.io import convert
from tpugan.losses.gradcam import grad_cam, guided_backprop, jet_colormap, majority_class, mask2cam
from tpugan.losses.lpips import LPIPS, make_lpips_fn, random_params
from tpugan.losses.vgg import VGG16, adaptive_avg_pool2d


def _torch_vgg16(num_classes=10):
    """A reference-shaped torchvision-style VGG16 (features+classifier)."""
    cfg = [64, 64, "M", 128, 128, "M", 256, 256, 256, "M", 512, 512, 512, "M", 512, 512, 512, "M"]
    layers = []
    in_c = 3
    for v in cfg:
        if v == "M":
            layers.append(torch.nn.MaxPool2d(2, 2))
        else:
            layers.append(torch.nn.Conv2d(in_c, v, 3, padding=1))
            layers.append(torch.nn.ReLU(inplace=False))
            in_c = v
    features = torch.nn.Sequential(*layers)
    classifier = torch.nn.Sequential(
        torch.nn.Linear(512 * 7 * 7, 4096), torch.nn.ReLU(), torch.nn.Dropout(0.0),
        torch.nn.Linear(4096, 4096), torch.nn.ReLU(), torch.nn.Dropout(0.0),
        torch.nn.Linear(4096, num_classes),
    )

    class Net(torch.nn.Module):
        def __init__(self):
            super().__init__()
            self.features = features
            self.avgpool = torch.nn.AdaptiveAvgPool2d((7, 7))
            self.classifier = classifier

        def forward(self, x):
            x = self.features(x)
            x = self.avgpool(x)
            x = torch.flatten(x, 1)
            return self.classifier(x)

    return Net()


def _torch_state_for_converter(net):
    """Rename to the torchvision layout the converter expects."""
    sd = {}
    conv_positions = [0, 2, 5, 7, 10, 12, 14, 17, 19, 21, 24, 26, 28]
    conv_modules = [m for m in net.features if isinstance(m, torch.nn.Conv2d)]
    for pos, m in zip(conv_positions, conv_modules):
        sd[f"features.{pos}.weight"] = m.weight.detach().numpy()
        sd[f"features.{pos}.bias"] = m.bias.detach().numpy()
    lin = [m for m in net.classifier if isinstance(m, torch.nn.Linear)]
    for pos, m in zip([0, 3, 6], lin):
        sd[f"classifier.{pos}.weight"] = m.weight.detach().numpy()
        sd[f"classifier.{pos}.bias"] = m.bias.detach().numpy()
    return sd


def test_vgg16_converter_parity(rng):
    torch.manual_seed(0)
    net = _torch_vgg16(num_classes=10).eval()
    sd = _torch_state_for_converter(net)
    params = convert.vgg16(sd)

    x = rng.randn(2, 64, 64, 3).astype(np.float32) * 0.5
    xt = torch.from_numpy(np.transpose(x, (0, 3, 1, 2)))
    with torch.no_grad():
        ref = net(xt).numpy()

    model = VGG16(num_classes=10)
    logits, feats = model.apply({"params": jax.tree.map(jnp.asarray, params)}, jnp.asarray(x))
    np.testing.assert_allclose(np.asarray(logits), ref, rtol=2e-3, atol=2e-4)
    assert len(feats) == 13


def test_adaptive_avg_pool_matches_torch(rng):
    x = rng.randn(1, 10, 10, 4).astype(np.float32)
    got = adaptive_avg_pool2d(jnp.asarray(x), 7)
    ref = F.adaptive_avg_pool2d(torch.from_numpy(np.transpose(x, (0, 3, 1, 2))), (7, 7))
    np.testing.assert_allclose(
        np.transpose(np.asarray(got), (0, 3, 1, 2)), ref.numpy(), rtol=1e-5, atol=1e-6
    )


def test_lpips_basic_properties(rng):
    params = random_params(jax.random.PRNGKey(0), image_size=32)
    fn = make_lpips_fn(params)
    a = jnp.asarray(rng.randn(2, 32, 32, 3).astype(np.float32))
    b = jnp.asarray(rng.randn(2, 32, 32, 3).astype(np.float32))
    d_ab = fn(a, b)
    d_aa = fn(a, a)
    assert d_ab.shape == (2,)
    np.testing.assert_allclose(np.asarray(d_aa), 0.0, atol=1e-5)  # identity fixpoint
    assert float(jnp.min(jnp.abs(d_ab))) > 0


def test_lpips_in_space_loss(rng):
    from tpugan.losses import space_loss

    params = random_params(jax.random.PRNGKey(0), image_size=32)
    fn = make_lpips_fn(params)
    a = jnp.asarray(rng.randn(2, 32, 32, 3).astype(np.float32))
    total, info = space_loss(a, a, lpips_fn=fn)
    np.testing.assert_allclose(float(info.lpips), 0.0, atol=1e-5)
    total2, info2 = space_loss(a, jnp.roll(a, 1, axis=1), lpips_fn=fn)
    # random head weights can make the distance negative; real LPIPS heads
    # are non-negative — only check it registers a difference
    assert abs(float(info2.lpips)) > 0


def test_lpips_feature_cache_equality(rng):
    """fn(a, b, a_feats=fn.features(a)) is bitwise fn(a, b) — the
    contract the inversion loop's target-side hoisting relies on."""
    from tpugan.losses.space_loss import pool_for_lpips, space_loss

    params = random_params(jax.random.PRNGKey(0), image_size=32)
    fn = make_lpips_fn(params)
    a = jnp.asarray(rng.randn(2, 32, 32, 3).astype(np.float32))
    b = jnp.asarray(rng.randn(2, 32, 32, 3).astype(np.float32))
    np.testing.assert_array_equal(
        np.asarray(fn(a, b)), np.asarray(fn(a, b, a_feats=fn.features(a)))
    )
    t0, i0 = space_loss(a, b, lpips_fn=fn)
    t1, i1 = space_loss(a, b, lpips_fn=fn, lpips_a_feats=fn.features(pool_for_lpips(a)))
    np.testing.assert_array_equal(np.asarray(t0), np.asarray(t1))
    np.testing.assert_array_equal(np.asarray(i0.lpips), np.asarray(i1.lpips))


def test_majority_class():
    logits = jnp.asarray(
        [[0.1, 0.9, 0.0], [0.0, 0.8, 0.2], [0.7, 0.1, 0.2]], dtype=jnp.float32
    )
    assert int(majority_class(logits)) == 1


def test_grad_cam_shapes_and_range(rng):
    model = VGG16(num_classes=10)
    x = jnp.asarray(rng.randn(2, 64, 64, 3).astype(np.float32))
    variables = model.init(jax.random.PRNGKey(0), x)
    mask = grad_cam(model, variables, x)
    assert mask.shape == (2, 64, 64, 1)
    assert float(mask.min()) >= 0.0 and float(mask.max()) <= 1.0 + 1e-6
    maskpp = grad_cam(model, variables, x, plus_plus=True)
    assert maskpp.shape == (2, 64, 64, 1)
    # jit-ability (the reference's cv2/numpy hops are gone)
    jitted = jax.jit(lambda v, x: grad_cam(model, v, x, plus_plus=True))
    np.testing.assert_allclose(np.asarray(jitted(variables, x)), np.asarray(maskpp), rtol=2e-4, atol=2e-5)


def test_guided_backprop_clamps(rng):
    model = VGG16(num_classes=10, guided=True)
    x = jnp.asarray(rng.randn(1, 32, 32, 3).astype(np.float32))
    variables = model.init(jax.random.PRNGKey(0), x)
    g = guided_backprop(model, variables, x)
    assert g.shape == x.shape
    assert np.isfinite(np.asarray(g)).all()


def test_mask2cam(rng):
    mask = jnp.asarray(rng.rand(2, 16, 16, 1).astype(np.float32))
    imgs = jnp.asarray(rng.randn(2, 16, 16, 3).astype(np.float32))
    heatmap, cam = mask2cam(mask, imgs)
    assert heatmap.shape == (2, 16, 16, 3)
    assert cam.shape == (2, 16, 16, 3)
    assert float(cam.max()) <= 1.0 + 1e-6
    # jet endpoints: 0 -> blue-ish, 1 -> red-ish
    ends = jet_colormap(jnp.asarray([0.0, 1.0]))
    assert float(ends[0, 2]) > float(ends[0, 0])
    assert float(ends[1, 0]) > float(ends[1, 2])
