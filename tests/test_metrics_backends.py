"""Parity tests for the exact FID / LPIPS metric backends.

The reference computes FID with ``piq.FID().compute_feats`` (InceptionV3
pool3 features) and LPIPS with ``piq.LPIPS()`` (VGG16 + learned linear
heads) — reference utils/metrics_utils.py:101-105,370.  piq/torchvision are
not installed in this environment, so the oracles are independent PyTorch
implementations of the same architectures (tests/torch_inception.py and the
in-file VGG16 mirror), exercised on random weights in the torchvision
state-dict layout.  This validates the JAX ports + every transplant mapping;
published numbers additionally need the published weight files, which load
through the same loaders.
"""

import numpy as np
import pytest

import jax.numpy as jnp

torch = pytest.importorskip("torch")
import torch.nn as tnn  # noqa: E402

from gazenerf_tpu.eval.metrics import (  # noqa: E402
    LPIPS_CAPTURE,
    fid,
    frechet_distance,
    lpips_lin_from_torch,
    make_lpips_fn,
)
from gazenerf_tpu.models.inception import (  # noqa: E402
    InceptionV3FID,
    inception_from_torch,
    make_fid_features_fn,
)
from gazenerf_tpu.models.vgg import VGG16Features, vgg_features_from_torch  # noqa: E402
from tests.torch_inception import TorchInceptionV3FID  # noqa: E402

VGG_CFG = [64, 64, "M", 128, 128, "M", 256, 256, 256, "M",
           512, 512, 512, "M", 512, 512, 512, "M"]
# post-ReLU torchvision feature indices of the 5 LPIPS capture points
TORCH_LPIPS_IDX = (3, 8, 15, 22, 29)


def make_torch_vgg16_features(seed=0):
    g = torch.Generator().manual_seed(seed)
    layers, cin = [], 3
    for v in VGG_CFG:
        if v == "M":
            layers.append(tnn.MaxPool2d(2, 2))
        else:
            layers += [tnn.Conv2d(cin, v, 3, padding=1), tnn.ReLU()]
            cin = v
    net = tnn.Sequential(*layers)
    with torch.no_grad():
        for p in net.parameters():
            p.copy_(torch.randn(p.shape, generator=g) * 0.05)
    return net.eval()


def randomize_torch_net(net, seed=0):
    g = torch.Generator().manual_seed(seed)
    with torch.no_grad():
        for m in net.modules():
            if isinstance(m, tnn.Conv2d):
                m.weight.copy_(torch.randn(m.weight.shape, generator=g) * 0.05)
            elif isinstance(m, tnn.BatchNorm2d):
                m.weight.copy_(torch.rand(m.weight.shape, generator=g) + 0.5)
                m.bias.copy_(torch.randn(m.bias.shape, generator=g) * 0.1)
                m.running_mean.copy_(
                    torch.randn(m.running_mean.shape, generator=g) * 0.1
                )
                m.running_var.copy_(
                    torch.rand(m.running_var.shape, generator=g) + 0.5
                )
    return net.eval()


def test_inception_fid_features_parity():
    """JAX InceptionV3-FID == torch oracle on transplanted random weights,
    through the full pool3 pipeline (resize 299, [-1,1], trunk, GAP)."""
    tnet = randomize_torch_net(TorchInceptionV3FID(), seed=1)
    sd = {k: v.numpy() for k, v in tnet.state_dict().items()}
    variables = inception_from_torch(sd)

    rng = np.random.default_rng(2)
    imgs = rng.random((2, 64, 64, 3), np.float32)
    feats_fn = make_fid_features_fn(variables)
    got = np.asarray(feats_fn(jnp.asarray(imgs)))

    with torch.no_grad():
        want = tnet.pool3(
            torch.from_numpy(imgs.transpose(0, 3, 1, 2))
        ).numpy()
    assert got.shape == (2, 2048)
    np.testing.assert_allclose(got, want, atol=2e-4, rtol=1e-3)


def test_inception_trunk_shape():
    """Trunk output is the 2048-channel Mixed_7c map at 299 input."""
    tnet = randomize_torch_net(TorchInceptionV3FID(), seed=3)
    variables = inception_from_torch(
        {k: v.numpy() for k, v in tnet.state_dict().items()}
    )
    x = jnp.zeros((1, 299, 299, 3))
    out = InceptionV3FID().apply(variables, x)
    assert out.shape == (1, 8, 8, 2048)


def test_vgg16_transplant_capture_parity():
    """torchvision-layout VGG16 weights flow through vgg_features_from_torch
    and all capture blocks match torch (VERDICT item: the frozen perceptual
    path was architecture-tested but never weight-flow-tested)."""
    tvgg = make_torch_vgg16_features(seed=4)
    sd = {f"features.{k}": v.numpy() for k, v in tvgg.state_dict().items()}
    params = vgg_features_from_torch(sd)

    rng = np.random.default_rng(5)
    imgs = rng.random((2, 64, 64, 3), np.float32)
    caps, final = VGG16Features(capture=LPIPS_CAPTURE).apply(
        {"params": params}, jnp.asarray(imgs)
    )

    x = torch.from_numpy(imgs.transpose(0, 3, 1, 2))
    want = []
    with torch.no_grad():
        for i, layer in enumerate(tvgg):
            x = layer(x)
            if i in TORCH_LPIPS_IDX:
                want.append(x.numpy().transpose(0, 2, 3, 1))
    assert len(caps) == len(want) == 5
    # f32 conv accumulation order differs between XLA and torch; through 13
    # layers that compounds to ~6e-4 absolute on O(0.1) activations
    for got_c, want_c in zip(caps, want):
        np.testing.assert_allclose(
            np.asarray(got_c), want_c, atol=2e-3, rtol=2e-2
        )


def test_lpips_parity():
    """make_lpips_fn == an independent torch implementation of the LPIPS
    'lin' formulation on the same transplanted weights."""
    tvgg = make_torch_vgg16_features(seed=6)
    sd = {f"features.{k}": v.numpy() for k, v in tvgg.state_dict().items()}
    params = vgg_features_from_torch(sd)

    rng = np.random.default_rng(7)
    lin_t = [torch.rand(1, c, 1, 1) * 0.2
             for c in (64, 128, 256, 512, 512)]
    lin = lpips_lin_from_torch([w.numpy() for w in lin_t])
    lpips_fn = make_lpips_fn({"params": params}, lin_weights=lin)

    a = rng.random((2, 64, 64, 3), np.float32)
    b = rng.random((2, 64, 64, 3), np.float32)
    got = np.asarray(lpips_fn(jnp.asarray(a), jnp.asarray(b)))

    mean = torch.tensor([0.485, 0.456, 0.406]).view(1, 3, 1, 1)
    std = torch.tensor([0.229, 0.224, 0.225]).view(1, 3, 1, 1)

    def torch_feats(x):
        x = (torch.from_numpy(x.transpose(0, 3, 1, 2)) - mean) / std
        caps = []
        for i, layer in enumerate(tvgg):
            x = layer(x)
            if i in TORCH_LPIPS_IDX:
                caps.append(x)
        return caps

    with torch.no_grad():
        want = torch.zeros(2)
        for fa, fb, w in zip(torch_feats(a), torch_feats(b), lin_t):
            na = fa / torch.sqrt((fa * fa).sum(1, keepdim=True) + 1e-10)
            nb = fb / torch.sqrt((fb * fb).sum(1, keepdim=True) + 1e-10)
            want += ((na - nb) ** 2 * w).sum(1).mean((1, 2))
    np.testing.assert_allclose(got, want.numpy(), atol=1e-5, rtol=1e-4)


def test_fid_end_to_end_properties():
    """fid() is ~0 on identical sets and positive on disjoint ones."""
    tnet = randomize_torch_net(TorchInceptionV3FID(), seed=8)
    variables = inception_from_torch(
        {k: v.numpy() for k, v in tnet.state_dict().items()}
    )
    feats_fn = make_fid_features_fn(variables)
    rng = np.random.default_rng(9)
    set_a = [rng.random((32, 32, 3), np.float32) for _ in range(6)]
    set_b = [np.clip(a + 0.3 * rng.random(a.shape, np.float32), 0, 1)
             for a in set_a]
    same = fid(feats_fn, set_a, list(set_a), batch_size=3)
    diff = fid(feats_fn, set_a, set_b, batch_size=3)
    assert abs(same) < 1e-3
    assert diff > same


def test_frechet_distance_closed_form():
    """Known-Gaussian check: two sets from shifted distributions."""
    rng = np.random.default_rng(10)
    a = rng.normal(0.0, 1.0, (4000, 4)).astype(np.float64)
    b = rng.normal(1.0, 1.0, (4000, 4)).astype(np.float64)
    d = frechet_distance(a, b)
    # analytic: |mu1-mu2|^2 = 4, cov terms ~ 0
    assert 3.0 < d < 5.0
