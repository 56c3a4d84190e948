"""Parity tests for the FaceX-Zoo identity pipeline ports
(RetinaFace detector, PFLD aligner, cropper, end-to-end fallback)."""

import sys
import types

import numpy as np
import pytest
import torch

import jax
import jax.numpy as jnp

from reference_oracle import REFERENCE_ROOT


def _install_torchvision_shim():
    """The reference retinaface_def only needs IntermediateLayerGetter."""
    if "torchvision" in sys.modules:
        return
    tv = types.ModuleType("torchvision")
    models = types.ModuleType("torchvision.models")
    utils = types.ModuleType("torchvision.models._utils")

    class IntermediateLayerGetter(torch.nn.ModuleDict):
        def __init__(self, model, return_layers):
            layers = {}
            rl = dict(return_layers)
            for name, module in model.named_children():
                layers[name] = module
                if name in rl:
                    del rl[name]
                if not rl:
                    break
            super().__init__(layers)
            self.return_layers = dict(return_layers)

        def forward(self, x):
            out = {}
            for name, module in self.items():
                x = module(x)
                if name in self.return_layers:
                    out[self.return_layers[name]] = x
            return out

    utils.IntermediateLayerGetter = IntermediateLayerGetter
    models._utils = utils
    tv.models = models
    sys.modules["torchvision"] = tv
    sys.modules["torchvision.models"] = models
    sys.modules["torchvision.models._utils"] = utils


def _randomize_bn(net):
    with torch.no_grad():
        for m in net.modules():
            if isinstance(m, torch.nn.BatchNorm2d):
                m.running_mean.uniform_(-0.1, 0.1)
                m.running_var.uniform_(0.5, 1.5)


def test_retinaface_parity():
    _install_torchvision_shim()
    if REFERENCE_ROOT not in sys.path:
        sys.path.insert(0, REFERENCE_ROOT)
    from face_recognition.models.network_def.retinaface_def import (
        RetinaFace as TorchRetinaFace,
    )

    from gazenerf_tpu.models.face_detection import (
        RetinaFace,
        retinaface_params_from_torch,
    )

    cfg = {
        "return_layers": {"stage1": 1, "stage2": 2, "stage3": 3},
        "in_channel": 32,
        "out_channel": 64,
    }
    torch.manual_seed(7)
    tnet = TorchRetinaFace(cfg=cfg, phase="test")
    tnet.eval()
    _randomize_bn(tnet)

    x = np.random.default_rng(0).standard_normal((1, 3, 120, 120)).astype(np.float32)
    with torch.no_grad():
        bbox_t, cls_t, ldm_t = tnet(torch.from_numpy(x))

    variables = retinaface_params_from_torch(
        {k: v.detach().numpy() for k, v in tnet.state_dict().items()}
    )
    jnet = RetinaFace()
    bbox_j, cls_j, ldm_j = jnet.apply(
        variables, jnp.asarray(x.transpose(0, 2, 3, 1))
    )
    np.testing.assert_allclose(np.asarray(bbox_j), bbox_t.numpy(), atol=3e-4, rtol=1e-3)
    np.testing.assert_allclose(np.asarray(cls_j), cls_t.numpy(), atol=3e-4, rtol=1e-3)
    np.testing.assert_allclose(np.asarray(ldm_j), ldm_t.numpy(), atol=3e-4, rtol=1e-3)


def test_priorbox_and_nms():
    from gazenerf_tpu.models.face_detection import decode_boxes, nms, prior_boxes

    priors = prior_boxes((120, 120))
    # 15x15 + 8x8 + 4x4 feature maps x 2 anchors
    assert priors.shape == ((15 * 15 + 8 * 8 + 4 * 4) * 2, 4)
    assert priors[0, :2] == pytest.approx([0.5 * 8 / 120, 0.5 * 8 / 120])
    assert priors[0, 2:] == pytest.approx([16 / 120, 16 / 120])

    # zero offsets decode back to the prior box corners
    boxes = decode_boxes(np.zeros_like(priors), priors)
    np.testing.assert_allclose(
        boxes[:, 2] - boxes[:, 0], priors[:, 2], atol=1e-6
    )

    dets = np.array(
        [
            [10, 10, 50, 50, 0.9],
            [12, 12, 52, 52, 0.8],  # heavy overlap -> suppressed
            [100, 100, 140, 140, 0.7],
        ],
        np.float32,
    )
    assert nms(dets, 0.2) == [0, 2]


def test_pfld_parity():
    if REFERENCE_ROOT not in sys.path:
        sys.path.insert(0, REFERENCE_ROOT)
    from face_recognition.models.network_def.mobilev3_pfld import PFLDInference

    from gazenerf_tpu.models.face_alignment import PFLD, pfld_params_from_torch

    torch.manual_seed(11)
    tnet = PFLDInference()
    tnet.eval()
    _randomize_bn(tnet)

    x = np.random.default_rng(1).standard_normal((1, 3, 112, 112)).astype(np.float32)
    with torch.no_grad():
        _, lm_t = tnet(torch.from_numpy(x))

    variables = pfld_params_from_torch(
        {k: v.detach().numpy() for k, v in tnet.state_dict().items()}
    )
    lm_j = PFLD().apply(variables, jnp.asarray(x.transpose(0, 2, 3, 1)))
    np.testing.assert_allclose(np.asarray(lm_j), lm_t.numpy(), atol=5e-4, rtol=1e-3)


def test_umeyama_recovers_similarity():
    from gazenerf_tpu.models.face_recognition import umeyama_similarity

    rng = np.random.default_rng(5)
    src = rng.standard_normal((5, 2)).astype(np.float32) * 20 + 56
    th, s = 0.3, 1.7
    R = np.array([[np.cos(th), -np.sin(th)], [np.sin(th), np.cos(th)]])
    t = np.array([3.0, -7.0])
    dst = (s * src @ R.T + t).astype(np.float32)
    M = umeyama_similarity(src, dst)
    np.testing.assert_allclose(M[:, :2], s * R, atol=1e-4)
    np.testing.assert_allclose(M[:, 2], t, atol=1e-3)


def test_identity_pipeline_fallback_and_crop():
    cv2 = pytest.importorskip("cv2")
    from gazenerf_tpu.models.face_recognition import (
        IdentitySimilarityPipeline,
        arcface_crop,
    )

    rng = np.random.default_rng(2)
    img = (rng.random((200, 200, 3)) * 255).astype(np.uint8)
    # no detector/aligner weights -> direct resize fallback; self-similarity 1
    pipe = IdentitySimilarityPipeline()
    assert pipe(img, img) == pytest.approx(1.0, abs=1e-5)
    other = (rng.random((200, 200, 3)) * 255).astype(np.uint8)
    assert -1.0 <= pipe(img, other) <= 1.0

    lms106 = rng.random((106, 2)).astype(np.float32) * 180 + 10
    crop = arcface_crop(img, lms106)
    assert crop.shape == (112, 112, 3)


def test_mobilefacenet_parity():
    """flax MobileFaceNet == reference mobilefacenet_def on transplanted
    weights (incl. PReLU blocks and the final l2-norm)."""
    if REFERENCE_ROOT not in sys.path:
        sys.path.insert(0, REFERENCE_ROOT)
    from face_recognition.models.network_def.mobilefacenet_def import (
        MobileFaceNet as TorchMFN,
    )

    from gazenerf_tpu.models.face_recognition import (
        MobileFaceNet,
        mobilefacenet_from_torch,
    )

    torch.manual_seed(13)
    tnet = TorchMFN(512, 7, 7)
    tnet.eval()
    _randomize_bn(tnet)

    x = np.random.default_rng(3).standard_normal((2, 3, 112, 112)).astype(np.float32)
    with torch.no_grad():
        e_t = tnet(torch.from_numpy(x)).numpy()

    variables = mobilefacenet_from_torch(
        {k: v.detach().numpy() for k, v in tnet.state_dict().items()}
    )
    e_j = MobileFaceNet().apply(variables, jnp.asarray(x.transpose(0, 2, 3, 1)))
    np.testing.assert_allclose(np.asarray(e_j), e_t, atol=2e-4, rtol=1e-3)


def test_gaze_vgg_transplant_parity():
    """gaze_vgg_from_torch: random weights in the reference gaze_network
    layout (gaze_estimation/xgaze_baseline_vgg.py:6-45) flow to GazeVGG and
    the (gaze, head) outputs match a torch mirror."""
    import torch
    import torch.nn as tnn
    import torch.nn.functional as tF

    from gazenerf_tpu.models.vgg import GazeVGG, gaze_vgg_from_torch

    VGG_CFG = [64, 64, "M", 128, 128, "M", 256, 256, 256, "M",
               512, 512, 512, "M", 512, 512, 512, "M"]
    layers, cin = [], 3
    for v in VGG_CFG:
        if v == "M":
            layers.append(tnn.MaxPool2d(2, 2))
        else:
            layers += [tnn.Conv2d(cin, v, 3, padding=1), tnn.ReLU()]
            cin = v
    feats = tnn.Sequential(*layers)
    fc1, fc2, fc3 = tnn.Linear(512, 64), tnn.Linear(64, 64), tnn.Linear(64, 4)
    g = torch.Generator().manual_seed(31)
    with torch.no_grad():
        for p in list(feats.parameters()) + list(fc1.parameters()) + list(
            fc2.parameters()
        ) + list(fc3.parameters()):
            p.copy_(torch.randn(p.shape, generator=g) * 0.05)

    sd = {f"vgg16.{k}": v for k, v in feats.state_dict().items()}
    for name, mod in (("FC1", fc1), ("FC2", fc2), ("FC3", fc3)):
        sd[f"{name}.weight"] = mod.weight.detach()
        sd[f"{name}.bias"] = mod.bias.detach()
    params = gaze_vgg_from_torch({k: np.asarray(v) for k, v in sd.items()})

    rng = np.random.default_rng(32)
    imgs = rng.random((2, 64, 64, 3), np.float32)
    gaze, head = GazeVGG().apply({"params": params}, jnp.asarray(imgs))

    with torch.no_grad():
        h = feats(torch.from_numpy(imgs.transpose(0, 3, 1, 2)))
        h = h.mean(-1).mean(-1)
        h = tF.leaky_relu(fc1(h), 0.2)
        h = tF.leaky_relu(fc2(h), 0.2)
        h = np.pi * 0.5 * torch.tanh(fc3(h))
    np.testing.assert_allclose(np.asarray(gaze), h[:, :2].numpy(), atol=1e-4)
    np.testing.assert_allclose(np.asarray(head), h[:, 2:].numpy(), atol=1e-4)


def test_gaze_resnet_transplant_parity():
    """gaze_resnet_from_torch vs the reference's ACTUAL vendored ResNet50
    gaze estimator (gaze_estimation/xgaze_baseline_resnet.py, resnet.py),
    imported with the weight download stubbed out."""
    import sys

    import torch
    import torch.utils.model_zoo as modelzoo

    modelzoo.load_url = lambda *a, **k: {}
    if "/root/reference" not in sys.path:
        sys.path.insert(0, "/root/reference")
    import gaze_estimation.resnet as ref_resnet

    ref_resnet.load_state_dict_from_url = lambda *a, **k: {}
    # the vendored resnet loads pretrained weights via load_state_dict(strict)
    orig_load = torch.nn.Module.load_state_dict
    torch.nn.Module.load_state_dict = lambda self, sd, *a, **k: None
    try:
        from gaze_estimation.xgaze_baseline_resnet import gaze_network
        tnet = gaze_network()
    finally:
        torch.nn.Module.load_state_dict = orig_load

    g = torch.Generator().manual_seed(33)
    with torch.no_grad():
        for m in tnet.modules():
            if isinstance(m, torch.nn.Conv2d):
                m.weight.copy_(torch.randn(m.weight.shape, generator=g) * 0.05)
            elif isinstance(m, torch.nn.BatchNorm2d):
                m.weight.copy_(torch.rand(m.weight.shape, generator=g) + 0.5)
                m.bias.copy_(torch.randn(m.bias.shape, generator=g) * 0.1)
                m.running_mean.copy_(
                    torch.randn(m.running_mean.shape, generator=g) * 0.1
                )
                m.running_var.copy_(
                    torch.rand(m.running_var.shape, generator=g) + 0.5
                )
            elif isinstance(m, torch.nn.Linear):
                m.weight.copy_(torch.randn(m.weight.shape, generator=g) * 0.05)
                m.bias.copy_(torch.randn(m.bias.shape, generator=g) * 0.1)
    tnet.eval()

    from gazenerf_tpu.models.resnet import GazeResNet, gaze_resnet_from_torch

    variables = gaze_resnet_from_torch(
        {k: v.numpy() for k, v in tnet.state_dict().items()}
    )
    rng = np.random.default_rng(34)
    imgs = rng.random((1, 64, 64, 3), np.float32)
    gaze, head = GazeResNet().apply(variables, jnp.asarray(imgs))
    with torch.no_grad():
        wg, wh = tnet(torch.from_numpy(imgs.transpose(0, 3, 1, 2)))
    np.testing.assert_allclose(np.asarray(gaze), wg.numpy(), atol=2e-3, rtol=2e-2)
    np.testing.assert_allclose(np.asarray(head), wh.numpy(), atol=2e-3, rtol=2e-2)
