"""Import the PyTorch reference (read-only, /root/reference) as a test oracle.

The parity north star (BASELINE.json) is pixel+gradient allclose vs the
reference on identical weights.  The reference's model modules only need
torch (+ a kornia ``filter2d`` shim, implemented here from its documented
semantics: depthwise correlation with reflect padding, normalized kernel).

This module must only be imported from tests.
"""

import sys
import types

import torch
import torch.nn.functional as F

REFERENCE_ROOT = "/root/reference"


def _install_kornia_shim():
    if "kornia" in sys.modules:
        return
    kornia = types.ModuleType("kornia")
    filters = types.ModuleType("kornia.filters")

    def filter2d(input, kernel, normalized=True):
        # kernel: [1, kH, kW]
        k = kernel
        if normalized:
            k = k / k.sum()
        C = input.shape[1]
        kH, kW = k.shape[-2:]
        k = k.view(1, 1, kH, kW).repeat(C, 1, 1, 1).to(input.dtype)
        x = F.pad(input, (kW // 2, kW // 2, kH // 2, kH // 2), mode="reflect")
        return F.conv2d(x, k, groups=C)

    filters.filter2d = filter2d
    kornia.filters = filters
    sys.modules["kornia"] = kornia
    sys.modules["kornia.filters"] = filters


def load_reference():
    """Returns the reference modules (imported from /root/reference)."""
    _install_kornia_shim()
    if REFERENCE_ROOT not in sys.path:
        sys.path.insert(0, REFERENCE_ROOT)
    from configs.gazenerf_options import BaseOptions  # noqa
    from models.gaze_nerf import GazeNeRFNet  # noqa
    from models.mlp_nerf import MLPforNeRF  # noqa

    return types.SimpleNamespace(
        BaseOptions=BaseOptions, GazeNeRFNet=GazeNeRFNet, MLPforNeRF=MLPforNeRF
    )


def small_reference_net(hidden=64, featmap_size=16, n_samples=8, img_size=128):
    """A shrunken reference GazeNeRFNet (same topology, small dims)."""
    ref = load_reference()
    opt = ref.BaseOptions(
        {"featmap_size": featmap_size, "featmap_nc": 258, "pred_img_size": img_size}
    )
    opt.num_sample_coarse = n_samples
    opt.mlp_hidden_nchannels = hidden
    torch.manual_seed(0)
    net = ref.GazeNeRFNet(opt, include_vd=False, hier_sampling=False)
    net.eval()
    return net, opt
