"""Weight transplant: PyTorch reference state-dict <-> flax param tree.

The parity north star (BASELINE.json) is pixel+gradient allclose vs the
PyTorch model on identical weights.  This module maps between:

* reference names (models/mlp_nerf.py:29-93, models/neural_renderer.py:57-96):
  ``fg_CD_predictor_face.FeaExt_module_0.weight`` (1x1 Conv2d, ``[out,in,1,1]``),
  ``neural_render.feat_upsample_list.0.layer_1.weight``,
  ``neural_render.bg_featmap`` (``[1,C,H,W]``), ...
* our flax tree: ``params["fg_CD_predictor_face"]["fea_0/kernel"]``
  (``[in,out]``), ``params["neural_render"]["feat_upsample_0"]["layer_1"]
  ["kernel"]``, ``params["neural_render"]["bg_featmap"]`` (``[1,H,W,C]``), ...

Works on plain numpy arrays so no torch import is required here (callers load
``.pth`` files with torch on CPU and pass ``{k: v.numpy()}``).
"""

from __future__ import annotations

from typing import Dict, Mapping

import numpy as np


def _conv1x1_to_kernel(w: np.ndarray) -> np.ndarray:
    """torch Conv2d 1x1 weight ``[out, in, 1, 1]`` -> Dense kernel ``[in, out]``."""
    assert w.ndim == 4 and w.shape[2] == w.shape[3] == 1, w.shape
    return np.ascontiguousarray(w[:, :, 0, 0].T)


def _kernel_to_conv1x1(k: np.ndarray) -> np.ndarray:
    return np.ascontiguousarray(k.T[:, :, None, None])


# field MLP name pairs: (torch module name, flax param prefix)
_FIELD_LAYERS = (
    [(f"FeaExt_module_{i}", f"fea_{i}") for i in range(8)]
    + [
        ("density_module", "density"),
        ("RGB_layer_0", "rgb_0"),
        ("RGB_layer_1", "rgb_1"),
        ("RGB_layer_2", "rgb_2"),
    ]
)

_FIELD_NAMES = ("fg_CD_predictor_face", "fg_CD_predictor_eyes", "fine_fg_CD_predictor")


def field_params_from_torch(sd: Mapping[str, np.ndarray], prefix: str) -> Dict:
    """Extract one ``MLPforNeRF``'s params from a torch state dict."""
    out = {}
    for tname, jname in _FIELD_LAYERS:
        out[f"{jname}/kernel"] = _conv1x1_to_kernel(
            np.asarray(sd[f"{prefix}.{tname}.weight"])
        )
        out[f"{jname}/bias"] = np.asarray(sd[f"{prefix}.{tname}.bias"])
    return out


def field_params_to_torch(params: Mapping, prefix: str) -> Dict[str, np.ndarray]:
    out = {}
    for tname, jname in _FIELD_LAYERS:
        out[f"{prefix}.{tname}.weight"] = _kernel_to_conv1x1(
            np.asarray(params[f"{jname}/kernel"])
        )
        out[f"{prefix}.{tname}.bias"] = np.asarray(params[f"{jname}/bias"])
    return out


def renderer_params_from_torch(
    sd: Mapping[str, np.ndarray], n_blocks: int, prefix: str = "neural_render"
) -> Dict:
    out: Dict = {}
    for i in range(n_blocks):
        blk = {}
        for layer in ("layer_1", "layer_2"):
            blk[layer] = {
                "kernel": _conv1x1_to_kernel(
                    np.asarray(sd[f"{prefix}.feat_upsample_list.{i}.{layer}.weight"])
                ),
                "bias": np.asarray(
                    sd[f"{prefix}.feat_upsample_list.{i}.{layer}.bias"]
                ),
            }
        out[f"feat_upsample_{i}"] = blk
        out[f"feat_layer_{i}"] = {
            "kernel": _conv1x1_to_kernel(
                np.asarray(sd[f"{prefix}.feat_layers.{i}.weight"])
            ),
            "bias": np.asarray(sd[f"{prefix}.feat_layers.{i}.bias"]),
        }
    for i in range(n_blocks + 1):
        out[f"feat_2_rgb_{i}"] = {
            "kernel": _conv1x1_to_kernel(
                np.asarray(sd[f"{prefix}.feat_2_rgb_list.{i}.weight"])
            ),
            "bias": np.asarray(sd[f"{prefix}.feat_2_rgb_list.{i}.bias"]),
        }
    out["bg_featmap"] = np.asarray(sd[f"{prefix}.bg_featmap"]).transpose(0, 2, 3, 1)
    return out


def renderer_params_to_torch(
    params: Mapping, n_blocks: int, prefix: str = "neural_render"
) -> Dict[str, np.ndarray]:
    out = {}
    for i in range(n_blocks):
        for layer in ("layer_1", "layer_2"):
            p = params[f"feat_upsample_{i}"][layer]
            out[f"{prefix}.feat_upsample_list.{i}.{layer}.weight"] = _kernel_to_conv1x1(
                np.asarray(p["kernel"])
            )
            out[f"{prefix}.feat_upsample_list.{i}.{layer}.bias"] = np.asarray(
                p["bias"]
            )
        p = params[f"feat_layer_{i}"]
        out[f"{prefix}.feat_layers.{i}.weight"] = _kernel_to_conv1x1(
            np.asarray(p["kernel"])
        )
        out[f"{prefix}.feat_layers.{i}.bias"] = np.asarray(p["bias"])
    for i in range(n_blocks + 1):
        p = params[f"feat_2_rgb_{i}"]
        out[f"{prefix}.feat_2_rgb_list.{i}.weight"] = _kernel_to_conv1x1(
            np.asarray(p["kernel"])
        )
        out[f"{prefix}.feat_2_rgb_list.{i}.bias"] = np.asarray(p["bias"])
    out[f"{prefix}.bg_featmap"] = np.asarray(params["bg_featmap"]).transpose(
        0, 3, 1, 2
    )
    return out


def gazenerf_params_from_torch(sd: Mapping[str, np.ndarray], n_blocks: int = 3) -> Dict:
    """Full reference ``GazeNeRFNet`` state dict -> flax param tree."""
    params: Dict = {}
    for name in _FIELD_NAMES:
        if any(k.startswith(name + ".") for k in sd):
            params[name] = field_params_from_torch(sd, name)
    params["neural_render"] = renderer_params_from_torch(sd, n_blocks)
    return {"params": params}


def gazenerf_params_to_torch(variables: Mapping, n_blocks: int = 3) -> Dict:
    params = variables["params"] if "params" in variables else variables
    out: Dict[str, np.ndarray] = {}
    for name in _FIELD_NAMES:
        if name in params:
            out.update(field_params_to_torch(params[name], name))
    out.update(renderer_params_to_torch(params["neural_render"], n_blocks))
    return out
