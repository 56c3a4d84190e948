from gazenerf_tpu.models.discriminator import PatchGAN
from gazenerf_tpu.models.face_recognition import (
    MobileFaceNet,
    make_identity_embed_fn,
)
from gazenerf_tpu.models.gaze_nerf import GazeNeRF
from gazenerf_tpu.models.mlp_nerf import NeRFFieldMLP
from gazenerf_tpu.models.neural_renderer import NeuralRenderer, PixelShuffleUpsample
from gazenerf_tpu.models.resnet import GazeResNet, ResNet50, gaze_resnet_from_torch
from gazenerf_tpu.models.vgg import (
    GazeVGG,
    VGG16Features,
    gaze_vgg_from_torch,
    normalize_imagenet,
    vgg_features_from_torch,
)

__all__ = [
    "PatchGAN",
    "MobileFaceNet",
    "make_identity_embed_fn",
    "GazeNeRF",
    "NeRFFieldMLP",
    "NeuralRenderer",
    "PixelShuffleUpsample",
    "GazeResNet",
    "ResNet50",
    "gaze_resnet_from_torch",
    "GazeVGG",
    "VGG16Features",
    "gaze_vgg_from_torch",
    "normalize_imagenet",
    "vgg_features_from_torch",
]
