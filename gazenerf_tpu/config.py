"""Configuration tree for the TPU-native GazeNeRF framework.

One dataclass config tree replaces the reference's two-tier argparse +
hard-coded ``BaseOptions`` system (reference: configs/gazenerf_options.py:1-36,
train.py:15-47).  The tree is serialized into checkpoints so a run is fully
reproducible from its checkpoint alone.
"""

from __future__ import annotations

import dataclasses
import json
from typing import Any, Optional, Tuple


@dataclasses.dataclass(frozen=True)
class ModelConfig:
    """Architecture hyper-parameters.

    Mirrors the capability surface of the reference ``BaseOptions``
    (configs/gazenerf_options.py:9-35) but is an explicit, frozen dataclass.
    """

    bg_type: str = "white"  # "white" | "black"

    iden_code_dims: int = 100
    expr_code_dims: int = 79
    text_code_dims: int = 100
    illu_code_dims: int = 27
    eye_code_dims: int = 2  # (pitch, yaw) gaze

    num_sample_coarse: int = 64
    num_sample_fine: int = 128
    hier_sampling: bool = False
    include_vd: bool = False

    # z-plane bounded sampling volume (reference configs/gazenerf_options.py:24-25)
    world_z1: float = 2.5
    world_z2: float = -3.5

    mlp_hidden: int = 384
    mlp_layers: int = 8

    # positional encoding
    vp_n_freqs: int = 10
    vd_n_freqs: int = 4
    include_input_vp: bool = True
    include_input_vd: bool = True

    featmap_size: int = 64
    featmap_nc: int = 258  # 86*3 -> enables the gaze-rotation trick
    pred_img_size: int = 512
    min_feat: int = 32

    # compute dtype for the field MLPs ("float32"|"bfloat16")
    compute_dtype: str = "float32"
    # compute dtype for the neural renderer. bf16 is ~15% faster end-to-end
    # inside the full training step, but in some isolated compilation contexts
    # the bf16 pixel-shuffle transposes hit a pathological Mosaic lowering
    # (200x; see PERF_NOTES.md) -- default f32 for safety, bench uses bf16.
    renderer_dtype: str = "float32"
    # rematerialize the field MLPs in the backward pass: recompute their
    # activations per-tile instead of spilling ~10 GB of [B,R,S,384] layer
    # activations to HBM (measured 1.2x step speedup at full size)
    remat_fields: bool = True
    # use the fused Pallas ray-march kernel on TPU (falls back to XLA path
    # automatically on other backends)
    use_pallas: bool = True
    # run the Pallas kernel in interpret mode on non-TPU backends (tests)
    pallas_interpret: bool = False
    # ray-tile sizes for the fused kernel (0 = auto: fwd <=2048 points/tile,
    # bwd 8 rays — the bwd stashes activations so its tiles are smaller)
    pallas_tile_rays: int = 0
    pallas_bwd_tile_rays: int = 0
    # blur-shuffle implementation in the neural renderer:
    # "phase_gm" (default; group-major phases emitted at zero cost by a
    #   static weight-column permutation + matmul residual, then the XLA
    #   shifted-FMA stencil: 129.9 vs 138.5 ms/step for plain "phase"),
    # "phase" (c-major XLA stencil with strided phase gathers),
    # "pallas" (fused VMEM stencil kernel, exact-parity tested; ties
    #   phase_gm at 130.2 ms — XLA already fuses the taps well),
    # "naive" (transpose shuffle + depthwise-conv blur)
    shuffle_mode: str = "phase_gm"
    # run the 4 neural-renderer passes (bg/face/eyes/merge) as one batched
    # call instead of sequentially (identical math).  Measured SLOWER on
    # v5e (156 vs 139 ms/step: the 3B+1-row batch tiles worse through the
    # pixel-shuffle transposes than 4 small passes) — default off.
    batch_renderer_passes: bool = False
    # batch only the three SAME-SHAPE foreground passes (face/eyes/merge,
    # 3B rows — even MXU tiles, unlike the 3B+1 stack above) and render the
    # 1-row bg featmap separately
    batch_fg_passes: bool = False
    # fold each feat_layer into the preceding blur-shuffle per phase
    # (exact: channel mixing commutes with the per-channel stencil whose
    # taps sum to 1) — the stencil runs on the folded channel count and the
    # full-resolution feat matmul disappears.  gm modes only.
    renderer_fold_feat: bool = True
    # rgb skip chain channel-first ([B,3,H,W]): NHWC C=3 lane-pads 3->128,
    # so the blur/upsample chain on the rgb accumulator otherwise touches
    # ~42x the real bytes.  Exact.
    renderer_rgb_cf: bool = True
    # (pruned probes, PERF_NOTES rounds 2-3: bwd data-grad bf16 EQUAL at
    # TR=8 and TR=32; trunk bf16-out rejected by Mosaic; split2 flat)
    # raise Mosaic's scoped-VMEM cap for the fused field kernels (MB).
    # The default cap (~16MB) is far below v5e's physical 128MB VMEM and
    # is what blocked bwd_tile_rays>8 ("25.58M scoped vs 16M", PERF_NOTES
    # round 2).  0 = compiler default.
    pallas_vmem_mb: int = 0
    # render rays in sequential chunks of this many rays (lax.map +
    # jax.checkpoint): bounds the live activation/stash footprint to one
    # chunk, enabling deep sample marches (e.g. S=256 full-size needs
    # ~16.7GB unchunked — over v5e's HBM) at the cost of recompute.
    # 0 = no chunking (fastest; the S=64 training shape fits easily)
    ray_chunk: int = 0
    # evaluate BOTH field branches (face + eyes) in ONE fused kernel per
    # direction: the two 8-layer chains are independent, so the scheduler
    # interleaves them to fill MXU pipeline gaps; shared-input cotangents
    # (dembed/dzvals/dzdists) are summed in VMEM
    pallas_dual_branch: bool = False
    # compute the positional encoding inside the fused field kernels (raw
    # sample points in, dpts cotangent out): the [B,R,S,63] embed/dembed
    # tensors never touch HBM and the XLA-side sin/cos+concat+layout chain
    # disappears
    pallas_fuse_embed: bool = False
    # field fwd kernel stashes its trunk/head activations (bf16) in HBM and
    # the bwd kernel reads them instead of recomputing the forward in-tile:
    # trades ~3.8 GB/branch of pipelined HBM traffic for 1/3 of the
    # backward's MXU FLOPs (the bwd kernels are the step's dominant cost —
    # 62 of 112 ms in the round-3 trace).  The stash traffic scales with
    # num_sample_coarse: it WINS at S=64 (-13 ms) and LOSES at S=256
    # (+30 ms) — keep False for deep marches (PERF_NOTES round 4 crossover)
    pallas_stash_acts: bool = False
    # two-level stash ladder: with stash_acts, stash only every k-th trunk
    # layer (k=2 -> x1,x3,x5,x7) and recompute the rest in-tile — interpolates
    # between full-stash (S=64 winner) and full-recompute (S=256 winner) by
    # trading k-1/k of the S-scaled stash HBM traffic for recompute matmuls
    pallas_stash_every: int = 1
    # store the stash tensors consumed only by ReLU masks / dW outer products
    # (x0..x6, y0b) as per-(ray,sample)-row-scaled int8 instead of bf16: halves their HBM
    # write+read traffic — the S-scaled term that decides the stash-vs-
    # recompute crossover.  x7 and y1 stay bf16 (the backward recomputes the
    # density/feature heads from them, feeding the nonlinear integration
    # backward).  Opt-in: gradients pick up ~quantization-step noise instead
    # of matching the recompute path bitwise.  Requires stash_every == 1 and
    # not split_dw.
    pallas_stash_dtype: str = "bfloat16"
    # backward kernel emits only the data-gradient chain (masked per-layer
    # dpre cotangents, bf16, to HBM); the weight gradients become one giant
    # [C_in,N]x[N,C_out] XLA matmul per layer over the stashed activations.
    # The in-kernel dW accumulate pattern (~35 small matmuls/grid step) ran
    # at ~60% MFU; XLA runs the same contractions at ~87%.  Implies
    # stash_acts; incompatible with pallas_fuse_embed.
    pallas_split_dw: bool = False
    # compute the 1-wide density head on the VPU (broadcast-multiply + lane
    # reduction) instead of its three worst-shaped MXU matmuls
    pallas_dens_vpu: bool = False
    # pass the positional encoding to the fused kernels as bf16 (forward
    # values unchanged — the kernel casts internally anyway); the dembed
    # cotangent then comes back bf16, halving its write + XLA-side chain
    pallas_embed_bf16: bool = False

    @property
    def shape_code_dims(self) -> int:
        return self.iden_code_dims + self.expr_code_dims

    @property
    def appea_code_dims(self) -> int:
        return self.text_code_dims + self.illu_code_dims

    @property
    def shape_ext_code_dims(self) -> int:
        return self.shape_code_dims + self.eye_code_dims

    @property
    def vp_embed_dims(self) -> int:
        d = self.vp_n_freqs * 6
        return d + 3 if self.include_input_vp else d

    @property
    def vd_embed_dims(self) -> int:
        d = self.vd_n_freqs * 6
        return d + 3 if self.include_input_vd else d

    @property
    def vp_channels(self) -> int:
        # embedded position + (iden, expr, gaze) conditioning
        return self.vp_embed_dims + self.shape_ext_code_dims

    @property
    def vd_channels(self) -> int:
        d = self.appea_code_dims
        if self.include_vd:
            d += self.vd_embed_dims
        return d

    @property
    def num_rays(self) -> int:
        return self.featmap_size * self.featmap_size

    @property
    def n_upsample_blocks(self) -> int:
        import math

        return int(math.log2(self.pred_img_size) - math.log2(self.featmap_size))


@dataclasses.dataclass(frozen=True)
class LossConfig:
    """Loss-stack knobs (reference losses/gazenerf_loss.py:190-236,450-468)."""

    # reference train.py CLI defaults (train.py:28,38-43): the out-of-the-box
    # Config IS the reference training recipe (VERDICT r4 #2)
    eye_loss_importance: float = 10.0
    vgg_importance: float = 1.0
    use_vgg_loss: bool = True
    # pretrained frozen-net checkpoints for the loss stack (reference loads
    # torchvision VGG16 + the gaze-VGG ckpt, losses/gazenerf_loss.py:49-52,
    # 110-117); empty = random init (tests only)
    vgg_ckpt: str = ""
    gaze_ckpt: str = ""
    use_l1_loss: bool = True
    use_angular_loss: bool = False
    use_patch_gan_loss: bool = False
    is_gradual_loss: bool = False
    # -- performance knobs (math-preserving unless noted) ------------------
    # run all 6 perceptual images (3 pred/gt pairs) through ONE batched
    # VGG16 apply instead of 6 separate forwards: identical values (convs
    # are per-sample; the per-pair feature-L1 means are taken on slices of
    # the batched features), ~one-third the kernel launches and far better
    # MXU tiling at B=2 (PERF_NOTES round 5)
    vgg_batched: bool = True
    # compute dtype for the frozen VGG16/gaze nets in the LOSS stack
    # ("float32" = reference-exact; bench uses bfloat16 — the frozen nets
    # only shape gradients, and bf16 halves their HBM traffic)
    vgg_dtype: str = "float32"

    # regularizer weights (reference losses/gazenerf_loss.py:456-468)
    w_cam_delta: float = 0.001
    w_iden_code: float = 0.001
    w_expr_code: float = 1.0
    w_appea_code: float = 0.001
    w_bg_code: float = 0.01
    # gaze angular scale (reference losses/gazenerf_loss.py:391)
    angular_scale: float = 1.0 / 60000.0
    # PatchGAN generator warm-up (reference losses/gazenerf_loss.py:394)
    gan_warmup_steps: int = 200000
    gan_warmup_cap: float = 0.1


@dataclasses.dataclass(frozen=True)
class TrainConfig:
    """Training-loop knobs (reference train.py:15-47, trainer/gazenerf_trainer.py)."""

    lr: float = 1e-4
    step_decay: int = 1000  # lr = lr0 * 0.1 ** (epoch / step_decay)
    optimizer: str = "adam"
    adam_b1: float = 0.9
    adam_b2: float = 0.999
    batch_size: int = 2  # reference README.md:29 recipe (argparse default is 1)
    num_epochs: int = 2000  # reference train.py:22
    seed: int = 45  # reference train.py:54 torch.manual_seed(45)
    opt_cam: bool = True
    disc_lr_weight_decay: float = 1e-4

    # per-group LR multipliers (reference trainer/gazenerf_trainer.py:463-474)
    lr_mult_iden: float = 1.0
    lr_mult_expr: float = 0.1
    lr_mult_appea: float = 1.0
    lr_mult_euler: float = 0.1
    lr_mult_tvec: float = 0.1

    checkpoint_dir: str = "checkpoints"
    checkpoint_every: int = 1  # epochs
    log_every: int = 300  # batches
    # train steps executed per device dispatch: K>1 stacks K loader batches
    # into one transfer and runs lax.scan of K steps inside one jit, hiding
    # per-dispatch host latency (the loader-fed/scan-fed gap, PERF_NOTES.md).
    # 1 = one dispatch per batch (finest logging granularity).
    steps_per_dispatch: int = 1


@dataclasses.dataclass(frozen=True)
class DataConfig:
    """Input-pipeline knobs (reference datasets/eth_xgaze.py:69-161)."""

    dataset: str = "eth_xgaze"  # eth_xgaze | mpii_face_gaze | columbia | gaze_capture
    img_dir: str = ""
    num_workers: int = 4
    prefetch: int = 2
    img_size: int = 512
    # frames per subject for the training split (reference datasets/eth_xgaze.py:260-267)
    frames_per_subject: int = 900


@dataclasses.dataclass(frozen=True)
class ParallelConfig:
    """Mesh / sharding layout.

    The reference is single-GPU (train.py:86-88); every axis here is new,
    TPU-first design: batch ("data") and ray-tile ("ray") sharding, gradients
    psum'ed over ICI.
    """

    data_axis: str = "data"
    ray_axis: str = "ray"
    data_parallel: int = 1
    ray_parallel: int = 1
    # whether per-sample offset tables are sharded along the data axis
    shard_offsets: bool = True


@dataclasses.dataclass(frozen=True)
class Config:
    model: ModelConfig = dataclasses.field(default_factory=ModelConfig)
    loss: LossConfig = dataclasses.field(default_factory=LossConfig)
    train: TrainConfig = dataclasses.field(default_factory=TrainConfig)
    data: DataConfig = dataclasses.field(default_factory=DataConfig)
    parallel: ParallelConfig = dataclasses.field(default_factory=ParallelConfig)

    def to_json(self) -> str:
        return json.dumps(dataclasses.asdict(self), indent=2, sort_keys=True)

    @classmethod
    def from_json(cls, s: str) -> "Config":
        d = json.loads(s)
        return cls(
            model=ModelConfig(**d.get("model", {})),
            loss=LossConfig(**d.get("loss", {})),
            train=TrainConfig(**d.get("train", {})),
            data=DataConfig(**d.get("data", {})),
            parallel=ParallelConfig(**d.get("parallel", {})),
        )

    def replace(self, **sections: Any) -> "Config":
        return dataclasses.replace(self, **sections)


def small_test_config() -> Config:
    """A tiny config for fast CPU tests (16x16 featmap, 8 samples)."""
    return Config(
        model=ModelConfig(
            num_sample_coarse=8,
            num_sample_fine=16,
            featmap_size=16,
            featmap_nc=258,
            pred_img_size=64,
            mlp_hidden=64,
            use_pallas=False,
        ),
        train=TrainConfig(batch_size=2),
    )
