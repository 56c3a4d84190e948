"""``python -m gazenerf_tpu.cli.evaluate_metrics`` — metric-protocol dispatcher.

TPU twin of the reference ``evaluate_metrics.py`` (reference:
evaluate_metrics.py:57-213): loads a checkpoint + frozen estimator and runs
one of the four quantitative protocols over (input, target) pairs.
"""

from __future__ import annotations

import argparse
import json
import logging

import jax
import jax.numpy as jnp
import numpy as np

from gazenerf_tpu.cli.common import add_common_args, config_from_args
from gazenerf_tpu.data.h5_dataset import BatchLoader, GazeH5Dataset
from gazenerf_tpu.eval.protocols import (
    EvalContext,
    evaluate_consistency,
    evaluate_gaze_transfer,
    evaluate_input_target_images,
)
from gazenerf_tpu.train.checkpoint import load_checkpoint
from gazenerf_tpu.train.trainer import Trainer

logger = logging.getLogger(__name__)


def build_estimator(ckpt_path: str):
    """Frozen ResNet50 gaze estimator (reference evaluate_metrics.py:131-136).

    With no checkpoint the estimator is skipped (angular metrics omitted).
    """
    if not ckpt_path:
        return None
    import torch

    from gazenerf_tpu.models.resnet import GazeResNet, gaze_resnet_from_torch

    sd = torch.load(ckpt_path, map_location="cpu")
    sd = sd.get("model_state", sd)
    variables = gaze_resnet_from_torch({k: v.numpy() for k, v in sd.items()})
    net = GazeResNet()
    # input contract: ImageNet-normalized 224x224 (the protocol applies the
    # reference's ``trans`` before calling — utils/metrics_utils.py:31-38)
    return jax.jit(lambda img: net.apply(variables, img))


def build_lpips(vgg_ckpt: str, lin_ckpt: str):
    """Exact LPIPS (reference piq.LPIPS, utils/metrics_utils.py:370) from a
    torchvision VGG16 checkpoint + the published linear-head weights.  With
    no checkpoints returns None (protocols fall back to the uniform-weight
    perceptual distance)."""
    if not vgg_ckpt:
        return None
    import torch

    from gazenerf_tpu.eval.metrics import (
        LPIPS_CAPTURE,
        lpips_lin_from_torch,
        make_lpips_fn,
    )
    from gazenerf_tpu.models.vgg import vgg_features_from_torch

    sd = torch.load(vgg_ckpt, map_location="cpu")
    params = vgg_features_from_torch({k: v.numpy() for k, v in sd.items()})
    lin = None
    if lin_ckpt:
        lw = torch.load(lin_ckpt, map_location="cpu")
        lin = lpips_lin_from_torch(
            [w.numpy() for w in lw] if isinstance(lw, (list, tuple))
            else {k: v.numpy() for k, v in lw.items()}
        )
    return make_lpips_fn({"params": params}, lin_weights=lin)


def build_fid_features(inception_ckpt: str):
    """Exact FID features (reference piq.FID == InceptionV3 pool3,
    utils/metrics_utils.py:101-105) from a pytorch-fid checkpoint."""
    if not inception_ckpt:
        return None
    import torch

    from gazenerf_tpu.models.inception import (
        inception_from_torch,
        make_fid_features_fn,
    )

    sd = torch.load(inception_ckpt, map_location="cpu")
    sd = sd.get("state_dict", sd)
    return make_fid_features_fn(
        inception_from_torch({k: v.numpy() for k, v in sd.items()})
    )


def build_identity_pipeline(embed_ckpt: str, detector_ckpt: str,
                            aligner_ckpt: str):
    """FaceX-Zoo identity pipeline from torch checkpoints
    (reference evaluation_similarity.py:16-86).  Any missing stage degrades
    gracefully (see models/face_recognition.IdentitySimilarityPipeline);
    with no embed checkpoint the identity metric still runs with a random
    but consistent embedder — only absolute values lose meaning.
    """
    from gazenerf_tpu.models.face_recognition import IdentitySimilarityPipeline

    def torch_sd(path):
        import torch

        sd = torch.load(path, map_location="cpu")
        sd = sd.get("state_dict", sd)
        return {k.replace("module.", ""): v.numpy() for k, v in sd.items()}

    embed_vars = detector = aligner = None
    if embed_ckpt:
        from gazenerf_tpu.utils.transplant import mobilefacenet_from_torch

        embed_vars = mobilefacenet_from_torch(torch_sd(embed_ckpt))
    if detector_ckpt:
        from gazenerf_tpu.models.face_detection import (
            RetinaFaceDetector,
            retinaface_params_from_torch,
        )

        detector = RetinaFaceDetector(
            retinaface_params_from_torch(torch_sd(detector_ckpt))
        )
    if aligner_ckpt:
        from gazenerf_tpu.models.face_alignment import (
            PFLDAligner,
            pfld_params_from_torch,
        )

        aligner = PFLDAligner(pfld_params_from_torch(torch_sd(aligner_ckpt)))
    return IdentitySimilarityPipeline(
        embed_variables=embed_vars, detector=detector, aligner=aligner
    )


def main(argv=None) -> int:
    p = argparse.ArgumentParser(description="Run evaluation protocols")
    add_common_args(p)
    p.add_argument(
        "--evaluation_type", type=str, default="input_target_images",
        choices=["input_target_images", "consistency", "gaze_transfer",
                 "personal_calibration"],
    )
    p.add_argument("--subject", type=str, default=None,
                   help="restrict to one subject (default: sweep every "
                        "subject of the chosen split, like the reference)")
    p.add_argument("--split", type=str, default="val",
                   help="train_test_split.json key to sweep (reference "
                        "evaluates the val subjects — metrics_utils.py:152)")
    p.add_argument("--img_dirs", type=str, default="",
                   help="comma-separated dataset dirs for a multi-dataset "
                        "sweep (parallel to --dataset_names); defaults to "
                        "the single --img_dir")
    p.add_argument("--dataset_names", type=str, default="",
                   help="comma-separated dataset kinds for --img_dirs")
    p.add_argument("--calib_out_dir", type=str, default="",
                   help="personal_calibration: directory for the synthesized "
                        "h5 files (reference metrics_utils.py:443-447)")
    p.add_argument("--num_fit_images", type=int, default=5,
                   help="personal_calibration: images fitted per subject "
                        "(random draw per iteration, reference "
                        "metrics_utils.py:437-440)")
    p.add_argument("--num_iterations", type=int, default=1,
                   help="personal_calibration: calibration rounds per "
                        "subject, each with a fresh random fit set "
                        "(reference metrics_utils.py:431)")
    p.add_argument("--fit_steps", type=int, default=50)
    p.add_argument("--max_pairs", type=int, default=20)
    p.add_argument("--num_eval_images", type=int, default=200,
                   help="val images swept per subject by the consistency / "
                        "personal-calibration protocols (the reference's "
                        "200-image val loader — metrics_utils.py:433,633); "
                        "lower for smoke runs")
    p.add_argument("--estimator_ckpt", type=str, default="",
                   help="torch ResNet50 gaze estimator checkpoint")
    p.add_argument("--identity_embed_ckpt", type=str, default="",
                   help="torch MobileFaceNet checkpoint")
    p.add_argument("--identity_detector_ckpt", type=str, default="",
                   help="torch RetinaFace checkpoint")
    p.add_argument("--identity_aligner_ckpt", type=str, default="",
                   help="torch PFLD checkpoint")
    # --vgg_ckpt comes from add_common_args (shared torchvision VGG16 weights)
    p.add_argument("--lpips_lin_ckpt", type=str, default="",
                   help="LPIPS linear-head weights")
    p.add_argument("--inception_ckpt", type=str, default="",
                   help="pytorch-fid InceptionV3 checkpoint (exact FID)")
    p.add_argument("--cam_dir", type=str, default="",
                   help="per-camera calibration dir (camNN.xml / CameraNN.mat)")
    p.add_argument("--eval_precision", type=str, default="highest",
                   choices=["default", "high", "highest"],
                   help="default matmul/conv precision for the metric nets: "
                        "TPU's bf16-3pass default quietly degrades the "
                        "'exact' LPIPS/FID/estimator backends (and broke "
                        "SSIM outright before its own fix, PERF_NOTES r5); "
                        "eval is fidelity-first, so HIGHEST is the default")
    args = p.parse_args(argv)
    if args.eval_precision != "default":
        import jax

        jax.config.update("jax_default_matmul_precision", args.eval_precision)
    cfg = config_from_args(args)
    logging.basicConfig(level=logging.INFO)
    from gazenerf_tpu.utils.logging import (
        log_subject_eval_results,
        maybe_wandb_init,
    )

    wandb = maybe_wandb_init(args.log, config=cfg.to_json())

    use_target = args.evaluation_type == "input_target_images"

    # dataset sweep list: (kind, dir) pairs — the reference loops every
    # dataset's val subjects (metrics_utils.py:137-220)
    if args.img_dirs:
        dirs = [d for d in args.img_dirs.split(",") if d]
        kinds = (
            [k for k in args.dataset_names.split(",") if k]
            if args.dataset_names
            else [cfg.data.dataset] * len(dirs)
        )
        datasets = list(zip(kinds, dirs))
    else:
        datasets = [(cfg.data.dataset, cfg.data.img_dir)]

    trainer = Trainer(cfg, train_len=1, steps_per_epoch=1)
    if args.resume:
        trainer.state, _, _ = load_checkpoint(args.resume, trainer.state)

    identity_pipeline = None
    identity_valid = True
    if args.identity_embed_ckpt or args.identity_detector_ckpt or args.identity_aligner_ckpt:
        identity_pipeline = build_identity_pipeline(
            args.identity_embed_ckpt, args.identity_detector_ckpt,
            args.identity_aligner_ckpt,
        )
        # without real embedder weights the similarity score is meaningless;
        # the protocol omits it and the result carries the validity flag
        identity_valid = bool(args.identity_embed_ckpt)
    from gazenerf_tpu.eval.protocols import make_eval_normalizer

    estimator_fn = build_estimator(args.estimator_ckpt)
    lpips_fn = build_lpips(args.vgg_ckpt, args.lpips_lin_ckpt)
    fid_feats_fn = build_fid_features(args.inception_ckpt)

    def make_ctx(dataset_kind: str, subject: str) -> EvalContext:
        cam_lookup = None
        if args.cam_dir:
            from gazenerf_tpu.data.cameras import (
                load_camera_calibrations,
                make_cam_lookup,
            )

            cams = load_camera_calibrations(dataset_kind, args.cam_dir)
            cam_lookup = make_cam_lookup(dataset_kind, cams, subject=subject)
        return EvalContext.build(
            cfg, trainer.model, trainer.state, trainer.frozen, trainer.expr_fix,
            fit_steps=args.fit_steps,
            estimator_fn=estimator_fn,
            identity_pipeline=identity_pipeline,
            lpips_fn=lpips_fn,
            fid_feats_fn=fid_feats_fn,
            normalizer=make_eval_normalizer(),
            cam_lookup=cam_lookup,
            identity_valid=identity_valid,
        )

    def subject_batches(kind: str, ddir: str, subject: str):
        ds = GazeH5Dataset(
            ddir, subjects=[subject], dataset=kind, shuffle=False,
            split=args.split, evaluate="target" if use_target else None,
        )
        loader = BatchLoader(ds, 1, num_workers=1, skip_invalid=False)
        batches = []
        if use_target:
            limit = args.max_pairs
        elif args.evaluation_type in ("consistency", "personal_calibration"):
            limit = args.num_eval_images
        else:
            limit = 2 * args.max_pairs
        for i, b in enumerate(loader):
            if i >= limit:
                break
            batches.append(b)
        return batches

    def list_subjects(kind: str, ddir: str):
        if args.subject:
            return [args.subject]
        ds = GazeH5Dataset(ddir, dataset=kind, shuffle=False, split=args.split)
        return ds.subjects

    per_dataset = {}
    for kind, ddir in datasets:
        subjects = list_subjects(kind, ddir)
        if args.evaluation_type == "input_target_images":
            from gazenerf_tpu.eval.protocols import (
                evaluate_input_target_sweep,
                split_target_batch,
            )

            subject_pairs = {}
            ctx = None
            for s in subjects:
                ctx = make_ctx(kind, s)
                subject_pairs[s] = [
                    split_target_batch(b) for b in subject_batches(kind, ddir, s)
                ]
            res = evaluate_input_target_sweep(ctx, subject_pairs)
            if wandb is not None:
                # eval-epoch scalar panels (reference utils/logging.py:
                # 134-196 log_one_subject / log_all_datasets results)
                for m in res["per_subject"].values():
                    log_subject_eval_results(wandb, m)
                log_subject_eval_results(
                    wandb, res["overall"], prefix=f"{kind} "
                )
        elif args.evaluation_type == "consistency":
            per_subject = {}
            for s in subjects:
                ctx = make_ctx(kind, s)
                batches = subject_batches(kind, ddir, s)
                if batches:
                    per_subject[s] = evaluate_consistency(ctx, batches)
            overall = {}
            if per_subject:
                keys = next(iter(per_subject.values())).keys()
                overall = {
                    k: float(np.mean([v[k] for v in per_subject.values()]))
                    for k in keys
                }
            res = {"per_subject": per_subject, "overall": overall}
        elif args.evaluation_type == "gaze_transfer":
            # reference pairs each val subject with the NEXT one: recover the
            # gaze on subject k, re-render it on subject k+1
            # (utils/metrics_utils.py:782-889); single-subject runs transfer
            # between two frames of the same subject
            per_pair = {}
            pairings = (
                list(zip(subjects[:-1], subjects[1:]))
                if len(subjects) > 1
                else [(subjects[0], subjects[0])]
            )
            for src_s, tgt_s in pairings[: args.max_pairs]:
                src_b = subject_batches(kind, ddir, src_s)
                tgt_b = (
                    src_b if tgt_s == src_s
                    else subject_batches(kind, ddir, tgt_s)
                )
                if not src_b or not tgt_b:
                    continue
                ctx = make_ctx(kind, src_s)
                tgt_batch = tgt_b[1] if tgt_s == src_s and len(tgt_b) > 1 else tgt_b[0]
                r = evaluate_gaze_transfer(ctx, src_b[0], tgt_batch)
                per_pair[f"{src_s}->{tgt_s}"] = {
                    k: v for k, v in r.items() if not isinstance(v, np.ndarray)
                }
            overall = {}
            if per_pair:
                overall = {
                    "opt_loss": float(
                        np.mean([v["opt_loss"] for v in per_pair.values()])
                    ),
                    "opt_steps": float(
                        np.mean([v["opt_steps"] for v in per_pair.values()])
                    ),
                }
            res = {"per_pair": per_pair, "overall": overall}
        else:  # personal_calibration
            from gazenerf_tpu.eval.protocols import (
                evaluate_personal_calibration_sweep,
            )

            cal_rng = np.random.default_rng(cfg.train.seed)
            per_subject = {}
            for s in subjects:
                ctx = make_ctx(kind, s)
                batches = subject_batches(kind, ddir, s)
                if not batches:
                    continue
                per_subject[s] = evaluate_personal_calibration_sweep(
                    ctx, batches,
                    num_fit_images=args.num_fit_images,
                    num_iterations=args.num_iterations,
                    rng=cal_rng,
                    out_dir=args.calib_out_dir or None,
                    subject=s,
                )
            res = {"per_subject": per_subject}
        if identity_pipeline is not None:
            res["identity_similarity_valid"] = identity_valid
        per_dataset[kind] = res

    if (
        wandb is not None
        and len(per_dataset) > 1
        and args.evaluation_type == "input_target_images"
    ):
        # the reference's " FULL " cross-dataset panel (utils/logging.py:
        # 150-196): pair-count-weighted means over every dataset's overall
        overalls = [r["overall"] for r in per_dataset.values() if r.get("overall")]
        keys = {
            k for o in overalls for k in o
            if isinstance(o[k], (int, float)) and k != "num_pairs"
        }
        n = [o.get("num_pairs", 1) for o in overalls]
        full = {
            k: float(
                np.average(
                    [o[k] for o in overalls if k in o],
                    weights=[w for o, w in zip(overalls, n) if k in o],
                )
            )
            for k in keys
        }
        log_subject_eval_results(wandb, full, prefix=" FULL ")

    result = per_dataset if len(per_dataset) > 1 else next(iter(per_dataset.values()))
    print(json.dumps(result, indent=2, default=float))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
