"""Fine-tune the JAX YOLOv8 detector (e.g. on fog-augmented data).

The reference system is inference-only; this closes the loop: train /
fine-tune on a YOLO-format dataset (images/ + labels/ *.txt) or on the
built-in synthetic road scenes, with checkpointing and optional multi-chip
data parallelism over a device mesh.

Usage:
  python tools/train.py --data synthetic --steps 50 --imgsz 320 \
      --batch 8 --out runs/ft.npz
  python tools/train.py --data yolo_dir|coco.json --weights yolov8n.pt \
      --steps 500 --lr 5e-4 --dp 4
"""
from __future__ import annotations

import argparse
import math
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import numpy as np  # noqa: E402

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from roadvision_tpu.utils.cache import enable_compilation_cache  # noqa: E402

enable_compilation_cache()

from roadvision_tpu.detect.dataset import load_dataset, synthetic_batches  # noqa: E402
from roadvision_tpu.models.yolo import weights as yolo_weights  # noqa: E402
from roadvision_tpu.models.yolo.train import (init_momentum,  # noqa: E402
                                              make_ema_update,
                                              make_train_step)
from roadvision_tpu.runtime.checkpoint import save_train_state  # noqa: E402
from roadvision_tpu.utils import get_logger  # noqa: E402

log = get_logger("roadvision.train")


def main(argv=None) -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--data", default="synthetic",
                    help="'synthetic' or a YOLO-format directory")
    ap.add_argument("--weights", default="yolov8n.pt",
                    help=".pt/.npz to start from (random init if missing)")
    ap.add_argument("--size", default=None, help="model size n/s/m/l/x")
    ap.add_argument("--nc", type=int, default=80)
    ap.add_argument("--imgsz", type=int, default=320)
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--steps", type=int, default=100)
    ap.add_argument("--lr", type=float, default=1e-3)
    ap.add_argument("--schedule", choices=["cosine", "constant"],
                    default="cosine",
                    help="LR schedule after warmup (cosine decays to "
                         "lrf x base, the ultralytics convention)")
    ap.add_argument("--warmup", type=int, default=None,
                    help="linear warmup steps (default: steps/10, max 100)")
    ap.add_argument("--lrf", type=float, default=0.01,
                    help="final LR fraction for the cosine schedule")
    ap.add_argument("--ema", action=argparse.BooleanOptionalAction,
                    default=True,
                    help="track EMA weights and export them as the "
                         "deploy weights (raw weights also saved)")
    ap.add_argument("--augment", action=argparse.BooleanOptionalAction,
                    default=True,
                    help="train-time flip + HSV jitter (YOLO-dir data; "
                         "the synthetic generator already varies)")
    ap.add_argument("--fog", type=float, default=0.0, metavar="P",
                    help="train-time fog augmentation: probability per "
                         "image of running the atmospheric-scattering "
                         "synthesizer (augment/fog.py; photometric only "
                         "so it works for every task; 0 disables)")
    ap.add_argument("--fog-level", default="random",
                    choices=["random", "light", "medium", "heavy"])
    ap.add_argument("--mosaic", type=float, default=1.0,
                    help="probability of 4-image mosaic composition per "
                         "batch (YOLO-dir data; 0 disables)")
    ap.add_argument("--eval-every", type=int, default=0,
                    help="score mAP@0.5 on held-out data every N steps "
                         "(0 = off); uses EMA weights when enabled")
    ap.add_argument("--eval-size", type=int, default=16,
                    help="held-out images: reserved from the dataset "
                         "tail (dir data) or fresh synthetic scenes")
    ap.add_argument("--out", default="runs/trained.npz")
    ap.add_argument("--save-every", type=int, default=0,
                    help="checkpoint training state (and EMA deploy "
                         "weights) to --out every N steps so long runs "
                         "survive interruption (0 = final save only)")
    ap.add_argument("--resume", default=None,
                    help="training-state checkpoint (.npz or orbax dir) "
                         "to continue from; restored onto the mesh "
                         "shardings when --dp > 1")
    ap.add_argument("--dp", type=int, default=1,
                    help="data-parallel devices (mesh batch sharding)")
    ap.add_argument("--log-every", type=int, default=10)
    args = ap.parse_args(argv)

    size_hint = args.size or "n"
    name = str(args.weights).lower()
    rtdetr_task = "rtdetr" in name
    arch_hint = "v5" if "yolov5" in name \
        else "11" if "yolo11" in name else "v8"
    task = "segment" if "-seg" in name \
        else "pose" if "-pose" in name \
        else "obb" if "-obb" in name else "detect"
    if rtdetr_task:
        # set-prediction family: plain detect gt (boxes/cls/mask), its
        # own objective (models/rtdetr_train.py), no size/head variants
        from roadvision_tpu.models.rtdetr import load_params_rtdetr
        params, args.nc, loaded = load_params_rtdetr(args.weights,
                                                     nc=args.nc)
        arch, size, task = "rtdetr", "l", "detect"
        log.info("model rtdetr-l (%s weights, nc=%d)",
                 "pretrained" if loaded else "random", args.nc)
    else:
        params, arch, size, loaded = yolo_weights.load_params(
            args.weights, size=size_hint, nc=args.nc, arch=arch_hint,
            task=task)
        head = "23" if arch == "11" else "22"
        if arch != "v5" and "cv4" in params.get(head, {}):
            # checkpoint head wins over the name hint (cv4 final width:
            # 1 = angle branch, else keypoints — weights.detect_task)
            if "proto" in params[head]:
                task = "segment"
            elif params[head]["cv4"][0][2]["b"].shape[0] == 1:
                task = "obb"
            else:
                task = "pose"
        if arch != "v5":
            # the actual head width wins over --nc (pose random init is
            # 1, obb is 15)
            args.nc = int(params[head]["cv3"][0][2]["b"].shape[0])
        log.info("model yolo%s%s%s (%s weights, nc=%d)", arch, size,
                 {"segment": "-seg", "pose": "-pose", "obb": "-obb"}
                 .get(task, ""),
                 "pretrained" if loaded else "random", args.nc)
    seg_task = task == "segment"
    pose_task = task == "pose"
    obb_task = task == "obb"

    if rtdetr_task:
        from roadvision_tpu.models.rtdetr_train import (init_opt_rtdetr,
                                                        make_train_step_rtdetr)
        momentum = init_opt_rtdetr(params)  # AdamW moments + step count
        step = make_train_step_rtdetr(args.nc, lr=args.lr)
    elif arch == "v5":
        momentum = init_momentum(params)
        from roadvision_tpu.models.yolo.train_v5 import make_train_step_v5
        step = make_train_step_v5(size, args.nc, lr=args.lr)
    elif seg_task:
        momentum = init_momentum(params)
        from roadvision_tpu.models.yolo.train_seg import make_train_step_seg
        step = make_train_step_seg(size, args.nc, lr=args.lr, arch=arch)
    elif pose_task:
        momentum = init_momentum(params)
        from roadvision_tpu.models.yolo.train_pose import make_train_step_pose
        step = make_train_step_pose(size, args.nc, lr=args.lr, arch=arch)
    elif obb_task:
        momentum = init_momentum(params)
        from roadvision_tpu.models.yolo.train_obb import make_train_step_obb
        step = make_train_step_obb(size, args.nc, lr=args.lr, arch=arch)
    else:
        momentum = init_momentum(params)
        step = make_train_step(size, args.nc, lr=args.lr, arch=arch)

    if args.dp > 1:
        from roadvision_tpu.parallel import (batch_sharding, make_mesh,
                                             param_shardings, shard_pytree)
        mesh = make_mesh(args.dp, model_parallel=1)
        pshard = param_shardings(params, mesh)
        params = shard_pytree(params, pshard)
        # param_shardings is a per-leaf rule, so it applies to the
        # rtdetr AdamW state dict ({m, v, t}) as well as a plain
        # momentum tree (t is 0-d → replicated)
        mshard = param_shardings(momentum, mesh)
        momentum = shard_pytree(momentum, mshard)
        bshard = batch_sharding(mesh, 4)
    else:
        bshard = None

    start_step = 0
    if args.resume:
        from roadvision_tpu.runtime.checkpoint import load_train_state
        params, momentum, start_step = load_train_state(
            args.resume, shardings=pshard if args.dp > 1 else None,
            mom_shardings=mshard if args.dp > 1 else None)
        if rtdetr_task and not (isinstance(momentum, dict)
                                and "t" in momentum):
            # pre-r5 rtdetr checkpoints stored SGD momentum (a
            # params-shaped pytree); the AdamW step needs {m, v, t}.
            # Loud + recoverable beats a KeyError deep in a jit trace.
            log.warning("resume checkpoint %s carries the old SGD "
                        "momentum tree; re-initializing AdamW moments "
                        "(params and step count are kept)", args.resume)
            momentum = init_opt_rtdetr(params)
            if args.dp > 1:
                momentum = shard_pytree(momentum,
                                        param_shardings(momentum, mesh))
        log.info("resumed from %s at step %d", args.resume, start_step)

    eval_set = None
    if args.data == "synthetic":
        if seg_task:
            from roadvision_tpu.detect.dataset import synthetic_seg_batches
            batches = synthetic_seg_batches(args.batch, imgsz=args.imgsz)
        elif pose_task:
            from roadvision_tpu.detect.dataset import synthetic_pose_batches
            batches = synthetic_pose_batches(args.batch, imgsz=args.imgsz)
        elif obb_task:
            from roadvision_tpu.detect.dataset import synthetic_obb_batches
            batches = synthetic_obb_batches(args.batch, imgsz=args.imgsz)
        else:
            batches = synthetic_batches(args.batch, imgsz=args.imgsz)
        def next_batch():
            return next(batches)
        if args.eval_every:
            if pose_task:   # OKS keypoint mAP on the pose scenes
                held = synthetic_pose_batches(args.eval_size,
                                              imgsz=args.imgsz, seed=999)
                eval_set = next(held)
            elif obb_task:  # rotated-box mAP on the obb scenes
                from roadvision_tpu.detect.dataset import \
                    synthetic_obb_batches as _obb_held
                eval_set = next(_obb_held(args.eval_size,
                                          imgsz=args.imgsz, seed=999))
            else:
                held = synthetic_batches(args.eval_size, imgsz=args.imgsz,
                                         seed=999)
                eval_set = next(held)
    else:
        # real data: COCO JSON for seg (polygon masks) / pose
        # (keypoints), YOLO-OBB dir for obb, YOLO dir or COCO JSON for
        # detect. Geometry augmentation (flip/mosaic) transforms boxes
        # only, so it stays detect-task-only.
        if seg_task or pose_task:
            if not str(args.data).endswith(".json"):
                ap.error(f"{task} training takes a COCO annotation "
                         "JSON (--data annotations.json)")
            if seg_task:
                from roadvision_tpu.detect.dataset import load_coco_seg_json
                data = load_coco_seg_json(args.data, imgsz=args.imgsz)
            else:
                from roadvision_tpu.detect.dataset import load_coco_kpts_json
                data = load_coco_kpts_json(args.data, imgsz=args.imgsz)
        elif obb_task:
            from roadvision_tpu.detect.dataset import load_yolo_obb_dir
            data = load_yolo_obb_dir(args.data, imgsz=args.imgsz)
        else:
            data = load_dataset(args.data, imgsz=args.imgsz)
        imgs, *gt_arrays = data
        if args.eval_every and imgs.shape[0] > 2:
            k = min(args.eval_size, imgs.shape[0] // 3)
            if seg_task:   # in-train eval scores box mAP (as synthetic)
                eval_set = (imgs[-k:],) + tuple(g[-k:]
                                                for g in gt_arrays[:3])
            else:
                eval_set = (imgs[-k:],) + tuple(g[-k:] for g in gt_arrays)
            imgs = imgs[:-k]
            gt_arrays = [g[:-k] for g in gt_arrays]
            log.info("held out %d images for eval", k)
        n = imgs.shape[0]
        plain = not (seg_task or pose_task or obb_task)
        log.info("dataset: %d images%s%s", n,
                 " (flip+HSV augment)" if args.augment and plain else "",
                 f" (mosaic p={args.mosaic})"
                 if args.mosaic > 0 and plain else "")
        rng = np.random.RandomState(0)

        def next_batch():
            idx = rng.randint(0, n, args.batch)
            bi = imgs[idx]
            gts = [g[idx] for g in gt_arrays]
            if plain:
                from roadvision_tpu.detect.dataset import (augment_batch,
                                                           mosaic_batch)
                bb, bc, bm = gts
                if args.mosaic > 0 and rng.rand() < args.mosaic:
                    bi, bb, bc, bm = mosaic_batch(bi, bb, bc, bm, rng)
                if args.augment:
                    bi, bb = augment_batch(bi, bb, bm, rng)
                return bi, bb, bc, bm
            return (bi, *gts)

    warmup = args.warmup if args.warmup is not None \
        else min(100, max(1, args.steps // 10))

    def lr_scale_at(it: int) -> float:
        if it <= warmup:
            return it / warmup
        if args.schedule == "cosine":
            # clamp: a resumed run past the nominal horizon holds lrf
            t = min((it - warmup) / max(args.steps - warmup, 1), 1.0)
            return args.lrf + (1.0 - args.lrf) * 0.5 * (
                1.0 + math.cos(math.pi * t))
        return 1.0

    # real copies: the train step DONATES params, so aliasing here would
    # leave the EMA tree pointing at deleted buffers after step 1
    ema = jax.tree_util.tree_map(jnp.array, params) if args.ema else None
    ema_update = make_ema_update() if args.ema else None

    eval_det = None

    def run_eval(weights_tree, step_no: int) -> None:
        nonlocal eval_det
        from roadvision_tpu.detect.eval import evaluate_detector
        if eval_det is None:
            # random-init detector of the SAME arch/size, then rebind to
            # the live weights (compiled steps take params as an arg)
            if rtdetr_task:
                from roadvision_tpu.detect.rtdetr_jax import RTDETRJax
                eval_det = RTDETRJax({"model": "rtdetr-l.eval",
                                      "imgsz": args.imgsz,
                                      "conf_thres": 0.25, "max_det": 50,
                                      "classes_keep": []})
            else:
                from roadvision_tpu.detect.yolo_jax import YOLOJax
                suffix = {"segment": "-seg", "pose": "-pose",
                          "obb": "-obb"}.get(task, "")
                eval_det = YOLOJax(
                    {"model": f"yolo{arch}{size}{suffix}.eval",
                     "imgsz": args.imgsz, "conf_thres": 0.25,
                     "max_det": 50, "classes_keep": [], "rect": False})
        eval_det.set_params(weights_tree)
        if pose_task:
            from roadvision_tpu.detect.eval import evaluate_pose
            imgs_e, boxes_e, _cls_e, mask_e, kpts_e = eval_set
            score = evaluate_pose(eval_det, imgs_e, boxes_e, kpts_e,
                                  mask_e)
        elif obb_task:
            from roadvision_tpu.detect.eval import evaluate_obb
            score = evaluate_obb(eval_det, *eval_set)
        else:
            score = evaluate_detector(eval_det, *eval_set)
        log.info("eval @%d: %s", step_no,
                 " ".join(f"{k}={v:.3f}" for k, v in score.items()))

    fog_rng = np.random.RandomState(77)
    if args.fog > 0:
        from roadvision_tpu.detect.dataset import fog_augment_batch
        log.info("fog augmentation: p=%.2f level=%s", args.fog,
                 args.fog_level)

    out = Path(args.out)
    out.parent.mkdir(parents=True, exist_ok=True)

    t0 = time.time()
    nan_logs = 0
    for it in range(1, args.steps + 1):
        images, *gts = next_batch()   # (+ gt instance masks for seg)
        if args.fog > 0:
            images = fog_augment_batch(np.asarray(images), fog_rng,
                                       p=args.fog, level=args.fog_level)
        x = jnp.asarray(images, jnp.float32) / 255.0
        if bshard is not None:
            x = jax.device_put(x, bshard)
        params, momentum, loss, aux = step(
            params, momentum, x, *(jnp.asarray(g) for g in gts),
            jnp.float32(lr_scale_at(start_step + it)))
        if ema is not None:
            ema = ema_update(ema, params, jnp.int32(start_step + it))
        if args.eval_every and eval_set is not None \
                and (it % args.eval_every == 0 or it == args.steps):
            run_eval(ema if ema is not None else params, start_step + it)
        if it % args.log_every == 0 or it == args.steps:
            parts = " ".join(
                f"{k}={float(v):.3f}" for k, v in sorted(aux.items())
                if k not in ("num_fg", "grad_norm"))
            log.info("step %d/%d loss=%.4f %s fg=%d (%.1fs)",
                     it, args.steps, float(loss), parts,
                     int(aux["num_fg"]), time.time() - t0)
            # divergence circuit breaker (checked only at log points —
            # no extra device syncs): the step's non-finite guard skips
            # bad BATCHES, but a finite-yet-divergent trajectory can
            # overflow params to ±inf, after which every loss is NaN
            # forever; burning the rest of a 50k-step budget (and
            # writing poisoned --save-every checkpoints) helps nobody.
            if np.isfinite(float(loss)):
                nan_logs = 0
            else:
                nan_logs += 1
                if nan_logs >= 2:
                    log.error(
                        "loss non-finite at %d consecutive log points — "
                        "params have diverged (overflowed to inf/NaN); "
                        "aborting without checkpointing. Lower --lr "
                        "and/or raise --warmup and restart%s.",
                        nan_logs,
                        " (resume from the last finite checkpoint)"
                        if args.save_every else "")
                    return 1
        if args.save_every and it % args.save_every == 0 \
                and it != args.steps and nan_logs == 0 \
                and np.isfinite(float(loss)):
            # the loss-finite check costs one sync at save points only
            # and narrows the poisoned-save window to a single step
            # (loss is computed on PRE-update params, so divergence AT
            # this exact step could still slip through; the next log
            # point's breaker stops the run before the next save)
            save_train_state(str(out), params, momentum, start_step + it)
            yolo_weights.export_npz(ema if ema is not None else params,
                                    out.with_suffix(".weights.npz"))
            log.info("checkpointed step %d to %s", start_step + it, out)

    if args.steps > 0 and not np.isfinite(float(loss)):
        # same protection for the final save: never clobber a good
        # --save-every checkpoint at the same path with diverged params
        log.error("final loss is non-finite — params diverged; NOT "
                  "overwriting %s (resume from the last finite "
                  "checkpoint with a lower --lr)", out)
        return 1
    path = save_train_state(str(out), params, momentum,
                            start_step + args.steps)
    deploy = ema if ema is not None else params
    yolo_weights.export_npz(deploy, out.with_suffix(".weights.npz"))
    if ema is not None:
        yolo_weights.export_npz(params, out.with_suffix(".raw.npz"))
    log.info("saved training state to %s and %sweights to %s",
             path, "EMA " if ema is not None else "",
             out.with_suffix(".weights.npz"))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
