"""Per-class IoU of FCN checkpoints on the bundled REAL labeled frame.

The one real labeled image in this environment is
/root/reference/test-scene/frame-000000.{color,mask}.png (the reference's
own demo scene). This is the synthetic-to-real transfer gate: the shipped
palette-trained nets measured mIoU 0.137 (small) / 0.024 (full) here
(WHOLE_SCENE_BENCH.json fcn_real_frame_miou); the transfer-randomized
training run (scripts/train_fcn.py --appearance transfer) is evaluated by
the same script. The GT mask is used ONLY for scoring, never for training.

Run: python scripts/eval_fcn_real_frame.py [--platform cpu]
         [--ckpt path.npz ...]   (default: every shipped checkpoint)
"""
import sys, os
sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import argparse
import json

parser = argparse.ArgumentParser()
parser.add_argument("--platform", default="cpu", choices=["cpu", "tpu"])
parser.add_argument("--ckpt", nargs="*", default=None,
                    help="checkpoint .npz paths (default: shipped)")
parser.add_argument("--json", action="store_true", help="print one JSON line")
parser.add_argument("--tta", action="store_true",
                    help="multi-scale (0.5/0.75/1.0) prob averaging - the "
                         "production fcn_tta path (fcn.make_predictor); "
                         "probe grid in scripts/r4_fcn_tta_probe.py")
args = parser.parse_args()

import jax

if args.platform == "cpu":
    jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")

import numpy as np
from PIL import Image

from physimglobalpose_tpu.models import fcn

SCENE = "/root/reference/test-scene"


def main():
    ckpts = args.ckpt
    if not ckpts:
        ckpts = [
            fcn.shipped_checkpoint_path(v)
            for v in ("small", "full", "transfer", "prior")
            if os.path.exists(fcn.shipped_checkpoint_path(v))
        ]
    color = np.asarray(Image.open(os.path.join(SCENE, "frame-000000.color.png")))
    gt = np.asarray(Image.open(os.path.join(SCENE, "frame-000000.mask.png")))
    classes = sorted(int(c) for c in np.unique(gt) if c != 0)
    hh, ww = color.shape[:2]
    scales = (0.5, 0.75, 1.0) if args.tta else (1.0,)

    out = {"classes": classes, "tta_scales": list(scales)}
    for path in ckpts:
        params, meta = fcn.load_params_npz(path)
        model = fcn.build_model(meta["model"], meta["num_classes"])
        labeler = fcn.make_labeler(model, hh, ww, tta_scales=scales)
        label = labeler(jax.device_put(params), color)
        ious = {}
        for c in classes:
            inter = float(((label == c) & (gt == c)).sum())
            union = float(((label == c) | (gt == c)).sum())
            ious[str(c)] = round(inter / union, 4) if union else 0.0
        row = {
            "model": meta["model"],
            "train": meta.get("train", "?"),
            "per_class_iou": ious,
            "miou": round(sum(ious.values()) / len(ious), 4),
        }
        out[os.path.basename(path)] = row
        if not args.json:
            print(f"{os.path.basename(path):44s} mIoU {row['miou']:.4f}  "
                  + " ".join(f"c{c}={ious[str(c)]:.3f}" for c in classes))
    if args.json:
        print(json.dumps(out))


if __name__ == "__main__":
    main()
