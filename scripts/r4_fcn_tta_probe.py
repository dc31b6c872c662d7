"""Probe: test-time augmentation (multi-scale + horizontal flip) for the FCN.

VERDICT r3 #2 measured the synthetic-to-real transfer gap on the one real
labeled frame (/root/reference/test-scene/frame-000000): best shipped
checkpoint (product-appearance prior) scores mIoU 0.418. This probe measures
whether inference-side augmentation - averaging softmax probabilities over
image scales and a horizontal flip, standard segmentation TTA - closes any
of the remaining gap WITHOUT new training data.

Guard against tuning to the single real frame: every combo is also scored on
held-out synthetic scenes (render_scene_transfer prior mode, seed disjoint
from training's rng(0)); a combo only "wins" if it does not regress there.

Run (TPU, ~8 compiles): python scripts/r4_fcn_tta_probe.py
"""
import sys, os
sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import argparse
import itertools
import json
import time

parser = argparse.ArgumentParser()
parser.add_argument("--platform", default="tpu", choices=["cpu", "tpu"])
parser.add_argument("--variants", nargs="*", default=["prior", "small"])
parser.add_argument("--synth-scenes", type=int, default=6)
parser.add_argument("--out", default="/tmp/r4_fcn_tta_probe.json")
args = parser.parse_args()

import jax

if args.platform == "cpu":
    jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")

import jax.numpy as jnp
import numpy as np
from PIL import Image

from physimglobalpose_tpu.models import fcn
from physimglobalpose_tpu.utils import synthdata

SCENE = "/root/reference/test-scene"
H, W = 480, 640
SCALES = (0.5, 0.75, 1.0, 1.25)


def canvas_for(scale):
    """Scaled canvas, padded to the stride-16 grid of the atrous net."""
    sh, sw = int(round(H * scale)), int(round(W * scale))
    return (sh, sw, (sh + 15) // 16 * 16, (sw + 15) // 16 * 16)


def make_scale_fn(model, scale):
    sh, sw, ch, cw = canvas_for(scale)

    @jax.jit
    def run(p, img_u8):
        img = img_u8.astype(jnp.float32) / 255.0
        img = jax.image.resize(img, (sh, sw, 3), "bilinear")
        img = jnp.pad(img, ((0, ch - sh), (0, cw - sw), (0, 0)))
        both = jnp.stack([img, img[:, ::-1]])          # [2, ch, cw, 3]
        logits = model.apply({"params": p}, both)
        probs = jax.nn.softmax(logits[:, :sh, :sw].astype(jnp.float32), -1)
        probs = probs.at[1].set(probs[1, :, ::-1])      # un-flip
        up = jax.image.resize(probs, (2, H, W, probs.shape[-1]), "bilinear")
        return up.astype(jnp.float16)                   # [2(noflip,flip), H, W, C]

    return run


def miou(label, gt, classes):
    vals = {}
    for c in classes:
        inter = float(((label == c) & (gt == c)).sum())
        union = float(((label == c) | (gt == c)).sum())
        vals[str(c)] = round(inter / union, 4) if union else 0.0
    return round(sum(vals.values()) / len(vals), 4), vals


def main():
    color = np.asarray(Image.open(os.path.join(SCENE, "frame-000000.color.png")))
    gt = np.asarray(Image.open(os.path.join(SCENE, "frame-000000.mask.png")))
    real_classes = sorted(int(c) for c in np.unique(gt) if c != 0)

    # Held-out synthetic frames, disjoint seed from training (rng(0) there).
    # Same generator configuration as train_fcn.py --appearance prior.
    from physimglobalpose_tpu.models import assets, objectdb
    OBJECTS = {  # train_fcn.py OBJECTS (obj_config.yml class ids)
        "kleenex_tissue_box": 8,
        "expo_dry_erase_board_eraser": 2,
        "folgers_classic_roast_coffee": 3,
    }
    db = objectdb.load_object_db(
        "/root/reference/src/physim_pose_estimation/src/data_layer/"
        "obj_config.yml",
        "/root/reference/src/physim_pose_estimation/models_visualization",
        cache_dir="/tmp/ppf_cache", only=list(OBJECTS))
    meshes = {n: assets.decimate_to_max_faces(db[n].mesh, 2000)
              for n in OBJECTS}
    intr2 = np.array([[614.0, 0.0, 320.0], [0.0, 614.0, 240.0],
                      [0.0, 0.0, 1.0]], np.float32)
    rng = np.random.default_rng(123)
    synth = []
    for _ in range(args.synth_scenes):
        c_img, l_img, _, _ = synthdata.render_scene_transfer(
            meshes, OBJECTS, rng, intr2, H, W, cam_dist_range=(0.38, 0.85),
            color_priors=synthdata.PRODUCT_COLOR_PRIORS)
        synth.append((c_img, l_img))

    results = {"scales": SCALES}
    for variant in args.variants:
        path = fcn.shipped_checkpoint_path(variant)
        params, meta = fcn.load_params_npz(path)
        model = fcn.build_model(meta["model"], meta["num_classes"])
        params_dev = jax.device_put(params)
        fns = {s: make_scale_fn(model, s) for s in SCALES}

        # Gather per-scale, per-flip prob stacks once per image; combos are
        # host-side averages of these.
        def probs_all(img):
            img_dev = jnp.asarray(np.ascontiguousarray(img[:H, :W]))
            return {s: np.asarray(fns[s](params_dev, img_dev), np.float32)
                    for s in SCALES}

        t0 = time.time()
        real_p = probs_all(color)
        synth_p = [probs_all(c) for c, _ in synth]
        print(f"[{variant}] inference for all scales x flip: "
              f"{time.time()-t0:.1f}s", flush=True)

        combos = []
        for k in range(1, len(SCALES) + 1):
            for scales in itertools.combinations(SCALES, k):
                if 1.0 not in scales:
                    continue
                for flip in (False, True):
                    combos.append((scales, flip))

        rows = []
        for scales, flip in combos:
            def fuse(pd):
                acc = np.zeros_like(pd[1.0][0])
                n = 0
                for s in scales:
                    acc += pd[s][0]
                    n += 1
                    if flip:
                        acc += pd[s][1]
                        n += 1
                return acc / n

            real_m, real_per = miou(np.argmax(fuse(real_p), -1), gt,
                                    real_classes)
            synth_ms = []
            for (c_img, l_img), pd in zip(synth, synth_p):
                cls = sorted(int(c) for c in np.unique(l_img) if c != 0)
                m, _ = miou(np.argmax(fuse(pd), -1), l_img, cls)
                synth_ms.append(m)
            rows.append({
                "scales": list(scales), "flip": flip,
                "real_miou": real_m, "real_per_class": real_per,
                "synth_miou": round(float(np.mean(synth_ms)), 4),
            })
            print(f"[{variant}] scales={scales} flip={flip}: "
                  f"real {real_m:.4f} synth {rows[-1]['synth_miou']:.4f}",
                  flush=True)
        results[variant] = rows

    with open(args.out, "w") as f:
        json.dump(results, f, indent=1)
    print("wrote", args.out)


if __name__ == "__main__":
    main()
