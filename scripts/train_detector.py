"""Train the CenterNet-style detector and ship the checkpoint (VERDICT r4 #4).

The reference's RCNN segmentation strategies call a Caffe Faster-RCNN
service trained on real APC imagery (rcnn_detection_package/bin/detect_bbox,
recognition.py:27-61); this environment has no real dataset (and no Caffe),
so the shipped detector is trained on the framework's own synthetic renders
(utils/synthdata.py) with box targets derived from the GT instance masks -
the same training story as the FCN zoo checkpoints (scripts/train_fcn.py).

Usage (CPU, ~10-20 min):
  python scripts/train_detector.py --steps 800 \
      --out physimglobalpose_tpu/models/weights/detector_synth_apc.npz
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

OBJECTS = {  # the bundled test-scene objects (obj_config.yml class ids)
    "kleenex_tissue_box": 8,
    "expo_dry_erase_board_eraser": 2,
    "folgers_classic_roast_coffee": 3,
}


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--steps", type=int, default=800)
    p.add_argument("--batch", type=int, default=8)
    p.add_argument("--scenes", type=int, default=64)
    p.add_argument("--lr", type=float, default=1e-3)
    p.add_argument("--width", type=int, default=32)
    p.add_argument("--height", type=int, default=240)
    p.add_argument("--img-width", type=int, default=320)
    p.add_argument("--domain-random-frac", type=float, default=0.5,
                   help="fraction of training scenes rendered with domain "
                        "randomization (harder appearance)")
    p.add_argument("--platform", default="cpu", choices=["cpu", "tpu"])
    p.add_argument(
        "--out",
        default=os.path.join(
            os.path.dirname(__file__), "..", "physimglobalpose_tpu",
            "models", "weights", "detector_synth_apc.npz",
        ),
    )
    p.add_argument(
        "--model-dir",
        default="/root/reference/src/physim_pose_estimation/models_visualization",
    )
    p.add_argument(
        "--obj-config",
        default="/root/reference/src/physim_pose_estimation/src/data_layer/obj_config.yml",
    )
    args = p.parse_args(argv)

    import jax

    if args.platform == "cpu":
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp
    import numpy as np
    import optax

    from physimglobalpose_tpu.models import assets, detect, objectdb
    from physimglobalpose_tpu.utils import synthdata

    db = objectdb.load_object_db(
        args.obj_config, args.model_dir, cache_dir="/tmp/ppf_cache",
        only=list(OBJECTS),
    )
    meshes = {
        n: assets.decimate_to_max_faces(db[n].mesh, 2000) for n in OBJECTS
    }
    hh, ww = args.height, args.img_width
    intr = np.array(
        [[307.0 * ww / 320.0, 0.0, ww / 2.0],
         [0.0, 307.0 * ww / 320.0, hh / 2.0],
         [0.0, 0.0, 1.0]], np.float32,
    )
    rng = np.random.default_rng(0)

    print(f"rendering {args.scenes} training scenes...", flush=True)
    colors, heats, sizes, poss = [], [], [], []
    for i in range(args.scenes):
        dr = rng.uniform() < args.domain_random_frac
        c, l, _, _ = synthdata.render_scene(
            meshes, OBJECTS, rng, intr, hh, ww, domain_random=dr
        )
        heat, size, pos = detect.make_targets(l, detect.NUM_CLASSES)
        colors.append(c)
        heats.append(heat)
        sizes.append(size)
        poss.append(pos)
    val = []
    for _ in range(6):
        c, l, _, _ = synthdata.render_scene(meshes, OBJECTS, rng, intr, hh, ww)
        val.append((c, l))

    model = detect.CenterNetDetector(
        num_classes=detect.NUM_CLASSES, width=args.width
    )
    params = model.init(
        jax.random.key(0), jnp.zeros((1, hh, ww, 3))
    )["params"]
    n_params = sum(x.size for x in jax.tree.leaves(params))
    print(f"CenterNetDetector(width={args.width}): {n_params/1e6:.2f} M params")
    tx = optax.adam(args.lr)
    opt_state = tx.init(params)
    train_step = jax.jit(detect.make_train_step(model, tx))

    colors_a = np.stack(colors).astype(np.float32) / 255.0
    heats_a = np.stack(heats)
    sizes_a = np.stack(sizes)
    poss_a = np.stack(poss)

    t0 = time.time()
    for step in range(args.steps):
        idx = rng.integers(0, args.scenes, args.batch)
        params, opt_state, loss = train_step(
            params, opt_state,
            jnp.asarray(colors_a[idx]), jnp.asarray(heats_a[idx]),
            jnp.asarray(sizes_a[idx]), jnp.asarray(poss_a[idx]),
        )
        if step % 50 == 0 or step == args.steps - 1:
            print(f"step {step:4d} loss {float(loss):.4f} "
                  f"({time.time()-t0:.0f}s)", flush=True)

    # Validation: top-1 box IoU per present class on held-out scenes
    # (weights as traced argument - same remote-compile fix as the FCN).
    @jax.jit
    def infer(p, img):
        heat, size = model.apply({"params": p}, img[None])
        return detect.decode_boxes(heat[0], size[0], top=9)

    ious, hits = [], 0
    total = 0
    for c_img, l_img in val:
        boxes, scores = infer(
            params, jnp.asarray(c_img.astype(np.float32) / 255.0)
        )
        boxes, scores = np.asarray(boxes), np.asarray(scores)
        for cid in sorted(set(np.unique(l_img)) - {0}):
            ys, xs = np.nonzero(l_img == cid)
            gt = (xs.min(), ys.min(), xs.max(), ys.max())
            bx = boxes[cid - 1, 0]  # top-1 box of that class
            ix1, iy1 = max(gt[0], bx[0]), max(gt[1], bx[1])
            ix2, iy2 = min(gt[2], bx[2]), min(gt[3], bx[3])
            inter = max(ix2 - ix1, 0) * max(iy2 - iy1, 0)
            a_gt = (gt[2] - gt[0]) * (gt[3] - gt[1])
            a_bx = max(bx[2] - bx[0], 0) * max(bx[3] - bx[1], 0)
            iou = inter / max(a_gt + a_bx - inter, 1e-6)
            ious.append(iou)
            hits += iou >= 0.5
            total += 1
    miou = float(np.mean(ious)) if ious else 0.0
    print(f"held-out top-1 box IoU: {miou:.3f}; "
          f"recall@0.5: {hits}/{total}")

    os.makedirs(os.path.dirname(os.path.abspath(args.out)), exist_ok=True)
    detect.save_params_npz(
        args.out, params,
        meta={
            "model": "CenterNetDetector",
            "num_classes": detect.NUM_CLASSES,
            "width": args.width,
            "input_size": [hh, ww],
            "train": "synthetic (utils/synthdata.py), box targets from GT "
                     "masks (scripts/train_detector.py)",
            "steps": args.steps,
            "holdout_box_iou": miou,
        },
    )
    print(f"saved {args.out} ({os.path.getsize(args.out)/1e6:.1f} MB)")
    if miou < 0.5:
        print("WARNING: box IoU below 0.5 - checkpoint may not drive RCNN mode")
        return 1
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
