"""Train the small FCN on synthetic color scenes and ship the checkpoint.

Closes the NN-segmentation loop (VERDICT r1 item 4): the reference serves
apc_weights.hdf5 trained on real APC imagery (predict:59-155); this
environment has no real dataset, so the shipped checkpoint is trained on the
framework's own synthetic renders (utils/synthdata.py) - enough for
`--segmentation FCN` to work end-to-end with no injected predictor on scenes
from that distribution, and the training pipeline is demonstrated to
converge. A real-data checkpoint drops in via the same .npz format.

Usage (CPU, ~10-20 min):
  python scripts/train_fcn.py --steps 400 \
      --out physimglobalpose_tpu/models/weights/fcn_synth_apc.npz
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
NUM_CLASSES = 12  # APC: background + 11 objects (predict:168)


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--steps", type=int, default=600)
    p.add_argument("--batch", type=int, default=8)
    p.add_argument("--size", type=int, default=160)
    p.add_argument("--scenes", type=int, default=48)
    p.add_argument("--lr", type=float, default=1e-3)
    # stride-16 atrous variant: objects span 2-8 feature cells at the
    # serving scales; the 32s masks were too blobby (IoU ~0.3).
    p.add_argument("--model", default="AtrousFCN_Vgg16_16s_small")
    p.add_argument("--domain-random", action="store_true",
                   help="harder randomized scenes (full-width training)")
    p.add_argument("--appearance", default="palette",
                   choices=["palette", "transfer", "prior"],
                   help="palette: class-keyed colors (render_scene); "
                        "transfer: class-AGNOSTIC instance colors + pattern "
                        "overlays + oblique camera (render_scene_transfer) - "
                        "forces shape/size keying for synthetic-to-real "
                        "transfer (measured negative, ROUND4_NOTES 7b); "
                        "prior: transfer randomization but with per-product "
                        "dominant-color priors (synthdata.PRODUCT_COLOR_PRIORS "
                        "- public product appearance knowledge, no test-frame "
                        "pixels)")
    p.add_argument("--save-f16", action="store_true",
                   help="save weights as float16 (halves large checkpoints)")
    p.add_argument("--platform", default="cpu", choices=["cpu", "tpu"])
    p.add_argument(
        "--out",
        default=os.path.join(
            os.path.dirname(__file__), "..",
            "physimglobalpose_tpu", "models", "weights", "fcn_synth_apc.npz",
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

    from physimglobalpose_tpu.models import assets, fcn, objectdb
    from physimglobalpose_tpu.utils import synthdata

    db = objectdb.load_object_db(
        args.obj_config, args.model_dir, cache_dir="/tmp/ppf_cache",
        only=list(OBJECTS),
    )
    meshes = {
        n: assets.decimate_to_max_faces(db[n].mesh, 2000) for n in OBJECTS
    }
    # Two rendering scales so the FCN serves both its native training scale
    # and the 640x480 pipeline scale (object apparent size varies 2x).
    intr1 = np.array(
        [[307.0, 0.0, 160.0], [0.0, 307.0, 120.0], [0.0, 0.0, 1.0]], np.float32
    )
    intr2 = intr1 * np.array([[2.0], [2.0], [1.0]], np.float32)
    rng = np.random.default_rng(0)

    def render(intr, hh, ww):
        if args.appearance in ("transfer", "prior"):
            # prior mode: closer camera than the transfer default - the real
            # rig's objects subtend 150-250 px at 640x480 (frame-000000);
            # at cam_dist up to 1.2 m the renders train a 2-4x smaller
            # apparent scale and the net misses the serving scale entirely
            # (first prior run: held-out 0.535, real-frame 0.035).
            dist = (0.38, 0.85) if args.appearance == "prior" else (0.55, 1.2)
            return synthdata.render_scene_transfer(
                meshes, OBJECTS, rng, intr, hh, ww,
                cam_dist_range=dist,
                color_priors=(synthdata.PRODUCT_COLOR_PRIORS
                              if args.appearance == "prior" else None))
        return synthdata.render_scene(
            meshes, OBJECTS, rng, intr, hh, ww,
            domain_random=args.domain_random)

    print(f"rendering {args.scenes} training scenes (2 scales, "
          f"{args.appearance})...", flush=True)
    colors, labels = [], []
    for i in range(args.scenes):
        if i % 3 == 2:
            c, l, _, _ = render(intr2, 480, 640)
        else:
            c, l, _, _ = render(intr1, 240, 320)
        colors.append(c)
        labels.append(l)
    # Held-out scenes for the convergence check (both scales).
    val = [render(intr1, 240, 320)[:2] for _ in range(4)] + [
        render(intr2, 480, 640)[:2] for _ in range(2)
    ]

    model = fcn.build_model(args.model, num_classes=NUM_CLASSES)
    params = model.init(jax.random.key(0), jnp.zeros((1, args.size, args.size, 3)))[
        "params"
    ]
    n_params = sum(x.size for x in jax.tree.leaves(params))
    print(f"{args.model}: {n_params/1e6:.2f} M params")
    tx = optax.adam(args.lr)
    opt_state = tx.init(params)
    train_step = jax.jit(fcn.make_train_step(model, tx))

    t0 = time.time()
    for step in range(args.steps):
        imgs, labs = synthdata.crop_batch(colors, labels, rng, args.batch, args.size)
        params, opt_state, loss = train_step(
            params, opt_state, jnp.asarray(imgs), jnp.asarray(labs)
        )
        if step % 25 == 0 or step == args.steps - 1:
            print(f"step {step:4d} loss {float(loss):.4f} "
                  f"({time.time()-t0:.0f}s)", flush=True)

    # Convergence check: per-class IoU on held-out full scenes. params is a
    # traced ARGUMENT (closing over it would embed 0.5 GB of weights as
    # compile-time constants - the axon remote-compile endpoint rejects the
    # request with HTTP 413 for the full-width net).
    @jax.jit
    def infer(p, img):
        return jnp.argmax(model.apply({"params": p}, img[None])[0], axis=-1)

    ious = []
    for c_img, l_img in val:
        pred = np.asarray(infer(params, jnp.asarray(c_img.astype(np.float32) / 255.0)))
        for cid in set(np.unique(l_img)) - {0}:
            inter = ((pred == cid) & (l_img == cid)).sum()
            union = ((pred == cid) | (l_img == cid)).sum()
            if union:
                ious.append(inter / union)
    miou = float(np.mean(ious)) if ious else 0.0
    print(f"held-out object mIoU: {miou:.3f} over {len(ious)} instances")

    os.makedirs(os.path.dirname(os.path.abspath(args.out)), exist_ok=True)
    import numpy as _np
    fcn.save_params_npz(
        args.out, params, dtype=_np.float16 if args.save_f16 else None,
        meta={
            "model": args.model,
            "num_classes": NUM_CLASSES,
            "train": "synthetic (utils/synthdata.py)"
                     + (" domain-randomized" if args.domain_random else "")
                     + (" transfer-randomized (class-agnostic appearance)"
                        if args.appearance == "transfer" else "")
                     + (" prior-randomized (product color priors)"
                        if args.appearance == "prior" else ""),
            "steps": args.steps,
            "holdout_miou": miou,
        },
    )
    size_mb = os.path.getsize(args.out) / 1e6
    print(f"saved {args.out} ({size_mb:.1f} MB)")
    if miou < 0.5:
        print("WARNING: mIoU below 0.5 - checkpoint may not drive the pipeline")
        return 1
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
