"""Generate synthetic evaluation scenes with exact ground-truth poses.

The bundled reference scene carries no GT object poses, so accuracy parity
(ADD/ADD-S) needs scenes where truth is known by construction: object
meshes from the reference's model set are rendered (the framework's own
triangle rasterizer, z-min composited) above a synthetic table plane;
depth/mask/gt_info.yml are written in the reference's scene layout so
pipeline/evaluate.py can sweep them. Mask class ids come from the
reference's obj_config.yml, and multi-object scenes place every listed
object at a non-overlapping slot with a random yaw (resting upright, like
the reference's APC shelf captures).

The --hard family (VERDICT r3 #4) stresses what the easy families saturate:
a TILTED camera with the objects packed in a line along the view direction
(real inter-object occlusion - the far object is >50% hidden behind the
near ones), touching footprints (pitch ~ object extent), sensor depth
dropout + Gaussian depth noise applied before the codec write, and a
duplicate-geometry DISTRACTOR - an unlabeled extra instance of one scene
object, present in depth but masked background, which the render-cost term
can never explain. Per-scene occlusion fractions are written to
hard_stats.json next to the frames.

Usage:
  python scripts/make_synthetic_scenes.py --out /tmp/synth_scenes --n 8 \
      --objects kleenex_tissue_box,expo_dry_erase_board_eraser,folgers_classic_roast_coffee
  python scripts/make_synthetic_scenes.py --out /tmp/hard_scenes --n 8 --hard
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--out", required=True)
    p.add_argument("--n", type=int, default=4)
    p.add_argument("--object", default=None,
                   help="single object (back-compat alias for --objects)")
    p.add_argument("--objects", default="kleenex_tissue_box",
                   help="comma-separated object names, all placed per scene")
    p.add_argument(
        "--model-dir",
        default="/root/reference/src/physim_pose_estimation/models_visualization",
    )
    p.add_argument(
        "--obj-config",
        default="/root/reference/src/physim_pose_estimation/src/data_layer/"
                "obj_config.yml",
        help="reference object config (mask class ids)",
    )
    p.add_argument("--platform", default="cpu", choices=["cpu", "tpu"])
    p.add_argument("--dataset", default="APC", choices=["APC", "YCB"],
                   help="scene layout codec: APC stores depth bit-rotated, "
                        "YCB plain (pass the matching obj-config, e.g. "
                        "obj_config_ycb.yml for YCB class ids)")
    p.add_argument("--table-z", type=float, default=0.8)
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--stack", action="store_true",
                   help="place the SECOND object resting ON the first "
                        "(gt_info dependency_order semantics - the paper's "
                        "stacked-scene case); remaining objects rest on the "
                        "table at side slots")
    p.add_argument("--hard", action="store_true",
                   help="hard family: tilted camera + line packing "
                        "(occlusion), touching footprints, depth dropout + "
                        "noise, duplicate-geometry distractor (see module "
                        "docstring); individual knobs below override")
    p.add_argument("--tilt-deg", type=float, default=None,
                   help="camera tilt from straight-down (hard default 55)")
    p.add_argument("--dropout", type=float, default=None,
                   help="fraction of valid depth pixels zeroed "
                        "(hard default 0.15)")
    p.add_argument("--noise-mm", type=float, default=None,
                   help="Gaussian depth noise sigma in mm (hard default 3)")
    p.add_argument("--distractor", action="store_true", default=None,
                   help="add an unlabeled duplicate of the first object "
                        "(depth only, mask background; hard default on)")
    args = p.parse_args(argv)
    names = (args.object or args.objects).split(",")
    if args.hard and args.stack:
        raise SystemExit("--hard and --stack are separate families")
    tilt_deg = args.tilt_deg if args.tilt_deg is not None else (
        55.0 if args.hard else 0.0)
    dropout = args.dropout if args.dropout is not None else (
        0.15 if args.hard else 0.0)
    noise_mm = args.noise_mm if args.noise_mm is not None else (
        3.0 if args.hard else 0.0)
    distractor = args.distractor if args.distractor is not None else args.hard

    if args.platform == "cpu":
        import jax

        jax.config.update("jax_platforms", "cpu")

    import jax
    import jax.numpy as jnp
    import numpy as np
    import yaml
    from scipy.spatial.transform import Rotation

    from physimglobalpose_tpu.geometry import depthio
    from physimglobalpose_tpu.models import assets
    from physimglobalpose_tpu.models.objectdb import _find_mesh
    from physimglobalpose_tpu.ops import raster_tri
    from physimglobalpose_tpu.utils import synthdata

    # Mask class ids from the reference's obj_config.yml (objectdb schema).
    with open(args.obj_config) as fh:
        objcfg = yaml.safe_load(fh)["objects"]
    class_ids = {
        objcfg[f"object_{i}"]["name"]: int(objcfg[f"object_{i}"]["classId"])
        for i in range(1, int(objcfg["num_objects"]) + 1)
    }

    intr = np.array(
        [[613.998, 0.0, 320.0], [0.0, 613.998, 240.0], [0.0, 0.0, 1.0]], np.float32
    )
    h, w = 480, 640
    # Camera 'table_z' meters above the world table plane, looking straight
    # down: world gravity (-z) then points INTO the observed surface, so the
    # physics-aware verification stage is meaningful. camera-to-world:
    # x_cam -> +x, y_cam -> -y, z_cam -> -z (right-handed).
    cam_height = 1.5
    table_z_world = cam_height - args.table_z
    if tilt_deg > 0:
        # Tilted camera (hard family): 1 m from the table center along the
        # view axis, pitched tilt_deg from straight-down toward +y. Objects
        # packed along +y then occlude each other for real - the lever the
        # straight-down camera cannot provide.
        th = np.deg2rad(tilt_deg)
        z_cam = np.array([0.0, np.sin(th), -np.cos(th)], np.float32)
        eye = np.array([0.0, 0.0, table_z_world], np.float32) - 1.0 * z_cam
        x_cam = np.array([1.0, 0.0, 0.0], np.float32)
        y_cam = np.cross(z_cam, x_cam)
        cam_pose = np.eye(4, dtype=np.float32)
        cam_pose[:3, 0], cam_pose[:3, 1], cam_pose[:3, 2] = x_cam, y_cam, z_cam
        cam_pose[:3, 3] = eye
    else:
        cam_pose = np.array(
            [[1, 0, 0, 0], [0, -1, 0, 0], [0, 0, -1, cam_height], [0, 0, 0, 1]],
            np.float32,
        )
    cam_pose_inv = np.eye(4, dtype=np.float32)
    cam_pose_inv[:3, :3] = cam_pose[:3, :3].T
    cam_pose_inv[:3, 3] = -cam_pose[:3, :3].T @ cam_pose[:3, 3]

    def table_depth_map() -> "np.ndarray":
        """Per-pixel camera-frame depth of the table plane z_world == table_z_world."""
        if tilt_deg <= 0:
            return np.full((h, w), np.float32(args.table_z))
        us, vs = np.meshgrid(np.arange(w), np.arange(h))
        d = np.stack(
            [(us - intr[0, 2]) / intr[0, 0], (vs - intr[1, 2]) / intr[1, 1],
             np.ones_like(us, np.float32)], -1,
        ).astype(np.float32)  # camera-frame ray with unit z -> depth == s
        dir_w = d @ cam_pose[:3, :3].T
        denom = dir_w[..., 2]
        s = np.where(
            denom < -1e-6,
            (table_z_world - cam_pose[2, 3]) / np.where(denom < -1e-6, denom, -1.0),
            0.0,
        )
        return np.where(s > 0, s, 0.0).astype(np.float32)

    meshes, half_heights = {}, {}
    for name in names:
        mesh = assets.load_mesh(_find_mesh(args.model_dir, name))
        meshes[name] = assets.decimate_to_max_faces(mesh, 4000)
        v = meshes[name].vertices
        half_heights[name] = (v[:, 2].max() - v[:, 2].min()) / 2

    # Non-overlapping XY slots: fixed grid cells jittered per scene. The
    # bundled meshes span <= ~12 cm, so 16 cm cell pitch keeps footprints
    # apart without physics.
    pitch = 0.16
    cols = int(np.ceil(np.sqrt(len(names))))
    slots = [
        np.array([(i % cols - (cols - 1) / 2) * pitch,
                  (i // cols - (max(1, (len(names) + cols - 1) // cols) - 1) / 2)
                  * pitch])
        for i in range(len(names))
    ]

    def render_cam_depth(name, pose_cam):
        mesh = meshes[name]
        return np.asarray(
            raster_tri.render_mesh_depth(
                jnp.asarray(pose_cam), jnp.asarray(mesh.vertices),
                jnp.asarray(mesh.faces),
                jnp.ones(len(mesh.faces), bool), jnp.asarray(intr), h, w,
            )
        )

    rng = np.random.default_rng(args.seed)
    k = 0
    attempt = 0
    while k < args.n:
        order = rng.permutation(len(names))
        depth = table_depth_map()
        mask = np.zeros((h, w), np.uint16)
        gt_entries = []
        alone_px = {}
        base_xy = None
        for idx, name in enumerate(names):
            slot = slots[order[idx]]
            if args.hard:
                # Line packing along the camera's ground direction (+y):
                # nearer objects (smaller y) occlude farther ones under the
                # tilted camera. Pitch 0.11 m leaves the largest footprints
                # touching; the yaw is unconstrained.
                pitch_hard = 0.11
                yq = (order[idx] - (len(names) - 1) / 2) * pitch_hard
                rot_w = Rotation.from_euler(
                    "xyz", [0, 0, rng.uniform(0, 360)], degrees=True
                ).as_matrix().astype(np.float32)
                pose_w = np.eye(4, dtype=np.float32)
                pose_w[:3, :3] = rot_w
                pose_w[:3, 3] = [
                    rng.uniform(-0.02, 0.02),
                    yq + rng.uniform(-0.01, 0.01),
                    table_z_world + half_heights[name] + 0.001,
                ]
                pose = (cam_pose_inv @ pose_w).astype(np.float32)
                depth_obj = render_cam_depth(name, pose)
                alone_px[name] = int(((depth_obj > 0)).sum())
                # The tilted table map can be 0 (sky) - objects win there too.
                closer = (depth_obj > 0) & ((depth_obj < depth) | (depth <= 0))
                depth = np.where(closer, depth_obj, depth)
                mask = np.where(closer, np.uint16(class_ids[name]), mask)
                gt_entries.append((name, pose))
                continue
            rot = Rotation.from_euler(
                "xyz", [0, 0, rng.uniform(0, 360)], degrees=True
            ).as_matrix().astype(np.float32)
            if args.stack and idx == 0:
                # Stack base: centered slot (the top object must stay inside
                # its footprint).
                base_xy = np.array([rng.uniform(-0.02, 0.02),
                                    rng.uniform(-0.02, 0.02)])
                t = np.array(
                    [base_xy[0], base_xy[1],
                     args.table_z - half_heights[name] - 0.001],
                    np.float32,
                )
            elif args.stack and idx == 1:
                # Rests ON the base: bottom at the base's top surface
                # (camera depth decreases upward), xy jittered ~1 cm inside
                # the base's footprint. Ground truth is physically
                # consistent by construction - the dependent-placement case
                # the sequential-settle search exists for (gt_info.yml
                # dependency_order in the reference's own scenes).
                t = np.array(
                    [base_xy[0] + rng.uniform(-0.01, 0.01),
                     base_xy[1] + rng.uniform(-0.01, 0.01),
                     args.table_z - 2 * half_heights[names[0]]
                     - half_heights[name] - 0.002],
                    np.float32,
                )
            else:
                # In stack mode the side slots widen 1.5x so they clear the
                # centered stack's footprint.
                s = slot * (1.5 if args.stack else 1.0)
                t = np.array(
                    [s[0] + rng.uniform(-0.02, 0.02),
                     s[1] + rng.uniform(-0.02, 0.02),
                     args.table_z - half_heights[name] - 0.001],
                    np.float32,
                )
            pose = np.eye(4, dtype=np.float32)
            pose[:3, :3] = rot
            pose[:3, 3] = t
            mesh = meshes[name]
            depth_obj = np.asarray(
                raster_tri.render_mesh_depth(
                    jnp.asarray(pose), jnp.asarray(mesh.vertices),
                    jnp.asarray(mesh.faces),
                    jnp.ones(len(mesh.faces), bool), jnp.asarray(intr), h, w,
                )
            )
            # z-min composite: closer surfaces win pixel ownership.
            closer = (depth_obj > 0) & (depth_obj < depth)
            depth = np.where(closer, depth_obj, depth)
            mask = np.where(closer, np.uint16(class_ids[name]), mask)
            gt_entries.append((name, pose))

        if distractor:
            # Duplicate-geometry distractor: an extra, UNLABELED instance of
            # the first object beside the line - present in depth (the
            # render-cost term can never explain those pixels; a generator
            # can lock onto it if segmentation leaks) but background in the
            # mask. It also steals mask pixels from anything behind it.
            dname = names[0]
            rot_w = Rotation.from_euler(
                "xyz", [0, 0, rng.uniform(0, 360)], degrees=True
            ).as_matrix().astype(np.float32)
            pose_w = np.eye(4, dtype=np.float32)
            pose_w[:3, :3] = rot_w
            pose_w[:3, 3] = [
                0.12 * (1 if rng.uniform() < 0.5 else -1) + rng.uniform(-0.01, 0.01),
                rng.uniform(-0.06, 0.06),
                table_z_world + half_heights[dname] + 0.001,
            ]
            d_pose = (cam_pose_inv @ pose_w).astype(np.float32)
            depth_obj = render_cam_depth(dname, d_pose)
            closer = (depth_obj > 0) & ((depth_obj < depth) | (depth <= 0))
            depth = np.where(closer, depth_obj, depth)
            mask = np.where(closer, np.uint16(0), mask)

        stats = None
        if args.hard:
            # Hard must not mean IMPOSSIBLE: an object fully hidden behind
            # another is unsolvable for every method and only flattens the
            # comparison. Redraw the placement until each object keeps a
            # minimal visible footprint (~250 px before dropout -> enough
            # segment points to clear the <30-point bail).
            min_vis = min(
                int((mask == class_ids[n]).sum()) for n, _ in gt_entries
            )
            if min_vis < 250 and attempt < 20:
                attempt += 1
                continue
            stats = {
                "tilt_deg": tilt_deg, "dropout": dropout, "noise_mm": noise_mm,
                "distractor": bool(distractor),
                "occlusion_frac": {
                    name: round(1.0 - float((mask == class_ids[name]).sum())
                                / max(alone_px.get(name, 1), 1), 3)
                    for name, _ in gt_entries
                },
            }

        # Sensor corruption AFTER compositing, BEFORE the codec write: the
        # GT poses stay exact; only the observation degrades.
        valid = depth > 0
        if noise_mm > 0:
            depth = np.where(
                valid,
                depth + rng.normal(0.0, noise_mm / 1000.0, depth.shape)
                .astype(np.float32),
                depth,
            ).astype(np.float32)
        if dropout > 0:
            drop = valid & (rng.uniform(size=depth.shape) < dropout)
            depth = np.where(drop, np.float32(0.0), depth)

        sd = os.path.join(args.out, f"scene_{k:04d}")
        os.makedirs(sd, exist_ok=True)
        # APC layout stores depth bit-rotated (load_scene decodes with
        # rot-left-13 for dataset="APC"); YCB stores plain millimeters.
        depthio.write_depth_png(
            os.path.join(sd, "frame-000000.depth.png"), depth,
            bit_rotated=(args.dataset == "APC"),
        )
        from PIL import Image

        Image.fromarray(mask).save(os.path.join(sd, "frame-000000.mask.png"))
        # Real color frame in the training appearance distribution
        # (synthdata palette + depth shading + noise) so color-consuming
        # strategies (FCN/RCNN) are evaluable on generator scenes - was an
        # all-black placeholder through round 4. The hard-family distractor
        # is mask-background, so it paints as background: an unmodeled bump
        # visible in depth only.
        color_rng = np.random.default_rng(args.seed * 100003 + k)
        color_img = synthdata.colorize_from_label_depth(
            mask.astype(np.int32), depth, color_rng
        )
        Image.fromarray(color_img).save(
            os.path.join(sd, "frame-000000.color.png")
        )
        if stats is not None:
            import json as json_mod

            with open(os.path.join(sd, "hard_stats.json"), "w") as fh:
                json_mod.dump(stats, fh, indent=1)
        cam_t = cam_pose[:3, 3]
        cam_q = Rotation.from_matrix(cam_pose[:3, :3]).as_quat()  # [x,y,z,w]
        lines = [
            "camera:\n",
            f"  camera_pose: [{cam_t[0]}, {cam_t[1]}, {cam_t[2]}, "
            f"{cam_q[3]}, {cam_q[0]}, {cam_q[1]}, {cam_q[2]}]\n",
            f"  camera_intrinsics: [[{intr[0,0]}, 0.0, {intr[0,2]}],"
            f"[0.0, {intr[1,1]}, {intr[1,2]}],[0.0, 0.0, 1.0]]\n",
            "rest_surface:\n",
            "  type: table\n",
            f"  surface_pose: [0, 0, {table_z_world}, 1, 0, 0, 0]\n",
            "scene:\n",
            f"  num_objects: {len(gt_entries)}\n",
        ]
        for i, (name, pose) in enumerate(gt_entries, start=1):
            pose_world = cam_pose @ pose
            t_w = pose_world[:3, 3]
            q = Rotation.from_matrix(pose_world[:3, :3]).as_quat()  # [x,y,z,w]
            lines += [
                f"  object_{i}:\n",
                f"    name: '{name}'\n",
                f"    pose: [{t_w[0]}, {t_w[1]}, {t_w[2]}, "
                f"{q[3]}, {q[0]}, {q[1]}, {q[2]}]\n",
            ]
        with open(os.path.join(sd, "gt_info.yml"), "w") as fh:
            fh.writelines(lines)
        extra = (
            f", max occlusion {max(stats['occlusion_frac'].values()):.2f}"
            if stats else ""
        )
        print(f"wrote {sd} ({len(gt_entries)} objects{extra})")
        k += 1
        attempt = 0


if __name__ == "__main__":
    main()
