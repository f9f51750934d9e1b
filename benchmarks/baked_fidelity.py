"""Pin the baked preview's fidelity budget against the volumetric render.

VERDICT r2 flagged that the baked splat preview's canonical-downward-
view color approximation (render/baked.py shade_fn) had no quantitative
image-delta recorded. This benchmark loads a TRAINED workspace, renders
the same test poses through both paths at the GUI preview configuration
(IncrementalBaker resolution 128 / 2^18 splats — backend.py), and
reports:

  - psnr_baked_vs_volumetric: the preview's fidelity budget (how far
    the fast path strays from the ground-truth volumetric render)
  - psnr_volumetric_vs_gt / psnr_baked_vs_gt: both paths against the
    captured frames
  - semantic_agreement: fraction of pixels where the baked class id
    matches the volumetric argmax (the quantity the user paints against)
  - depth_mae_baked_vs_volumetric (on pixels both consider occupied)

Usage: python benchmarks/baked_fidelity.py SCENE [--workspace DIR]
       [--frames 8] [--factor 4.0]
Prints one JSON line.
"""
import argparse
import glob
import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument('scene')
    parser.add_argument('--workspace', default=None,
                        help="Trained model dir (default: the scene's "
                        "single nerf/* workspace).")
    parser.add_argument('--frames', type=int, default=8)
    parser.add_argument('--factor', type=float, default=4.0,
                        help="Preview downscale factor (reference GUI "
                        "renders at factor 4).")
    parser.add_argument('--resolution', type=int, default=128,
                        help="Bake grid resolution (GUI default 128).")
    parser.add_argument('--max-points', type=int, default=2 ** 18,
                        help="Splat budget (GUI default 2^18).")
    parser.add_argument('--no-sh', action='store_true',
                        help="Disable the degree-1 SH view-dependent "
                        "splat color (fall back to the round-2 canonical "
                        "downward view).")
    parser.add_argument('--diagnose', action='store_true',
                        help="Break semantic disagreement down by pixel "
                        "population (hole-filled vs direct-splat vs "
                        "class-boundary) and report depth-error "
                        "quantiles — tells the fix where to aim.")
    flags = parser.parse_args()

    from autolabel_tpu import model_utils
    from autolabel_tpu.core.dataset import SceneDataset
    from autolabel_tpu.inference import InferenceModel
    from autolabel_tpu.render.baked import BakedRenderer, IncrementalBaker

    workspace = flags.workspace
    if workspace is None:
        candidates = sorted(glob.glob(os.path.join(flags.scene, 'nerf', '*')))
        assert len(candidates) == 1, (
            f"--workspace required, found {candidates}")
        workspace = candidates[0]

    params_flags = model_utils.read_params(workspace)
    dataset = SceneDataset('test', flags.scene, factor=flags.factor,
                           batch_size=4096, lazy=True)
    n_classes = dataset.n_classes if dataset.n_classes is not None else 2
    field = model_utils.create_model(dataset.min_bounds, dataset.max_bounds,
                                     n_classes, params_flags)
    model = InferenceModel.from_checkpoint(field, workspace)

    baker = IncrementalBaker(field, resolution=flags.resolution,
                             max_points=flags.max_points,
                             view_dependent=not flags.no_sh)
    baker.update_all(model.params)
    baked_renderer = BakedRenderer(baker.scene())
    camera = dataset.camera

    def psnr(a, b):
        return float(-10.0 * np.log10(np.mean((a - b) ** 2) + 1e-12))

    n = min(flags.frames, len(dataset.poses))
    stride = max(len(dataset.poses) // n, 1)
    b_vs_v, v_vs_gt, b_vs_gt, sem_agree, depth_mae = [], [], [], [], []
    diag = {'hole_px': 0, 'hole_dis': 0, 'direct_px': 0, 'direct_dis': 0,
            'boundary_px': 0, 'boundary_dis': 0, 'interior_px': 0,
            'interior_dis': 0, 'depth_err': []}
    for i in range(0, n * stride, stride):
        batch = dataset._get_test(i)
        vol = model.render(batch)
        T_CW = np.linalg.inv(dataset.poses[i])
        baked = baked_renderer.render(camera.camera_matrix, T_CW,
                                      camera.size)
        v_rgb = np.asarray(vol['image'], np.float32)
        b_rgb = np.asarray(baked['image'], np.float32)
        gt = np.asarray(batch['pixels'], np.float32).reshape(v_rgb.shape)
        b_vs_v.append(psnr(b_rgb, v_rgb))
        v_vs_gt.append(psnr(v_rgb, gt))
        b_vs_gt.append(psnr(b_rgb, gt))
        v_sem = np.asarray(vol['semantic']).argmax(-1)
        b_sem = np.asarray(baked['semantic'])
        sem_agree.append(float((v_sem == b_sem).mean()))
        v_depth = np.asarray(vol['depth'])
        b_depth = np.asarray(baked['depth'])
        both = (v_depth > 0.05) & (b_depth > 0.05) & (b_depth < 1e8)
        if both.any():
            depth_mae.append(float(np.abs(v_depth[both]
                                          - b_depth[both]).mean()))
        if flags.diagnose:
            dis = v_sem != b_sem
            hole = ~np.asarray(baked['splat_hit'])
            # Boundary = volumetric class differs from any 3x3 neighbor.
            bnd = np.zeros_like(dis)
            for dy in (-1, 0, 1):
                for dx in (-1, 0, 1):
                    bnd |= v_sem != np.roll(v_sem, (dy, dx), (0, 1))
            diag['hole_px'] += int(hole.sum())
            diag['hole_dis'] += int((dis & hole).sum())
            diag['direct_px'] += int((~hole).sum())
            diag['direct_dis'] += int((dis & ~hole).sum())
            diag['boundary_px'] += int((bnd & ~hole).sum())
            diag['boundary_dis'] += int((dis & bnd & ~hole).sum())
            diag['interior_px'] += int((~bnd & ~hole).sum())
            diag['interior_dis'] += int((dis & ~bnd & ~hole).sum())
            if both.any():
                diag['depth_err'].append(np.abs(v_depth[both]
                                                - b_depth[both]))

    print(json.dumps({
        'scene': os.path.basename(os.path.normpath(flags.scene)),
        'workspace': os.path.basename(workspace),
        'frames': n,
        'factor': flags.factor,
        'resolution': flags.resolution,
        'max_points': flags.max_points,
        'sh': not flags.no_sh,
        'psnr_baked_vs_volumetric': round(float(np.mean(b_vs_v)), 2),
        'psnr_volumetric_vs_gt': round(float(np.mean(v_vs_gt)), 2),
        'psnr_baked_vs_gt': round(float(np.mean(b_vs_gt)), 2),
        'semantic_agreement': round(float(np.mean(sem_agree)), 4),
        'depth_mae_baked_vs_volumetric':
            round(float(np.mean(depth_mae)), 4) if depth_mae else None,
        **({} if not flags.diagnose else {
            'diag_hole_frac': round(diag['hole_px'] / max(
                diag['hole_px'] + diag['direct_px'], 1), 4),
            'diag_hole_disagree': round(
                diag['hole_dis'] / max(diag['hole_px'], 1), 4),
            'diag_direct_disagree': round(
                diag['direct_dis'] / max(diag['direct_px'], 1), 4),
            'diag_boundary_disagree': round(
                diag['boundary_dis'] / max(diag['boundary_px'], 1), 4),
            'diag_interior_disagree': round(
                diag['interior_dis'] / max(diag['interior_px'], 1), 4),
            'diag_disagree_share_hole': round(diag['hole_dis'] / max(
                diag['hole_dis'] + diag['direct_dis'], 1), 4),
            'diag_disagree_share_boundary': round(
                diag['boundary_dis'] / max(
                    diag['hole_dis'] + diag['direct_dis'], 1), 4),
            'diag_depth_err_q50_q90_q99': [
                round(float(np.quantile(
                    np.concatenate(diag['depth_err']), q)), 4)
                for q in (0.5, 0.9, 0.99)] if diag['depth_err'] else None,
        }),
    }))


if __name__ == '__main__':
    main()
