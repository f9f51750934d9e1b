"""Train the DemoCLIP text+pixel teacher on a labeled scene.

Produces the .npz checkpoint that `--features demo` consumes across the
vision-language pipeline (compute_feature_maps.py, language/evaluate.py)
— a genuinely shared text<->pixel embedding space trained contrastively
on the scene's dense gt_semantic labels, standing in for LSeg/CLIP in
zero-egress environments (see autolabel_tpu/features/demo_clip.py;
reference teachers: /root/reference/autolabel/features/lseg.py:9-66).

Usage:
    python scripts/train_demo_teacher.py <scene> --out demo_teacher.npz \
        [--prompts prompts.json] [--iters 1500]

--prompts: optional JSON {class_id: [synonym, ...]}; defaults to the
procedural room scene's prompt bank.
"""
import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def read_args():
    parser = argparse.ArgumentParser()
    parser.add_argument('scene', type=str)
    parser.add_argument('--out', type=str, default=None,
                        help="Checkpoint path (default "
                        "<scene>/demo_teacher.npz).")
    parser.add_argument('--prompts', type=str, default=None,
                        help="JSON file mapping class id -> prompt "
                        "synonyms (default: the room-scene bank).")
    parser.add_argument('--iters', type=int, default=1500)
    parser.add_argument('--crop', type=int, default=96)
    parser.add_argument('--lr', type=float, default=2e-3)
    parser.add_argument('--frames-stride', type=int, default=4)
    parser.add_argument('--seed', type=int, default=0)
    return parser.parse_args()


def main():
    flags = read_args()
    from autolabel_tpu.features import demo_clip

    prompt_bank = None
    if flags.prompts:
        with open(flags.prompts) as f:
            prompt_bank = {int(k): v for k, v in json.load(f).items()}
    out = flags.out or os.path.join(flags.scene, 'demo_teacher.npz')
    demo_clip.train_demo_teacher(flags.scene, out,
                                 prompt_bank=prompt_bank,
                                 iters=flags.iters,
                                 crop=flags.crop,
                                 lr=flags.lr,
                                 seed=flags.seed,
                                 frames_stride=flags.frames_stride)
    print(f"wrote {out}")


if __name__ == '__main__':
    main()
