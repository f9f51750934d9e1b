"""Stray Scanner capture -> autolabel raw scene (raw_rgb/ raw_depth/
intrinsics.txt).

Decodes rgb.mp4, masks low-confidence depth, optionally rotates portrait
captures. CLI parity: reference scripts/convert_scanner.py (skvideo
replaced by cv2.VideoCapture).
"""
import argparse
import os

import cv2
import numpy as np
from tqdm import tqdm


def read_args():
    parser = argparse.ArgumentParser()
    parser.add_argument('scan', type=str, help="Scan directory")
    parser.add_argument('--out', type=str, help="Output directory")
    parser.add_argument("--rotate",
                        action="store_true",
                        help="Rotate frames 90 degrees")
    parser.add_argument("--subsample",
                        type=int,
                        default=1,
                        help="Use every n frames from the dataset")
    return parser.parse_args()


def write_frames(scan_dir, rgb_out_dir, rotate=False, subsample=1):
    video = cv2.VideoCapture(os.path.join(scan_dir, 'rgb.mp4'))
    img_idx = 0
    i = 0
    bar = tqdm(desc="Writing RGB")
    while True:
        ok, frame = video.read()  # BGR already
        if not ok:
            break
        if i % subsample == 0:
            if rotate:
                frame = cv2.rotate(frame, cv2.ROTATE_90_CLOCKWISE)
            cv2.imwrite(os.path.join(rgb_out_dir, f"{img_idx:05}.jpg"),
                        frame, [int(cv2.IMWRITE_JPEG_QUALITY), 90])
            img_idx += 1
        i += 1
        bar.update()
    video.release()


def write_depth(scan_dir, depth_out_dir, rotate=False, subsample=1):
    depth_dir_in = os.path.join(scan_dir, 'depth')
    confidence_dir = os.path.join(scan_dir, 'confidence')
    files = sorted(os.listdir(depth_dir_in))
    img_idx = 0
    for i, filename in tqdm(enumerate(files), desc="Writing Depth"):
        if '.png' not in filename:
            continue
        if i % subsample != 0:
            continue
        number = filename.split('.')[0]
        depth = cv2.imread(os.path.join(depth_dir_in, filename), -1)
        confidence = cv2.imread(
            os.path.join(confidence_dir, number + '.png'))[:, :, 0]
        if rotate:
            depth = cv2.rotate(depth, cv2.ROTATE_90_CLOCKWISE)
            confidence = cv2.rotate(confidence, cv2.ROTATE_90_CLOCKWISE)
        # Low-confidence LiDAR returns are dropped entirely.
        depth[confidence < 2] = 0
        cv2.imwrite(os.path.join(depth_out_dir, f"{img_idx:05}.png"), depth)
        img_idx += 1
    return img_idx


def write_intrinsics(scan_dir, out_dir, rotate=False):
    intrinsics = np.loadtxt(os.path.join(scan_dir, 'camera_matrix.csv'),
                            delimiter=',')
    fx, fy = intrinsics[0, 0], intrinsics[1, 1]
    cx, cy = intrinsics[0, 2], intrinsics[1, 2]
    if rotate:
        out_intrinsics = np.array([[fy, 0, cy], [0, fx, cx], [0, 0, 1]])
    else:
        out_intrinsics = np.array([[fx, 0, cx], [0, fy, cy], [0, 0, 1]])
    np.savetxt(os.path.join(out_dir, 'intrinsics.txt'), out_intrinsics)


def main():
    flags = read_args()
    rgb_out = os.path.join(flags.out, 'raw_rgb')
    depth_out = os.path.join(flags.out, 'raw_depth')
    os.makedirs(rgb_out, exist_ok=True)
    os.makedirs(depth_out, exist_ok=True)

    write_intrinsics(flags.scan, flags.out, rotate=flags.rotate)
    write_depth(flags.scan, depth_out, rotate=flags.rotate,
                subsample=flags.subsample)
    write_frames(flags.scan, rgb_out, rotate=flags.rotate,
                 subsample=flags.subsample)
    print("Done")


if __name__ == "__main__":
    main()
