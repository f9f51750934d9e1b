"""Stray Scanner capture -> autolabel raw scene (raw_rgb/ raw_depth/
intrinsics.txt).

Decodes rgb.mp4, masks low-confidence LiDAR depth, optionally rotates
portrait captures. Same CLI and on-disk contract as the reference
scripts/convert_scanner.py; structured as a ScannerCapture reader whose
frame streams are piped through one shared subsample/rotate/write loop.
"""
import argparse
import os

import cv2
import numpy as np
from tqdm import tqdm

MIN_CONFIDENCE = 2  # LiDAR returns below this are dropped entirely


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


class ScannerCapture:
    """Streams of a Stray Scanner capture directory."""

    def __init__(self, scan_dir):
        self.scan_dir = scan_dir

    @property
    def intrinsics(self):
        return np.loadtxt(os.path.join(self.scan_dir, 'camera_matrix.csv'),
                          delimiter=',')

    def rgb_frames(self):
        video = cv2.VideoCapture(os.path.join(self.scan_dir, 'rgb.mp4'))
        try:
            while True:
                ok, frame = video.read()  # BGR already
                if not ok:
                    return
                yield frame
        finally:
            video.release()

    def depth_frames(self):
        """Confidence-masked depth frames, in numeric order."""
        depth_dir = os.path.join(self.scan_dir, 'depth')
        names = sorted(n for n in os.listdir(depth_dir) if '.png' in n)
        for name in names:
            stem = name.split('.')[0]
            depth = cv2.imread(os.path.join(depth_dir, name), -1)
            confidence = cv2.imread(
                os.path.join(self.scan_dir, 'confidence',
                             stem + '.png'))[:, :, 0]
            depth = depth.copy()
            depth[confidence < MIN_CONFIDENCE] = 0
            yield depth


def rotated_intrinsics(K):
    """Camera matrix after a 90-degree clockwise image rotation."""
    fx, fy = K[0, 0], K[1, 1]
    cx, cy = K[0, 2], K[1, 2]
    return np.array([[fy, 0, cy], [0, fx, cx], [0, 0, 1.0]])


def write_stream(frames, out_dir, ext, desc, rotate=False, subsample=1,
                 imwrite_params=()):
    """Subsample, optionally rotate, and write a frame stream with
    contiguous 5-digit names."""
    out_index = 0
    for i, frame in enumerate(tqdm(frames, desc=desc)):
        if i % subsample:
            continue
        if rotate:
            frame = cv2.rotate(frame, cv2.ROTATE_90_CLOCKWISE)
        cv2.imwrite(os.path.join(out_dir, f"{out_index:05}{ext}"), frame,
                    list(imwrite_params))
        out_index += 1
    return out_index


def convert(scan_dir, out_dir, rotate=False, subsample=1):
    capture = ScannerCapture(scan_dir)
    rgb_out = os.path.join(out_dir, 'raw_rgb')
    depth_out = os.path.join(out_dir, 'raw_depth')
    os.makedirs(rgb_out, exist_ok=True)
    os.makedirs(depth_out, exist_ok=True)

    K = capture.intrinsics
    np.savetxt(os.path.join(out_dir, 'intrinsics.txt'),
               rotated_intrinsics(K) if rotate else K)
    write_stream(capture.depth_frames(), depth_out, '.png', 'Writing Depth',
                 rotate=rotate, subsample=subsample)
    write_stream(capture.rgb_frames(), rgb_out, '.jpg', 'Writing RGB',
                 rotate=rotate, subsample=subsample,
                 imwrite_params=(int(cv2.IMWRITE_JPEG_QUALITY), 90))


def main():
    flags = read_args()
    convert(flags.scan, flags.out, rotate=flags.rotate,
            subsample=flags.subsample)
    print("Done")


if __name__ == "__main__":
    main()
