description = """
This script converts scenes from the ARKitScenes dataset
(https://github.com/apple/ARKitScenes) format to the format used by
autolabel.

Usage:
    python scripts/convert_arkitscenes.py <arkit-scenes-dir> --out <out-dir>

After running this script, scripts/compute_scene_bounds.py needs to be run
to compute the scene bounding box.

Uses the lowres_wide, lowres_depth, lowres_wide.traj, confidence and
lowres_wide_intrinsics assets (see ARKitScenes DATA.md). Poses are matched
to rgb frames by nearest trajectory timestamp within one frame interval.
"""
import argparse
import os
from argparse import RawTextHelpFormatter

import cv2
import numpy as np
from scipy.spatial.transform import Rotation

# Same CLI and output contract as the reference converter; restructured
# around an ArkitCapture reader yielding matched frame tuples.

MIN_CONFIDENCE = 2
MAX_POSE_DT = 1.0 / 90.0  # max rgb <-> pose timestamp difference


def read_args():
    parser = argparse.ArgumentParser(description=description,
                                     formatter_class=RawTextHelpFormatter)
    parser.add_argument('arkit_scenes')
    parser.add_argument('--out')
    return parser.parse_args()


class ArkitCapture:
    """One ARKitScenes capture: timestamp-keyed asset maps + trajectory."""

    ASSETS = ('lowres_wide', 'lowres_depth', 'confidence')

    def __init__(self, scene_dir):
        self.scene_dir = scene_dir
        self._trajectory = None

    @property
    def trajectory(self):
        if self._trajectory is None:
            self._trajectory = np.loadtxt(
                os.path.join(self.scene_dir, 'lowres_wide.traj'))
        return self._trajectory

    @property
    def complete(self):
        needed = [os.path.join(self.scene_dir, 'lowres_wide.traj'),
                  os.path.join(self.scene_dir, 'lowres_wide_intrinsics')]
        needed += [os.path.join(self.scene_dir, a) for a in self.ASSETS]
        return all(os.path.exists(p) for p in needed)

    def intrinsics(self):
        d = os.path.join(self.scene_dir, 'lowres_wide_intrinsics')
        _, _, fx, fy, cx, cy = np.loadtxt(os.path.join(d, os.listdir(d)[0]))
        return np.array([[fx, 0, cx], [0, fy, cy], [0, 0, 1.0]])

    @staticmethod
    def _stamp(filename):
        # Names look like <video_id>_<seconds>.<milliseconds>
        seconds, ms = filename.split('_')[1].split('.')
        return int(seconds) + int(ms) * 1e-3

    def _asset_map(self, asset):
        d = os.path.join(self.scene_dir, asset)
        return {f.replace('.png', ''): os.path.join(d, f)
                for f in os.listdir(d)}

    def _pose_at(self, timestamp):
        """Nearest-timestamp trajectory row -> (T_CW, |dt|)."""
        errors = np.abs(self.trajectory[:, 0] - timestamp)
        row = self.trajectory[errors.argmin()]
        T_CW = np.eye(4)
        T_CW[:3, :3] = Rotation.from_rotvec(row[1:4]).as_matrix()
        T_CW[:3, 3] = row[4:]
        return T_CW, errors.min()

    def frames(self):
        """Yield (stamp_key, rgb_path, depth_path, conf_path, T_CW) for
        every rgb frame with all assets and a pose within MAX_POSE_DT,
        in timestamp order."""
        rgb, depth, conf = (self._asset_map(a) for a in self.ASSETS)
        for key in sorted(rgb, key=self._stamp):
            if key not in depth or key not in conf:
                print(f"Skipping image {key} (missing depth/confidence)")
                continue
            T_CW, dt = self._pose_at(self._stamp(key))
            if dt > MAX_POSE_DT:
                print(f"Skipping {key} due to time diff {dt:.03}", end='\r')
                continue
            yield key, rgb[key], depth[key], conf[key], T_CW


def write_scene(capture, out_dir):
    dirs = {sub: os.path.join(out_dir, sub)
            for sub in ('rgb', 'depth', 'pose')}
    for d in dirs.values():
        os.makedirs(d, exist_ok=True)

    for i, (key, rgb_path, depth_path, conf_path,
            T_CW) in enumerate(capture.frames()):
        print(f"Writing {key}", end='\r')
        name = f"{i:06}"
        depth = cv2.imread(depth_path, -1)
        depth[cv2.imread(conf_path, -1) < MIN_CONFIDENCE] = 0
        cv2.imwrite(os.path.join(dirs['depth'], name + '.png'), depth)
        cv2.imwrite(os.path.join(dirs['rgb'], name + '.png'),
                    cv2.imread(rgb_path, -1))
        np.savetxt(os.path.join(dirs['pose'], name + '.txt'), T_CW)
    np.savetxt(os.path.join(out_dir, 'intrinsics.txt'),
               capture.intrinsics())


def main():
    flags = read_args()
    for scene in os.listdir(flags.arkit_scenes):
        capture = ArkitCapture(os.path.join(flags.arkit_scenes, scene))
        if not capture.complete:
            print(f"Missing files in {scene}")
            continue
        write_scene(capture, os.path.join(flags.out, scene))


if __name__ == "__main__":
    main()
