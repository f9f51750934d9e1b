"""Converts autolabel .txt world-to-camera poses to a transforms.json
usable by instant-ngp / torch-ngp (the NeRF transforms convention: flipped
y/z, up-vector alignment, center-of-attention recentering and
average-camera-distance scaling — the same recipe instant-ngp's
colmap2nerf uses).

CLI parity: reference scripts/convert_to_instant_ngp.py. Serves as a
cross-implementation sanity check of the data pipeline (SURVEY.md §4).
"""
import argparse
import glob
import json
import math
import os

import cv2
import numpy as np

AABB_SCALE = 8
IMAGE_EXTENSIONS = ["png", "jpg", "jpeg"]


def sharpness(image_path):
    """Variance of the Laplacian: instant-ngp's per-frame sharpness score."""
    image = cv2.imread(image_path)
    gray = cv2.cvtColor(image, cv2.COLOR_BGR2GRAY)
    return cv2.Laplacian(gray, cv2.CV_64F).var()


def rotmat(a, b):
    """Rotation taking unit vector a to unit vector b (Rodrigues)."""
    a, b = a / np.linalg.norm(a), b / np.linalg.norm(b)
    v = np.cross(a, b)
    c = np.dot(a, b)
    s = np.linalg.norm(v)
    kmat = np.array([[0, -v[2], v[1]], [v[2], 0, -v[0]], [-v[1], v[0], 0]])
    return np.eye(3) + kmat + kmat.dot(kmat) * ((1 - c) / (s ** 2 + 1e-10))


def closest_point_2_lines(oa, da, ob, db):
    """Point closest to both rays o+t*d, and a weight that goes to 0 for
    parallel lines."""
    da = da / np.linalg.norm(da)
    db = db / np.linalg.norm(db)
    c = np.cross(da, db)
    denom = np.linalg.norm(c) ** 2
    t = ob - oa
    ta = np.linalg.det([t, db, c]) / (denom + 1e-10)
    tb = np.linalg.det([t, da, c]) / (denom + 1e-10)
    ta = min(ta, 0)
    tb = min(tb, 0)
    return (oa + ta * da + ob + tb * db) * 0.5, denom


def read_args():
    parser = argparse.ArgumentParser()
    parser.add_argument(
        '--dataset_folder',
        type=str,
        required=True,
        help=("Path to the dataset folder. It is expected to contain a "
              "`rgb` subfolder with images, a `pose` subfolder with "
              "world-to-camera poses as .txt files and an intrinsics.txt "
              "file. A transforms.json file will be created in it."))
    return parser.parse_args()


def main():
    args = read_args()
    dataset_folder = args.dataset_folder
    image_folder = os.path.join(dataset_folder, "rgb")
    pose_folder = os.path.join(dataset_folder, "pose")
    intrinsics_path = os.path.join(dataset_folder, "intrinsics.txt")
    output_path = os.path.join(dataset_folder, "transforms.json")

    for path, kind in ((image_folder, 'image folder'),
                       (pose_folder, 'pose folder'),
                       (intrinsics_path, 'intrinsics file')):
        if not os.path.exists(path):
            raise OSError(f"The {kind} '{path}' could not be found.")
    if os.path.exists(output_path):
        raise OSError(f"The output transform file '{output_path}' already "
                      "exists. Please remove it or rename to avoid "
                      "overriding it.")

    image_list = []
    image_extension = None
    for ext in IMAGE_EXTENSIONS:
        image_list = sorted(glob.glob(os.path.join(image_folder, f"*.{ext}")))
        if image_list:
            image_extension = ext
            break
    assert image_list, f"Found no images in '{image_folder}'."
    pose_list = sorted(glob.glob(os.path.join(pose_folder, "*.txt")))
    image_names = [os.path.basename(f).split(f'.{image_extension}')[0]
                   for f in image_list]
    pose_names = [os.path.basename(f).split('.txt')[0] for f in pose_list]
    assert image_names == pose_names, (
        f"Found non-matching images-poses in '{image_folder}' and "
        f"'{pose_folder}'.")

    H, W = cv2.imread(image_list[0]).shape[:2]
    K = np.loadtxt(intrinsics_path)
    f_x, f_y = K[0, 0], K[1, 1]
    c_x, c_y = K[0, 2], K[1, 2]

    out = {
        "camera_angle_x": math.atan(W / (f_x * 2)) * 2,
        "camera_angle_y": math.atan(H / (f_y * 2)) * 2,
        "f_x": f_x,
        "f_y": f_y,
        "k1": 0.0,
        "k2": 0.0,
        "p1": 0.0,
        "p2": 0.0,
        "cx": c_x,
        "cy": c_y,
        "w": W,
        "h": H,
        "aabb_scale": AABB_SCALE,
        "frames": [],
    }
    print(f"\033[94mCreating output transform file '{output_path}'.\033[0m")

    up = np.zeros(3)
    for image_file_path, pose_file_path in zip(image_list, pose_list):
        T_CW = np.loadtxt(pose_file_path).reshape(4, 4)
        T_WC = np.linalg.inv(T_CW)
        # NeRF convention: flip y/z axes, swap x/y rows, flip world z.
        T_WC[0:3, 2] *= -1
        T_WC[0:3, 1] *= -1
        T_WC = T_WC[[1, 0, 2, 3], :]
        T_WC[2, :] *= -1
        up += T_WC[0:3, 1]
        out["frames"].append({
            "file_path": f"./rgb/{os.path.basename(image_file_path)}",
            "sharpness": sharpness(image_file_path),
            "transform_matrix": T_WC,
        })

    num_frames = len(out["frames"])
    up = up / np.linalg.norm(up)
    print(f"Found up vector {up}")

    # Rotate so the up vector is +z.
    R = np.pad(rotmat(up, [0, 0, 1]), [0, 1])
    R[-1, -1] = 1
    for f in out["frames"]:
        f["transform_matrix"] = np.matmul(R, f["transform_matrix"])

    # Recenter on the mutual center of attention of all camera rays.
    print("Computing center of attention...")
    total_weight = 0.0
    center_point = np.zeros(3)
    for f in out["frames"]:
        mf = f["transform_matrix"][0:3, :]
        for g in out["frames"]:
            mg = g["transform_matrix"][0:3, :]
            p, weight = closest_point_2_lines(mf[:, 3], mf[:, 2], mg[:, 3],
                                              mg[:, 2])
            if weight > 0.01:
                center_point += p * weight
                total_weight += weight
    center_point /= total_weight
    for f in out["frames"]:
        f["transform_matrix"][0:3, 3] -= center_point

    # Scale so the average camera distance from the origin is 1 UOM.
    avg_len = sum(
        np.linalg.norm(f["transform_matrix"][0:3, 3])
        for f in out["frames"]) / num_frames
    scale = 1.0 / avg_len
    print(f"\033[94mAverage camera distance from origin = {avg_len} m "
          "(NOTE: Assuming the input UOM of the transforms was meters, "
          "which is the case when using `autolabel` to extract the "
          "poses).\033[0m")

    for f in out["frames"]:
        f["transform_matrix"] = f["transform_matrix"].tolist()
    out["scale"] = scale
    out["one_uom_scene_to_one_m"] = 1.0 / scale

    with open(output_path, "w") as outfile:
        json.dump(out, outfile, indent=4)


if __name__ == "__main__":
    main()
