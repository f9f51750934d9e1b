description = """
Converts ScanNet scans (<scene>.sens binary streams + 2D label-filt maps +
annotated meshes) to the autolabel scene format, remapping labels to the
raw-category / NYU40 / ScanNet20 vocabularies and writing label_map.csv,
gt_semantic/, mesh.ply + mesh_labels.npy for open-vocab evaluation.

Usage:
    python scripts/convert_scannet.py <scans-dir> --label-map <tsv> --out <dir>
"""
import argparse
import json
import math
import os
import struct
import subprocess
import sys
import zlib
from argparse import RawTextHelpFormatter

import cv2
import imageio
import numpy as np
import pandas

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from autolabel_tpu.utils.ply import read_ply_vertices, write_ply_pointcloud

# CLI parity: reference scripts/convert_scannet.py; trimesh mesh copy is
# replaced by the numpy PLY reader/writer (vertices are all the 3D
# evaluator consumes).

SCANNET20_IDS = [
    1, 2, 3, 4, 5, 6, 7, 8, 9, 10, 11, 12, 14, 16, 24, 28, 33, 34, 36, 39
]


def read_args():
    parser = argparse.ArgumentParser(description=description,
                                     formatter_class=RawTextHelpFormatter)
    parser.add_argument('scannet_scan_dir')
    parser.add_argument(
        '--label-map',
        required=True,
        help="Path to label map .tsv file with semantic label names and ids.")
    parser.add_argument('--out', required=True)
    parser.add_argument('--max-frames',
                        type=int,
                        default=750,
                        help="Maximum number of frames to keep.")
    parser.add_argument('--stride',
                        type=int,
                        default=5,
                        help="Use only every s-th frame.")
    parser.add_argument('--nyu40',
                        action='store_true',
                        help="Use NYU40 label map.")
    parser.add_argument('--scannet20',
                        action='store_true',
                        help="Use ScanNet20 evaluation label map.")
    return parser.parse_args()


class LabelHelper:
    """ScanNet raw ids -> evaluation vocabulary remapping + prompts."""

    def __init__(self, label_path, flags):
        label_map = pandas.read_csv(label_path, sep='\t')
        mapping = np.zeros(label_map['id'].values.max() + 1, np.uint16)
        if flags.nyu40 or flags.scannet20:
            ids = np.arange(1, 41)
            texts = [
                label_map['nyu40class'][label_map['nyu40id'] == i].values[0]
                for i in ids
            ]
            for i, num in zip(label_map['id'].values,
                              label_map['nyu40id'].values):
                mapping[i] = num
        else:
            texts = label_map['raw_category'].values.tolist()
            ids = np.arange(1, len(texts) + 1)
            for i, num in zip(label_map['id'].values, ids):
                mapping[i] = num

        if flags.scannet20:
            mapping[~np.isin(mapping, SCANNET20_IDS)] = 0
            texts = [t for t, i in zip(texts, ids) if i in SCANNET20_IDS]
            ids = ids[np.isin(ids, SCANNET20_IDS)]

        self.label_text_to_id = dict(
            zip(label_map['raw_category'], label_map['id']))
        self.mapping = mapping
        self.label_map = pandas.DataFrame({'id': ids, 'prompt': texts})
        self.classes_in_scene = set()

    def reset(self):
        self.classes_in_scene = set()

    def write_labelmap(self, out):
        self.label_map.to_csv(os.path.join(out, 'label_map.csv'),
                              index=False)

    def map_semantics(self, semantic_frame):
        return self.mapping[semantic_frame]

    def register_frame(self, frame):
        for i in np.unique(frame):
            self.classes_in_scene.add(int(i))

    def label_ids(self):
        return self.label_map['id'].values

    def label_to_id(self, label_name):
        return self.mapping[self.label_text_to_id[label_name]]


def write_intrinsics(out, sensor_reader):
    np.savetxt(os.path.join(out, "intrinsics.txt"),
               sensor_reader.intrinsic_color[:3, :3])


def write_metadata(out, label_helper):
    metadata = {
        "n_classes": int(label_helper.label_ids().max()),
        'classes': list(sorted(label_helper.classes_in_scene)),
    }
    with open(os.path.join(out, "metadata.json"), 'w') as f:
        f.write(json.dumps(metadata, indent=2))


def read_aggregation(filename):
    """ScanNet aggregation JSON: object/label -> segment ids."""
    object_id_to_segs = {}
    label_to_segs = {}
    with open(filename) as f:
        data = json.load(f)
    for group in data['segGroups']:
        object_id = group['objectId'] + 1  # instance ids are 1-indexed
        segs = group['segments']
        object_id_to_segs[object_id] = segs
        label_to_segs.setdefault(group['label'], []).extend(segs)
    return object_id_to_segs, label_to_segs


def read_segmentation(filename):
    """ScanNet segs JSON: segment id -> vertex indices."""
    seg_to_verts = {}
    with open(filename) as f:
        data = json.load(f)
    for i, seg_id in enumerate(data['segIndices']):
        seg_to_verts.setdefault(seg_id, []).append(i)
    return seg_to_verts, len(data['segIndices'])


def copy_3d_semantics(scene_in, scene, scene_out, label_helper):
    mesh_path = os.path.join(scene_in, f"{scene}_vh_clean_2.ply")
    aggregation = os.path.join(scene_in, f"{scene}.aggregation.json")
    segments = os.path.join(scene_in,
                            f"{scene}_vh_clean_2.0.010000.segs.json")
    vertices = read_ply_vertices(mesh_path)
    label_ids = np.zeros(len(vertices), dtype=np.uint16)
    _, label_to_segs = read_aggregation(aggregation)
    seg_to_vertex, _ = read_segmentation(segments)
    for label, segs in label_to_segs.items():
        label_id = label_helper.label_to_id(label)
        for seg in segs:
            for vertex in seg_to_vertex[seg]:
                if vertex < len(label_ids):
                    label_ids[vertex] = label_id
                else:
                    print(f"Index error for {scene} vertex {vertex} and "
                          f"seg: {seg}")
    write_ply_pointcloud(os.path.join(scene_out, 'mesh.ply'), vertices)
    np.save(os.path.join(scene_out, 'mesh_labels.npy'), label_ids)


class RGBDFrame:
    """One record of the .sens stream: pose + jpeg color + zlib depth."""

    def load(self, f):
        self.camera_to_world = np.frombuffer(f.read(16 * 4),
                                             dtype=np.float32).reshape(4, 4)
        self.timestamp_color = struct.unpack('Q', f.read(8))[0]
        self.timestamp_depth = struct.unpack('Q', f.read(8))[0]
        color_size = struct.unpack('Q', f.read(8))[0]
        depth_size = struct.unpack('Q', f.read(8))[0]
        self.color_data = f.read(color_size)
        self.depth_data = f.read(depth_size)


class SensReader:
    """Streaming reader for ScanNet's .sens binary container (v4)."""

    def __init__(self, sens_file):
        self.file = sens_file
        self.file_handle = None
        self.num_frames = None
        self.rgb_size = None
        self.depth_size = None

    def __enter__(self):
        self.file_handle = f = open(self.file, 'rb')
        version = struct.unpack('I', f.read(4))[0]
        assert version == 4
        strlen = struct.unpack('Q', f.read(8))[0]
        self.sensor_name = f.read(strlen).decode('utf-8')
        read_mat = lambda: np.frombuffer(f.read(16 * 4),
                                         dtype=np.float32).reshape(4, 4)
        self.intrinsic_color = read_mat()
        self.extrinsic_color = read_mat()
        self.intrinsic_depth = read_mat()
        self.extrinsic_depth = read_mat()
        struct.unpack('i', f.read(4))  # color compression type
        struct.unpack('i', f.read(4))  # depth compression type
        color_width, color_height = struct.unpack('II', f.read(8))
        self.rgb_size = (color_width, color_height)
        depth_width, depth_height = struct.unpack('II', f.read(8))
        self.depth_size = (depth_width, depth_height)
        struct.unpack('f', f.read(4))  # depth shift
        self.num_frames = struct.unpack('Q', f.read(8))[0]
        return self

    def __exit__(self, *args):
        self.file_handle.close()

    def read(self):
        for _ in range(self.num_frames):
            frame = RGBDFrame()
            frame.load(self.file_handle)
            rgb = imageio.v3.imread(frame.color_data)
            depth = np.frombuffer(zlib.decompress(frame.depth_data),
                                  dtype=np.uint16).reshape(
                                      self.depth_size[1], self.depth_size[0])
            yield frame.camera_to_world, rgb, depth


def main():
    flags = read_args()
    os.makedirs(flags.out, exist_ok=True)

    label_helper = LabelHelper(flags.label_map, flags)
    label_helper.write_labelmap(flags.out)

    for scene in os.listdir(flags.scannet_scan_dir):
        label_helper.reset()
        scene_dir_in = os.path.join(flags.scannet_scan_dir, scene)
        sensor_file = os.path.join(scene_dir_in, f"{scene}.sens")
        semantic_dir_in = os.path.join(scene_dir_in, "label-filt")
        if not os.path.exists(semantic_dir_in):
            label_filt_zip = os.path.join(scene_dir_in,
                                          f"{scene}_2d-label-filt.zip")
            subprocess.call(['unzip', label_filt_zip, '-d', scene_dir_in])

        scene_out = os.path.join(flags.out, scene)
        rgb_dir = os.path.join(scene_out, "rgb")
        depth_dir = os.path.join(scene_out, "depth")
        pose_dir = os.path.join(scene_out, "pose")
        semantic_dir = os.path.join(scene_out, "gt_semantic")
        for d in (rgb_dir, depth_dir, pose_dir, semantic_dir):
            os.makedirs(d, exist_ok=True)

        copy_3d_semantics(scene_dir_in, scene, scene_out, label_helper)

        semantic_files = sorted(os.listdir(semantic_dir_in),
                                key=lambda x: int(x.split('.')[0]))

        with SensReader(sensor_file) as reader:
            write_intrinsics(scene_out, reader)
            stride = max(math.ceil(reader.num_frames / flags.max_frames),
                         flags.stride)
            for i, ((T_WC, rgb, depth), semantic_file) in enumerate(
                    zip(reader.read(), semantic_files)):
                if i % stride != 0:
                    continue
                print("Processing frame %d" % i, end='\r')
                if np.isnan(T_WC).any() or np.isinf(T_WC).any():
                    print("Skipping frame %d" % i, "because of nan or inf.")
                    continue
                T_CW = np.linalg.inv(T_WC)
                number = f"{i:06}"
                imageio.imwrite(os.path.join(rgb_dir, f"{number}.jpg"), rgb)
                cv2.imwrite(os.path.join(depth_dir, f"{number}.png"), depth)
                np.savetxt(os.path.join(pose_dir, f"{number}.txt"), T_CW)

                semantic_frame = cv2.imread(
                    os.path.join(semantic_dir_in, semantic_file), -1)
                out_semantic = label_helper.map_semantics(semantic_frame)
                label_helper.register_frame(out_semantic)
                cv2.imwrite(os.path.join(semantic_dir, f"{number}.png"),
                            out_semantic)

        write_metadata(scene_out, label_helper)
        subprocess.call([
            sys.executable,
            os.path.join(os.path.dirname(os.path.abspath(__file__)),
                         'compute_scene_bounds.py'), scene_out
        ])


if __name__ == "__main__":
    main()
