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

import cv2
import imageio
import numpy as np
import pandas

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from autolabel_tpu.utils.ply import read_ply_vertices, write_ply_pointcloud

# CLI parity: reference scripts/convert_scannet.py; trimesh mesh copy is
# replaced by the numpy PLY reader/writer (vertices are all the 3D
# evaluator consumes).

SCANNET20_IDS = np.array(
    [1, 2, 3, 4, 5, 6, 7, 8, 9, 10, 11, 12, 14, 16, 24, 28, 33, 34, 36, 39])


def read_args():
    parser = argparse.ArgumentParser(
        description=description,
        formatter_class=argparse.RawTextHelpFormatter)
    parser.add_argument('scannet_scan_dir')
    parser.add_argument(
        '--label-map', required=True,
        help="Path to label map .tsv file with semantic label names and ids.")
    parser.add_argument('--out', required=True)
    parser.add_argument(
        '--max-frames', type=int, default=750,
        help="Maximum number of frames to keep.")
    parser.add_argument(
        '--stride', type=int, default=5, help="Use only every s-th frame.")
    parser.add_argument(
        '--nyu40', action='store_true', help="Use NYU40 label map.")
    parser.add_argument(
        '--scannet20', action='store_true',
        help="Use ScanNet20 evaluation label map.")
    return parser.parse_args()


class Vocabulary:
    """Target label vocabulary: raw ScanNet ids -> evaluation ids + prompts.

    `remap` is a dense uint16 lookup table over raw ids; `table` is the
    label_map.csv DataFrame (id, prompt) written next to the scenes.
    """

    def __init__(self, remap, table, raw_name_to_raw_id):
        self.remap = remap
        self.table = table
        self._raw_ids = raw_name_to_raw_id
        self.seen = set()

    @classmethod
    def from_tsv(cls, label_path, nyu40=False, scannet20=False):
        df = pandas.read_csv(label_path, sep='\t')
        raw_ids = df['id'].values
        remap = np.zeros(raw_ids.max() + 1, np.uint16)
        if nyu40 or scannet20:
            target_ids = np.arange(1, 41)
            prompts = [df['nyu40class'][df['nyu40id'] == i].values[0]
                       for i in target_ids]
            remap[raw_ids] = df['nyu40id'].values
        else:
            prompts = df['raw_category'].values.tolist()
            target_ids = np.arange(1, len(prompts) + 1)
            remap[raw_ids] = target_ids
        if scannet20:
            keep = np.isin(target_ids, SCANNET20_IDS)
            remap[~np.isin(remap, SCANNET20_IDS)] = 0
            prompts = list(np.asarray(prompts, dtype=object)[keep])
            target_ids = target_ids[keep]
        table = pandas.DataFrame({'id': target_ids, 'prompt': prompts})
        return cls(remap, table, dict(zip(df['raw_category'], raw_ids)))

    def id_of(self, raw_name):
        return self.remap[self._raw_ids[raw_name]]

    def apply(self, raw_label_image):
        mapped = self.remap[raw_label_image]
        self.seen.update(int(v) for v in np.unique(mapped))
        return mapped


class SceneWriter:
    """Owns one output scene directory and its artifact contract."""

    SUBDIRS = ('rgb', 'depth', 'pose', 'gt_semantic')

    def __init__(self, scene_out):
        self.root = scene_out
        for sub in self.SUBDIRS:
            os.makedirs(os.path.join(scene_out, sub), exist_ok=True)

    def _path(self, sub, name):
        return os.path.join(self.root, sub, name)

    def intrinsics(self, K):
        np.savetxt(os.path.join(self.root, 'intrinsics.txt'), K[:3, :3])

    def frame(self, index, T_WC, rgb, depth, semantic):
        stem = f"{index:06}"
        imageio.imwrite(self._path('rgb', stem + '.jpg'), rgb)
        cv2.imwrite(self._path('depth', stem + '.png'), depth)
        np.savetxt(self._path('pose', stem + '.txt'), np.linalg.inv(T_WC))
        cv2.imwrite(self._path('gt_semantic', stem + '.png'), semantic)

    def mesh(self, vertices, vertex_labels):
        write_ply_pointcloud(os.path.join(self.root, 'mesh.ply'), vertices)
        np.save(os.path.join(self.root, 'mesh_labels.npy'), vertex_labels)

    def metadata(self, vocab):
        blob = {
            'n_classes': int(vocab.table['id'].values.max()),
            'classes': sorted(vocab.seen),
        }
        with open(os.path.join(self.root, 'metadata.json'), 'w') as f:
            json.dump(blob, f, indent=2)

    def bounds(self):
        subprocess.call([
            sys.executable,
            os.path.join(os.path.dirname(os.path.abspath(__file__)),
                         'compute_scene_bounds.py'), self.root
        ])


def mesh_vertex_labels(scene_in, scene, vocab):
    """Rasterize the ScanNet mesh annotation onto vertices.

    Composes <scene>.aggregation.json (object/label -> segment ids) with
    <scene>_vh_clean_2.0.010000.segs.json (per-vertex segment index).
    """
    vertices = read_ply_vertices(
        os.path.join(scene_in, f"{scene}_vh_clean_2.ply"))
    with open(os.path.join(scene_in, f"{scene}.aggregation.json")) as f:
        groups = json.load(f)['segGroups']
    with open(os.path.join(
            scene_in, f"{scene}_vh_clean_2.0.010000.segs.json")) as f:
        vertex_seg = np.asarray(json.load(f)['segIndices'])

    seg_label = {}
    for group in groups:
        label_id = vocab.id_of(group['label'])
        for seg in group['segments']:
            seg_label[seg] = label_id
    labels = np.zeros(len(vertices), dtype=np.uint16)
    n = min(len(vertex_seg), len(labels))
    if len(vertex_seg) != len(labels):
        print(f"Mesh/segs vertex count mismatch for {scene}: "
              f"{len(labels)} vs {len(vertex_seg)}")
    for i in range(n):
        labels[i] = seg_label.get(int(vertex_seg[i]), 0)
    return vertices, labels


class RGBDFrame:
    """One record of the .sens stream: pose + jpeg color + zlib depth."""

    def load(self, f):
        self.camera_to_world = np.frombuffer(f.read(16 * 4),
                                             dtype=np.float32).reshape(4, 4)
        self.timestamp_color, self.timestamp_depth, color_size, depth_size = \
            struct.unpack('<QQQQ', f.read(32))
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
        version, = struct.unpack('I', f.read(4))
        assert version == 4
        strlen, = struct.unpack('Q', f.read(8))
        self.sensor_name = f.read(strlen).decode('utf-8')
        mats = np.frombuffer(f.read(4 * 16 * 4),
                             dtype=np.float32).reshape(4, 4, 4)
        (self.intrinsic_color, self.extrinsic_color,
         self.intrinsic_depth, self.extrinsic_depth) = mats
        (_, _, cw, ch, dw, dh, _, self.num_frames) = struct.unpack(
            '<iiIIIIfQ', f.read(36))
        self.rgb_size = (cw, ch)
        self.depth_size = (dw, dh)
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


def label_filt_files(scene_dir_in, scene):
    semantic_dir = os.path.join(scene_dir_in, 'label-filt')
    if not os.path.exists(semantic_dir):
        subprocess.call(['unzip',
                         os.path.join(scene_dir_in,
                                      f"{scene}_2d-label-filt.zip"),
                         '-d', scene_dir_in])
    names = sorted(os.listdir(semantic_dir),
                   key=lambda x: int(x.split('.')[0]))
    return [os.path.join(semantic_dir, n) for n in names]


def convert_scene(scene, scene_dir_in, scene_out, vocab, flags):
    vocab.seen = set()
    writer = SceneWriter(scene_out)
    writer.mesh(*mesh_vertex_labels(scene_dir_in, scene, vocab))
    semantic_paths = label_filt_files(scene_dir_in, scene)

    with SensReader(os.path.join(scene_dir_in, f"{scene}.sens")) as reader:
        writer.intrinsics(reader.intrinsic_color)
        stride = max(math.ceil(reader.num_frames / flags.max_frames),
                     flags.stride)
        for i, ((T_WC, rgb, depth), semantic_path) in enumerate(
                zip(reader.read(), semantic_paths)):
            if i % stride != 0:
                continue
            print(f"Processing frame {i}", end='\r')
            if not np.isfinite(T_WC).all():
                print(f"Skipping frame {i} because of nan or inf.")
                continue
            raw_semantic = cv2.imread(semantic_path, -1)
            writer.frame(i, T_WC, rgb, depth, vocab.apply(raw_semantic))

    writer.metadata(vocab)
    writer.bounds()


def main():
    flags = read_args()
    os.makedirs(flags.out, exist_ok=True)

    vocab = Vocabulary.from_tsv(flags.label_map, nyu40=flags.nyu40,
                                scannet20=flags.scannet20)
    vocab.table.to_csv(os.path.join(flags.out, 'label_map.csv'), index=False)

    for scene in os.listdir(flags.scannet_scan_dir):
        convert_scene(scene, os.path.join(flags.scannet_scan_dir, scene),
                      os.path.join(flags.out, scene), vocab, flags)


if __name__ == "__main__":
    main()
