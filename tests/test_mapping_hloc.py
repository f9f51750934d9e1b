"""HLoc SfM backend driven end to end under stub hloc/pycolmap modules.

The reference's only mapping path is hloc + pycolmap (reference
scripts/mapping.py:25-179); this repo import-gates that backend and
ships a built-in cv2+JAX one. Without hloc installed the HLoc class was
untested parity surface — these tests execute its full control flow
(feature extraction, pair generation on BOTH the exhaustive and the
NetVLAD-retrieval branches, matching, reconstruction, intrinsics/
distortion writing, rgb+depth undistortion) against recording stubs,
the same pattern the ROS/maplab tests use for rospy.
"""
import os
import sys
import types

import numpy as np
import pytest

cv2 = pytest.importorskip('cv2')

sys.path.insert(0, os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))), 'scripts'))


class _Recorder:
    """Module-shaped stub whose .main records every call."""

    def __init__(self, name, result=None):
        self.__name__ = name
        self.calls = []
        self._result = result
        self.confs = {
            'superpoint_aachen': {'output': 'feats-superpoint'},
            'netvlad': {'output': 'global-feats-netvlad'},
            'superglue': {'output': 'matches-superglue'},
        }

    def main(self, *args, **kwargs):
        self.calls.append((args, kwargs))
        return self._result


class _FakeCamera:

    def __init__(self, params):
        self.params = params


class _FakeModel:

    def __init__(self, params):
        self.cameras = {1: _FakeCamera(params)}
        self.written = []

    def write_text(self, path):
        self.written.append(path)


def _install_stubs(monkeypatch, camera_params):
    hloc = types.ModuleType('hloc')
    hloc.extract_features = _Recorder('extract_features',
                                      result='/tmp/fake-features.h5')
    hloc.match_features = _Recorder('match_features',
                                    result='/tmp/fake-matches.h5')
    hloc.pairs_from_exhaustive = _Recorder('pairs_from_exhaustive')
    hloc.pairs_from_retrieval = _Recorder('pairs_from_retrieval')
    hloc.reconstruction = _Recorder('reconstruction',
                                    result=_FakeModel(camera_params))
    pycolmap = types.ModuleType('pycolmap')
    pycolmap.CameraMode = types.SimpleNamespace(SINGLE='SINGLE')
    monkeypatch.setitem(sys.modules, 'hloc', hloc)
    monkeypatch.setitem(sys.modules, 'pycolmap', pycolmap)
    return hloc, pycolmap


def _make_raw_scene(root, n=3, size=(64, 48), depth_size=(32, 24)):
    (root / 'raw_rgb').mkdir(parents=True)
    (root / 'raw_depth').mkdir()
    rng = np.random.default_rng(0)
    for i in range(n):
        rgb = rng.integers(0, 255, size=(size[1], size[0], 3), dtype=np.uint8)
        cv2.imwrite(str(root / 'raw_rgb' / f'{i}.png'), rgb)
        depth = rng.integers(100, 4000, size=(depth_size[1], depth_size[0]),
                             dtype=np.uint16)
        cv2.imwrite(str(root / 'raw_depth' / f'{i}.png'), depth)
    K = np.array([[60.0, 0, 32.0], [0, 60.0, 24.0], [0, 0, 1.0]])
    np.savetxt(root / 'intrinsics.txt', K)


def test_hloc_exhaustive_end_to_end(tmp_path, monkeypatch):
    """< 250 images: superpoint + exhaustive pairs + superglue +
    COLMAP SINGLE/OPENCV reconstruction; intrinsics + distortion land in
    the scene dir and raw rgb/depth get undistorted (reference
    scripts/mapping.py:42-76, 123-175)."""
    params = (61.5, 62.5, 33.0, 23.0, 0.01, -0.002, 0.0005, -0.0005)
    hloc, pycolmap = _install_stubs(monkeypatch, params)

    scene_dir = tmp_path / 'capture'
    _make_raw_scene(scene_dir)

    import mapping as mapping_cli
    from autolabel_tpu.utils import Scene

    flags = types.SimpleNamespace(debug=False)
    scene = Scene(str(scene_dir))
    backend = mapping_cli.HLoc(str(tmp_path / 'work'), scene, flags)
    assert backend.exhaustive
    os.makedirs(tmp_path / 'work', exist_ok=True)
    backend.run()

    # Control flow: extract -> exhaustive pairs -> match -> reconstruct.
    assert len(hloc.extract_features.calls) == 1
    assert hloc.extract_features.calls[0][0][0] is \
        hloc.extract_features.confs['superpoint_aachen']
    assert len(hloc.pairs_from_exhaustive.calls) == 1
    assert len(hloc.match_features.calls) == 1
    assert hloc.match_features.calls[0][0][0] is \
        hloc.match_features.confs['superglue']
    assert not hloc.pairs_from_retrieval.calls
    (_, kwargs) = hloc.reconstruction.calls[0]
    assert kwargs['camera_mode'] == pycolmap.CameraMode.SINGLE
    assert kwargs['image_options'] == {'camera_model': 'OPENCV'}
    assert all(kwargs['mapper_options'][k] for k in
               ('ba_refine_principal_point', 'ba_refine_extra_params',
                'ba_refine_focal_length'))
    assert len(kwargs['image_list']) == 3

    # Artifacts: SfM intrinsics + distortion written back to the scene.
    K = np.loadtxt(scene_dir / 'intrinsics.txt')
    np.testing.assert_allclose(
        [K[0, 0], K[1, 1], K[0, 2], K[1, 2]], params[:4])
    np.testing.assert_allclose(
        np.loadtxt(scene_dir / 'distortion_parameters.txt'), params[4:])

    # Undistortion ran at each stream's own resolution.
    rgbs = sorted(os.listdir(scene_dir / 'rgb'))
    depths = sorted(os.listdir(scene_dir / 'depth'))
    assert len(rgbs) == 3 and len(depths) == 3
    rgb = cv2.imread(str(scene_dir / 'rgb' / rgbs[0]), cv2.IMREAD_UNCHANGED)
    assert rgb.shape == (48, 64, 3)
    depth = cv2.imread(str(scene_dir / 'depth' / depths[0]),
                       cv2.IMREAD_UNCHANGED)
    assert depth.shape == (24, 32) and depth.dtype == np.uint16


def test_hloc_retrieval_branch(tmp_path, monkeypatch):
    """>= 250 images switches pair generation to NetVLAD retrieval with
    num_matched=50 (reference scripts/mapping.py:31, 77-107)."""
    params = (61.5, 62.5, 33.0, 23.0, 0.0, 0.0, 0.0, 0.0)
    hloc, _ = _install_stubs(monkeypatch, params)

    scene_dir = tmp_path / 'capture'
    _make_raw_scene(scene_dir)

    import mapping as mapping_cli
    from autolabel_tpu.utils import Scene

    scene = Scene(str(scene_dir))
    # Only the count decides the branch; the stub never opens images.
    scene.raw_rgb_paths = lambda: [
        str(scene_dir / 'raw_rgb' / f'{i}.png') for i in range(300)]
    backend = mapping_cli.HLoc(str(tmp_path / 'work'), scene,
                               types.SimpleNamespace(debug=False))
    assert not backend.exhaustive
    os.makedirs(tmp_path / 'work', exist_ok=True)
    backend._run_sfm()

    # extract runs twice: retrieval (netvlad) then local (superpoint).
    confs = [call[0][0] for call in hloc.extract_features.calls]
    assert confs == [hloc.extract_features.confs['netvlad'],
                     hloc.extract_features.confs['superpoint_aachen']]
    assert not hloc.pairs_from_exhaustive.calls
    (_, kwargs) = hloc.pairs_from_retrieval.calls[0]
    assert kwargs['num_matched'] == 50
    assert len(hloc.match_features.calls) == 1
    assert np.loadtxt(scene_dir / 'distortion_parameters.txt').shape == (4,)


def test_pipeline_auto_prefers_hloc_when_importable(tmp_path, monkeypatch):
    """--backend auto resolves to HLoc when hloc+pycolmap import, and to
    the built-in cv2 backend otherwise."""
    import mapping as mapping_cli

    _install_stubs(monkeypatch, (1, 1, 0, 0, 0, 0, 0, 0))
    scene_dir = tmp_path / 'capture'
    _make_raw_scene(scene_dir, n=1)
    pipeline = mapping_cli.Pipeline(
        types.SimpleNamespace(scene=str(scene_dir), debug=False,
                              backend='auto'))
    assert pipeline._pick_backend() is mapping_cli.HLoc
    monkeypatch.delitem(sys.modules, 'hloc')
    monkeypatch.delitem(sys.modules, 'pycolmap')
    assert pipeline._pick_backend() is mapping_cli.CV2Mapping
