"""Tests for the interactive labeler: the Qt-free annotation layer, the
prompt-list model, and a --dry structural pass over the real window code
with Qt stubbed (VERDICT round-1 item 3)."""
import argparse
import importlib
import os
import sys

import cv2
import numpy as np
import pytest

from autolabel_tpu.ui.annotations import (AnnotationStore,
                                          paint_overlay_rgba,
                                          prediction_overlay_rgba)


def test_paint_stroke_writes_class_plus_one(tmp_path):
    store = AnnotationStore(str(tmp_path), (64, 48))
    bitmap = store.paint_stroke('frame0', (10, 10), (30, 10), class_id=1,
                                radius=3)
    assert bitmap.shape == (48, 64)
    assert bitmap[10, 20] == 2  # class 1 -> pixel value 2
    assert bitmap[40, 50] == 0  # untouched pixels stay unlabeled
    # Round caps extend past the endpoints.
    assert bitmap[10, 8] == 2


def test_save_load_roundtrip(tmp_path):
    store = AnnotationStore(str(tmp_path), (32, 24))
    assert store.save('f1') is None  # empty canvases are not persisted
    store.paint_stroke('f1', (5, 5), (20, 5), class_id=0)
    path = store.save('f1')
    assert path and os.path.exists(path)
    png = cv2.imread(path, cv2.IMREAD_GRAYSCALE)
    assert png.shape == (24, 32)
    assert png[5, 10] == 1  # class 0 -> value 1

    fresh = AnnotationStore(str(tmp_path), (32, 24))
    fresh.load_existing()
    np.testing.assert_array_equal(fresh.get('f1'), store.get('f1'))


def test_load_existing_rescales(tmp_path):
    semantic = tmp_path / 'semantic'
    semantic.mkdir()
    big = np.zeros((100, 200), np.uint8)
    big[:50] = 3
    cv2.imwrite(str(semantic / 'f2.png'), big)
    store = AnnotationStore(str(tmp_path), (20, 10))
    store.load_existing()
    bitmap = store.get('f2')
    assert bitmap.shape == (10, 20)
    assert bitmap[0, 0] == 3 and bitmap[9, 0] == 0


def test_clear(tmp_path):
    store = AnnotationStore(str(tmp_path), (16, 16))
    store.paint_stroke('f', (4, 4), (8, 8), class_id=2)
    assert not store.is_empty('f')
    store.clear('f')
    assert store.is_empty('f')


def test_overlays():
    bitmap = np.array([[0, 1], [2, 0]], np.uint8)
    rgba = paint_overlay_rgba(bitmap)
    assert rgba.shape == (2, 2, 4)
    assert rgba[0, 0, 3] == 0  # unlabeled -> transparent
    assert rgba[0, 1, 3] == 175 and rgba[1, 0, 3] == 175
    pred = prediction_overlay_rgba(np.array([[0, 1]]))
    assert pred.shape == (1, 2, 4)
    assert (pred[..., 3] == 120).all()


def test_prompt_list():
    sys.path.insert(0, os.path.join(os.path.dirname(__file__), '..'))
    from scripts.ros.class_input import BACKGROUND_PROMPT, PromptList
    published = []
    prompts = PromptList(on_change=published.append)
    assert prompts.prompts == [BACKGROUND_PROMPT]
    assert prompts.add('a red chair')
    assert not prompts.add('   ')
    assert published == [f'{BACKGROUND_PROMPT}|a red chair']
    prompts.reset()
    assert prompts.prompts == [BACKGROUND_PROMPT]
    assert published[-1] == BACKGROUND_PROMPT
    assert len(prompts.color(0)) == 3


@pytest.fixture()
def gui_module():
    from tests import qt_stub
    qt_stub.install()
    sys.path.insert(0, os.path.join(os.path.dirname(__file__), '..',
                                    'scripts'))
    if 'gui' in sys.modules:
        del sys.modules['gui']
    import gui
    return importlib.reload(gui)


def _dry_flags(scene):
    return argparse.Namespace(scene=scene, batch_size=512, dry=True,
                              lr=1e-4, features=None)


def test_gui_dry_structural(gui_module, sphere_scene, tmp_path):
    """Instantiate the real LabelerWindow over a real scene with Qt
    stubbed: navigation, painting, saving, clearing all run their true
    code paths (file I/O included)."""
    import shutil
    scene = str(tmp_path / 'scene')
    shutil.copytree(sphere_scene, scene)
    shutil.rmtree(os.path.join(scene, 'semantic'))  # start unlabeled
    window = gui_module.LabelerWindow(_dry_flags(scene))
    assert len(window.frame_names) == 12
    assert window.active_class == 1

    # Paint a stroke on frame 0; mouse-up must persist the PNG.
    window.show_frame(0)
    window._on_stroke((100.0, 100.0), (200.0, 100.0))
    window._on_stroke_end()
    name = window.frame_name
    png_path = os.path.join(scene, 'semantic', f'{name}.png')
    assert os.path.exists(png_path)
    saved = cv2.imread(png_path, cv2.IMREAD_GRAYSCALE)
    assert saved.max() == 2  # active class 1 -> value 2

    # Class toggle: selecting the active class flips to background.
    window.select_class(1)
    assert window.active_class == 0
    window.select_class(1)
    assert window.active_class == 1

    # Navigation keeps per-frame annotations separate.
    window.show_frame(3)
    assert window.annotations.is_empty(window.frame_name)
    window.show_frame(0)
    assert not window.annotations.is_empty(window.frame_name)

    # Clear removes the persisted PNG.
    window.clear_current_frame()
    assert not os.path.exists(png_path)
    assert window.annotations.is_empty(window.frame_name)

    # Preview dispatch renders without touching a live backend.
    h, w = 36, 48
    window._on_preview({
        'image_index': 0,
        'rgb': np.random.rand(h, w, 3).astype(np.float32),
        'depth': np.random.rand(h, w).astype(np.float32),
        'semantic': np.random.randint(0, 2, (h, w)),
        'features': None,
    })

    window.save_session()  # dry backend: must not raise


def test_backend_client_dry_is_inert(gui_module):
    client = gui_module.BackendClient(
        argparse.Namespace(dry=True), on_preview=lambda p: None)
    assert not client.live
    client.request_preview(0)
    client.labels_changed(0)
    client.save_checkpoint()
    client.poll()
    client.stop()
