"""Interactive scene labeler.

Paint sparse class strokes over scene frames while a NeRF trains in a
child process and streams back dense predictions. Behavior contract from
the reference tool (/root/reference/scripts/gui.py — key bindings per
README.md:92-102, PNG-on-disk label protocol, 5 s preview cadence, 50 ms
pipe poll), rebuilt around this repo's TPU backend:

  - label state is numpy (autolabel_tpu/ui/annotations.py), saved as
    grayscale PNGs the trainer re-reads — the disk IS the IPC payload;
  - one composited PaintCanvas widget (ui/canvas.py) instead of stacked
    graphics-scene items;
  - a BackendClient owns the child process + pipe and drops stale
    previews, so slow TPU renders never block painting.

Run with --dry to use the UI without a training backend.
"""
import argparse  # noqa: F401  (surface comes from model_flag_parser)
import os
import signal
import sys

import cv2
import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from PyQt6 import QtCore, QtGui, QtWidgets

from autolabel_tpu import model_utils, visualization
from autolabel_tpu.ui.annotations import AnnotationStore
from autolabel_tpu.ui.canvas import PaintCanvas
from autolabel_tpu.utils import Scene

PREVIEW_INTERVAL_MS = 5000
PIPE_POLL_MS = 50
CANVAS_WIDTH = 720
CLASS_KEYS = '0123456789'


def read_args():
    parser = model_utils.model_flag_parser()
    parser.set_defaults(lr=1e-4)
    parser.add_argument('scene')
    parser.add_argument('--batch-size', type=int, default=4096)
    parser.add_argument('--dry', action='store_true',
                        help="Run the UI without the NeRF backend.")
    parser.add_argument('--baked-preview', action='store_true',
                        help="Serve preview renders from a periodically "
                        "re-baked splat cache (millisecond frames) "
                        "instead of full volumetric renders.")
    parser.add_argument('--rebake-every', type=int, default=2000,
                        help="Training steps between preview re-bakes.")
    parser.add_argument('--occupancy-grid', action='store_true',
                        help="Maintain an occupancy grid masking density "
                        "in empty/unobserved cells during training.")
    return parser.parse_args()


def _run_backend(flags, connection):
    """Child-process entry: train forever, serving preview requests."""
    from autolabel_tpu.backend import TrainingLoop
    loop = TrainingLoop(flags.scene, flags, connection)
    signal.signal(signal.SIGTERM, loop.shutdown)
    loop.run()


class BackendClient:
    """Owns the trainer child process and its duplex pipe.

    Messages out: ('get_image', idx) / ('update_image', idx) /
    ('checkpoint', None). Messages in: ('image', payload). Stale previews
    (for a frame the user already navigated away from) are discarded
    here, not in the window.
    """

    def __init__(self, flags, on_preview):
        self.on_preview = on_preview
        self._current_frame = 0
        self._process = None
        self._pipe = None
        if not flags.dry:
            from torch import multiprocessing
            self._pipe, child_end = multiprocessing.Pipe()
            self._process = multiprocessing.Process(
                target=_run_backend, args=(flags, child_end))
            self._process.start()

    @property
    def live(self):
        return self._pipe is not None

    def request_preview(self, frame_index):
        self._current_frame = frame_index
        self._send(('get_image', frame_index))

    def labels_changed(self, frame_index):
        self._send(('update_image', frame_index))

    def save_checkpoint(self):
        self._send(('checkpoint', None))

    def poll(self):
        """Drain the pipe; forward the newest preview for the current
        frame to on_preview."""
        if not self.live:
            return
        while self._pipe.poll():
            kind, payload = self._pipe.recv()
            if kind == 'image' and \
                    payload['image_index'] == self._current_frame:
                self.on_preview(payload)

    def stop(self):
        if self._process is not None:
            self._process.terminate()
            self._process.join()
            self._process = None

    def _send(self, message):
        if self.live:
            self._pipe.send(message)


class PreviewStrip(QtWidgets.QWidget):
    """Vertical strip of live renders: rgb / depth / feature-PCA."""

    def __init__(self):
        super().__init__()
        layout = QtWidgets.QVBoxLayout(self)
        self.views = {}
        for name in ('rgb', 'depth', 'features'):
            label = QtWidgets.QLabel(name)
            label.setScaledContents(True)
            label.setMinimumSize(160, 120)
            layout.addWidget(label)
            self.views[name] = label

    def update_preview(self, payload):
        rgb = (np.clip(payload['rgb'], 0, 1) * 255).astype(np.uint8)
        self._set('rgb', rgb)
        self._set('depth', visualization.visualize_depth(payload['depth']))
        if payload.get('features') is not None:
            feat = (np.clip(payload['features'], 0, 1) * 255).astype(np.uint8)
            self._set('features', feat)

    def _set(self, name, array):
        array = np.ascontiguousarray(array)
        h, w = array.shape[:2]
        image = QtGui.QImage(array.data, w, h, array.strides[0],
                             QtGui.QImage.Format.Format_RGB888)
        self.views[name].setPixmap(QtGui.QPixmap.fromImage(image.copy()))

    def clear(self):
        for label in self.views.values():
            label.setPixmap(QtGui.QPixmap())


class LabelerWindow(QtWidgets.QMainWindow):

    def __init__(self, flags):
        super().__init__()
        self.setWindowTitle('autolabel-tpu')
        self.scene = Scene(flags.scene)
        self.frame_names = self.scene.image_names()
        self.frame_paths = self.scene.rgb_paths()

        cam_w, cam_h = self.scene.camera.size
        canvas_size = (CANVAS_WIDTH,
                       int(round(CANVAS_WIDTH * cam_h / cam_w)))
        self.annotations = AnnotationStore(flags.scene, canvas_size)
        self.annotations.load_existing()

        self.n_classes = self.scene.n_classes or 2
        self.active_class = 1
        self.frame_index = 0
        self._photo_cache = {}

        self.canvas = PaintCanvas(canvas_size, self._on_stroke,
                                  self._on_stroke_end)
        self.previews = PreviewStrip()

        splitter = QtWidgets.QSplitter()
        splitter.addWidget(self.canvas)
        splitter.addWidget(self.previews)
        splitter.setStretchFactor(0, 3)
        splitter.setStretchFactor(1, 1)
        self.setCentralWidget(splitter)

        self.frame_slider = QtWidgets.QSlider(
            QtCore.Qt.Orientation.Horizontal)
        self.frame_slider.setRange(0, len(self.frame_names) - 1)
        self.frame_slider.valueChanged.connect(self.show_frame)
        toolbar = self.addToolBar('frames')
        toolbar.addWidget(self.frame_slider)
        self.class_indicator = QtWidgets.QLabel()
        toolbar.addWidget(self.class_indicator)
        self._update_class_indicator()

        self.backend = BackendClient(flags, self._on_preview)
        self.preview_timer = QtCore.QTimer(self)
        self.preview_timer.timeout.connect(self._request_preview)
        self.preview_timer.start(PREVIEW_INTERVAL_MS)
        self.poll_timer = QtCore.QTimer(self)
        self.poll_timer.timeout.connect(self.backend.poll)
        self.poll_timer.start(PIPE_POLL_MS)

        self.show_frame(0)

    # -- frame navigation ----------------------------------------------

    @property
    def frame_name(self):
        return self.frame_names[self.frame_index]

    def show_frame(self, index):
        self.frame_index = int(index)
        photo = self._photo_cache.get(self.frame_index)
        if photo is None:
            bgr = cv2.imread(self.frame_paths[self.frame_index])
            photo = cv2.cvtColor(bgr, cv2.COLOR_BGR2RGB)
            self._photo_cache[self.frame_index] = photo
        self.canvas.show_photo(photo)
        self.canvas.clear_prediction()
        self.canvas.show_labels(self.annotations.get(self.frame_name))
        self.previews.clear()
        self._request_preview()
        self.preview_timer.start(PREVIEW_INTERVAL_MS)

    # -- painting ----------------------------------------------------------

    def _on_stroke(self, p0, p1):
        bitmap = self.annotations.paint_stroke(self.frame_name, p0, p1,
                                               self.active_class,
                                               self.canvas.brush_radius)
        self.canvas.show_labels(bitmap)

    def _on_stroke_end(self):
        if self.annotations.save(self.frame_name):
            self.backend.labels_changed(self.frame_index)

    def select_class(self, class_id):
        # Re-selecting the active class flips back to background — same
        # toggle the reference uses (gui.py:291-294).
        self.active_class = 0 if class_id == self.active_class else class_id
        self._update_class_indicator()

    def _update_class_indicator(self):
        self.class_indicator.setText(f'  class: {self.active_class}  ')

    def clear_current_frame(self):
        self.annotations.clear(self.frame_name)
        path = os.path.join(self.annotations.semantic_dir,
                            f'{self.frame_name}.png')
        if os.path.exists(path):
            os.remove(path)
        self.canvas.show_labels(self.annotations.get(self.frame_name))
        self.backend.labels_changed(self.frame_index)

    # -- backend -------------------------------------------------------------

    def _request_preview(self):
        self.backend.request_preview(self.frame_index)

    def _on_preview(self, payload):
        self.canvas.show_prediction(payload['semantic'])
        self.previews.update_preview(payload)

    def save_session(self):
        self.annotations.save_all()
        self.backend.save_checkpoint()

    # -- keys / lifecycle ------------------------------------------------

    def keyPressEvent(self, event):
        key = event.key()
        ctrl = event.modifiers() & QtCore.Qt.KeyboardModifier.ControlModifier
        if key in (QtCore.Qt.Key.Key_Escape, QtCore.Qt.Key.Key_Q):
            self.close()
        elif key == QtCore.Qt.Key.Key_S and ctrl:
            self.save_session()
        elif key == QtCore.Qt.Key.Key_C:
            self.clear_current_frame()
        else:
            text = event.text()
            if text in CLASS_KEYS and int(text) < self.n_classes:
                self.select_class(int(text))

    def closeEvent(self, event):
        self.backend.stop()
        event.accept()


def main():
    flags = read_args()
    from torch import multiprocessing
    multiprocessing.set_start_method('spawn')
    app = QtWidgets.QApplication([])
    window = LabelerWindow(flags)
    window.show()
    app.exec()


if __name__ == '__main__':
    main()
